"""Per-stage timing of the bench path on the live backend (dev tool)."""
import json, os, sys, time
import numpy as np

def t(fn, *args, iters=20):
    import jax
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_bank_arrays
    from linemod_pose_estimation_tpu.ops import match as M
    from linemod_pose_estimation_tpu.ops import features as F

    n_templates = 10240
    T0, T1 = 5, 8
    E1, E0 = 48, 96
    Kc = E1 // T1 + 1
    feats1 = _synthetic_bank_arrays(n_templates, fmax=63, extent=E1, seed=0)
    feats0 = _synthetic_bank_arrays(n_templates, fmax=63, extent=E0, seed=1)
    W1 = M.build_gemm_weights(feats1, 8, T1, Kc)

    pre = jax.jit(lambda rgb: M.preprocess_frame(rgb, None, T0=T0, T1=T1, use_depth=False))
    pre_pallas = jax.jit(lambda rgb: M.preprocess_frame(rgb, None, T0=T0, T1=T1, use_depth=False, use_pallas=True))
    coarse = jax.jit(lambda R, W: M.coarse_scores_gemm(R, W, T1, Kc))
    def _sel(raw, f1):
        Hc, Wc = raw.shape[1:]
        vpos = M.position_validity(f1.size, T1, Hc, Wc)
        return M.select_candidates_approx(raw, f1.count, vpos, 80.0, 256)
    sel = jax.jit(_sel)
    refine = jax.jit(lambda R0, f0, cand: M.refine_candidates_pallas(R0, f0, cand, T1, 85.0, E0=E0, fine_T=T0))

    rng = np.random.default_rng(42)
    rgb = jnp.asarray(rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8))

    print("pre_xla_ms", round(t(pre, rgb), 3)); sys.stdout.flush()
    print("pre_pallas_ms", round(t(pre_pallas, rgb), 3)); sys.stdout.flush()
    pyr = pre(rgb)
    print("coarse_ms", round(t(coarse, pyr.grad_r1, W1), 3)); sys.stdout.flush()
    raw = coarse(pyr.grad_r1, W1)
    print("sel_ms", round(t(sel, raw, feats1), 3)); sys.stdout.flush()
    cand = sel(raw, feats1)
    print("refine_ms", round(t(refine, pyr.grad_r0, feats0, cand), 3)); sys.stdout.flush()

    # quantize-only (the non-pallas-fusable front half of preprocess)
    q = jax.jit(lambda rgb: F.quantize_color_gradient(rgb, 10.0)[0])
    print("quantize_l0_ms", round(t(q, rgb), 3)); sys.stdout.flush()
    from linemod_pose_estimation_tpu.ops.pallas_kernels import spread_response
    qv = q(rgb)
    sr = jax.jit(lambda q_: spread_response(q_, T0))
    print("spread_response_pallas_l0_ms", round(t(sr, qv), 3)); sys.stdout.flush()
    sx = jax.jit(lambda q_: F.response_maps(F.orientation_spread(q_, T0)))
    print("spread_response_xla_l0_ms", round(t(sx, qv), 3)); sys.stdout.flush()

    # end-to-end both ways
    def frame(rgb, prefn):
        pyr = prefn(rgb)
        raw = coarse(pyr.grad_r1, W1)
        cand = sel(raw, feats1)
        return refine(pyr.grad_r0, feats0, cand)
    print("frame_xla_pre_ms", round(t(frame, rgb, pre), 3)); sys.stdout.flush()
    print("frame_pallas_pre_ms", round(t(frame, rgb, pre_pallas), 3)); sys.stdout.flush()

if __name__ == "__main__":
    main()
