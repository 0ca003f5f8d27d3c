"""Bisect batched RGB-D stage compiles on the live backend (dev tool)."""
import os, sys, time
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench as BB
    from linemod_pose_estimation_tpu.ops import match as M

    def log(m):
        print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

    n_templates, B = 10240, 16
    T0, T1, E1, E0, top_k, thr = 5, 8, 48, 96, 256, 85.0
    Kc = (E1 - 1) // T1 + 1
    n_mod = 2
    log("building bank arrays")
    feats1 = BB._merged_bank(n_templates, 63*n_mod, E1, n_mod, seed=0)
    feats0 = BB._merged_bank(n_templates, 63*n_mod, E0, n_mod, seed=1)
    jax.block_until_ready(feats1.oris); log("bank arrays on device")
    W1 = M.build_gemm_weights(feats1, 8*n_mod, T1, Kc)
    jax.block_until_ready(W1); log(f"W1 built {W1.shape}")

    rng = np.random.default_rng(42)
    rgbs = jnp.asarray(rng.integers(0,255,size=(B,480,640,3),dtype=np.uint8))
    depths = jnp.asarray(rng.uniform(600,900,size=(B,480,640)).astype(np.float32))
    log("inputs on device")

    def _pre(rgb, depth_mm):
        pyr = M.preprocess_frame(rgb, depth_mm, T0=T0, T1=T1, use_depth=True)
        return (jnp.concatenate([pyr.grad_r0, pyr.norm_r0], axis=0),
                jnp.concatenate([pyr.grad_r1, pyr.norm_r1], axis=0))
    pre1 = jax.jit(_pre)
    R0f, R1f = pre1(rgbs[0], depths[0]); jax.block_until_ready(R1f); log("single-frame RGBD pre compiled")
    pre_b = jax.jit(jax.vmap(_pre))
    R0, R1 = pre_b(rgbs, depths); jax.block_until_ready(R1); log("batched pre compiled")
    coarse1 = jax.jit(lambda R, W: M.coarse_scores_gemm_flat(R, W, T1, Kc))
    raw1 = coarse1(R1f, W1); jax.block_until_ready(raw1); log("single coarse RGBD compiled")
    coarse_b = jax.jit(lambda Rb, W: M.coarse_scores_gemm_flat_batched(Rb, W, T1, Kc))
    raw = coarse_b(R1, W1); jax.block_until_ready(raw); log("batched coarse compiled")
    Hc, Wc = 480 // 2 // T1, 640 // 2 // T1
    def _sel(rawf, f1):
        vpos = M.position_validity_flat(f1.size, T1, Hc, Wc)
        return M.select_candidates_flat(rawf, f1.count, vpos, thr-5.0, top_k, Wc)
    sel_b = jax.jit(jax.vmap(_sel, in_axes=(0,None)))
    cand = sel_b(raw, feats1); jax.block_until_ready(cand.similarity); log("batched sel compiled")
    refine_b = jax.jit(lambda R0_, c, f0: M.refine_candidates_pallas_batched(R0_, f0, c, T1, thr, E0=E0, fine_T=T0))
    out = refine_b(R0, cand, feats0); jax.block_until_ready(out.similarity); log("batched refine compiled")

    def t(fn, *args, iters=10):
        o = fn(*args); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters): o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter()-t0)/iters*1e3
    log(f"pre_b {t(pre_b, rgbs, depths):.2f} ms  coarse_b {t(coarse_b, R1, W1):.2f} ms  sel_b {t(sel_b, raw, feats1):.2f} ms  refine_b {t(refine_b, R0, cand, feats0):.2f} ms")
    def chain(rgbs, depths):
        R0, R1 = pre_b(rgbs, depths)
        raw = coarse_b(R1, W1)
        cand = sel_b(raw, feats1)
        return refine_b(R0, cand, feats0)
    dt = t(chain, rgbs, depths)
    log(f"chain B={B}: {dt:.2f} ms -> {B/dt*1000:.1f} fps/chip (RGB-D)")

if __name__ == "__main__":
    main()
