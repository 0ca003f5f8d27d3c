"""Stage-level profile of the POOLED production match path at the
headline batch — the round-5 successor of profile_pruned_sol.py: margins
(bound GEMM + epilogue), coarse pool build, pooled fine bound, fine pool
build, pooled survivor patches + exact GEMM (split), pooled select, and
the prefix-skipped walk, beside their analytic floors.  Also sweeps the
survivor dot's M axis to localize the batch-32 MFU regression
(VERDICT round 4: 89% at M=1536/B16 -> 68% at B32).

Usage: python tools/profile_pooled_sol.py [batch]   (real TPU)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import bench as B  # noqa: E402
from linemod_pose_estimation_tpu.models.detector import Detector  # noqa: E402
from linemod_pose_estimation_tpu.models.renderer import Renderer  # noqa: E402
from linemod_pose_estimation_tpu.models.templates import TemplateBank  # noqa: E402
from linemod_pose_estimation_tpu.ops import match as M  # noqa: E402

INT8_MACS = 197e12  # v5e-1: 394 int8 TOPS
HBM_GBS = 819e9


def thru(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:36s}: {ms:7.3f} ms/batch")
    return ms


def main():
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tpl, prm = B._gunzip_bank()
    det = Detector.read(tpl)
    meta, glob = TemplateBank.read_params_yaml(prm)
    bank = det.bank(det.class_ids[0])
    p = det.params
    T0, T1 = p.t_pyramid
    Kc1 = bank.max_cell_extent(1)
    E0 = bank.extent(0)
    use_depth = p.use_depth_normal
    C = 16 if use_depth else 8
    thr, top_k, g = 91.0, 128, 4
    pool1 = int(os.environ.get("LPE_BENCH_POOL1", str(56 * Bsz)))
    pool2 = int(os.environ.get("LPE_BENCH_POOL2", str(36 * Bsz)))
    n0 = bank.num_templates
    reps = max(1, -(-10240 // n0))
    N = ((n0 * reps + 127) // 128) * 128
    feats1 = B._tile_features(bank.merged_features(1), reps, N)
    feats0 = B._tile_features(bank.merged_features(0), reps, N)
    W_gemm = M.build_gemm_weights(feats1, C, T1, Kc1)
    W_cell = M.build_cell_weights(feats1, C, T1, Kc1)
    W_fine = M.build_cell_weights_fine(feats1, C, T1, Kc1, g)
    jax.block_until_ready((W_gemm, W_cell, W_fine))

    rng = np.random.default_rng(3)
    r = Renderer("/root/reference/config/stl/boxNew.stl", glob.width,
                 glob.height, glob.focal_length_x, glob.focal_length_y)
    frames, depths_np, _ = B._real_scenes(r, meta, Bsz, glob.height,
                                          glob.width, rng)
    rgbs, depths = jnp.asarray(frames), jnp.asarray(depths_np)
    H, W = glob.height, glob.width
    Hc, Wc = H // 2 // T1, W // 2 // T1
    K_dim = C * T1 * T1 * Kc1 * Kc1
    vpos = M.position_validity_flat(feats1.size, T1, Hc, Wc)
    sel_thr = thr - 5.0

    pre_b = jax.jit(lambda r_, d: M.preprocess_frames_batched(
        r_, d, T0=T0, T1=T1, use_depth=use_depth,
        weak_threshold=p.color.weak_threshold, use_pallas_quant=True))
    R0, R1 = pre_b(rgbs, depths)
    jax.block_until_ready((R0, R1))

    print(f"batch {Bsz}, N={N}, pools ({pool1}, {pool2}), K={K_dim}")
    margins_f = jax.jit(lambda Rb: M.position_margins_batched(
        Rb, W_cell, feats1.count, vpos, sel_thr, T1, Kc1))
    thru(pre_b, rgbs, depths, label="preprocess")
    ms_m = thru(margins_f, R1, label="margins (bound GEMM + epilogue)")
    margins = margins_f(R1)
    pool_f = jax.jit(lambda m: M.pool_plan_from_margins(m, pool1))
    thru(pool_f, margins, label=f"coarse pool build ({pool1})")
    # Grouped pre-bound alternative for the whole coarse plan.
    grp = 16
    W_grp, gcnt = M.build_group_bound(feats1, C, T1, Kc1, grp,
                                      W_cell=W_cell)
    jax.block_until_ready((W_grp, gcnt))
    grp_f = jax.jit(lambda Rb: M.pool_plan_grouped(
        Rb, W_cell, W_grp, gcnt, feats1.count, vpos, sel_thr, T1, Kc1,
        2 * pool1, pool1, grp))
    thru(grp_f, R1, label=f"GROUPED coarse plan (g{grp}, {2 * pool1})")
    ppg = grp_f(R1)
    print(f"  grouped plan: total={int(ppg.total)} "
          f"overflow={bool(ppg.overflow)}")
    pp = pool_f(margins)
    jax.block_until_ready(pp)
    print(f"  coarse survivors: total={int(pp.total)} "
          f"per-frame mean={float(np.asarray(pp.m_survivors).mean()):.1f} "
          f"max={int(np.asarray(pp.m_survivors).max())}")
    fub_f = jax.jit(lambda Rb, fr, po: M.fine_ub_at_pool(
        Rb, fr, po, W_fine, T1, Kc1, g))
    thru(fub_f, R1, pp.frame, pp.pos, label=f"fine ub at pool ({pool1})")
    ubf = fub_f(R1, pp.frame, pp.pos)

    t_int = M.int_score_threshold(sel_thr, feats1.count).astype(jnp.int32)

    @jax.jit
    def fine_pool_f(ubf, pp_frame, pp_pos, pp_keep):
        fm = jnp.where(vpos[pp_pos] & pp_keep[:, None],
                       ubf - t_int[None, :], -(2**30))
        fs = jnp.max(fm, axis=1)
        idx2, keep2, total2 = M._compact_eligible_flat(fs >= 0, pool2)
        return pp_frame[idx2], pp_pos[idx2], keep2, total2

    thru(fine_pool_f, ubf, pp.frame, pp.pos, pp.keep,
         label=f"fine margin + pool build ({pool2})")
    fr2, po2, keep2, total2 = fine_pool_f(ubf, pp.frame, pp.pos, pp.keep)
    print(f"  fine survivors: total={int(total2)}")

    # Pooled patches and the exact GEMM, separately then fused.
    def patches_f(Rb, fr, po):
        L = jax.vmap(lambda R: M.linearize_responses_lanes(R, T1, Kc1))(Rb)
        Hy = Hc + Kc1
        L3 = L.reshape(Bsz * Hy, Wc + Kc1, C * T1 * T1).astype(jnp.int8)
        return M.gather_windows_pooled(L3, fr * Hy + po // Wc, po % Wc, Kc1)

    patches_j = jax.jit(patches_f)
    ms_pat = thru(patches_j, R1, fr2, po2, label=f"pooled patches ({pool2})")
    P_sub = patches_j(R1, fr2, po2)
    dot_f = jax.jit(lambda P: jax.lax.dot_general(
        P, W_gemm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    ms_dot = thru(dot_f, P_sub, label=f"survivor dot ({pool2} x {K_dim})")
    floor = pool2 * K_dim * N / INT8_MACS * 1e3
    print(f"  dot floor {floor:.2f} ms -> MFU ~{100 * floor / ms_dot:.0f}%")
    gemm_f = jax.jit(lambda Rb, fr, po: M.coarse_scores_gemm_pooled(
        Rb, W_gemm, fr, po, T1, Kc1))
    thru(gemm_f, R1, fr2, po2, label="patches+dot fused")
    raw = gemm_f(R1, fr2, po2)

    # M-axis MFU sweep of the standalone survivor dot.
    print("\nM-axis sweep of the (M, K) x (K, N) int8 dot:")
    rngx = np.random.default_rng(0)
    for Mrows in (512, 768, 1024, 1536, 2048, 3072):
        A = jnp.asarray(rngx.integers(0, 4, size=(Mrows, K_dim), dtype=np.int8))
        ms = thru(dot_f, A, n=20, label=f"  M={Mrows}")
        fl = Mrows * K_dim * N / INT8_MACS * 1e3
        print(f"    floor {fl:.2f} ms -> MFU ~{100 * fl / ms:.0f}%")

    # M-CHUNKED variants: if the MFU drop is an M-tiling pathology, a
    # sequence of row-chunk dots (each at the good M) beats the single
    # big dot even though XLA re-reads the 1.57 GB weight per chunk —
    # the weight read is ~2 ms vs the ~6 ms/chunk of compute, so two
    # 89%-MFU chunks (~13.6 + 2 ms) would beat one 68% dot (17.9 ms).
    # If this WINS, wire a dot_m_chunk knob into the pooled path.
    print("\nM-chunked survivor dot (sequential row-chunk dots):")

    def chunked(A, chunk):
        outs = [
            jax.lax.dot_general(
                jax.lax.slice_in_dim(A, i, i + chunk, axis=0), W_gemm,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            for i in range(0, A.shape[0], chunk)
        ]
        return jnp.concatenate(outs, axis=0)

    for Mrows in (1536, 2048):
        A = jnp.asarray(rngx.integers(0, 4, size=(Mrows, K_dim), dtype=np.int8))
        fl = Mrows * K_dim * N / INT8_MACS * 1e3
        for chunk in (512, 768, 1024):
            if Mrows % chunk:
                continue
            f = jax.jit(lambda A, c=chunk: chunked(A, c))
            ms = thru(f, A, n=20, label=f"  M={Mrows} chunk={chunk}")
            print(f"    floor {fl:.2f} ms -> MFU ~{100 * fl / ms:.0f}%")

    # Pooled select + walk.
    fine_m = jnp.zeros((Bsz,), jnp.int32).at[fr2].add(
        keep2.astype(jnp.int32))
    starts2 = jnp.cumsum(fine_m) - fine_m
    sel_f = jax.jit(lambda raw, fr, po, kp, st, fm: M.select_candidates_pooled(
        raw, feats1.count, vpos, fr, po, kp, st, fm, sel_thr, top_k, Wc,
        128))
    thru(sel_f, raw, fr2, po2, keep2, starts2, fine_m, label="pooled select")
    cands, nv, _ = sel_f(raw, fr2, po2, keep2, starts2, fine_m)
    print(f"  n_valid mean={float(np.asarray(nv).mean()):.1f} "
          f"max={int(np.asarray(nv).max())}")
    walk_f = jax.jit(lambda R0, cand, nv: M.refine_candidates_opencv_batched(
        R0, feats0, cand, T1, thr, E0=E0, fine_T=T0, use_pallas=True,
        n_valid=nv))
    walk_full = jax.jit(lambda R0, cand: M.refine_candidates_opencv_batched(
        R0, feats0, cand, T1, thr, E0=E0, fine_T=T0, use_pallas=True))
    thru(walk_f, R0, cands, nv, label="walk (prefix skip)")
    thru(walk_full, R0, cands, label="walk (all slots)")


if __name__ == "__main__":
    main()
