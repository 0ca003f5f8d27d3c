"""Speed-of-light accounting for the PRUNED production match path.

Measures each stage of the pruned pipeline throughput-style (back-to-back
dispatches, one block at the end — a single block_until_ready through this
environment's remote-TPU tunnel costs ~30 ms and would swamp every number)
on the committed real bank at reference scale, and prints the analytic
floor beside each measurement:

- preprocess: HBM floor = bytes in/out of the filter/vote/spread chain;
  MXU floor = banded-matmul MACs.
- prune bound GEMM: int8 MACs = P * (Kc^2 C) * N (+ the int32 margin pass
  over (P, N)).
- survivor patch gather + GEMM: int8 MACs = m_cap * (C T^2 Kc^2) * N; the
  weight matrix read (K_dim x N int8) is the bandwidth term.
- select/refine: the Pallas walk kernel's VMEM-resident accumulation.

Writes the table into PERF.md by hand — this script just prints it.
Usage: python tools/profile_pruned_sol.py  (real TPU; no platform override)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench as B  # noqa: E402
from linemod_pose_estimation_tpu.models.detector import Detector  # noqa: E402
from linemod_pose_estimation_tpu.models.templates import TemplateBank  # noqa: E402
from linemod_pose_estimation_tpu.ops import match as M  # noqa: E402

# v5e peaks (public): 394 TOPS int8, 197 TFLOP/s bf16, 819 GB/s HBM.
INT8_TOPS = 394e12
HBM_GBS = 819e9


def thru(fn, *args, n=30, label="", per_frame=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.3f} ms/batch = {ms/per_frame*1e3:.0f} us/frame")
    return ms


def main():
    Bsz = 16
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
    thr, top_k, m_cap = 91.0, 128, 96
    n0 = bank.num_templates
    reps = max(1, -(-10240 // n0))
    N = ((n0 * reps + 127) // 128) * 128
    feats1 = B._tile_features(bank.merged_features(1), reps, N)
    feats0 = B._tile_features(bank.merged_features(0), reps, N)
    W_gemm = M.build_gemm_weights(feats1, C, T1, Kc1)
    W_cell = M.build_cell_weights(feats1, C, T1, Kc1)
    jax.block_until_ready((W_gemm, W_cell))

    rng = np.random.default_rng(3)
    from linemod_pose_estimation_tpu.models.renderer import Renderer
    r = Renderer("/root/reference/config/stl/boxNew.stl", glob.width,
                 glob.height, glob.focal_length_x, glob.focal_length_y)
    frames, depths_np, _ = B._real_scenes(r, meta, Bsz, glob.height,
                                          glob.width, rng)
    rgbs = jnp.asarray(frames)
    depths = jnp.asarray(depths_np)
    H, W = glob.height, glob.width
    Hc, Wc = H // 2 // T1, W // 2 // T1
    P = Hc * Wc
    K_dim = C * T1 * T1 * Kc1 * Kc1
    Kc_dim = Kc1 * Kc1 * C

    print(f"bank N={N} C={C} T1={T1} Kc1={Kc1} E0={E0} "
          f"P={P} K_dim={K_dim} W_gemm={W_gemm.nbytes/1e9:.2f} GB")

    pre_b = jax.jit(lambda rgbs, ds: M.preprocess_frames_batched(
        rgbs, ds, T0=T0, T1=T1, use_depth=use_depth,
        weak_threshold=p.color.weak_threshold, use_pallas_quant=True))
    vpos = M.position_validity_flat(feats1.size, T1, Hc, Wc)
    prune_b = jax.jit(lambda Rb, Wc_, cnt, vp: M.prune_positions_batched(
        Rb, Wc_, cnt, vp, thr - 5.0, T1, Kc1, m_cap))
    coarse_pos = jax.jit(lambda Rb, Wg, pi: M.coarse_scores_gemm_flat_batched_pos(
        Rb, Wg, pi, T1, Kc1, use_pallas=True))
    sel_pos = jax.jit(jax.vmap(
        lambda raw, pi, pk, cnt, vp: M.select_candidates_flat_pos(
            raw, cnt, vp, pi, pk, thr - 5.0, top_k, Wc),
        in_axes=(0, 0, 0, None, None)))
    refine_b = jax.jit(lambda R0, cand, f0: M.refine_candidates_opencv_batched(
        R0, f0, cand, T1, thr, E0=E0, fine_T=T0, use_pallas=True))

    ms_pre = thru(pre_b, rgbs, depths, label="preprocess")
    R0, R1 = pre_b(rgbs, depths)
    jax.block_until_ready((R0, R1))
    ms_prune = thru(prune_b, R1, W_cell, feats1.count, vpos, label="prune bound")
    pp = prune_b(R1, W_cell, feats1.count, vpos)
    jax.block_until_ready(pp)
    ms_gemm = thru(coarse_pos, R1, W_gemm, pp.p_idx, label="survivor gather+GEMM")
    raw = coarse_pos(R1, W_gemm, pp.p_idx)
    jax.block_until_ready(raw)
    ms_sel = thru(sel_pos, raw, pp.p_idx, pp.p_keep, feats1.count, vpos,
                  label="select")
    cand = sel_pos(raw, pp.p_idx, pp.p_keep, feats1.count, vpos)
    jax.block_until_ready(cand)
    ms_ref = thru(refine_b, R0, cand, feats0, label="refine walk")

    # Analytic floors (per batch of Bsz frames).
    bound_macs = Bsz * P * Kc_dim * N
    margin_bytes = Bsz * P * N * 4 * 2
    surv_macs = Bsz * m_cap * K_dim * N
    wread = W_gemm.nbytes
    print("\n-- floors (per batch) --")
    print(f"bound GEMM: {bound_macs/INT8_TOPS*1e3:.3f} ms int8-MXU; "
          f"margin pass {margin_bytes/HBM_GBS*1e3:.3f} ms HBM")
    print(f"survivor GEMM: {surv_macs/INT8_TOPS*1e3:.3f} ms int8-MXU; "
          f"weight read {wread/HBM_GBS*1e3:.3f} ms HBM")
    pre_bytes = Bsz * (H * W * 3 + H * W * 4 + C * H * W + C * H * W // 4) * 3
    print(f"preprocess rough HBM (3 passes of in+R0+R1): "
          f"{pre_bytes/HBM_GBS*1e3:.3f} ms")
    tot = ms_pre + ms_prune + ms_gemm + ms_sel + ms_ref
    print(f"\nstage sum: {tot:.2f} ms/batch -> {Bsz/tot*1e3:.1f} fps/chip")


if __name__ == "__main__":
    main()
