"""Benchmark: RGB-D frames/sec/chip for full-pyramid LINEMOD matching at
640x480 over a large template bank (the BASELINE.json headline metric:
">= 1000 RGB-D fps/chip @ 640x480 over a 10k-template bank").

Runs on whatever JAX backend is live (the driver provides one real TPU
chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, "extra": {...}}

vs_baseline is measured fps / 1000 (the north-star target; the reference
itself publishes no numbers — BASELINE.md).

HEADLINE: the PRODUCTION path on a REAL trained bank — the committed
reference-scale 2652-view banks (data/*.yml.gz: dual-modality
ColorGradient+DepthNormal when present, else ColorGradient) tiled to the
10k scale, matched over realistic bin-picking scenes (rendered views of
the real object planted on low-texture backgrounds with distractors),
through exact hierarchical pruning: one cell-max upper-bound GEMM ->
per-frame survivor positions -> exact int8 GEMM over survivors with the
static weight matrix -> flat select -> ONE Pallas refinement dispatch.
Exactness is equality-tested in tests/test_prune.py; the bench also
reports the planted-object found-rate and the exhaustive-path fps on the
same scenes.

EXTRAS: exhaustive real-bank fps, the round-2 synthetic-bank numbers
(continuity), single-frame fps, two-object config, and the end-to-end
p50 detect+cascade latency.

The pipeline runs as stage-level jitted programs rather than one fused
program: XLA compiles of the monolith take ~10 minutes through this
environment's remote-compile tunnel, while the stages hit the persistent
compilation cache; chained async dispatches cost ~25 us each.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BG_MM = 1500.0


def _merged_bank(n_templates: int, fmax: int, extent: int, n_mod: int, seed: int):
    """Synthetic modality-merged LevelFeatures (oris in [0, 8*n_mod))."""
    import jax.numpy as jnp

    from linemod_pose_estimation_tpu.ops.match import LevelFeatures

    rng = np.random.default_rng(seed)
    offs = rng.integers(0, extent, size=(n_templates, fmax, 2)).astype(np.int32)
    oris = rng.integers(0, 8 * n_mod, size=(n_templates, fmax)).astype(np.int32)
    cnt = np.full((n_templates,), fmax, np.int32)
    live = np.ones((n_templates, fmax), bool)
    size = np.full((n_templates, 2), extent, np.int32)
    return LevelFeatures(
        offsets=jnp.asarray(offs), oris=jnp.asarray(oris), live=jnp.asarray(live),
        count=jnp.asarray(cnt), size=jnp.asarray(size),
    )


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _time(fn, iters, *args, label=""):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _log(f"{label}: warmup/compile {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ----------------------------------------------------------------------
# Real-bank headline


def _gunzip_bank(stems=("boxNew_rgbd", "boxNew_full")):
    """Decompress the committed reference-scale banks; prefer RGB-D."""
    for stem in stems:
        tpl_gz = os.path.join(REPO, "data", f"{stem}_templates.yml.gz")
        prm_gz = os.path.join(REPO, "data", f"{stem}_params.yml.gz")
        if os.path.exists(tpl_gz) and os.path.exists(prm_gz):
            tpl = f"/tmp/bench_{stem}_templates.yml"
            prm = f"/tmp/bench_{stem}_params.yml"
            for src, dst in ((tpl_gz, tpl), (prm_gz, prm)):
                if not os.path.exists(dst):
                    with gzip.open(src, "rb") as f, open(dst, "wb") as g:
                        shutil.copyfileobj(f, g)
            return tpl, prm
    return None, None


def _tile_features(f, reps: int, pad_to: int):
    import jax.numpy as jnp

    from linemod_pose_estimation_tpu.ops.match import LevelFeatures

    cat = lambda a: np.concatenate([np.asarray(a)] * reps, axis=0)
    offs, oris, live, cnt, size = (cat(a) for a in f)
    pad = pad_to - offs.shape[0]
    z = lambda a: np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    return LevelFeatures(
        jnp.asarray(z(offs)), jnp.asarray(z(oris)), jnp.asarray(z(live) & True),
        jnp.asarray(z(cnt)), jnp.asarray(np.pad(size, [(0, pad), (0, 0)],
                                                constant_values=10**6)),
    )


def _real_scenes(renderer, meta, B, H, W, rng, n_objects=2):
    """Bin-picking RGB-D scenes: rendered real views planted (color AND
    depth) on low-texture backgrounds with flat distractors."""
    yy, xx = np.mgrid[0:H, 0:W]
    frames = np.zeros((B, H, W, 3), np.uint8)
    depths = np.zeros((B, H, W), np.float32)
    truths = []
    n_meta = meta.R.shape[0]
    views = {}
    for b in range(B):
        bg = (40 + 60 * yy / H + 30 * np.sin(xx / 200.0)).astype(np.uint8)
        fr = np.stack([bg, (bg * 0.9).astype(np.uint8),
                       (bg * 1.1).clip(0, 255).astype(np.uint8)], -1)
        dp = np.full((H, W), BG_MM, np.float32)
        for _ in range(3):
            y0, x0 = int(rng.integers(0, H - 80)), int(rng.integers(0, W - 120))
            fr[y0:y0 + 80, x0:x0 + 120] = rng.integers(60, 160, size=3)
            dp[y0:y0 + 80, x0:x0 + 120] = float(rng.uniform(1200, 1800))
        planted = []
        for _ in range(n_objects):
            vid = int(rng.integers(0, min(n_meta, 64)))
            if vid not in views:
                out = renderer.render(meta.R[vid], meta.T[vid])
                views[vid] = (np.asarray(out.rgb), np.asarray(out.depth_mm),
                              np.asarray(out.mask) > 0,
                              [int(v) for v in np.asarray(out.rect)])
            rgb, vdep, mask, (x, y, w, h) = views[vid]
            dy = int(rng.integers(-y, H - (y + h)))
            dx = int(rng.integers(-x, W - (x + w)))
            sub = mask[y:y + h, x:x + w]
            tgt = np.s_[y + dy:y + dy + h, x + dx:x + dx + w]
            fr[tgt][sub] = rgb[y:y + h, x:x + w][sub]
            dp[tgt][sub] = vdep[y:y + h, x:x + w][sub].astype(np.float32)
            planted.append((vid, x + dx, y + dy))
        frames[b], depths[b] = fr, dp
        truths.append(planted)
    return frames, depths, truths


def _found_rate(m, truths, tol=8):
    ok, total = 0, 0
    for b, pl in enumerate(truths):
        v = np.asarray(m.valid[b])
        xs, ys = np.asarray(m.x[b]), np.asarray(m.y[b])
        for vid, x, y in pl:
            total += 1
            ok += bool((v & (np.abs(xs - x) <= tol) & (np.abs(ys - y) <= tol)).any())
    return ok, total


def _bench_real_bank(B, iters, extra):
    """The headline: production pruned path over the tiled real bank."""
    import jax
    import jax.numpy as jnp

    from linemod_pose_estimation_tpu.models.detector import Detector
    from linemod_pose_estimation_tpu.models.renderer import Renderer
    from linemod_pose_estimation_tpu.models.templates import TemplateBank
    from linemod_pose_estimation_tpu.ops import match as M

    tpl, prm = _gunzip_bank()
    if tpl is None:
        return None
    t0 = time.perf_counter()
    det = Detector.read(tpl)
    extra["real_cold_start_load_s"] = round(time.perf_counter() - t0, 2)
    meta, glob = TemplateBank.read_params_yaml(prm)
    cid = det.class_ids[0]
    bank = det.bank(cid)
    p = det.params
    T0, T1 = p.t_pyramid
    Kc1 = bank.max_cell_extent(1)
    E0 = bank.extent(0)
    use_depth = p.use_depth_normal
    C = 16 if use_depth else 8
    # m_cap 96: the exact-quantizer bank measures ~49 mean survivors on
    # these scenes (the 5x5-median-smoothed normal field spreads wider),
    # and m_cap 64 OVERFLOWED — which triggers the in-graph exhaustive
    # fallback and costs the whole batch the exhaustive price.  96 keeps
    # ~2x headroom (measured 331 fps vs 290 at cap 128; the survivor GEMM
    # is linear in the cap).  LPE_BENCH_MCAP overrides for tuning runs.
    thr, top_k = 91.0, 128
    m_cap = int(os.environ.get("LPE_BENCH_MCAP", "96"))
    # Fine-stage (g=4 subcell bound) position cap: real scenes measure
    # mean ~28 / max ~38 fine survivors of the ~46 coarse ones, so 48
    # keeps headroom; overflow falls back in-graph to the coarse set.
    m2_cap = int(os.environ.get("LPE_BENCH_M2CAP", "48"))
    fine_g = 4

    n0 = bank.num_templates
    # tile UP to >= 10240 (LPE_BENCH_TILE overrides for smoke tests).
    tile_to = int(os.environ.get("LPE_BENCH_TILE", "10240"))
    reps = max(1, -(-tile_to // n0))
    N = ((n0 * reps + 127) // 128) * 128
    feats1 = _tile_features(bank.merged_features(1), reps, N)
    feats0 = _tile_features(bank.merged_features(0), reps, N)
    _log(f"real bank {n0} x {reps} -> {N} templates, Kc1={Kc1}, E0={E0}, "
         f"modalities={'RGB-D' if use_depth else 'RGB'}")

    W_gemm = M.build_gemm_weights(feats1, C, T1, Kc1)
    W_cell = M.build_cell_weights(feats1, C, T1, Kc1)
    W_fine = M.build_cell_weights_fine(feats1, C, T1, Kc1, fine_g)
    jax.block_until_ready((W_gemm, W_cell, W_fine))

    rng = np.random.default_rng(3)
    r = Renderer("/root/reference/config/stl/boxNew.stl", glob.width,
                 glob.height, glob.focal_length_x, glob.focal_length_y)
    frames, depths_np, truths = _real_scenes(r, meta, B, glob.height, glob.width, rng)
    rgbs = jnp.asarray(frames)
    depths = jnp.asarray(depths_np)

    pq = jax.default_backend() != "cpu"
    pre_b = jax.jit(lambda rgbs, depths: M.preprocess_frames_batched(
        rgbs, depths, T0=T0, T1=T1, use_depth=use_depth,
        weak_threshold=p.color.weak_threshold, use_pallas_quant=pq))
    Hc, Wc = glob.height // 2 // T1, glob.width // 2 // T1
    vpos = M.position_validity_flat(feats1.size, T1, Hc, Wc)
    pallas_gather = jax.default_backend() != "cpu"
    # The production orchestrator: coarse bound -> fine subcell re-test ->
    # exact GEMM over fine survivors, with both in-graph exact fallbacks.
    orch_b = jax.jit(lambda Rb, Wg, Wc_, Wf, cnt, vp:
                     M.match_coarse_pruned_fine_with_fallback(
                         Rb, Wg, Wc_, Wf, cnt, vp, thr - 5.0, T1, Kc1,
                         fine_g, m_cap, m2_cap, top_k, Wc,
                         use_pallas=pallas_gather))
    coarse_ex = jax.jit(lambda Rb, W: M.coarse_scores_gemm_flat_batched(Rb, W, T1, Kc1))
    sel_ex = jax.jit(jax.vmap(
        lambda raw, cnt, vp: M.select_candidates_flat(raw, cnt, vp, thr - 5.0,
                                                      top_k, Wc),
        in_axes=(0, None, None)))
    walk_pallas = jax.default_backend() != "cpu"
    # Every path passes the per-frame valid-prefix count into the walk:
    # similarity-sorted selects put valid candidates first, so the Pallas
    # kernel skips the sub-threshold top-k filler (real scenes fill ~30-60
    # of the 128 slots); the in-graph prefix guard makes this exact.
    refine_b = jax.jit(lambda R0, cand, f0: M.refine_candidates_opencv_batched(
        R0, f0, cand, T1, thr, E0=E0, fine_T=T0, use_pallas=walk_pallas,
        n_valid=jnp.sum(cand.valid.astype(jnp.int32), axis=1)))
    refine_nv = jax.jit(lambda R0, cand, f0, nv: M.refine_candidates_opencv_batched(
        R0, f0, cand, T1, thr, E0=E0, fine_T=T0, use_pallas=walk_pallas,
        n_valid=nv))
    # POOLED path (batch-shared survivor pool, per-frame fallback
    # granularity): the headline contender vs the per-frame-cap path.
    pool1 = int(os.environ.get("LPE_BENCH_POOL1", str(56 * B)))
    pool2 = int(os.environ.get("LPE_BENCH_POOL2", str(36 * B)))
    # Group-max pre-bound (build_group_bound): replaces the full (B, P, N)
    # bound GEMM + epilogue with a (B*P, N/group) one + a per-template
    # re-test at pooled positions only.  LPE_BENCH_GROUP=0 disables.
    grp = int(os.environ.get("LPE_BENCH_GROUP", "16"))
    gkw = {}
    if grp:
        W_grp, gcnt = M.build_group_bound(feats1, C, T1, Kc1, grp,
                                          W_cell=W_cell)
        jax.block_until_ready((W_grp, gcnt))
        gkw = dict(W_group=W_grp, group_counts=gcnt, group=grp,
                   pool0=int(os.environ.get("LPE_BENCH_POOL0",
                                            str(2 * pool1))))
    # Survivor-dot M-chunk probe: the (pool2, K) x (K, N) int8 dot's MFU
    # degrades with M past ~1k on v5e (round-4 ledger: 89% at M=768 ->
    # 68% at M=1536); sequential row-chunk dots re-read the static weight
    # (~2 ms) but keep the good MXU rate.  Time the bare dot at the
    # pool's M and let the measurement pick (results are bit-identical).
    # LPE_BENCH_DOT_CHUNK=-1 (default) probes on TPU; >=0 forces.
    m_chunk = int(os.environ.get("LPE_BENCH_DOT_CHUNK", "-1"))
    if m_chunk < 0:
        m_chunk = 0
        if jax.default_backend() != "cpu":
            P2 = min(pool2, pool1)
            K_dim = W_gemm.shape[0]
            A_probe = jnp.asarray(np.random.default_rng(7).integers(
                0, 4, size=(P2, K_dim), dtype=np.int8))
            dn = (((1,), (0,)), ((), ()))

            # W is an ARGUMENT, never a closure: a jit-captured const of
            # this size (1.57 GB) rides inside the remote-compile request
            # body on the tunneled backend, which rejects it (HTTP 413).
            def _dot_c(A, W, c):
                if c and c < P2:
                    return jnp.concatenate(
                        [jax.lax.dot_general(
                            jax.lax.slice_in_dim(A, i, min(i + c, P2), axis=0),
                            W, dn, preferred_element_type=jnp.int32)
                         for i in range(0, P2, c)], axis=0)
                return jax.lax.dot_general(A, W, dn,
                                           preferred_element_type=jnp.int32)

            best = float("inf")
            for c in (0, 512, 768):
                if c and c >= P2:
                    continue
                dt_c = _time(jax.jit(lambda A, W, c=c: _dot_c(A, W, c)), 10,
                             A_probe, W_gemm, label=f"dot_probe_chunk{c}")
                if dt_c < best:
                    best, m_chunk = dt_c, c
            del A_probe  # ~113 MB; dead past the probe
    extra["real_dot_m_chunk"] = m_chunk
    orch_pool = jax.jit(lambda Rb, Wg, Wc_, Wf, cnt, vp:
                        M.match_pooled_fine_with_fallback(
                            Rb, Wg, Wc_, Wf, cnt, vp, thr - 5.0, T1, Kc1,
                            fine_g, pool1, pool2, top_k, Wc,
                            m_chunk=m_chunk, **gkw))

    def match_pruned(rgbs, depths, Wg=W_gemm, Wc=W_cell, Wf=W_fine):
        R0, R1 = pre_b(rgbs, depths)
        cand, _pp, _fp = orch_b(R1, Wg, Wc, Wf, feats1.count, vpos)
        return refine_b(R0, cand, feats0)

    def match_pooled(rgbs, depths, Wg=W_gemm, Wc=W_cell, Wf=W_fine):
        R0, R1 = pre_b(rgbs, depths)
        cand, nv, _st = orch_pool(R1, Wg, Wc, Wf, feats1.count, vpos)
        return refine_nv(R0, cand, feats0, nv)

    def match_ex(rgbs, depths):
        R0, R1 = pre_b(rgbs, depths)
        raw = coarse_ex(R1, W_gemm)
        cand = sel_ex(raw, feats1.count, vpos)
        return refine_b(R0, cand, feats0)

    dt_pool = _time(match_pooled, iters, rgbs, depths,
                    label=f"real_pooled_batch{B}")
    dt = _time(match_pruned, iters, rgbs, depths, label=f"real_pruned_batch{B}")
    extra["real_pooled_batch_fps"] = round(B / dt_pool, 2)
    extra["real_percap_batch_fps"] = round(B / dt, 2)
    # Headline = the faster of the two exact pruned paths (both equality-
    # gated below); the pooled path is expected to win once its pools are
    # tuned, but the measurement decides.  LPE_BENCH_HEADLINE forces the
    # selection (debug / smoke coverage of the losing path's plumbing).
    forced = os.environ.get("LPE_BENCH_HEADLINE")
    if forced == "pooled" or (forced is None and dt_pool <= dt):
        match_headline, extra["real_headline_path"] = match_pooled, "pooled"
        fps = B / dt_pool
    else:
        match_headline, extra["real_headline_path"] = match_pruned, "per_frame_caps"
        fps = B / dt
    if forced is None:
        fps = B / min(dt, dt_pool)
    dt_ex = _time(match_ex, max(iters // 2, 5), rgbs, depths,
                  label=f"real_exhaustive_batch{B}")
    # Found rates for BOTH exact pruned paths, not just the headline
    # winner: aliasing real_found_pruned to the headline would leave the
    # losing path (still a supported prune mode) with zero accuracy
    # validation in the artifact.
    m_pc = match_pruned(rgbs, depths)
    m_ex = match_ex(rgbs, depths)
    m_pl = match_pooled(rgbs, depths)
    ok_p, tot = _found_rate(m_pc, truths)
    ok_e, _ = _found_rate(m_ex, truths)
    ok_pl, _ = _found_rate(m_pl, truths)
    R1_stats = pre_b(rgbs, depths)[1]
    _, pp, fp = orch_b(R1_stats, W_gemm, W_cell, W_fine, feats1.count, vpos)
    _, _, pst = orch_pool(R1_stats, W_gemm, W_cell, W_fine,
                          feats1.count, vpos)
    extra["real_bank_templates"] = int(N)
    extra["real_bank_modalities"] = "RGB-D" if use_depth else "RGB"
    extra["real_exhaustive_fps"] = round(B / dt_ex, 2)
    extra["real_found_pruned"] = f"{ok_p}/{tot}"
    extra["real_found_exhaustive"] = f"{ok_e}/{tot}"
    extra["real_found_pooled"] = f"{ok_pl}/{tot}"
    extra["real_found_headline"] = (
        extra["real_found_pooled"]
        if extra["real_headline_path"] == "pooled"
        else extra["real_found_pruned"]
    )
    extra["real_prune_pos_survivors_mean"] = round(
        float(np.asarray(pp.m_survivors).mean()), 1)
    extra["real_fine_pos_survivors_mean"] = round(
        float(np.asarray(fp.m_survivors).mean()), 1)
    extra["real_prune_overflow"] = bool(pp.overflow)
    extra["real_fine_overflow"] = bool(fp.overflow)
    extra["real_pool_coarse_total"] = int(pst.coarse_total)
    extra["real_pool_fine_total"] = int(pst.fine_total)
    extra["real_pool_caps"] = [pool1, pool2]
    extra["real_pool_fallback"] = bool(pst.fallback)
    # Single-frame latency through the HEADLINE production path (pool
    # capacities are per-batch totals, so the pooled variant re-jits with
    # pools scaled to B=1 — same per-frame slack as the headline config).
    if extra["real_headline_path"] == "pooled":
        gkw1 = dict(gkw, pool0=max(1, gkw["pool0"] // B)) if gkw else {}
        orch_pool1 = jax.jit(lambda Rb, Wg, Wc_, Wf, cnt, vp:
                             M.match_pooled_fine_with_fallback(
                                 Rb, Wg, Wc_, Wf, cnt, vp, thr - 5.0, T1,
                                 Kc1, fine_g, max(1, pool1 // B),
                                 max(1, pool2 // B), top_k, Wc, **gkw1))

        def match_single(rgbs, depths, Wg=W_gemm, Wc=W_cell, Wf=W_fine):
            R0, R1 = pre_b(rgbs, depths)
            cand, nv, _st = orch_pool1(R1, Wg, Wc, Wf, feats1.count, vpos)
            return refine_nv(R0, cand, feats0, nv)
    else:
        match_single = match_pruned
    dt1 = _time(match_single, iters, rgbs[:1], depths[:1],
                label=f"real_{extra['real_headline_path']}_single")
    extra["real_single_frame_fps"] = round(1.0 / dt1, 2)

    # Real-bank RGB-only pruned throughput (the round-3 comparison point:
    # same pruned path on the ColorGradient-only trained bank, C = 8).
    try:
        tpl_rgb, _ = _gunzip_bank(stems=("boxNew_full",))
        det_rgb = Detector.read(tpl_rgb)
        bank_rgb = det_rgb.bank(det_rgb.class_ids[0])
        Kc1r = bank_rgb.max_cell_extent(1)
        E0r = bank_rgb.extent(0)
        n0r = bank_rgb.num_templates
        repsr = max(1, -(-10240 // n0r))
        Nr = ((n0r * repsr + 127) // 128) * 128
        f1r = _tile_features(bank_rgb.merged_features(1), repsr, Nr)
        f0r = _tile_features(bank_rgb.merged_features(0), repsr, Nr)
        Wg_r = M.build_gemm_weights(f1r, 8, T1, Kc1r)
        Wc_r = M.build_cell_weights(f1r, 8, T1, Kc1r)
        jax.block_until_ready((Wg_r, Wc_r))
        pre_rgb = jax.jit(lambda rgbs, depths: M.preprocess_frames_batched(
            rgbs, depths, T0=T0, T1=T1, use_depth=False,
            weak_threshold=p.color.weak_threshold, use_pallas_quant=pq))
        vpos_r = M.position_validity_flat(f1r.size, T1, Hc, Wc)
        Wf_r = M.build_cell_weights_fine(f1r, 8, T1, Kc1r, fine_g)
        orch_r = jax.jit(lambda Rb, Wg, Wc_, Wf, cnt, vp:
                         M.match_coarse_pruned_fine_with_fallback(
                             Rb, Wg, Wc_, Wf, cnt, vp, thr - 5.0, T1, Kc1r,
                             fine_g, m_cap, m2_cap, top_k, Wc,
                             use_pallas=pallas_gather))
        refine_r = jax.jit(lambda R0, cand, f0: M.refine_candidates_opencv_batched(
            R0, f0, cand, T1, thr, E0=E0r, fine_T=T0, use_pallas=walk_pallas,
            n_valid=jnp.sum(cand.valid.astype(jnp.int32), axis=1)))

        def match_rgb_real(rgbs, depths):
            R0, R1 = pre_rgb(rgbs, depths)
            cand, _pp, _fp = orch_r(R1, Wg_r, Wc_r, Wf_r, f1r.count, vpos_r)
            return refine_r(R0, cand, f0r)

        dt_r = _time(match_rgb_real, iters, rgbs, depths,
                     label=f"real_rgb_pruned_batch{B}")
        extra["real_rgb_bank_templates"] = int(Nr)
        extra["real_rgb_pruned_batch_fps"] = round(B / dt_r, 2)
        mr = match_rgb_real(rgbs, depths)
        okr, totr = _found_rate(mr, truths)
        extra["real_rgb_found"] = f"{okr}/{totr}"
        del Wg_r, Wc_r, Wf_r, f1r, f0r  # release before the merged 2-class pass
    except Exception as e:  # pragma: no cover
        extra["real_rgb_error"] = str(e)[:200]

    # Two-object config on the MERGED multi-class path (BASELINE thresholds
    # 92/94): cv::linemod scores every class in one Detector::match call
    # (rgbdDetector.cpp:31-34) while the reference's two-object service
    # alternates two single-class detectors; here both classes (each the
    # full tiled real bank) share ONE preprocess -> ONE pooled prune (at
    # min(thresholds)) -> ONE pooled survivor GEMM over the concatenated
    # template axis -> ONE walk over the MERGED per-frame valid prefix
    # (merge_candidates_sorted: walk cost follows the total valid count
    # across classes, not classes x top_k slots).  two_object_split_fps is
    # the alternator baseline: two sequential single-class dispatches of
    # the headline path.  The pooled path's (M, 2N) score tensor replaces
    # the round-4 (B, m2, 2N) one, which tipped v5e HBM past batch 16 —
    # batch B is tried first, halving on RESOURCE_EXHAUSTED.
    thr_a, thr_b = 92.0, 94.0
    f1m, bases = M.concat_level_features([feats1, feats1])
    f0m, _ = M.concat_level_features([feats0, feats0])
    W_gemm_m = M.build_gemm_weights(f1m, C, T1, Kc1)
    W_cell_m = M.build_cell_weights(f1m, C, T1, Kc1)
    W_fine_m = M.build_cell_weights_fine(f1m, C, T1, Kc1, fine_g)
    jax.block_until_ready((W_gemm_m, W_cell_m, W_fine_m))
    slices = ((0, N), (N, 2 * N))
    vpos_m = M.position_validity_flat(f1m.size, T1, Hc, Wc)
    merge_j = jax.jit(M.merge_candidates_sorted)

    def _two_object_try(B2):
        rgbs2, depths2 = rgbs[:B2], depths[:B2]
        # Weights/features as ARGUMENTS: closing over them embeds ~3 GB
        # of HLO constants (see the module docstring's remote-compile
        # note).  Pools sized like the single-class path (the margin pass
        # is at min(thresholds), so survivors match the loosest class).
        match_mc = jax.jit(lambda Rb, Wg, Wc_, Wf, cnt, vp:
                           M.match_pooled_multiclass(
                               Rb, Wg, Wc_, Wf, cnt, vp, slices,
                               (thr_a - 5.0, thr_b - 5.0), T1, Kc1, fine_g,
                               56 * B2, 36 * B2, top_k, Wc))
        refine_mc = jax.jit(lambda R0, cand, f0, nv:
                            M.refine_candidates_opencv_batched(
                                R0, f0, cand, T1, min(thr_a, thr_b), E0=E0,
                                fine_T=T0, use_pallas=walk_pallas,
                                n_valid=nv))

        def two_object_merged(rgbs, depths):
            R0, R1 = pre_b(rgbs, depths)
            cands, _nvs, _st = match_mc(R1, W_gemm_m, W_cell_m, W_fine_m,
                                        f1m.count, vpos_m)
            cat, nv = merge_j(cands)
            return refine_mc(R0, cat, f0m, nv)

        # The split baseline must not be handicapped by pool shapes sized
        # for the full batch: after an HBM retry at B2 < B, the pooled
        # headline's jitted pools still carry 56*B/36*B rows, overstating
        # the split cost and inflating merged-vs-split.  Rebuild the
        # single-class matcher with pools scaled to B2 (the per-frame-cap
        # path is batch-agnostic and needs no rebuild).
        if B2 == B or extra.get("real_headline_path") == "per_frame_caps":
            split_fn = match_headline
        else:
            gkw2 = dict(gkw)
            if grp:
                gkw2["pool0"] = max(1, gkw["pool0"] * B2 // B)
            orch_pool2 = jax.jit(lambda Rb, Wg, Wc_, Wf, cnt, vp:
                                 M.match_pooled_fine_with_fallback(
                                     Rb, Wg, Wc_, Wf, cnt, vp, thr - 5.0,
                                     T1, Kc1, fine_g,
                                     max(1, pool1 * B2 // B),
                                     max(1, pool2 * B2 // B),
                                     top_k, Wc, **gkw2))

            def split_fn(rgbs, depths):
                R0, R1 = pre_b(rgbs, depths)
                cand, nv, _st = orch_pool2(R1, W_gemm, W_cell, W_fine,
                                           feats1.count, vpos)
                return refine_nv(R0, cand, feats0, nv)

        def two_object_split(rgbs, depths):
            return (split_fn(rgbs, depths), split_fn(rgbs, depths))

        dt_m = _time(two_object_merged, iters, rgbs2, depths2,
                     label=f"two_object_merged_batch{B2}")
        extra["two_object_batch_fps"] = round(B2 / dt_m, 2)
        extra["two_object_batch"] = B2
        dt_s = _time(two_object_split, iters, rgbs2, depths2,
                     label=f"two_object_split_batch{B2}")
        extra["two_object_split_fps"] = round(B2 / dt_s, 2)
        m2 = two_object_merged(rgbs2, depths2)
        ok2, tot2 = _found_rate(m2, truths[:B2])
        extra["two_object_found"] = f"{ok2}/{tot2}"

    try:
        try:
            _two_object_try(B)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or B <= 16:
                raise
            _log(f"two-object at batch {B} exhausted HBM; retrying at 16")
            _two_object_try(16)
    except Exception as e:  # pragma: no cover
        extra["two_object_error"] = str(e)[:200]
    finally:
        # Free the ~3.3 GB merged-class weights UNCONDITIONALLY: when both
        # two-object attempts exhaust HBM, leaking them into the e2e
        # section starves it too (observed: e2e RESOURCE_EXHAUSTED only
        # after a two-object OOM).
        del W_gemm_m, W_cell_m, W_fine_m, f1m, f0m

    # End-to-end p50 on a REAL scene: match + the full cascade (voting,
    # NMS, orientation clustering, viewport re-render, two-stage ICP, HV)
    # against the real 2652-entry metadata.  On real scenes ICP early-stops
    # (the synthetic-noise e2e never converges and runs all 150 iters).
    try:
        p50, dev, pipe = _e2e_real_ms(match_headline, meta, glob, frames,
                                      depths_np, reps,
                                      weights=(W_gemm, W_cell, W_fine))
        extra["real_e2e_p50_ms"] = round(p50, 2)
        extra["real_e2e_device_ms"] = round(dev, 2)
        extra["real_e2e_pipelined_p50_ms"] = round(pipe, 2)
    except Exception as e:  # pragma: no cover
        extra["real_e2e_error"] = str(e)[:200]
    return fps, use_depth


def make_real_pose_stage(meta, glob, reps):
    """The production cascade as ONE callable (matches, cloud) -> (poses,
    valid): RCD voting + IoU NMS + orientation clustering + viewport
    re-render + point-to-plane ICP + HV against the real bank's metadata
    tiled `reps` times.  Shared by the e2e latency bench and the streaming
    bench (tools/bench_streaming.py)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from linemod_pose_estimation_tpu.models import cascade as CC
    from linemod_pose_estimation_tpu.models.renderer import _pad_triangles
    from linemod_pose_estimation_tpu.utils import geometry as geo
    from linemod_pose_estimation_tpu.utils.stl import load_stl

    mesh = load_stl("/root/reference/config/stl/boxNew.stl")
    tris = jnp.asarray(_pad_triangles(mesh.triangles.astype(np.float32), 64))
    K_render = jnp.array(
        [[glob.focal_length_x, 0, glob.width / 2.0],
         [0, glob.focal_length_y, glob.height / 2.0], [0, 0, 1.0]], jnp.float32,
    )
    # The production pose config: point-to-plane ICP (converges in ~3-9
    # iterations where the Kabsch two-stage needed 150+; same accuracy
    # config as ACCURACY.json, incl. symmetry disambiguation).
    p = CC.CascadeParams(canonicalize="none", icp_variant="point_to_plane",
                         orientation_hypotheses=2, nms_after_pose=True)
    # metadata tiled like the features (template ids may exceed n0)
    q_bank = jnp.tile(jnp.asarray(
        np.asarray(geo.quat_from_matrix(jnp.asarray(meta.R))), jnp.float32), (reps, 1))
    T_bank = jnp.tile(jnp.asarray(meta.T, jnp.float32), (reps, 1))
    D_bank = jnp.tile(jnp.asarray(meta.D, jnp.float32), (reps,))
    Od_bank = jnp.tile(jnp.asarray(meta.Ori_dist, jnp.float32), (reps,))
    Rect_bank = jnp.tile(jnp.asarray(meta.Rect, jnp.int32), (reps, 1))
    rmin, rstep = float(glob.radius_min), float(glob.radius_step)

    def pose_stage(matches, cloud):
        clusters = CC.cluster_matches(
            matches, Od_bank, Rect_bank, rmin, rstep, p.clustering_step,
            p.cluster_filter_thresh, p.max_cells, p.members_cap,
        )
        keep = CC.nms_iou(clusters, p.iou_threshold)
        alive = clusters.valid & keep
        order = jnp.argsort(-jnp.where(alive, clusters.score, -jnp.inf))[: p.max_clusters]
        midx = clusters.member_idx[order]
        f = partial(CC.rough_pose_and_refine, params=p,
                    render_wh=(glob.width, glob.height))
        from linemod_pose_estimation_tpu.ops.verification import depth_normals
        depth_mm_img = jnp.where(jnp.isfinite(cloud[..., 2]), cloud[..., 2], 0.0) * 1000.0
        snrm = depth_normals(depth_mm_img, K_render)
        poses = jax.vmap(
            lambda qq, T, D, Odd, x, y, sim, mv, cv, cs: f(
                qq, T, D, Odd, x, y, sim, mv, cv, cs,
                cloud=cloud, triangles=tris, K_render=K_render,
                scene_normals=snrm,
            )
        )(
            q_bank[matches.template_id[midx]], T_bank[matches.template_id[midx]],
            D_bank[matches.template_id[midx]], Od_bank[matches.template_id[midx]],
            matches.x[midx].astype(jnp.float32), matches.y[midx].astype(jnp.float32),
            matches.similarity[midx].astype(jnp.float32),
            clusters.member_valid[order], alive[order], clusters.score[order],
        )
        return poses.pose, poses.valid

    return pose_stage


def _e2e_real_ms(match_frames, meta, glob, frames, depths_np, reps, iters=15,
                 weights=None):
    import jax
    import jax.numpy as jnp

    from linemod_pose_estimation_tpu.ops import match as M
    from linemod_pose_estimation_tpu.utils import pointcloud as pcu

    K_render = jnp.array(
        [[glob.focal_length_x, 0, glob.width / 2.0],
         [0, glob.focal_length_y, glob.height / 2.0], [0, 0, 1.0]], jnp.float32,
    )
    pose_stage = make_real_pose_stage(meta, glob, reps)

    rgb1 = jnp.asarray(frames[:1])
    dep1 = jnp.asarray(depths_np[:1])
    cloud = pcu.depth_to_cloud(jnp.asarray(depths_np[0]) / 1000.0, jnp.asarray(K_render))

    # ONE jit for the whole frame: the match path is itself composed of
    # five jitted stages, and each dispatch through the remote-TPU tunnel
    # costs ~3.6 ms — more than some stages' device time.  Fusing
    # match + slice + pose into a single program is both the honest
    # serving shape and removes ~10 dispatches/frame.
    Wg, Wc, Wf = weights

    @jax.jit
    def one_frame_fused(rgb, dep, cloud, Wg, Wc, Wf):
        m = match_frames(rgb, dep, Wg, Wc, Wf)
        m1 = M.Matches(*(a[0] for a in m))
        return pose_stage(m1, cloud)

    pose, valid = one_frame_fused(rgb1, dep1, cloud, Wg, Wc, Wf)
    jax.block_until_ready(pose)
    _log(f"real_e2e: {int(np.asarray(valid).sum())} verified hypotheses")
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(one_frame_fused(rgb1, dep1, cloud, Wg, Wc, Wf))
        ts.append((time.perf_counter() - t0) * 1e3)
    # Device time per frame: back-to-back dispatches, ONE block at the end.
    # In this environment a single block_until_ready costs a ~30 ms tunnel
    # round-trip (measured: a trivial select stage blocks at ~32 ms p50),
    # so the blocking p50 above overstates on-hardware latency by ~that
    # constant; the pipelined figure is the device-bound bound.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = one_frame_fused(rgb1, dep1, cloud, Wg, Wc, Wf)
    jax.block_until_ready(out)
    device_ms = (time.perf_counter() - t0) / iters * 1e3
    # PIPELINED serving: two frames in flight (PipelinedRunner) — frame
    # t+1 dispatches before blocking on frame t, so the tunnel round-trip
    # hides behind device compute.  This is the production serving shape;
    # p50 here is the steady-state blocking period per frame.
    from linemod_pose_estimation_tpu.models.serving import PipelinedRunner

    run = PipelinedRunner(one_frame_fused, depth=2)
    run.submit(rgb1, dep1, cloud, Wg, Wc, Wf)
    tp = []
    for _ in range(2 * iters):
        t0 = time.perf_counter()
        run.submit(rgb1, dep1, cloud, Wg, Wc, Wf)
        tp.append((time.perf_counter() - t0) * 1e3)
    run.drain()
    return (float(np.percentile(ts, 50)), float(device_ms),
            float(np.percentile(tp, 50)))


# ----------------------------------------------------------------------
# Synthetic continuity extras (round-2 configuration)


def _build_stages(n_templates, n_mod, T0, T1, E1, E0, top_k, threshold,
                  seed_base=0):
    import jax
    import jax.numpy as jnp

    from linemod_pose_estimation_tpu.ops import match as M

    Kc = (E1 - 1) // T1 + 1  # feature offsets are in [0, E1)
    fmax = 63 * n_mod
    feats1 = _merged_bank(n_templates, fmax, E1, n_mod, seed=seed_base)
    feats0 = _merged_bank(n_templates, fmax, E0, n_mod, seed=seed_base + 1)
    # NOTE: bank arrays are passed as ARGUMENTS — closing over them embeds
    # ~200 MB of constants in the HLO and makes remote compiles pathological.
    W1 = M.build_gemm_weights(feats1, 8 * n_mod, T1, Kc)
    use_depth = n_mod > 1

    pq = jax.default_backend() != "cpu"
    pre_b = jax.jit(lambda rgbs, depths: M.preprocess_frames_batched(
        rgbs, depths, T0=T0, T1=T1, use_depth=use_depth,
        use_pallas_quant=pq))
    coarse_b = jax.jit(
        lambda Rb, W: M.coarse_scores_gemm_flat_batched(Rb, W, T1, Kc)
    )
    Hc, Wc = 480 // 2 // T1, 640 // 2 // T1

    def _sel(raw_flat, f1):
        vpos = M.position_validity_flat(f1.size, T1, Hc, Wc)
        return M.select_candidates_flat(
            raw_flat, f1.count, vpos, threshold - 5.0, top_k, Wc
        )

    sel_b = jax.jit(jax.vmap(_sel, in_axes=(0, None)))
    walk_pallas = jax.default_backend() != "cpu"
    refine_b = jax.jit(
        lambda R0, cand, f0: M.refine_candidates_opencv_batched(
            R0, f0, cand, T1, threshold, E0=E0, fine_T=T0,
            use_pallas=walk_pallas,
        )
    )

    def match_frames(rgbs, depths):
        R0, R1 = pre_b(rgbs, depths)
        raw = coarse_b(R1, W1)
        cand = sel_b(raw, feats1)
        return refine_b(R0, cand, feats0)

    return match_frames, feats1, feats0, W1


def _e2e_p50_ms(match_frames, rgbs, depths, cloud, iters=15):
    """p50 latency of match + full cascade (pose clustering, re-render, ICP,
    HV) on one frame against a synthetic 10k-template-metadata bank."""
    import jax
    import jax.numpy as jnp

    from linemod_pose_estimation_tpu.models import cascade as CC
    from linemod_pose_estimation_tpu.models.renderer import _pad_triangles
    from linemod_pose_estimation_tpu.ops import match as M

    rng = np.random.default_rng(7)
    n_meta = 10240
    q = rng.normal(size=(n_meta, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    Od = rng.uniform(0.5, 1.0, size=(n_meta,))
    Rect = np.concatenate(
        [rng.integers(0, 400, size=(n_meta, 2)), rng.integers(40, 120, size=(n_meta, 2))],
        axis=1,
    ).astype(np.int32)
    # A unit box mesh (12 triangles).
    v = np.array([[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05)
                  for z in (-0.05, 0.05)], np.float32)
    fidx = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5), (0, 4, 5), (0, 5, 1),
            (2, 3, 7), (2, 7, 6), (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)]
    tris = jnp.asarray(_pad_triangles(v[np.array(fidx)], 64))
    K_render = jnp.array([[535.0, 0, 320.0], [0, 537.0, 240.0], [0, 0, 1.0]], jnp.float32)

    p = CC.CascadeParams()
    q_bank = jnp.asarray(q, jnp.float32)
    T_bank = jnp.asarray(rng.normal(size=(n_meta, 3)), jnp.float32)
    D_bank = jnp.asarray(rng.uniform(0, 0.05, size=(n_meta,)), jnp.float32)
    Od_bank = jnp.asarray(Od, jnp.float32)
    Rect_bank = jnp.asarray(Rect)

    from functools import partial

    def pose_stage(matches, cloud):
        clusters = CC.cluster_matches(
            matches, Od_bank, Rect_bank, 0.5, 0.1, p.clustering_step,
            p.cluster_filter_thresh, p.max_cells, p.members_cap,
        )
        keep = CC.nms_iou(clusters, p.iou_threshold)
        alive = clusters.valid & keep
        order = jnp.argsort(-jnp.where(alive, clusters.score, -jnp.inf))[: p.max_clusters]
        midx = clusters.member_idx[order]
        f = partial(CC.rough_pose_and_refine, params=p, render_wh=(640, 480))
        poses = jax.vmap(
            lambda qq, T, D, Odd, x, y, sim, mv, cv, cs: f(
                qq, T, D, Odd, x, y, sim, mv, cv, cs,
                cloud=cloud, triangles=tris, K_render=K_render,
            )
        )(
            q_bank[matches.template_id[midx]], T_bank[matches.template_id[midx]],
            D_bank[matches.template_id[midx]], Od_bank[matches.template_id[midx]],
            matches.x[midx].astype(jnp.float32), matches.y[midx].astype(jnp.float32),
            matches.similarity[midx].astype(jnp.float32),
            clusters.member_valid[order], alive[order], clusters.score[order],
        )
        return poses.pose

    pose_jit = jax.jit(pose_stage)

    def one_frame():
        m = match_frames(rgbs[:1], depths[:1])
        m1 = M.Matches(*(a[0] for a in m))
        return pose_jit(m1, cloud)

    jax.block_until_ready(one_frame())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(one_frame())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def main() -> None:
    import jax

    # Honour an EXPLICIT host-CPU override (smoke tests): the environment's
    # sitecustomize re-forces the axon platform via jax.config, so the env
    # var alone is not enough (same pattern as the CLI and eval tools).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    n_templates = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    # Batch 32 is the headline sweet spot on v5e-1: the 1.57 GB survivor-
    # GEMM weight read and fixed dispatch costs amortize over 2x frames
    # (+5% RGB-D, +13% RGB vs batch 16); beyond that the working set
    # crowds HBM.  The merged two-class section stays at 16 (see B2).
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    T0, T1 = 5, 8
    E1, E0 = 48, 96
    top_k, thr = 256, 85.0

    rng = np.random.default_rng(42)
    rgbs = jnp.asarray(rng.integers(0, 255, size=(B, 480, 640, 3), dtype=np.uint8))
    base = 800.0 + 40.0 * np.sin(np.arange(480) / 17.0)[:, None] * np.cos(np.arange(640) / 23.0)[None, :]
    depth_np = (base + rng.normal(scale=3.0, size=(480, 640))).astype(np.float32)
    depths = jnp.asarray(np.broadcast_to(depth_np, (B, 480, 640)).copy())

    extra = {}

    # HEADLINE: the production pruned path on the REAL trained bank.
    real = None
    try:
        real = _bench_real_bank(B, iters, extra)
    except Exception as e:  # pragma: no cover — keep the bench robust
        extra["real_bank_error"] = str(e)[:300]
        _log(f"real-bank headline failed: {e}")
    extra["batch"] = B

    if os.environ.get("LPE_BENCH_REAL_ONLY"):
        _emit(real, extra, n_templates, B)
        return

    # Synthetic continuity extras (round-2 configuration).
    match_rgbd, f1d, f0d, _ = _build_stages(n_templates, 2, T0, T1, E1, E0, top_k, thr)
    dt = _time(match_rgbd, iters, rgbs, depths, label=f"synth_rgbd_batch{B}")
    extra["synth_rgbd_batch_fps"] = round(B / dt, 2)
    dt = _time(match_rgbd, iters, rgbs[:1], depths[:1], label="synth_rgbd_single")
    extra["synth_rgbd_single_fps"] = round(1.0 / dt, 2)

    # Two-object config now runs inside _bench_real_bank on the MERGED
    # multi-class production path (real bank, thresholds 92/94).

    # RGB-only (round-1 continuity).
    match_rgb, _, _, _ = _build_stages(n_templates, 1, T0, T1, E1, E0, top_k, thr)
    dt = _time(match_rgb, iters, rgbs[:1], depths[:1], label="rgb_single")
    extra["rgb_single_fps"] = round(1.0 / dt, 2)
    dt = _time(match_rgb, iters, rgbs, depths, label=f"rgb_batch{B}")
    extra["rgb_batch_fps"] = round(B / dt, 2)

    # End-to-end p50: match + cascade (pose clustering/render/ICP/HV).
    cloud = jnp.stack(
        [jnp.zeros((480, 640)), jnp.zeros((480, 640)), jnp.asarray(depth_np) / 1000.0],
        axis=-1,
    ).astype(jnp.float32)
    try:
        extra["e2e_p50_ms"] = round(
            _e2e_p50_ms(match_rgbd, rgbs, depths, cloud), 2
        )
    except Exception as e:  # keep the headline robust to cascade issues
        extra["e2e_error"] = str(e)[:200]

    _emit(real, extra, n_templates, B)


def _emit(real, extra, n_templates=10240, B=16) -> None:
    if real is not None:
        fps, use_depth = real
        mod = "rgbd" if use_depth else "rgb"
        metric = (f"linemod_{mod}_match_fps_per_chip_640x480_real_bank_"
                  f"{extra['real_bank_templates']}templates_pruned_batch{B}")
        value = fps
    else:
        metric = f"linemod_rgbd_match_fps_per_chip_640x480_{n_templates}templates_batch{B}"
        # A REAL_ONLY run whose real-bank section failed has no synthetic
        # number either — emit value 0 with the recorded error rather
        # than crash without the JSON line.
        value = extra.get("synth_rgbd_batch_fps", 0.0)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "fps",
                "vs_baseline": round(value / 1000.0, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
