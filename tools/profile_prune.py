"""Profile exact hierarchical pruning vs exhaustive scoring on the REAL
trained bank, tiled to reference 10k scale, over realistic planted scenes
(rendered objects on low-texture backgrounds with distractors — the
bin-picking regime the reference operates in; VERDICT r2 item 1).

Usage: python tools/profile_prune.py [templates_yml] [params_yml] [B] [iters]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from linemod_pose_estimation_tpu.models.detector import Detector
from linemod_pose_estimation_tpu.models.renderer import Renderer
from linemod_pose_estimation_tpu.models.templates import TemplateBank
from linemod_pose_estimation_tpu.ops import match as M


def tile_features(f: M.LevelFeatures, reps: int, pad_to: int) -> M.LevelFeatures:
    """Tile a bank's merged features to scale-test size, padding with dead
    templates to a lane-friendly multiple."""
    cat = lambda a: np.concatenate([np.asarray(a)] * reps, axis=0)
    offs, oris, live, cnt, size = (cat(a) for a in f)
    n = offs.shape[0]
    pad = pad_to - n
    assert pad >= 0
    z = lambda a: np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    live = z(live) & True
    return M.LevelFeatures(
        jnp.asarray(z(offs)), jnp.asarray(z(oris)), jnp.asarray(live),
        jnp.asarray(z(cnt)), jnp.asarray(np.pad(size, [(0, pad), (0, 0)],
                                                constant_values=1)),
    )


def make_scenes(r, meta, B, H, W, rng, n_objects=2):
    """Low-texture backgrounds (smooth gradient + flat distractor boxes) with
    rendered real views planted at random offsets."""
    yy, xx = np.mgrid[0:H, 0:W]
    frames = np.zeros((B, H, W, 3), np.uint8)
    truths = []
    n_meta = meta.R.shape[0]
    for b in range(B):
        bg = (40 + 60 * yy / H + 30 * np.sin(xx / 200.0)).astype(np.uint8)
        fr = np.stack([bg, (bg * 0.9).astype(np.uint8), (bg * 1.1).clip(0, 255).astype(np.uint8)], -1)
        for _ in range(3):  # flat distractor rectangles (weak edges only)
            y0, x0 = rng.integers(0, H - 80), rng.integers(0, W - 120)
            fr[y0:y0 + 80, x0:x0 + 120] = rng.integers(60, 160, size=3)
        planted = []
        for _ in range(n_objects):
            vid = int(rng.integers(0, n_meta))
            out = r.render(meta.R[vid], meta.T[vid])
            rgb = np.asarray(out.rgb)
            mask = np.asarray(out.mask) > 0
            x, y, w, h = (int(v) for v in np.asarray(out.rect))
            dy = int(rng.integers(-y, H - (y + h)))
            dx = int(rng.integers(-x, W - (x + w)))
            sub = mask[y:y + h, x:x + w]
            fr[y + dy:y + dy + h, x + dx:x + dx + w][sub] = rgb[y:y + h, x:x + w][sub]
            planted.append((vid, x + dx, y + dy))
        frames[b] = fr
        truths.append(planted)
    return frames, truths


def _time(fn, iters, *args, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"[prof] {label}: compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    tpl = sys.argv[1] if len(sys.argv) > 1 else "/tmp/boxNew_full_templates.yml"
    prm = sys.argv[2] if len(sys.argv) > 2 else "/tmp/boxNew_full_params.yml"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    thr, top_k, n_cap, m_cap = 91.0, 256, 4096, 256

    det = Detector.read(tpl)
    meta, glob = TemplateBank.read_params_yaml(prm)
    cid = det.class_ids[0]
    bank = det.bank(cid)
    p = det.params
    T0, T1 = p.t_pyramid
    Kc1 = bank.max_cell_extent(1)
    E0 = bank.extent(0)
    use_depth = p.use_depth_normal
    n_mod = 2 if use_depth else 1
    C = 8 * n_mod

    n0 = bank.num_templates
    reps = max(1, 10240 // n0)
    N = ((n0 * reps + 127) // 128) * 128
    feats1 = tile_features(bank.merged_features(1), reps, N)
    feats0 = tile_features(bank.merged_features(0), reps, N)
    print(f"[prof] bank {n0} x {reps} -> {N} templates, Kc1={Kc1}, E0={E0}, "
          f"C={C}", flush=True)

    W_gemm = M.build_gemm_weights(feats1, C, T1, Kc1)  # (K, N)
    W_rows = jnp.asarray(W_gemm).T
    W_cell = M.build_cell_weights(feats1, C, T1, Kc1)
    jax.block_until_ready((W_gemm, W_rows, W_cell))

    rng = np.random.default_rng(3)
    r = Renderer("/root/reference/config/stl/boxNew.stl", glob.width,
                 glob.height, glob.focal_length_x, glob.focal_length_y)
    frames, truths = make_scenes(r, meta, B, glob.height, glob.width, rng)
    rgbs = jnp.asarray(frames)
    base = 800.0 + 40.0 * np.sin(np.arange(glob.height) / 17.0)[:, None] * \
        np.cos(np.arange(glob.width) / 23.0)[None, :]
    depths = jnp.asarray(np.broadcast_to(base.astype(np.float32),
                                         (B,) + base.shape).copy())

    def _pre(rgb, depth):
        pyr = M.preprocess_frame(rgb, depth, T0=T0, T1=T1, use_depth=use_depth,
                                 weak_threshold=p.color.weak_threshold)
        return M.stack_modalities(pyr, use_depth)

    pre_b = jax.jit(jax.vmap(_pre))
    Hc, Wc = glob.height // 2 // T1, glob.width // 2 // T1
    vpos = M.position_validity_flat(feats1.size, T1, Hc, Wc)

    # Bank arrays are ARGUMENTS, not closures: closing over them embeds
    # hundreds of MB of constants in the HLO (the remote-compile tunnel
    # rejects the body with HTTP 413).
    coarse_b = jax.jit(lambda Rb, W: M.coarse_scores_gemm_flat_batched(Rb, W, T1, Kc1))
    sel_b = jax.jit(jax.vmap(
        lambda raw, cnt, vp: M.select_candidates_flat(raw, cnt, vp, thr - 5.0,
                                                      top_k, Wc),
        in_axes=(0, None, None)))
    prune_b = jax.jit(lambda Rb, Wc_, cnt, vp: M.prune_plan_batched(
        Rb, Wc_, cnt, vp, thr - 5.0, T1, Kc1, n_cap, m_cap))
    coarse_sub = jax.jit(lambda Rb, Wr, ti, pi: M.coarse_scores_gemm_flat_batched_sub2(
        Rb, Wr, ti, pi, T1, Kc1))
    sel_sub = jax.jit(jax.vmap(
        lambda raw, pi, pk, cnt, vp, ti, tk: M.select_candidates_flat_sub2(
            raw, cnt, vp, ti, tk, pi, pk, thr - 5.0, top_k, Wc),
        in_axes=(0, 0, 0, None, None, None, None)))
    refine_b = jax.jit(lambda R0, cand, f0: M.refine_candidates_pallas_batched(
        R0, f0, cand, T1, thr, E0=E0, fine_T=T0))

    R0, R1 = pre_b(rgbs, depths)
    jax.block_until_ready((R0, R1))

    pr = prune_b(R1, W_cell, feats1.count, vpos)
    print(f"[prof] survivors: templates {int(pr.n_survivors)}/{N} (cap {n_cap}), "
          f"positions/frame mean {float(np.asarray(pr.m_survivors).mean()):.0f}"
          f"/{Hc*Wc} (cap {m_cap}), overflow={bool(pr.overflow)}", flush=True)

    t_pre = _time(lambda: pre_b(rgbs, depths), iters, label="preprocess")
    t_coarse = _time(lambda: coarse_b(R1, W_gemm), iters, label="coarse exhaustive")
    raw = coarse_b(R1, W_gemm)
    t_sel = _time(lambda: sel_b(raw, feats1.count, vpos), iters,
                  label="select exhaustive")
    cand = sel_b(raw, feats1.count, vpos)
    t_prune = _time(lambda: prune_b(R1, W_cell, feats1.count, vpos), iters,
                    label="prune (UB gemm + topk)")
    t_csub = _time(lambda: coarse_sub(R1, W_rows, pr.t_idx, pr.p_idx), iters,
                   label="coarse pruned")
    raw_sub = coarse_sub(R1, W_rows, pr.t_idx, pr.p_idx)
    t_ssub = _time(lambda: sel_sub(raw_sub, pr.p_idx, pr.p_keep, feats1.count,
                                   vpos, pr.t_idx, pr.t_keep), iters,
                   label="select pruned")
    cand_sub = sel_sub(raw_sub, pr.p_idx, pr.p_keep, feats1.count, vpos,
                       pr.t_idx, pr.t_keep)
    t_ref = _time(lambda: refine_b(R0, cand_sub, feats0), iters, label="refine")

    # Position-only pruning: static weights (no template gather).
    m_caps = [m_cap, 128]
    pos_results = []
    for mc in m_caps:
        prune_pos = jax.jit(lambda Rb, Wc_, cnt, vp, mc=mc: M.prune_positions_batched(
            Rb, Wc_, cnt, vp, thr - 5.0, T1, Kc1, mc))
        coarse_pos = jax.jit(lambda Rb, W, pi: M.coarse_scores_gemm_flat_batched_pos(
            Rb, W, pi, T1, Kc1))
        sel_pos = jax.jit(jax.vmap(
            lambda raw, pi, pk, cnt, vp: M.select_candidates_flat_pos(
                raw, cnt, vp, pi, pk, thr - 5.0, top_k, Wc),
            in_axes=(0, 0, 0, None, None)))
        pp = prune_pos(R1, W_cell, feats1.count, vpos)
        t_pp = _time(lambda: prune_pos(R1, W_cell, feats1.count, vpos), iters,
                     label=f"prune_pos m={mc}")
        t_cp = _time(lambda: coarse_pos(R1, W_gemm, pp.p_idx), iters,
                     label=f"coarse_pos m={mc}")
        raw_pos = coarse_pos(R1, W_gemm, pp.p_idx)
        t_sp = _time(lambda: sel_pos(raw_pos, pp.p_idx, pp.p_keep,
                                     feats1.count, vpos), iters,
                     label=f"select_pos m={mc}")
        cand_pos = sel_pos(raw_pos, pp.p_idx, pp.p_keep, feats1.count, vpos)
        pos_results.append((mc, pp, t_pp, t_cp, t_sp, cand_pos))
        print(f"[prof] pos-only m_cap={mc}: survivors/frame mean "
              f"{float(np.asarray(pp.m_survivors).mean()):.0f} overflow="
              f"{bool(pp.overflow)}", flush=True)

    # Found-rate sanity: every planted view must be detected by both paths.
    m_ex = refine_b(R0, cand, feats0)
    m_pr = refine_b(R0, cand_sub, feats0)
    def found(m):
        ok = 0
        for b, pl in enumerate(truths):
            v = np.asarray(m.valid[b]); sims = np.asarray(m.similarity[b])
            xs = np.asarray(m.x[b]); ys = np.asarray(m.y[b])
            tids = np.asarray(m.template_id[b])
            for vid, x, y in pl:
                hit = v & (np.abs(xs - x) <= 8) & (np.abs(ys - y) <= 8)
                ok += bool(hit.any())
        return ok
    total = sum(len(t) for t in truths)
    print(f"[prof] found exhaustive {found(m_ex)}/{total}, "
          f"pruned {found(m_pr)}/{total}", flush=True)

    ms = lambda t: t * 1e3 / B
    print(f"[prof] per-frame ms: pre {ms(t_pre):.2f}  "
          f"coarse_ex {ms(t_coarse):.2f}  sel_ex {ms(t_sel):.2f}  "
          f"prune {ms(t_prune):.2f}  coarse_sub {ms(t_csub):.2f}  "
          f"sel_sub {ms(t_ssub):.2f}  refine {ms(t_ref):.2f}", flush=True)
    ex = t_pre + t_coarse + t_sel + t_ref
    pru = t_pre + t_prune + t_csub + t_ssub + t_ref
    print(f"[prof] fps/chip exhaustive {B / ex:.1f}  pruned(2-axis) {B / pru:.1f}",
          flush=True)
    for mc, pp, t_pp, t_cp, t_sp, cand_pos in pos_results:
        m_po = refine_b(R0, cand_pos, feats0)
        tot = t_pre + t_pp + t_cp + t_sp + t_ref
        print(f"[prof] pos-only m_cap={mc}: per-frame ms prune {ms(t_pp):.2f} "
              f"coarse {ms(t_cp):.2f} sel {ms(t_sp):.2f} -> fps/chip "
              f"{B / tot:.1f}  found {found(m_po)}/{total}", flush=True)


if __name__ == "__main__":
    main()
