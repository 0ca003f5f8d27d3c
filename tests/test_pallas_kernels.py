"""Pallas kernels vs their XLA reference twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linemod_pose_estimation_tpu.ops import features as F
from linemod_pose_estimation_tpu.ops import match as M
from linemod_pose_estimation_tpu.ops import pallas_kernels as PK


def test_spread_response_matches_xla(rng):
    q_bits = rng.integers(0, 8, size=(64, 96))
    present = rng.random((64, 96)) < 0.3
    quant = np.where(present, 1 << q_bits, 0).astype(np.uint8)
    for T in (5, 8):
        ref = F.response_maps(F.orientation_spread(jnp.asarray(quant), T))
        got = PK.spread_response(jnp.asarray(quant), T, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_refine_scores_matches_slices(rng):
    T1, T0 = 8, 5
    n, fmax, ext = 12, 16, 40
    offs = rng.integers(0, ext, size=(n, fmax, 2)).astype(np.int32)
    oris = rng.integers(0, 8, size=(n, fmax)).astype(np.int32)
    cnt = rng.integers(4, fmax + 1, size=(n,)).astype(np.int32)
    live = np.arange(fmax)[None, :] < cnt[:, None]
    feats0 = M.LevelFeatures(
        offsets=jnp.asarray(offs), oris=jnp.asarray(oris), live=jnp.asarray(live),
        count=jnp.asarray(cnt), size=jnp.asarray(np.full((n, 2), ext, np.int32)),
    )
    R0 = jnp.asarray(rng.choice([0, 3, 4], size=(8, 96, 128)).astype(np.uint8))
    K = 5
    cand = M.CoarseMatches(
        template_id=jnp.asarray(rng.integers(0, n, K).astype(np.int32)),
        cell_y=jnp.asarray(rng.integers(0, 5, K).astype(np.int32)),
        cell_x=jnp.asarray(rng.integers(0, 7, K).astype(np.int32)),
        similarity=jnp.full((K,), 90.0, jnp.float32),
        valid=jnp.ones((K,), bool),
    )
    ref = M.refine_candidates_slices(R0, feats0, cand, T1, 50.0, E0=48, fine_T=T0)

    window = 24
    anchor_y = jnp.clip(cand.cell_y * T1 * 2 - (T0 - 1), 0, R0.shape[1] - 1)
    anchor_x = jnp.clip(cand.cell_x * T1 * 2 - (T0 - 1), 0, R0.shape[2] - 1)
    t = cand.template_id
    raw = PK.refine_scores_pallas(
        R0,
        feats0.oris[t],
        feats0.offsets[t][..., 0],
        feats0.offsets[t][..., 1],
        feats0.count[t],
        anchor_y,
        anchor_x,
        E0=48,
        window=window,
        interpret=True,
    )
    raw = np.asarray(raw).reshape(K, -1)
    # Reconstruct best score like the slices path (last max).
    best = raw.shape[1] - 1 - np.argmax(raw[:, ::-1], axis=1)
    best_raw = raw[np.arange(K), best]
    sim = 100.0 * best_raw / (4.0 * np.maximum(np.asarray(feats0.count[t]), 1))
    np.testing.assert_allclose(sim, np.asarray(ref.similarity), atol=1e-4)

def test_coarse_pos_pallas_equals_xla(rng):
    """End-to-end: the pruned coarse GEMM with use_pallas=True returns the
    exact same raw scores as the XLA-gather path."""
    from linemod_pose_estimation_tpu.ops import match as M

    T, C, Kc = 8, 16, 4  # CTT = 1024
    B, H, W = 2, 80, 120
    Hc, Wc = H // T, W // T
    n, fmax = 24, 32
    Rb = jnp.asarray(rng.integers(0, 5, size=(B, C, H, W)).astype(np.uint8))
    offs = rng.integers(0, Kc * T, size=(n, fmax, 2)).astype(np.int32)
    oris = rng.integers(0, C, size=(n, fmax)).astype(np.int32)
    live = rng.random((n, fmax)) < 0.9
    feats = M.LevelFeatures(
        jnp.asarray(offs), jnp.asarray(oris), jnp.asarray(live),
        jnp.asarray(live.sum(axis=1).astype(np.int32)),
        jnp.asarray(np.full((n, 2), Kc * T, np.int32)),
    )
    Wg = M.build_gemm_weights(feats, C, T, Kc)
    p_idx = jnp.asarray(rng.integers(0, Hc * Wc, size=(B, 8)).astype(np.int32))
    ref = M.coarse_scores_gemm_flat_batched_pos(Rb, Wg, p_idx, T, Kc)
    got = M.coarse_scores_gemm_flat_batched_pos(
        Rb, Wg, p_idx, T, Kc, use_pallas=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
