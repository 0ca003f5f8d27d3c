"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linemod_pose_estimation_tpu.ops import match as M
from linemod_pose_estimation_tpu.parallel import mesh as PM
from linemod_pose_estimation_tpu.parallel.sharded_match import (
    make_sharded_coarse_matcher,
    make_sharded_detect_step,
    pad_bank_features,
)


def random_bank(rng, n, fmax=16, extent=32):
    offs = rng.integers(0, extent, size=(n, fmax, 2)).astype(np.int32)
    oris = rng.integers(0, 8, size=(n, fmax)).astype(np.int32)
    cnt = rng.integers(fmax // 2, fmax + 1, size=(n,)).astype(np.int32)
    live = np.arange(fmax)[None, :] < cnt[:, None]
    size = np.full((n, 2), extent, np.int32)
    return M.LevelFeatures(
        offsets=jnp.asarray(offs), oris=jnp.asarray(oris), live=jnp.asarray(live),
        count=jnp.asarray(cnt), size=jnp.asarray(size),
    )


def random_responses(rng, b, h, w):
    return jnp.asarray(
        rng.choice([0, 3, 4], size=(b, 8, h, w), p=[0.5, 0.25, 0.25]).astype(np.uint8)
    )


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return PM.make_mesh(data=2, bank=4)


def test_sharded_matches_single_device_result(rng, mesh8):
    T, ext = 8, 5
    n, b, h, w = 24, 2, 64, 96
    feats = pad_bank_features(random_bank(rng, n), mesh8.shape["bank"])
    R = random_responses(rng, b, h, w)

    matcher = make_sharded_coarse_matcher(mesh8, T, ext, top_k=16, threshold=0.0)
    cand = matcher(R, feats)

    # Single-device reference.
    for fi in range(b):
        raw = M.coarse_scores(R[fi], feats, T, ext)
        Hc, Wc = raw.shape[1:]
        vpos = M.position_validity(feats.size, T, Hc, Wc)
        ref = M.select_candidates(raw, feats.count, vpos, 0.0, 16)
        got_sims = np.sort(np.asarray(cand.similarity[fi]))[::-1]
        ref_sims = np.sort(np.asarray(ref.similarity))[::-1]
        np.testing.assert_allclose(got_sims, ref_sims, atol=1e-4)
        # The global best must agree exactly (id + cell).
        gb = int(np.argmax(np.asarray(cand.similarity[fi])))
        rb = int(np.argmax(np.asarray(ref.similarity)))
        assert int(cand.template_id[fi][gb]) == int(ref.template_id[rb])
        assert int(cand.cell_y[fi][gb]) == int(ref.cell_y[rb])
        assert int(cand.cell_x[fi][gb]) == int(ref.cell_x[rb])


def test_sharded_detect_step_runs(rng, mesh8):
    feats = pad_bank_features(random_bank(rng, 16), 4)
    R = random_responses(rng, 2, 64, 64)
    step = make_sharded_detect_step(mesh8, 8, 5, top_k=8, threshold=0.0)
    cand, metrics = step(R, feats)
    assert cand.template_id.shape == (2, 8)
    assert int(metrics["num_matches"]) > 0
    assert 0.0 <= float(metrics["best_similarity"]) <= 100.0


def test_bank_padding_dead_templates(rng, mesh8):
    feats = random_bank(rng, 10)
    padded = pad_bank_features(feats, 4)
    assert padded.oris.shape[0] == 12
    assert not bool(np.asarray(padded.live[-1]).any())
    assert int(padded.count[-1]) == 0
