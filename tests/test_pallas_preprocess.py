"""Fused Pallas ColorGradient quantizer vs the XLA reference
(ops.features.quantize_color_gradient), interpret mode on CPU.

The kernel is the production TPU preprocess path (match.py
preprocess_frames_batched use_pallas_quant=True), so its bit-exactness
pins the whole bit-exact-vs-oracle story at the entry of the chain."""

import jax.numpy as jnp
import numpy as np

from linemod_pose_estimation_tpu.ops import features as F
from linemod_pose_estimation_tpu.ops.pallas_preprocess import (
    quantize_color_gradient_pallas,
)


def _ref(rgb, weak):
    q, _ = F.quantize_color_gradient(jnp.asarray(rgb), weak_threshold=weak)
    return np.asarray(q)


def test_quantizer_matches_xla_random(rng):
    rgb = rng.integers(0, 256, size=(2, 72, 88, 3)).astype(np.uint8)
    got = np.asarray(
        quantize_color_gradient_pallas(jnp.asarray(rgb), 10.0, interpret=True)
    )
    for b in range(2):
        np.testing.assert_array_equal(got[b], _ref(rgb[b], 10.0))


def test_quantizer_matches_xla_structured(rng):
    """Edges, flat regions, and borders: the cases that exercise the vote,
    the hysteresis threshold, and the replicate clamps."""
    H, W = 96, 104
    rgb = np.zeros((1, H, W, 3), np.uint8)
    rgb[0, :, : W // 2] = (200, 40, 40)
    rgb[0, : H // 3, W // 2 :] = (0, 220, 0)
    yy, xx = np.mgrid[0:H, 0:W]
    rgb[0, ((yy + xx) // 9) % 2 == 0] //= 2
    rgb[0, 60:80, 70:90] = (255, 255, 255)
    got = np.asarray(
        quantize_color_gradient_pallas(jnp.asarray(rgb), 10.0, interpret=True)
    )
    np.testing.assert_array_equal(got[0], _ref(rgb[0], 10.0))


def test_quantizer_matches_xla_odd_height(rng):
    """H not a multiple of the stripe height exercises the tail stripe."""
    rgb = rng.integers(0, 256, size=(1, 50, 64, 3)).astype(np.uint8)
    got = np.asarray(
        quantize_color_gradient_pallas(jnp.asarray(rgb), 55.0, interpret=True)
    )
    np.testing.assert_array_equal(got[0], _ref(rgb[0], 55.0))
