"""Pallas bbox-windowed rasterizer vs the XLA scan rasterizer.

The kernel replicates models.renderer.render's per-pixel expressions
exactly (see ops/pallas_raster.py docstring): depth must be bit-equal
and the mask identical.  Runs in interpret mode on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from linemod_pose_estimation_tpu.models.renderer import render, _pad_triangles
from linemod_pose_estimation_tpu.ops.pallas_raster import raster_zbuffer_pallas
from linemod_pose_estimation_tpu.utils import geometry as geo


def _mesh():
    v = np.array(
        [[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05)
         for z in (-0.05, 0.05)], np.float32)
    fidx = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5), (0, 4, 5), (0, 5, 1),
            (2, 3, 7), (2, 7, 6), (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)]
    tris = v[np.array(fidx)]
    rng = np.random.default_rng(1)
    extra = rng.uniform(-0.06, 0.06, size=(10, 3, 3)).astype(np.float32)
    return np.concatenate([tris, extra])


@pytest.mark.parametrize("trial", range(3))
def test_raster_matches_xla(trial):
    tris = jnp.asarray(_pad_triangles(_mesh(), 8))
    K = jnp.array([[535.0, 0, 64.0], [0, 537.0, 64.0], [0, 0, 1.0]], jnp.float32)
    rng = np.random.default_rng(10 + trial)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(geo.quat_to_matrix(jnp.asarray(q, jnp.float32)))
    T = (R.T @ np.array([0, 0, 0.45 + 0.1 * trial], np.float32)).astype(np.float32)

    out = render(tris, jnp.asarray(R), jnp.asarray(T), K, 128, 128, chunk=8)
    zb, sb = raster_zbuffer_pallas(
        tris, jnp.asarray(R), jnp.asarray(T), K, 128, 128, interpret=True
    )
    z_ref = np.asarray(out.depth_mm)  # mm, 0 = miss
    z_new = np.asarray(jnp.where(jnp.isfinite(zb), zb * 1000.0, 0.0))
    assert int(np.asarray(out.mask).astype(bool).sum()) > 500  # object on screen
    np.testing.assert_array_equal(
        z_ref > 0, z_new > 0, err_msg="mask coverage differs"
    )
    np.testing.assert_array_equal(z_ref, z_new, err_msg="depth not bit-equal")


def test_raster_empty_view():
    """Object fully off-screen: all-inf z-buffer, no spurious coverage."""
    tris = jnp.asarray(_pad_triangles(_mesh(), 8))
    K = jnp.array([[535.0, 0, 64.0], [0, 537.0, 64.0], [0, 0, 1.0]], jnp.float32)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.asarray(np.array([10.0, 0.0, 0.5], np.float32))  # far off axis
    zb, _ = raster_zbuffer_pallas(tris, R, T, K, 128, 128, interpret=True)
    assert not bool(jnp.any(jnp.isfinite(zb)))
