"""Depth / surface-normal hypothesis re-scoring (SURVEY.md C5).

The reference's dormant-but-shipped verification path
(rgbdDetector::depth_normal_diff_calc + depth_diff + normal_diff +
getClusterScore, rgbdDetector.cpp:147-359, 576-584): re-render a match's
template depth, overlay it at the match position, and score

    depth_diff  = mean |depth_template - depth_scene| over the joint
                  valid mask, in meters (cpp:254-271)
    normal_diff = mean angle between scene and template surface normals
                  over the mask (cpp:344-357; cv::RgbdNormals LINEMOD
                  method -> our LS plane-fit normals from depth)
    score       = exp(-depth_diff) * exp(-normal_diff)   (cpp:576-584)

Fixed-size implementation: both depth images are compared over a static
ExE window anchored at the (dynamic) match position.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def depth_normals(depth_mm: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Continuous surface normals from a depth image (H, W) in mm.

    LS plane fit over the 8-neighbourhood (the same stencil as the
    quantized path in ops.features) -> camera-frame unit normals (H, W, 3),
    oriented toward the camera; invalid depth -> zero vector.
    """
    d = depth_mm.astype(jnp.float32)
    H, W = d.shape
    pd = jnp.pad(d, [(1, 1), (1, 1)])
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    A00 = jnp.zeros((H, W));  A01 = jnp.zeros((H, W));  A11 = jnp.zeros((H, W))
    b0 = jnp.zeros((H, W));  b1 = jnp.zeros((H, W))
    for oy, ox in offsets:
        nb = jax.lax.dynamic_slice(pd, (oy + 1, ox + 1), (H, W))
        delta = nb - d
        ok = (nb > 0) & (jnp.abs(delta) < 50.0)
        w = ok.astype(jnp.float32)
        u, v = float(ox), float(oy)
        A00 += w * u * u; A01 += w * u * v; A11 += w * v * v
        b0 += w * u * delta; b1 += w * v * delta
    det = A00 * A11 - A01 * A01
    inv = jnp.where(jnp.abs(det) > 1e-6, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    ddx = (A11 * b0 - A01 * b1) * inv  # d(depth)/d(px), mm per px
    ddy = (A00 * b1 - A01 * b0) * inv
    # Surface tangents: t_x = (z/fx, 0, ddx), t_y = (0, z/fy, ddy) (mm).
    fx, fy = K[0, 0], K[1, 1]
    zx = d / fx
    zy = d / fy
    nx = -ddx * zy
    ny = -ddy * zx
    nz = zx * zy
    n = jnp.stack([nx, ny, nz], axis=-1)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-9, n / jnp.maximum(norm, 1e-9), 0.0)
    # Orient toward camera (z < 0 in CV convention means facing camera).
    n = jnp.where(n[..., 2:3] > 0, -n, n)
    return jnp.where((d > 0)[..., None], n, 0.0)


@partial(jax.jit, static_argnames=("E",))
def depth_normal_score(
    scene_depth_mm: jnp.ndarray,
    scene_normals: jnp.ndarray,
    tmpl_depth_mm: jnp.ndarray,
    tmpl_mask: jnp.ndarray,
    tmpl_normals: jnp.ndarray,
    tmpl_rect: jnp.ndarray,
    match_x: jnp.ndarray,
    match_y: jnp.ndarray,
    E: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(score, depth_diff_m, normal_diff_rad) for one match.

    The template render (full frame + its bbox `tmpl_rect`) is overlaid at
    the scene position (match_x, match_y) over a static ExE window.
    """
    H, W = scene_depth_mm.shape
    # Template window at its bbox origin.
    tx = jnp.clip(tmpl_rect[0], 0, max(tmpl_depth_mm.shape[1] - E, 0))
    ty = jnp.clip(tmpl_rect[1], 0, max(tmpl_depth_mm.shape[0] - E, 0))
    td = jax.lax.dynamic_slice(tmpl_depth_mm, (ty, tx), (E, E))
    tm = jax.lax.dynamic_slice(tmpl_mask, (ty, tx), (E, E))
    tn = jax.lax.dynamic_slice(tmpl_normals, (ty, tx, 0), (E, E, 3))
    # Scene window at the match position.
    sx = jnp.clip(match_x, 0, W - E)
    sy = jnp.clip(match_y, 0, H - E)
    sd = jax.lax.dynamic_slice(scene_depth_mm, (sy, sx), (E, E))
    sn = jax.lax.dynamic_slice(scene_normals, (sy, sx, 0), (E, E, 3))

    joint = (tm > 0) & (sd > 0) & (td > 0)
    n = jnp.maximum(jnp.sum(joint), 1)
    dd = jnp.sum(jnp.where(joint, jnp.abs(td - sd), 0.0)) / n / 1000.0

    ndot = jnp.clip(jnp.sum(tn * sn, axis=-1), -1.0, 1.0)
    have_n = joint & (jnp.linalg.norm(tn, axis=-1) > 0.5) & (jnp.linalg.norm(sn, axis=-1) > 0.5)
    nn = jnp.maximum(jnp.sum(have_n), 1)
    nd = jnp.sum(jnp.where(have_n, jnp.arccos(jnp.abs(ndot)), 0.0)) / nn

    score = jnp.exp(-dd) * jnp.exp(-nd)
    return score, dd, nd
