"""Aux image filters (SURVEY.md C24, dormant in the reference but shipped).

- hsv_color_filter: the single-pixel HSV gate colorFilter2
  (service.cpp:906-927) — keep a hypothesis only if the scene pixel at its
  bbox center falls in an HSV range.
- absolute_rectangle: contour-free reformulation of calAbsoluteRectangle
  (service.cpp:930-964) — the tight bbox of the thresholded foreground
  inside a ROI.
- distance NMS: the inactive C6 variant (rgbdDetector::
  nonMaximaSuppression, rgbdDetector.cpp:361-460) — greedy suppression in
  vote-cell index space within a neighbourhood radius.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) uint8 RGB -> OpenCV-style HSV (H in [0,180), S,V in [0,255])."""
    f = rgb.astype(jnp.float32) / 255.0
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(d > 0, h * 30.0, 0.0)  # 0..180 like OpenCV
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0) * 255.0
    v = mx * 255.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_color_filter(
    rgb: jnp.ndarray,
    rect_xywh: jnp.ndarray,
    h_range=(0.0, 180.0),
    s_range=(0.0, 255.0),
    v_range=(0.0, 255.0),
) -> jnp.ndarray:
    """True iff the hypothesis bbox-center pixel lies in the HSV gate."""
    H, W = rgb.shape[:2]
    cx = jnp.clip(rect_xywh[0] + rect_xywh[2] // 2, 0, W - 1)
    cy = jnp.clip(rect_xywh[1] + rect_xywh[3] // 2, 0, H - 1)
    hsv = rgb_to_hsv_u8(rgb[cy, cx])
    return (
        (hsv[0] >= h_range[0]) & (hsv[0] <= h_range[1])
        & (hsv[1] >= s_range[0]) & (hsv[1] <= s_range[1])
        & (hsv[2] >= v_range[0]) & (hsv[2] <= v_range[1])
    )


def absolute_rectangle(
    gray: jnp.ndarray, roi_xywh: jnp.ndarray, threshold: float = 10.0
) -> jnp.ndarray:
    """Tight bbox (x, y, w, h) of foreground (> threshold) inside the ROI."""
    H, W = gray.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    x0, y0, w, h = roi_xywh[0], roi_xywh[1], roi_xywh[2], roi_xywh[3]
    inside = (xx >= x0) & (xx < x0 + w) & (yy >= y0) & (yy < y0 + h)
    fg = inside & (gray > threshold)
    any_fg = jnp.any(fg)
    bx0 = jnp.min(jnp.where(fg, xx, W))
    bx1 = jnp.max(jnp.where(fg, xx, -1))
    by0 = jnp.min(jnp.where(fg, yy, H))
    by1 = jnp.max(jnp.where(fg, yy, -1))
    return jnp.where(
        any_fg,
        jnp.stack([bx0, by0, bx1 - bx0 + 1, by1 - by0 + 1]),
        jnp.zeros(4, jnp.int32),
    ).astype(jnp.int32)


def nms_distance(
    cell_indices: jnp.ndarray,  # (C, 3) int32 vote-cell (hy, hx, hd)
    scores: jnp.ndarray,  # (C,)
    valid: jnp.ndarray,  # (C,)
    neighbor_size: int,
) -> jnp.ndarray:
    """C6: greedy suppression of cells within `neighbor_size` in vote-index
    space, keeping the best score (rgbdDetector.cpp:361-460)."""
    C = scores.shape[0]
    d = jnp.max(jnp.abs(cell_indices[:, None, :2] - cell_indices[None, :, :2]), axis=-1)
    near = d <= neighbor_size
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    rank_of = jnp.zeros((C,), jnp.int32).at[order].set(jnp.arange(C, dtype=jnp.int32))

    def body(keep, i):
        idx = order[i]
        sup = keep[idx] & near[idx] & (rank_of > i)
        return jnp.where(sup, False, keep), None

    keep, _ = jax.lax.scan(body, valid, jnp.arange(C))
    return keep
