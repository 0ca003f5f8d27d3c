"""Batched sliding-window template scoring — the back half of the
cv::linemod engine (SURVEY.md section 2.2 E1) re-designed for TPU.

Where OpenCV walks linearized memories with SSE u8 adds per template, we
batch the whole template bank into one device computation per frame:

  coarse level (pyramid top, stride T):
     response maps -> "linearized planes" L[C*T*T, Hc, Wc]
     (channel = orientation x subcell offset, spatial = T-strided cells);
     each feature (ori, dy, dx) is one shifted plane-slice; scores for all
     templates x all window positions accumulate over a `lax.scan` of the
     feature slots.  Output: raw (N, Hc, Wc) int32.

  fine level (pyramid bottom, stride 1):
     for top-K coarse candidates, one big XLA gather evaluates the
     level-0 features over a 16x16 refinement window around each candidate
     (OpenCV's similarityLocal), giving the final sub-stride position and
     the reported similarity.

Modalities (ColorGradient + DepthNormal) are fused before scoring: their
response maps concatenate channel-wise (C = 8 * num_modalities) and their
feature lists merge with globally-offset orientation indices, so one scan
scores both — similarity(%) = 100 * raw / (4 * total_features), identical
to cv::linemod::Detector::match which sums similarities across modalities
before normalizing.

The template axis is the sharding axis for multi-chip operation
(parallel/sharded_match.py): each device scores its shard of the bank and
top-k results merge over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import features as F


class LevelFeatures(NamedTuple):
    """Padded per-level feature set for a bank of N templates.

    offsets: (N, Fmax, 2) int32 — (dy, dx) pixel offsets inside the template
    oris:    (N, Fmax)    int32 — orientation channel (globally indexed when
                                   modalities are merged: mod*8 + bin)
    live:    (N, Fmax)    bool  — which slots hold real features
    count:   (N,)         int32 — total live features (for normalization)
    size:    (N, 2)       int32 — template (h, w) at this level
    """

    offsets: jnp.ndarray
    oris: jnp.ndarray
    live: jnp.ndarray
    count: jnp.ndarray
    size: jnp.ndarray


def merge_modalities(
    feats: Sequence[LevelFeatures], response_maps: Sequence[jnp.ndarray]
) -> tuple[LevelFeatures, jnp.ndarray]:
    """Concatenate modalities into one feature set + one response stack.

    Each modality m's orientation indices shift by 8*m to address its slice
    of the channel-concatenated response maps.
    """
    assert len(feats) == len(response_maps) >= 1
    if len(feats) == 1:
        return feats[0], response_maps[0]
    offs = jnp.concatenate([f.offsets for f in feats], axis=1)
    oris = jnp.concatenate(
        [f.oris + 8 * m for m, f in enumerate(feats)], axis=1
    )
    live = jnp.concatenate([f.live for f in feats], axis=1)
    count = sum(f.count for f in feats)
    size = jnp.max(jnp.stack([f.size for f in feats]), axis=0)
    R = jnp.concatenate(list(response_maps), axis=0)
    return LevelFeatures(offs, oris, live, count, size), R


def linearize_responses(R: jnp.ndarray, T: int, max_cell_extent: int) -> jnp.ndarray:
    """(C, H, W) response maps -> (C*T*T, Hc + Kc, Wc + Kc) planes.

    L[c*T*T + ry*T + rx, i, j] = R[c, i*T + ry, j*T + rx]; bottom/right
    zero-padded by Kc cells so any feature cell-shift reads in-bounds.
    """
    C, H, W = R.shape
    Hc, Wc = H // T, W // T
    Kc = max_cell_extent
    Rc = R[:, : Hc * T, : Wc * T].reshape(C, Hc, T, Wc, T)
    L = Rc.transpose(0, 2, 4, 1, 3).reshape(C * T * T, Hc, Wc)
    return jnp.pad(L, [(0, 0), (0, Kc), (0, Kc)])


@partial(jax.jit, static_argnames=("T", "max_cell_extent"))
def coarse_scores(
    R: jnp.ndarray,
    feats: LevelFeatures,
    T: int,
    max_cell_extent: int,
) -> jnp.ndarray:
    """Raw scores (N, Hc, Wc) int32 of every template at every T-strided
    window position."""
    L = linearize_responses(R, T, max_cell_extent)
    C, H, W = R.shape
    Hc, Wc = H // T, W // T
    N, Fmax = feats.oris.shape

    dy = feats.offsets[..., 0]
    dx = feats.offsets[..., 1]
    chan = feats.oris * (T * T) + (dy % T) * T + (dx % T)  # (N, Fmax)
    qy = dy // T
    qx = dx // T

    def slice_one(c, y, x):
        return jax.lax.dynamic_slice(L, (c, y, x), (1, Hc, Wc))[0]

    def body(acc, fidx):
        vals = jax.vmap(
            lambda c, y, x, m: jnp.where(m, slice_one(c, y, x).astype(jnp.int32), 0)
        )(chan[:, fidx], qy[:, fidx], qx[:, fidx], feats.live[:, fidx])
        return acc + vals, None

    acc0 = jnp.zeros((N, Hc, Wc), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(Fmax, dtype=jnp.int32))
    return acc


def position_validity(size: jnp.ndarray, T: int, Hc: int, Wc: int) -> jnp.ndarray:
    """(N, Hc, Wc) bool — window position (i, j) keeps the template in-bounds."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 1)
    h = size[:, 0][:, None, None]
    w = size[:, 1][:, None, None]
    return (ii[None] * T + h <= Hc * T) & (jj[None] * T + w <= Wc * T)


class CoarseMatches(NamedTuple):
    template_id: jnp.ndarray  # (K,) int32
    cell_y: jnp.ndarray  # (K,) int32 (coarse grid row)
    cell_x: jnp.ndarray  # (K,)
    similarity: jnp.ndarray  # (K,) float32 percent
    valid: jnp.ndarray  # (K,) bool


@partial(jax.jit, static_argnames=("top_k",))
def select_candidates(
    raw: jnp.ndarray,
    total_features: jnp.ndarray,
    valid_pos: jnp.ndarray,
    threshold: float,
    top_k: int,
) -> CoarseMatches:
    """Threshold + top-k over the (N, Hc, Wc) coarse score volume."""
    N, Hc, Wc = raw.shape
    sim = 100.0 * raw.astype(jnp.float32) / (4.0 * jnp.maximum(total_features, 1)[:, None, None])
    sim = jnp.where(valid_pos, sim, -1.0)
    flat = sim.reshape(-1)
    vals, idx = jax.lax.top_k(flat, min(top_k, flat.shape[0]))
    t = idx // (Hc * Wc)
    rem = idx % (Hc * Wc)
    cy = rem // Wc
    cx = rem % Wc
    ok = vals >= threshold
    return CoarseMatches(t.astype(jnp.int32), cy.astype(jnp.int32), cx.astype(jnp.int32), vals, ok)


class Matches(NamedTuple):
    """Final refined matches — the analog of cv::linemod::Match records."""

    template_id: jnp.ndarray  # (K,)
    x: jnp.ndarray  # (K,) full-res template-origin column
    y: jnp.ndarray  # (K,)
    similarity: jnp.ndarray  # (K,) float32 percent
    valid: jnp.ndarray  # (K,) bool


@partial(jax.jit, static_argnames=("window", "coarse_T", "fine_T"))
def refine_candidates(
    R0: jnp.ndarray,
    feats0: LevelFeatures,
    cand: CoarseMatches,
    coarse_T: int,
    threshold: float,
    fine_T: int = 5,
    window: int = 24,
) -> Matches:
    """Evaluate level-0 features over a `window`x`window` stride-1 region
    around each coarse candidate; keep the best offset (OpenCV
    similarityLocal + candidate update).

    Window coverage: a coarse cell at grid index i covers true level-0
    positions [i*2T .. i*2T + 2(T-1)+1] (forward, because spreading covers
    forward offsets), plus the level-0 plateau extends back by fine_T-1 —
    so anchor at i*2T - (fine_T - 1) with window >= 2*coarse_T + fine_T.
    """
    _, H, W = R0.shape
    K = cand.template_id.shape[0]
    Fmax = feats0.oris.shape[1]

    anchor_y = cand.cell_y * coarse_T * 2 - (fine_T - 1)
    anchor_x = cand.cell_x * coarse_T * 2 - (fine_T - 1)
    anchor_y = jnp.clip(anchor_y, 0, H - 1)
    anchor_x = jnp.clip(anchor_x, 0, W - 1)

    t = cand.template_id
    offs = feats0.offsets[t]  # (K, Fmax, 2)
    oris = feats0.oris[t]  # (K, Fmax)
    cnt = feats0.count[t]
    live = feats0.live[t]

    wy = jnp.arange(window, dtype=jnp.int32)
    wx = jnp.arange(window, dtype=jnp.int32)
    # Gather indices (K, Fmax, window, window)
    yy = anchor_y[:, None, None, None] + offs[..., 0][..., None, None] + wy[None, None, :, None]
    xx = anchor_x[:, None, None, None] + offs[..., 1][..., None, None] + wx[None, None, None, :]
    inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
    yy = jnp.clip(yy, 0, H - 1)
    xx = jnp.clip(xx, 0, W - 1)
    oo = jnp.broadcast_to(oris[..., None, None], yy.shape)
    vals = R0[oo, yy, xx].astype(jnp.int32)
    vals = jnp.where(inb & live[..., None, None], vals, 0)
    scores = jnp.sum(vals, axis=1)  # (K, window, window)

    flat = scores.reshape(K, -1)
    # Orientation spreading covers forward offsets only, so equal-score
    # plateaus extend up to T-1 px toward the top-left of the true position;
    # take the LAST maximum (bottom-right plateau corner) to recover it.
    rev = flat[:, ::-1]
    best = flat.shape[1] - 1 - jnp.argmax(rev, axis=1)
    raw = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    by = best // window
    bx = best % window
    sim = 100.0 * raw.astype(jnp.float32) / (4.0 * jnp.maximum(cnt, 1))
    ok = cand.valid & (sim >= threshold)
    return Matches(
        template_id=t,
        x=anchor_x + bx,
        y=anchor_y + by,
        similarity=sim,
        valid=ok,
    )


# ---------------------------------------------------------------------------
# Frame preprocessing: quantize + spread + respond at both pyramid levels.
# ---------------------------------------------------------------------------


class FramePyramid(NamedTuple):
    """Response maps per level per modality (zeros when depth unused)."""

    grad_r0: jnp.ndarray  # (8, H, W) u8
    grad_r1: jnp.ndarray  # (8, H/2, W/2) u8
    norm_r0: jnp.ndarray
    norm_r1: jnp.ndarray


@partial(jax.jit, static_argnames=("T0", "T1", "use_depth", "weak_threshold"))
def preprocess_frame(
    rgb: jnp.ndarray,
    depth_mm: jnp.ndarray | None,
    T0: int = 5,
    T1: int = 8,
    use_depth: bool = False,
    weak_threshold: float = 10.0,
) -> FramePyramid:
    """RGB (H, W, 3) u8 [+ depth (H, W) mm] -> response-map pyramid.

    Level 1 inputs are pyrDown'd per channel (cv::linemod builds the source
    pyramid the same way); depth is decimated 2x (OpenCV subsamples depth).
    """
    q0, _ = F.quantize_color_gradient(rgb, weak_threshold)
    g_r0 = F.response_maps(F.orientation_spread(q0, T0))

    rgb1 = jnp.stack(
        [F.pyr_down(rgb[..., c].astype(jnp.float32)) for c in range(rgb.shape[-1])], axis=-1
    )
    q1, _ = F.quantize_color_gradient(rgb1, weak_threshold)
    g_r1 = F.response_maps(F.orientation_spread(q1, T1))

    if use_depth and depth_mm is not None:
        n0 = F.quantize_depth_normal(depth_mm)
        n_r0 = F.response_maps(F.orientation_spread(n0, T0))
        d1 = depth_mm[::2, ::2]
        n1 = F.quantize_depth_normal(d1)
        n_r1 = F.response_maps(F.orientation_spread(n1, T1))
    else:
        n_r0 = jnp.zeros_like(g_r0)
        n_r1 = jnp.zeros_like(g_r1)
    return FramePyramid(g_r0, g_r1, n_r0, n_r1)
