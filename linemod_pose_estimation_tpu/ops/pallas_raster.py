"""Pallas TPU triangle rasterizer: bbox-windowed z-buffer in VMEM.

The XLA rasterizer (models.renderer.render) evaluates every triangle
against every pixel — O(Tn * H * W) VPU work with (chunk, H, W) f32
intermediates streamed through HBM.  At the cascade's production shapes
(boxNew: 1984 padded triangles, 256x256 viewport, 8 vmapped hypothesis
lanes) that is ~41 GFLOP of brute force per pose stage, measured ~20 ms —
the single largest e2e latency item (PERF.md; the reference leans on an
interactive GL rasterizer instead, renderer.cpp:262-329).

This kernel rasterizes each triangle only over its own bounding box:

- Per-triangle scalars (projected vertices, edge thresholds, z range,
  shade, stripe bounds) are precomputed in XLA with the SAME f32
  expressions as the XLA path and streamed through VMEM as one
  (entries, 128) f32 table — every in-kernel read is a static index, so
  there is no SMEM prefetch and no scalar-load alignment to manage.
- The z/shade buffers are the pallas OUTPUTS with a constant index map:
  they stay resident in VMEM across the whole grid (init at step 0,
  accumulate in place, nothing is re-fetched).
- The grid walks entry chunks; each entry covers one (triangle,
  128-lane tile) pair and loops over 16-row stripes of the triangle's
  bbox.  Work is O(sum of bbox areas) instead of O(Tn * H * W) — ~40x
  less at production shapes.  Triangles spanning several lane tiles are
  simply duplicated across entries (the in-bbox mask keeps coverage
  exact); dead entries are skipped with pl.when.

Per-pixel depth is bit-identical to the XLA rasterizer: identical
expressions and operation order, and the final z is a min over triangles
(order-independent).  Only the flat-shade value can differ when two
triangles tie EXACTLY in depth at a pixel (argmin-by-chunk vs sequential
first-win) — depth/mask/rect are unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 8  # entries per grid step
_SB = 16  # stripe rows (f32 sublane tile = 8; 16 amortizes the loop)

# Column layout of the per-entry coefficient table.
_NCOEF = 23
(_LIVE, _Y0A, _NS, _X0, _UX0, _UY0, _UX1, _UY1, _UX2, _UY2, _Z0, _Z1, _Z2,
 _AREA, _GL0, _GL1, _GL2, _XMIN, _XMAX, _YMIN, _YMAX, _ZTMIN, _ZTMAX,
 ) = range(_NCOEF)
_SHADE = _NCOEF  # one more column
_NCOL = _NCOEF + 1


def _raster_kernel(Hp: int, Wp: int, n_steps: int):
    def kernel(coef_ref, zbuf_ref, sbuf_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            zbuf_ref[:, :] = jnp.full((Hp, Wp), jnp.inf, jnp.float32)
            sbuf_ref[:, :] = jnp.zeros((Hp, Wp), jnp.float32)

        for c in range(_CH):
            live = coef_ref[c, _LIVE] > 0.5

            @pl.when(live)
            def _(c=c):
                y0a = jnp.int32(coef_ref[c, _Y0A])
                ns = jnp.int32(coef_ref[c, _NS])
                x0 = pl.multiple_of(jnp.int32(coef_ref[c, _X0]), 128)
                ux0, uy0 = coef_ref[c, _UX0], coef_ref[c, _UY0]
                ux1, uy1 = coef_ref[c, _UX1], coef_ref[c, _UY1]
                ux2, uy2 = coef_ref[c, _UX2], coef_ref[c, _UY2]
                z0, z1, z2 = coef_ref[c, _Z0], coef_ref[c, _Z1], coef_ref[c, _Z2]
                a = coef_ref[c, _AREA]
                gl0, gl1, gl2 = coef_ref[c, _GL0], coef_ref[c, _GL1], coef_ref[c, _GL2]
                xmin, xmax = coef_ref[c, _XMIN], coef_ref[c, _XMAX]
                ymin, ymax = coef_ref[c, _YMIN], coef_ref[c, _YMAX]
                ztmin, ztmax = coef_ref[c, _ZTMIN], coef_ref[c, _ZTMAX]
                shade = coef_ref[c, _SHADE]

                # Mosaic iota is integer-only; cast to f32 after.
                px = (x0.astype(jnp.float32)
                      + jax.lax.broadcasted_iota(jnp.int32, (_SB, 128), 1
                                                 ).astype(jnp.float32)
                      + 0.5)
                iy = jax.lax.broadcasted_iota(jnp.int32, (_SB, 128), 0
                                              ).astype(jnp.float32)

                def stripe(s, _):
                    y0 = pl.multiple_of(y0a + s * _SB, 8)
                    py = y0.astype(jnp.float32) + iy + 0.5
                    # Identical expressions to models.renderer.render —
                    # per-pixel depth stays bit-equal to the XLA path.
                    w0 = (ux2 - ux1) * (py - uy1) - (uy2 - uy1) * (px - ux1)
                    w1 = (ux0 - ux2) * (py - uy2) - (uy0 - uy2) * (px - ux2)
                    w2 = (ux1 - ux0) * (py - uy0) - (uy1 - uy0) * (px - ux0)
                    pos = (w0 >= -gl0) & (w1 >= -gl1) & (w2 >= -gl2)
                    neg = (w0 <= gl0) & (w1 <= gl1) & (w2 <= gl2)
                    inb = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
                    inside = (pos | neg) & inb
                    inv_z = (
                        (w0 / a) * (1.0 / jnp.maximum(z0, 1e-9))
                        + (w1 / a) * (1.0 / jnp.maximum(z1, 1e-9))
                        + (w2 / a) * (1.0 / jnp.maximum(z2, 1e-9))
                    )
                    zpix = jnp.clip(1.0 / jnp.maximum(inv_z, 1e-9), ztmin, ztmax)
                    zpix = jnp.where(inside & (inv_z > 1e-9), zpix, jnp.inf)

                    zt = zbuf_ref[pl.ds(y0, _SB), pl.ds(x0, 128)]
                    st = sbuf_ref[pl.ds(y0, _SB), pl.ds(x0, 128)]
                    closer = zpix < zt
                    zbuf_ref[pl.ds(y0, _SB), pl.ds(x0, 128)] = jnp.where(
                        closer, zpix, zt)
                    sbuf_ref[pl.ds(y0, _SB), pl.ds(x0, 128)] = jnp.where(
                        closer, shade, st)
                    return 0

                jax.lax.fori_loop(0, ns, stripe, 0)

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def raster_zbuffer_pallas(
    triangles: jnp.ndarray,  # (Tn, 3, 3) object-space, padded
    R: jnp.ndarray,
    T_bank: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    coverage_grow: float = 0.5,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(zbuf, sbuf): (H, W) f32 depth (inf = miss) and flat shade.

    Drop-in replacement for the XLA scan's z/shade buffers in
    models.renderer.render (same conventions; see module docstring)."""
    Tn = triangles.shape[0]
    H, W = height, width
    Hp = _round_up(H, _SB) + _SB  # stripes may start one 8-block below H
    Wp = _round_up(W, 128)
    NL = Wp // 128

    # --- XLA precompute: same expressions as models.renderer.render ---
    v_cam = (triangles + T_bank[None, None, :]) @ R.T
    z = v_cam[..., 2]
    u = K[0, 0] * v_cam[..., 0] / jnp.maximum(z, 1e-9) + K[0, 2]
    v = K[1, 1] * v_cam[..., 1] / jnp.maximum(z, 1e-9) + K[1, 2]
    behind = jnp.any(z <= 1e-6, axis=-1)
    n = jnp.cross(v_cam[:, 1] - v_cam[:, 0], v_cam[:, 2] - v_cam[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    shade = jnp.abs(n[:, 2])

    x0v, y0v = u[:, 0], v[:, 0]
    x1v, y1v = u[:, 1], v[:, 1]
    x2v, y2v = u[:, 2], v[:, 2]
    area = (x1v - x0v) * (y2v - y0v) - (y1v - y0v) * (x2v - x0v)
    a = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    g = coverage_grow
    gl0 = g * jnp.hypot(x2v - x1v, y2v - y1v)
    gl1 = g * jnp.hypot(x0v - x2v, y0v - y2v)
    gl2 = g * jnp.hypot(x1v - x0v, y1v - y0v)
    xmin = jnp.minimum(jnp.minimum(x0v, x1v), x2v) - g
    xmax = jnp.maximum(jnp.maximum(x0v, x1v), x2v) + g
    ymin = jnp.minimum(jnp.minimum(y0v, y1v), y2v) - g
    ymax = jnp.maximum(jnp.maximum(y0v, y1v), y2v) + g
    ztmin = jnp.min(z, axis=1)
    ztmax = jnp.max(z, axis=1)
    ok_tri = (jnp.abs(area) > 1e-12) & (~behind)

    # Stripe bounds (conservative; the in-kernel bbox mask is exact).
    j0 = jnp.clip(jnp.floor(ymin - 0.5), 0, H - 1).astype(jnp.int32)
    j1 = jnp.clip(jnp.ceil(ymax - 0.5), 0, H - 1).astype(jnp.int32)
    y0a = (j0 // 8) * 8
    ns = (j1 - y0a) // _SB + 1
    i0 = jnp.clip(jnp.floor(xmin - 0.5), 0, W - 1).astype(jnp.int32)
    i1 = jnp.clip(jnp.ceil(xmax - 0.5), 0, W - 1).astype(jnp.int32)
    # Degenerate/behind triangles project to garbage coords (and the pad
    # fillers sit at 1e5): their entries are dead, bounds don't matter.
    on_screen = ok_tri & (xmax >= 0) & (xmin <= W) & (ymax >= 0) & (ymin <= H)

    tri_cols = jnp.stack(
        [y0a.astype(jnp.float32), ns.astype(jnp.float32),
         x0v, y0v, x1v, y1v, x2v, y2v, z[:, 0], z[:, 1], z[:, 2],
         a, gl0, gl1, gl2, xmin, xmax, ymin, ymax, ztmin, ztmax, shade],
        axis=1,
    )  # (Tn, _NCOL - 2): everything but live / x0-tile

    # Entries = (triangle, lane tile) pairs, triangle-major.
    hs = jnp.arange(NL, dtype=jnp.int32)
    live = (
        on_screen[:, None]
        & (i1[:, None] >= hs[None, :] * 128)
        & (i0[:, None] < (hs[None, :] + 1) * 128)
    ).astype(jnp.float32)  # (Tn, NL)
    x0tile = jnp.broadcast_to((hs * 128).astype(jnp.float32), (Tn, NL))
    rep = jnp.repeat(tri_cols, NL, axis=0)  # (Tn * NL, 22)
    coefs = jnp.concatenate(
        [
            live.reshape(-1, 1),
            rep[:, :2],  # y0a, ns
            x0tile.reshape(-1, 1),
            rep[:, 2:],
        ],
        axis=1,
    )  # (Tn * NL, _NCOL)
    ne = _round_up(Tn * NL, _CH)
    coefs = jnp.pad(coefs, [(0, ne - Tn * NL), (0, 128 - _NCOL)])

    n_steps = ne // _CH
    zbuf, sbuf = pl.pallas_call(
        _raster_kernel(Hp, Wp, n_steps),
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ],
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((_CH, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((Hp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(coefs)
    return zbuf[:H, :W], sbuf[:H, :W]
