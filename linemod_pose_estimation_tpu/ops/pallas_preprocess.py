"""Fused Pallas TPU kernel for the ColorGradient quantizer.

ops.features.quantize_color_gradient is the preprocess hotspot (~590
us/frame of the ~860 us RGB-D preprocess, measured on v5e at batch 16):
per channel it runs a 7-tap separable Gaussian and a 3x3 Sobel as
block-banded MXU matmuls with full HBM round-trips between every pass,
then the strongest-channel select, cv::fastAtan2, half-even binning and
the 3x3 hysteresis vote as further full-frame passes.  The arithmetic is
trivial — the cost is ~25 HBM passes over frame-sized tensors.

This kernel computes the whole chain in ONE pass: each grid step DMAs a
row stripe (+6-row halo) of the replicate-padded image into VMEM and
produces the quantized-orientation stripe; every intermediate (blurred
channels, Sobel responses, magnitudes, angle, bins, vote planes) lives
and dies in VMEM.

BIT-EXACT with the XLA path (tests/test_pallas_preprocess.py): identical
expressions and f32 operation order — integer Q6 Gaussian accumulators,
exact integer Sobel, the same fastAtan2 polynomial/constants, half-even
convertTo binning, border-replicate clamps for blur/Sobel, the 1-px
border bin zeroing, and the 9-neighbour vote with zero contribution
outside the image.  Replicate clamps at the image edges are applied with
row/lane iota masks so every grid step runs the same code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import (
    _ATAN_P1, _ATAN_P3, _ATAN_P5, _ATAN_P7, _DBL_EPS_F, _GAUSS7_Q6,
)

_SB = 120  # output rows per grid step (measured best on v5e: 120 rows
# amortize the per-step sync DMA + grid overhead; 480 overflows the
# remote compile helper, 24 costs ~20% more)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _quant_cg_kernel(H: int, W: int, Wp: int, SB: int, weak2: float):
    """Grid (B, n_stripes); PI is the (B, 3, H+6, Wp) replicate-padded
    image in HBM; output stripe rows [y0, y1) of the (B, Hs, Wp) quant."""
    HALO = _round_up(SB + 10, 8)  # blur rows [y0-2, y1+2) need PI rows
    # [y0, y0+SB+10); rounded up so the DMA slice is sublane-aligned.

    taps = [float(t) for t in np.asarray(_GAUSS7_Q6)]

    def kernel(pi_hbm, out_ref, slab, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        y0 = i * SB
        # PI carries a 5-row replicated top pad (PI row p = input row p-5),
        # so blur-slab row j (global row y0-2+j, which needs PI rows
        # y0+j .. y0+j+6) reads slab rows j..j+6 from a DMA starting at
        # PI row y0; the slab base is 8-aligned because SB % 8 == 0.
        dma = pltpu.make_async_copy(
            pi_hbm.at[b, :, pl.ds(y0, HALO), :], slab, sem
        )
        dma.start()
        dma.wait()

        NR = SB + 4
        lane = jax.lax.broadcasted_iota(jnp.int32, (NR, Wp), 1)

        def rollr(x, k, axis):  # result[i] = x[i - k], any-sign static k
            n = NR if axis == 0 else Wp
            return pltpu.roll(x, k % n, axis)
        # Global row of each blur-slab row: slab blur row j <-> input row
        # y0 - 2 + j (blur rows [y0-2, y1+2)).
        growb = (jax.lax.broadcasted_iota(jnp.int32, (SB + 4, Wp), 0)
                 + y0 - 2)

        def blur_sobel(c):
            # --- 7-tap separable Gaussian (exact integer Q6) ---
            # Rows: blur-slab row j accumulates PI rows j..j+6 (valid conv:
            # PI row j maps to input row y0 - 5 + j... offsets prebuilt so
            # blur row j = input row y0 - 2 + j).
            accr = None
            for k in range(7):
                v = slab[c, pl.ds(k, SB + 4), :]
                accr = v * taps[k] if accr is None else accr + v * taps[k]
            # Cols: valid conv along lanes; col c0 of the blurred image
            # accumulates accr cols c0..c0+6 (PI cols carry the 3-col
            # replicate pad, so blurred col c0 lands at lane c0).
            accc = None
            for k in range(7):
                v = rollr(accr, -k, 1)
                accc = v * taps[k] if accc is None else accc + v * taps[k]
            blur = jnp.floor((accc + 2048.0) * (1.0 / 4096.0))

            # Replicate-clamped row neighbours for Sobel (global edges).
            up = jnp.where(growb == 0, blur, rollr(blur, 1, 0))
            dn = jnp.where(growb == H - 1, blur, rollr(blur, -1, 0))
            # Replicate-clamped lane neighbours.
            def lshift(x):  # col - 1 (replicate at col 0)
                return jnp.where(lane == 0, x, rollr(x, 1, 1))
            def rshift(x):  # col + 1 (replicate at col W-1)
                return jnp.where(lane == W - 1, x, rollr(x, -1, 1))
            # Sobel (CV_16S semantics, exact integers in f32):
            # dx = [-1,0,1] cols (x) smoothed [1,2,1] rows
            # dy = [-1,0,1] rows smoothed [1,2,1] cols
            row_sm = up + 2.0 * blur + dn
            dx = rshift(row_sm) - lshift(row_sm)
            row_d = dn - up
            dy = lshift(row_d) + 2.0 * row_d + rshift(row_d)
            return dx, dy, dx * dx + dy * dy

        dx0, dy0, m0 = blur_sobel(0)
        dx1, dy1, m1 = blur_sobel(1)
        dx2, dy2, m2 = blur_sobel(2)
        # Strongest channel, first-channel-wins ties (features.py order).
        mag2 = jnp.maximum(jnp.maximum(m0, m1), m2)
        dx, dy = dx2, dy2
        dx = jnp.where(m1 == mag2, dx1, dx)
        dy = jnp.where(m1 == mag2, dy1, dy)
        dx = jnp.where(m0 == mag2, dx0, dx)
        dy = jnp.where(m0 == mag2, dy0, dy)

        # cv::fastAtan2 (identical constants / op order to features.py).
        ax_, ay_ = jnp.abs(dx), jnp.abs(dy)
        big = ax_ >= ay_
        num = jnp.where(big, ay_, ax_)
        den = jnp.where(big, ax_, ay_) + _DBL_EPS_F
        cr = num / den
        c2 = cr * cr
        ang = (((_ATAN_P7 * c2 + _ATAN_P5) * c2 + _ATAN_P3) * c2 + _ATAN_P1) * cr
        ang = jnp.where(big, ang, jnp.float32(90.0) - ang)
        ang = jnp.where(dx < 0, jnp.float32(180.0) - ang, ang)
        ang = jnp.where(dy < 0, jnp.float32(360.0) - ang, ang)

        # convertTo(CV_8U, 16/360) half-even, &15 wrap, 16->8 fold.
        bin8 = (
            jnp.round(ang * np.float32(16.0 / 360.0)).astype(jnp.int32) & 15
        ) & 7
        strong = mag2 > weak2

        # 1-px border zero BEFORE the vote (border pixels vote bin 0).
        interior = ((growb >= 1) & (growb <= H - 2)
                    & (lane >= 1) & (lane <= W - 2))
        bin8 = jnp.where(interior, bin8, 0)
        in_img = (growb >= 0) & (growb < H) & (lane < W)

        # 3x3 vote with all 8 orientation counters packed as NIBBLES of
        # one int32 plane: each 3x3 count is <= 9 < 16, so the 9 shifted
        # adds never carry across nibbles and ONE roll+add per neighbour
        # replaces the 8-plane formulation's 72 (the vote was ~60% of the
        # kernel's VPU ops).  Bin 7's counter rides bits 28-31 — sums
        # overflow SIGNED int32, but two's-complement adds keep the bit
        # pattern exact and the arithmetic-shift extraction masks with 15.
        # Zero contribution outside the image rides the packed zeros.
        pk = jnp.where(in_img, jnp.int32(1) << (4 * bin8), 0)
        acc = None
        for dr in (1, 0, -1):
            rr = rollr(pk, dr, 0)
            # Row wrap: rolled-in rows come from outside the slab's
            # [y0-1, y1+1) working range only at the slab ends, which
            # are never part of the OUTPUT rows [y0, y1) +-1 window —
            # and out-of-image rows are already zeroed via in_img.
            for dc in (1, 0, -1):
                v = rollr(rr, dc, 1)
                # Lane wrap brings col Wp-1 into col 0: out-of-image
                # lanes are zero (in_img), and col -1 must contribute
                # zero — mask the wrapped lane explicitly.
                if dc == 1:
                    v = jnp.where(lane == 0, 0, v)
                acc = v if acc is None else acc + v
        votes = [(acc >> (4 * o)) & 15 for o in range(8)]

        best = votes[0]
        win = jnp.zeros_like(best)
        for o in range(1, 8):
            better = votes[o] > best
            win = jnp.where(better, o, win)
            best = jnp.where(better, votes[o], best)

        ok = strong & (best >= 5) & interior
        quant = jnp.where(ok, (1 << win), 0)
        # Output rows [y0, y1) = blur-slab rows [2, SB + 2); the batch/
        # stripe block dims are squeezed, out_ref is (SB, Wp).
        out_ref[:, :] = quant[2:SB + 2, :].astype(jnp.uint8)

    return kernel, HALO


@partial(jax.jit, static_argnames=("weak_threshold", "interpret"))
def quantize_color_gradient_pallas(
    rgb: jnp.ndarray,  # (B, H, W, 3) uint8 or float32
    weak_threshold: float = 10.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused ColorGradient quantizer: (B, H, W, 3) -> (B, H, W) u8
    bitmask, bit-identical to ops.features.quantize_color_gradient's first
    output (which remains the reference implementation and the CPU path).
    """
    B, H, W, C = rgb.shape
    assert C == 3
    SB = _SB
    n_str = -(-H // SB)
    Hs = n_str * SB
    Wp = _round_up(W + 6, 128)
    # Replicate-pad: 5 rows on top (3 blur halo + 2 slab margin, so every
    # stripe's DMA start y0 stays >= 0), enough on the bottom for the last
    # stripe's SB+10-row slab, 3 cols each side; the 128-lane tail is
    # zero-padded (dead lanes are masked in-kernel).
    img = jnp.moveaxis(rgb.astype(jnp.float32), -1, 1)  # (B, 3, H, W)
    halo = _round_up(SB + 10, 8)
    img = jnp.pad(img,
                  [(0, 0), (0, 0), (5, (Hs - SB + halo) - H - 5), (3, 3)],
                  mode="edge")
    img = jnp.pad(img, [(0, 0), (0, 0), (0, 0), (0, Wp - img.shape[-1])])

    weak2 = float(np.float32(weak_threshold) * np.float32(weak_threshold))
    kern, HALO = _quant_cg_kernel(H, W, Wp, SB, weak2)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Hs, Wp), jnp.uint8),
        grid=(B, n_str),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (None, SB, Wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img)
    return out[:, :H, :W]
