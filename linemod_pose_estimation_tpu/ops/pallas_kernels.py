"""Pallas TPU kernels for the per-frame hot ops.

Two ops dominate the non-GEMM frame time (profiled on v5e):

1. spread_response: quantized bitmask -> TxT orientation spreading -> the
   8 response maps.  XLA runs this as ~90 separate HBM passes (~20 ms);
   here it is ONE kernel with the image resident in VMEM — every shifted
   OR and LUT select reads on-chip.

2. refine_score: per-candidate level-0 scoring over a window x window
   region.  The XLA formulation issues 16k tiny gathers (~23 ms); here
   each candidate's response patch is DMA'd into VMEM once and the 63
   feature slices accumulate on the VPU.

(A third kernel — a strided-DMA survivor-patch gather — used to live
here; it was retired when the separable one-hot MXU formulation in
ops.match.gather_cell_patches_onehot measured ~2x faster with no
Pallas at all.  See PERF.md "Gathers are matmuls".)

All have jittable XLA twins in ops.match / ops.features that serve as the
bit-exact reference implementations (equality-tested; the twins also run in
Pallas interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import RESPONSE_BY_DISTANCE, distance_masks


# ---------------------------------------------------------------------------
# Kernel 1: fused orientation spread + response maps
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _graded_response_planes(s):
    """Spread bitmask (int32 plane of 8-bit values) -> list of 8 graded
    response planes (int32, values 0..4).

    Identity used (bit-exact with the distance_masks/RESPONSE_BY_DISTANCE
    select chain): with s_d the CIRCULAR radius-d OR-dilation of s over the
    8 orientation bins, the dilations nest (s_0 <= s_1 <= s_2 <= s_3), so
      response[o] = sum_{d=0..3} bit_o(s_d)
    equals 4 - (circular distance from o to the nearest set bit), i.e. the
    graded 4/3/2/1/0 LUT.  All 8 responses are then built at once by
    expanding each 8-bit s_d into 8 NIBBLES of one int32 plane (bit o ->
    bit 4o) and summing — each nibble holds one orientation's response.
    """
    def dil1(x):  # circular OR-dilation by 1 over the 8 bins
        rol = ((x << 1) | (x >> 7)) & 255
        ror = ((x >> 1) | (x << 7)) & 255
        return x | rol | ror

    def nib(x):  # 8 bits -> 8 nibbles (bit o -> bit 4o)
        x = (x | (x << 12)) & 0x000F000F
        x = (x | (x << 6)) & 0x03030303
        return (x | (x << 3)) & 0x11111111

    s1 = dil1(s)
    s2 = dil1(s1)
    s3 = dil1(s2)
    packed = nib(s) + nib(s1) + nib(s2) + nib(s3)
    return [(packed >> (4 * o)) & 15 for o in range(8)]


def _spread_response_kernel(T: int, TH: int, W: int, halo: int,
                            batched: bool = False):
    def kernel(q_hbm, out_ref, q_tile, sem):
        i = pl.program_id(1 if batched else 0)
        # DMA this row stripe + halo from HBM.  Stripes overlap by T-1 rows
        # (BlockSpec index maps can't express overlap); offsets/sizes are
        # (8, 128)-aligned for Mosaic's memref slicing.
        src = q_hbm.at[pl.program_id(0)] if batched else q_hbm
        dma = pltpu.make_async_copy(src.at[pl.ds(i * TH, halo), :], q_tile, sem)
        dma.start()
        dma.wait()

        # Separable TxT box OR-dilation: rows then cols (2T ORs, not T^2).
        sr = q_tile[0:TH, :]
        for r in range(1, T):
            sr = sr | q_tile[r : r + TH, :]
        s = sr[:, 0:W]
        for c in range(1, T):
            s = s | sr[:, c : c + W]
        for o, resp in enumerate(_graded_response_planes(s)):
            out_ref[o, :, :] = resp.astype(jnp.int8)

    return kernel


@partial(jax.jit, static_argnames=("T", "tile_h", "interpret"))
def spread_response(
    quant: jnp.ndarray, T: int, tile_h: int = 64, interpret: bool = False
) -> jnp.ndarray:
    """(H, W) uint8 quantized bitmask -> (8, H, W) uint8 response maps.

    Fuses ops.features.orientation_spread + response_maps in one pass:
    a grid over row stripes, each DMA'd (with its T-1-row halo) into VMEM,
    all TxT shifted ORs and the orientation LUT evaluated on-chip.
    """
    H, W = quant.shape
    grid_h = -(-H // tile_h)
    halo = _round_up(tile_h + T - 1, 8)
    Hp = (grid_h - 1) * tile_h + halo
    Wp = _round_up(W + T - 1, 128)
    qp = jnp.pad(quant, [(0, Hp - H), (0, Wp - W)]).astype(jnp.int32)
    out = pl.pallas_call(
        _spread_response_kernel(T, tile_h, W, halo),
        out_shape=jax.ShapeDtypeStruct((8, grid_h * tile_h, W), jnp.int8),
        grid=(grid_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, tile_h, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((halo, Wp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(qp)
    return out[:, :H, :].astype(jnp.uint8)


@partial(jax.jit, static_argnames=("T", "tile_h", "interpret"))
def spread_response_batched(
    quant: jnp.ndarray, T: int, tile_h: int = 64, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) uint8 bitmasks -> (B, 8, H, W) uint8 response maps.

    Explicit batch twin of spread_response: vmap cannot batch the
    HBM-resident (memory_space=ANY) input, so the batch rides grid axis 0
    and each step DMAs its own frame's stripe."""
    B, H, W = quant.shape
    grid_h = -(-H // tile_h)
    halo = _round_up(tile_h + T - 1, 8)
    Hp = (grid_h - 1) * tile_h + halo
    Wp = _round_up(W + T - 1, 128)
    qp = jnp.pad(quant, [(0, 0), (0, Hp - H), (0, Wp - W)]).astype(jnp.int32)
    out = pl.pallas_call(
        _spread_response_kernel(T, tile_h, W, halo, batched=True),
        out_shape=jax.ShapeDtypeStruct((B, 8, grid_h * tile_h, W), jnp.int8),
        grid=(B, grid_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (None, 8, tile_h, W), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((halo, Wp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(qp)
    return out[:, :, :H, :].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Kernel 2: per-candidate refinement scoring
# ---------------------------------------------------------------------------


def _refine_kernel(Fmax: int, C: int, PR: int, PC: int, window: int, WR: int):
    def kernel(oris_ref, dys_ref, dxs_ref, meta_ref, R_hbm, out_ref, patch, sem):
        k = pl.program_id(0)
        nk = pl.num_programs(0)

        # Double-buffered patch DMA (one slot computes while the next
        # candidate's patch streams in).  Alignment: the sub-tile residual
        # is folded into the per-feature offsets on the host side;
        # multiple_of lets Mosaic prove the tiled-memref slice is aligned.
        def get_dma(idx, slot):
            ay = pl.multiple_of(meta_ref[idx, 1], 32)
            ax = pl.multiple_of(meta_ref[idx, 2], 128)
            ch0 = pl.multiple_of(meta_ref[idx, 3] * C, C)
            return pltpu.make_async_copy(
                R_hbm.at[pl.ds(ch0, C), pl.ds(ay, PR), pl.ds(ax, PC)],
                patch.at[slot],
                sem.at[slot],
            )

        slot = jax.lax.rem(k, 2)

        @pl.when(k == 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(k + 1 < nk)
        def _():
            get_dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        get_dma(k, slot).wait()

        nf = meta_ref[k, 0]
        acc = jnp.zeros((window, window), jnp.int32)
        for f in range(Fmax):
            o = oris_ref[k, f]
            dy = dys_ref[k, f]
            dx = dxs_ref[k, f]
            # Row offset: Mosaic vector loads need sublane starts provably
            # aligned to the dtype tile (32 rows for int8 — the patch stays
            # int8 to quarter the per-candidate DMA), so slice at the
            # aligned base below dy and roll the residual.  Rolling the
            # (WR, PC) slab instead of the full (PR, PC) plane twice cuts
            # the per-feature VPU traffic ~4x.
            dy32 = pl.multiple_of((dy // 32) * 32, 32)
            # Mosaic rotates only 32-bit data: widen the slab, then roll.
            slab = patch[slot, o, pl.ds(dy32, WR), :].astype(jnp.int32)
            rows = pltpu.roll(slab, -(dy - dy32), 0)[:window, :]
            rolled = pltpu.roll(rows, -dx, 1)
            acc = acc + jnp.where(f < nf, rolled[:, :window], 0)
        out_ref[0, :, :] = acc

    return kernel


@partial(jax.jit, static_argnames=("window", "E0", "interpret"))
def refine_scores_pallas(
    R0: jnp.ndarray,
    cand_oris: jnp.ndarray,  # (K, Fmax) int32
    cand_dys: jnp.ndarray,  # (K, Fmax) int32 (>= 0)
    cand_dxs: jnp.ndarray,  # (K, Fmax)
    cand_nf: jnp.ndarray,  # (K,) int32
    anchor_y: jnp.ndarray,  # (K,)
    anchor_x: jnp.ndarray,  # (K,)
    E0: int,
    window: int = 24,
    interpret: bool = False,
    frame_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Raw refinement scores (K, window, window) int32.

    R0: (C, H, W) uint8 response maps — or (B, C, H, W) with `frame_idx`
    (K,) selecting each candidate's frame (the DP-batched serving path).
    The caller supplies non-negative anchors/offsets; reads past the image
    edge land in the zero padding.
    """
    if R0.ndim == 4:
        B, C, H, W = R0.shape
        Rflat = R0.reshape(B * C, H, W)
    else:
        C, H, W = R0.shape
        Rflat = R0
    K, Fmax = cand_oris.shape
    if frame_idx is None:
        frame_idx = jnp.zeros((K,), jnp.int32)
    # Patch big enough for the 32/128 alignment residual + offsets + window
    # (int8 tile = 32 sublanes x 128 lanes; the patch stays int8 to quarter
    # the per-candidate DMA, the hot cost at batched candidate counts).
    PR = _round_up(32 + E0 + window + 8, 32)
    # The LANE width must be a power of two: Mosaic's lane rotate (and/or
    # the strided patch DMA) silently produces wrong data at non-power-of-
    # two lane-tile multiples — measured on v5e: PC=256 and 512 are exact,
    # PC=384 and 768 corrupt every candidate (caught by the real 2652-
    # template bank whose extent(0)=200 pushed PC to 384; synthetic benches
    # at E0=96 stayed at 256 and never tripped it).
    PC = 256
    while PC < 128 + E0 + window:
        PC *= 2
    Rp = jnp.pad(Rflat, [(0, 0), (0, PR), (0, PC)]).astype(jnp.int8)

    # Align the DMA base; fold residuals into the feature offsets.
    ay32 = (anchor_y // 32) * 32
    ax128 = (anchor_x // 128) * 128
    dys = cand_dys + (anchor_y - ay32)[:, None]
    dxs = cand_dxs + (anchor_x - ax128)[:, None]
    # Row-slab height: window + the 32-alignment residual of the row offset.
    WR = _round_up(window + 32, 32)
    # Per-candidate scalar metadata row: (nf, ay32, ax128, frame_idx).
    meta = jnp.stack(
        [cand_nf, ay32, ax128, frame_idx.astype(jnp.int32)], axis=1
    ).astype(jnp.int32)

    # Scalar-prefetch operands live in SMEM (1 MB): chunk the candidate axis
    # so (3 * Kc_chunk * Fmax + 4 * Kc_chunk) * 4 bytes stays well under it
    # (batched serving can pass B * top_k = thousands of candidates).  The
    # compiler's real SMEM footprint is ~2.6x the raw operand bytes
    # (measured: a 640 KB prefetch compiled to 1.63 MB SMEM use), so budget
    # conservatively.
    budget = 60_000  # int32 slots (~240 KB raw)
    kc = max(1, min(K, budget // max(3 * Fmax + 4, 1)))
    n_chunks = -(-K // kc)

    def run_chunk(o_c, dy_c, dx_c, m_c):
        Kc_ = o_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Kc_,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, window, window), lambda k, *_: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, C, PR, PC), jnp.int8),  # double-buffered
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            _refine_kernel(Fmax, C, PR, PC, window, WR),
            out_shape=jax.ShapeDtypeStruct((Kc_, window, window), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(o_c, dy_c, dx_c, m_c, Rp)

    if n_chunks == 1:
        return run_chunk(cand_oris, dys, dxs, meta)
    pad = n_chunks * kc - K
    padk = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    outs = [
        run_chunk(
            padk(cand_oris)[i * kc : (i + 1) * kc],
            padk(dys)[i * kc : (i + 1) * kc],
            padk(dxs)[i * kc : (i + 1) * kc],
            padk(meta)[i * kc : (i + 1) * kc],
        )
        for i in range(n_chunks)
    ]
    return jnp.concatenate(outs, axis=0)[:K]


# ---------------------------------------------------------------------------
# Kernel 2b: cv::linemod local-walk scoring (16x16 stride-T0 placements)
# ---------------------------------------------------------------------------


def _walk_kernel(Fmax: int, C: int, T: int, PR: int, PC: int, WR: int, Wp: int):
    WIN = 16

    def kernel(oris_ref, qys_ref, rys_ref, dxs_ref, meta_ref, R_hbm, sel_ref,
               out_ref, frame, sem):
        k = pl.program_id(0)

        # The WHOLE phase-decomposed frame rides VMEM once per call (the
        # caller issues one pallas_call per frame): zero per-candidate DMA.
        @pl.when(k == 0)
        def _():
            b = meta_ref[3, 0]
            dma = pltpu.make_async_copy(R_hbm.at[b], frame, sem)
            dma.start()
            dma.wait()

        # Live-prefix skip: candidates are similarity-sorted, so the valid
        # ones occupy slots [0, n_valid) — slots past the prefix (top-k
        # filler below the selection threshold, masked downstream anyway)
        # write zeros and skip the whole feature loop.  Real scenes carry
        # ~30-60 valid candidates of the 128 static slots, so this is the
        # walk's single biggest cost lever (the grid still steps through
        # dead slots, but a predicated-off body costs ~nothing).
        @pl.when(k < meta_ref[4, 0])
        def _():
            nf = meta_ref[0, k]
            gy0 = meta_ref[1, k]
            ax = meta_ref[2, k]  # placement-0 pixel column (gx0 * T)

            acc = jnp.zeros((WIN, PC), jnp.int32)
            for f in range(Fmax):
                o = oris_ref[k, f]
                qy = gy0 + qys_ref[k, f]  # feature grid row at placement 0
                ry = rys_ref[k, f]  # row phase (dy % T)
                s = ax + dxs_ref[k, f]  # feature pixel column at placement 0
                ax128 = pl.multiple_of(
                    jnp.minimum((s // 128) * 128, Wp - PC), 128
                )
                qy32 = pl.multiple_of(
                    jnp.minimum((qy // 32) * 32, PR - WR), 32
                )
                slab = frame[ry, o, pl.ds(qy32, WR), pl.ds(ax128, PC)].astype(
                    jnp.int32
                )
                rows = pltpu.roll(slab, -(qy - qy32), 0)[:WIN, :]
                rolled = pltpu.roll(rows, -(s - ax128), 1)
                acc = acc + jnp.where(f < nf, rolled, 0)
            # Placement columns live at lanes {0, T, 2T, ...}: extract the
            # 16 strided lanes with one tiny MXU dot against the 0/1
            # selector (values <= 4 * Fmax stay exact in f32).
            out_ref[0, :, :] = jax.lax.dot_general(
                acc.astype(jnp.float32), sel_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        @pl.when(k >= meta_ref[4, 0])
        def _():
            # Deterministic zeros for skipped slots (the XLA twin masks to
            # the same value, keeping the in-graph cond branches bit-equal).
            out_ref[0, :, :] = jnp.zeros((WIN, WIN), jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("E0", "T", "interpret"))
def walk_scores_pallas(
    R0: jnp.ndarray,  # (B, C, H, W) uint8 response maps
    cand_oris: jnp.ndarray,  # (B, K, Fmax) int32
    cand_dys: jnp.ndarray,  # (B, K, Fmax) int32 level-0 feature rows [0, E0]
    cand_dxs: jnp.ndarray,  # (B, K, Fmax)
    cand_nf: jnp.ndarray,  # (B, K)
    gy0: jnp.ndarray,  # (B, K) grid row of placement (0, 0)
    gx0: jnp.ndarray,  # (B, K) grid col
    E0: int,
    T: int = 5,
    interpret: bool = False,
    n_valid: jnp.ndarray | None = None,  # (B,) live-prefix per frame
) -> jnp.ndarray:
    """Raw cv::linemod walk scores (B, K, 16, 16) int32: placement (r, c)
    scores the template at pixel ((gy0+r)*T, (gx0+c)*T).

    Layout trick: rows are phase-decomposed into a (T, C, H/T, W) frame so
    each feature's 16 strided placement rows are ONE contiguous sublane
    slice; columns stay dense (a lane roll aligns placement c to lane c*T)
    and the 16 strided lanes are extracted by a 0/1 selector dot.  The
    frame is DMA'd to VMEM ONCE per pallas_call (one call per batch frame)
    — no per-candidate DMA at all.

    `n_valid` (default: all K slots) skips candidate slots >= n_valid[b]
    per frame — their scores come out EXACTLY zero.  Callers must pass the
    length of the frame's valid PREFIX (similarity-sorted selects put all
    valid candidates first); see refine_candidates_opencv_batched, which
    guards the precondition in-graph."""
    B, C, H, W = R0.shape
    K, Fmax = cand_oris.shape[1:]
    WIN = 16
    # Phase-major frame: (B, T, C, H/T, W).
    Hp = _round_up(H, T)
    R5 = jnp.pad(R0, [(0, 0), (0, 0), (0, Hp - H), (0, 0)])
    R5 = R5.reshape(B, C, Hp // T, T, W).transpose(0, 3, 1, 2, 4)
    # Placement pixel rows stay below H (the walk clamps against the global
    # border), so grid rows reach at most (H-1)//T; the 32-aligned slab
    # base tops out 32 below that.
    WR = 64  # 32-align residual (< 32) + 16 placement rows, padded to 64
    PR = _round_up(((Hp - 1) // T) // 32 * 32 + WR, 32)
    # Lane window: 128-align residual (< 128) + the 16*T placement span;
    # must be a power of two (Mosaic lane-rotate corrupts at other sizes —
    # see refine_scores_pallas).  The lane base is re-aligned PER FEATURE
    # ((ax + dx) // 128 * 128), so the window never depends on E0.
    PC = 256
    assert PC >= 128 + WIN * T
    # Feature pixel columns stay below W (the walk clamps against the
    # global border); the per-feature 128-aligned base needs PC of room.
    Wp = ((max(W, 128) - 1) // 128) * 128 + PC
    ax = (gx0 * T).reshape(B, K)
    R5 = jnp.pad(R5, [(0, 0), (0, 0), (0, 0), (0, PR - R5.shape[3]),
                      (0, Wp - W)]).astype(jnp.int8)

    sel = np.zeros((PC, WIN), np.float32)
    sel[np.arange(WIN) * T, np.arange(WIN)] = 1.0
    sel = jnp.asarray(sel)

    qys = cand_dys // T
    rys = cand_dys % T
    if n_valid is None:
        n_valid = jnp.full((B,), K, jnp.int32)
    meta = jnp.stack(
        [cand_nf.reshape(B, K),
         gy0.reshape(B, K),
         ax,
         jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, K)),
         jnp.broadcast_to(n_valid.astype(jnp.int32)[:, None], (B, K))],
        axis=1,
    ).astype(jnp.int32)  # (B, 5, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((PC, WIN), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, WIN, WIN), lambda k, *_: (k, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((T, C, PR, Wp), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = _walk_kernel(Fmax, C, T, PR, PC, WR, Wp)

    outs = [
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, WIN, WIN), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(cand_oris[b], qys[b], rys[b], cand_dxs[b], meta[b], R5, sel)
        for b in range(B)
    ]
    return jnp.stack(outs, axis=0)
