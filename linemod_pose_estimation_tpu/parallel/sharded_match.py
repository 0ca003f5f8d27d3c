"""Multi-chip template matching: bank-sharded scoring + ICI top-k merge.

The load-bearing parallelism for large banks (SURVEY.md section 2.3): the
template axis shards over the mesh's "bank" axis (each chip scores its
templates over the whole frame — the TP analog), frames batch over "data"
(DP analog).  Per-shard top-k candidates merge with an all-gather over ICI;
template ids are re-based by shard offset so the merged result is globally
indexed.  This replaces the reference's single-core sliding window + ROS
process pipelining with XLA collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import match as M


def pad_bank_features(feats: M.LevelFeatures, shards: int) -> M.LevelFeatures:
    """Pad the template axis to a multiple of `shards` (padded templates are
    dead: live=False, count=0, giant size so no position validates)."""
    N = feats.oris.shape[0]
    pad = (-N) % shards
    if pad == 0:
        return feats
    z = lambda a, fill=0: jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
    )
    return M.LevelFeatures(
        offsets=z(feats.offsets),
        oris=z(feats.oris),
        live=z(feats.live, False),
        count=z(feats.count),
        size=z(feats.size, 10**6),
    )


def make_sharded_coarse_matcher(
    mesh: Mesh,
    T: int,
    max_cell_extent: int,
    top_k: int,
    threshold: float,
):
    """Build a jitted (R_batch, feats) -> CoarseMatches-per-frame function.

    R_batch: (B, C, H, W) response maps, B sharded over "data".
    feats:   LevelFeatures with template axis sharded over "bank".
    Output:  per-frame global top-k (B, top_k) arrays, replicated over
             "bank", sharded over "data".
    """
    n_bank = mesh.shape["bank"]

    feats_spec = M.LevelFeatures(
        offsets=P("bank"), oris=P("bank"), live=P("bank"), count=P("bank"), size=P("bank")
    )

    def local_match(R_local, feats_local):
        # R_local: (B_local, C, H, W); feats_local: shard of the bank.
        def one_frame(R):
            raw = M.coarse_scores(R, feats_local, T, max_cell_extent)
            Hc, Wc = raw.shape[1:]
            vpos = M.position_validity(feats_local.size, T, Hc, Wc)
            cand = M.select_candidates(raw, feats_local.count, vpos, threshold, top_k)
            # Re-base template ids to global indices.
            shard = jax.lax.axis_index("bank")
            n_local = feats_local.oris.shape[0]
            gtid = cand.template_id + shard.astype(jnp.int32) * n_local
            return M.CoarseMatches(gtid, cand.cell_y, cand.cell_x, cand.similarity, cand.valid)

        cand = jax.vmap(one_frame)(R_local)

        # Merge shards: all-gather per-shard top-k over ICI, then global top-k.
        allc = jax.lax.all_gather(cand, "bank", axis=1, tiled=False)
        # allc arrays: (B_local, n_bank, top_k)
        sims = allc.similarity.reshape(allc.similarity.shape[0], -1)
        vals, idx = jax.lax.top_k(jnp.where(
            allc.valid.reshape(sims.shape), sims, -1.0), top_k)
        take = lambda a: jnp.take_along_axis(a.reshape(sims.shape), idx, axis=1)
        return M.CoarseMatches(
            template_id=take(allc.template_id),
            cell_y=take(allc.cell_y),
            cell_x=take(allc.cell_x),
            similarity=vals,
            valid=take(allc.valid) & (vals >= threshold),
        )

    fn = shard_map(
        local_match,
        mesh=mesh,
        in_specs=(P("data"), feats_spec),
        out_specs=M.CoarseMatches(
            template_id=P("data"), cell_y=P("data"), cell_x=P("data"),
            similarity=P("data"), valid=P("data"),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_detect_step(
    mesh: Mesh,
    T1: int,
    max_cell_extent: int,
    top_k: int,
    threshold: float,
):
    """Full multi-chip 'detect step' over a frame batch: per-shard coarse
    scoring -> ICI top-k merge -> psum'd match-count metric.  This is the
    function the driver dry-runs across virtual devices (see
    __graft_entry__.dryrun_multichip)."""
    matcher = make_sharded_coarse_matcher(mesh, T1, max_cell_extent, top_k, threshold)

    def step(R_batch, feats):
        cand = matcher(R_batch, feats)
        num = jnp.sum(cand.valid.astype(jnp.int32))
        best = jnp.max(jnp.where(cand.valid, cand.similarity, -1.0))
        return cand, {"num_matches": num, "best_similarity": best}

    return jax.jit(step)
