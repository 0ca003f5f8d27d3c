"""Cloud segmentation ops: normals, smoothing, region growing, clustering.

The PCL algorithm suite the reference's grasp planner and dormant paths use
(SURVEY.md E3): NormalEstimationOMP (kNN PCA), MovingLeastSquares smoothing,
RegionGrowing (smoothness + curvature thresholds), and
EuclideanClusterExtraction — as fixed-capacity masked JAX ops.

Connectivity algorithms (region growing, euclidean clustering) run as
iterative min-label propagation over a kNN graph (`lax.while_loop` to a
fixpoint) instead of PCL's sequential BFS queues: same components, SPMD-
friendly.  PCL's curvature-gated seed expansion maps to edges that may only
*propagate through* low-curvature points (documented deviation: PCL gates
whether a joined point becomes a new seed; we gate the same condition on the
propagation source).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import SENTINEL, pad_cloud, pairwise_sq_dists


def knn_indices(points: jnp.ndarray, valid: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, k) neighbour indices + validity (excludes self; invalid far)."""
    pts = pad_cloud(points, valid)
    d2 = pairwise_sq_dists(pts, pts)
    n = points.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    ok = jnp.isfinite(-neg) & valid[:, None]
    return idx, ok


def estimate_normals(
    points: jnp.ndarray, valid: jnp.ndarray, k: int = 50, viewpoint=(0.0, 0.0, 0.0)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """kNN-PCA normals + curvature — NormalEstimationOMP(kSearch=k)
    (rgbdDetector.cpp:1157-1162).  Normals oriented toward `viewpoint`.

    Returns (normals (N, 3), curvature (N,))."""
    idx, ok = knn_indices(points, valid, k)
    nb = points[idx]  # (N, k, 3)
    w = ok.astype(points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nb * w, axis=1) / cnt
    d = (nb - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    normal = evecs[..., 0]
    vp = jnp.asarray(viewpoint, points.dtype)
    flip = jnp.sum(normal * (points - vp), axis=-1) > 0
    normal = jnp.where(flip[:, None], -normal, normal)
    tr = jnp.maximum(jnp.sum(evals, axis=-1), 1e-12)
    curvature = evals[..., 0] / tr
    return normal, curvature


def mls_smooth(
    points: jnp.ndarray, valid: jnp.ndarray, radius: float = 0.04, k: int = 32
) -> jnp.ndarray:
    """MovingLeastSquares-style smoothing (rgbdDetector.cpp:1146-1154):
    project each point onto the local PCA plane of its radius neighbours
    (first-order MLS; PCL's optional polynomial refit omitted)."""
    idx, ok = knn_indices(points, valid, k)
    nb = points[idx]
    within = ok & (jnp.sum((nb - points[:, None, :]) ** 2, axis=-1) < radius * radius)
    w = within.astype(points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nb * w, axis=1) / cnt
    d = (nb - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[..., None]
    _, evecs = jnp.linalg.eigh(cov)
    normal = evecs[..., 0]
    off = jnp.sum((points - mean) * normal, axis=-1, keepdims=True)
    sm = points - off * normal
    return jnp.where(valid[:, None], sm, points)


def _propagate_min_labels(labels0, nbr_idx, edge_ok, max_iters: int = 64):
    """Min-label fixpoint over a directed kNN graph."""

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        nl = labels[nbr_idx]  # (N, k)
        nl = jnp.where(edge_ok, nl, jnp.int32(2**30))
        best = jnp.minimum(labels, jnp.min(nl, axis=1))
        return best, jnp.any(best != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.array(True), 0))
    return labels


@partial(jax.jit, static_argnames=("k", "max_iters"))
def region_growing_largest(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    normals: jnp.ndarray,
    curvature: jnp.ndarray,
    smoothness_deg: float,
    curvature_thresh: float,
    k: int = 30,
    min_cluster: int = 50,
    max_iters: int = 64,
) -> jnp.ndarray:
    """Largest smooth region's membership mask — pcl::RegionGrowing with
    setSmoothnessThreshold / setCurvatureThreshold semantics
    (rgbdDetector.cpp:1164-1186) followed by the take-largest selection."""
    n = points.shape[0]
    nbr_idx, ok = knn_indices(points, valid, k)
    cos_th = jnp.cos(jnp.radians(smoothness_deg))
    ndot = jnp.abs(jnp.sum(normals[:, None, :] * normals[nbr_idx], axis=-1))
    smooth = ndot > cos_th
    # Propagation may pass through low-curvature sources only.
    src_seed = curvature < curvature_thresh
    edge_ok = ok & smooth & src_seed[nbr_idx]
    labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**30))
    labels = _propagate_min_labels(labels0, nbr_idx, edge_ok, max_iters)
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), jnp.clip(labels, 0, n - 1), n)
    big = jnp.argmax(counts)
    mask = valid & (labels == big) & (counts[big] >= min_cluster)
    return mask


@partial(jax.jit, static_argnames=("k", "max_iters"))
def euclidean_cluster_largest(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    tolerance: float,
    k: int = 16,
    min_cluster: int = 50,
    max_iters: int = 64,
) -> jnp.ndarray:
    """Largest euclidean cluster's mask — EuclideanClusterExtraction with
    setClusterTolerance (rgbdDetector::euclidianClustering,
    rgbdDetector.cpp:1414-1434, which keeps cluster_indices[0])."""
    n = points.shape[0]
    nbr_idx, ok = knn_indices(points, valid, k)
    nb = points[nbr_idx]
    close_enough = jnp.sum((nb - points[:, None, :]) ** 2, axis=-1) < tolerance * tolerance
    edge_ok = ok & close_enough
    labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), jnp.int32(2**30))
    labels = _propagate_min_labels(labels0, nbr_idx, edge_ok, max_iters)
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), jnp.clip(labels, 0, n - 1), n)
    big = jnp.argmax(counts)
    return valid & (labels == big) & (counts[big] >= min_cluster)
