"""Point-to-point ICP as a fixed-shape JAX loop.

TPU-native replacement for the reference's two-pass PCL ICP refinement
(rgbdDetector::icpPoseRefine, rgbdDetector.cpp:1263-1412): brute-force
nearest-neighbour correspondence via an MXU pairwise-distance matmul
(clouds are a few thousand points — a (M, S) distance matrix is tiny),
distance-gated correspondence rejection (the moral equivalent of PCL's
max-correspondence-distance + RANSAC outlier threshold), closed-form
Umeyama/Kabsch update via 3x3 SVD, iterated under `lax.while_loop` with a
transform-epsilon early stop.

The reference's schedule (coarse: argv params e.g. 150 it / 0.05 corr /
RANSAC 0.02; fine: 20 it / 0.01 corr / RANSAC 0.01 — service launch args and
rgbdDetector.cpp:1349-1366) is reproduced by `icp_two_stage`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.pointcloud import pairwise_sq_dists


class ICPResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) source -> target
    fitness: jnp.ndarray  # mean squared inlier distance
    num_inliers: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray  # bool


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid alignment src->dst: (4,4) transform."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    cs = jnp.sum(src * w[:, None], axis=0) / wsum
    cd = jnp.sum(dst * w[:, None], axis=0) / wsum
    H = ((src - cs) * w[:, None]).T @ (dst - cd)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = Vt.T @ S @ U.T
    t = cd - R @ cs
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@partial(jax.jit, static_argnames=("max_iterations",))
def icp(
    model_pts: jnp.ndarray,
    model_valid: jnp.ndarray,
    scene_pts: jnp.ndarray,
    scene_valid: jnp.ndarray,
    max_iterations: int = 50,
    max_corr_dist: float = 0.05,
    rejection_dist: float = 0.02,
    transform_epsilon: float = 1e-5,
) -> ICPResult:
    """Align model (source) onto scene (target); returns the source->target
    transform like PCL's getFinalTransformation (pose update is
    `tf @ pose`, ref rgbdDetector.cpp:1328-1331)."""
    corr2 = max_corr_dist * max_corr_dist
    rej2 = rejection_dist * rejection_dist
    scene_safe = jnp.where(scene_valid[:, None], scene_pts, 1e6)

    def cond(state):
        T, it, done, _, _ = state
        return (it < max_iterations) & (~done)

    def body(state):
        T, it, _, _, _ = state
        cur = model_pts @ T[:3, :3].T + T[:3, 3]
        d2 = pairwise_sq_dists(cur, scene_safe)  # (M, S)
        nn = jnp.argmin(d2, axis=1)
        nd2 = jnp.min(d2, axis=1)
        # Distance-gated rejection: PCL gates at max_corr_dist then RANSAC-
        # rejects residuals beyond `rejection_dist`; we gate at min of both
        # (with slack on the rejection radius while far from convergence).
        w = (model_valid & (nd2 < jnp.minimum(corr2, rej2 * 4))).astype(jnp.float32)
        tgt = scene_safe[nn]
        delta = _kabsch(cur, tgt, w)
        Tn = delta @ T
        # Convergence: PCL transformation_epsilon compares successive
        # transforms; use rotation/translation increment magnitude.
        dr = jnp.sum((delta[:3, :3] - jnp.eye(3)) ** 2)
        dt = jnp.sum(delta[:3, 3] ** 2)
        done = (dr + dt) < transform_epsilon
        fit = jnp.sum(nd2 * w) / jnp.maximum(jnp.sum(w), 1.0)
        return (Tn, it + 1, done, fit, jnp.sum(w))

    T0 = jnp.eye(4)
    state = (T0, jnp.int32(0), jnp.array(False), jnp.array(jnp.inf), jnp.array(0.0))
    T, it, done, fit, ninl = jax.lax.while_loop(cond, body, state)
    return ICPResult(T, fit, ninl.astype(jnp.int32), it, done)


def icp_schedule(
    model_pts: jnp.ndarray,
    model_valid: jnp.ndarray,
    scene_pts: jnp.ndarray,
    scene_valid: jnp.ndarray,
    stages: tuple[tuple[int, float, float, float], ...],
) -> ICPResult:
    """Run a multi-pass ICP schedule; each stage is (max_iterations,
    max_corr_dist, rejection_dist, transform_epsilon) and starts from the
    previous stage's alignment (pose accumulates as tf_n @ ... @ tf_1).

    Generalizes the reference's two-pass icpPoseRefine and the three-pass
    icpNonLinearPoseRefine (rgbdDetector.cpp:1263-1412, 1508-1600; the
    nonlinear variant's LM inner loop is replaced by our closed-form Kabsch
    updates, which converge on the same point-to-point objective).
    """
    T_acc = jnp.eye(4)
    pts = model_pts
    fit = jnp.array(jnp.inf)
    ninl = jnp.array(0, jnp.int32)
    iters = jnp.array(0, jnp.int32)
    conv = jnp.array(False)
    for max_it, corr, rej, eps in stages:
        r = icp(
            pts, model_valid, scene_pts, scene_valid,
            max_iterations=max_it, max_corr_dist=corr,
            rejection_dist=rej, transform_epsilon=eps,
        )
        pts = pts @ r.transform[:3, :3].T + r.transform[:3, 3]
        T_acc = r.transform @ T_acc
        fit, ninl, conv = r.fitness, r.num_inliers, conv | r.converged
        iters = iters + r.iterations
    return ICPResult(T_acc, fit, ninl, iters, conv)


def icp_two_stage(
    model_pts: jnp.ndarray,
    model_valid: jnp.ndarray,
    scene_pts: jnp.ndarray,
    scene_valid: jnp.ndarray,
    coarse_iterations: int = 150,
    coarse_corr_dist: float = 0.05,
    coarse_rejection: float = 0.02,
    transform_epsilon: float = 1e-5,
    fine_iterations: int = 20,
    fine_corr_dist: float = 0.01,
    fine_rejection: float = 0.01,
) -> ICPResult:
    """The reference's coarse + fine-1 ICP schedule (rgbdDetector.cpp:
    1314-1331 then 1349-1368); the composed source->target transform."""
    r1 = icp(
        model_pts, model_valid, scene_pts, scene_valid,
        max_iterations=coarse_iterations,
        max_corr_dist=coarse_corr_dist,
        rejection_dist=coarse_rejection,
        transform_epsilon=transform_epsilon,
    )
    moved = model_pts @ r1.transform[:3, :3].T + r1.transform[:3, 3]
    r2 = icp(
        moved, model_valid, scene_pts, scene_valid,
        max_iterations=fine_iterations,
        max_corr_dist=fine_corr_dist,
        rejection_dist=fine_rejection,
        transform_epsilon=1e-6,
    )
    T = r2.transform @ r1.transform
    return ICPResult(T, r2.fitness, r2.num_inliers, r1.iterations + r2.iterations,
                     r1.converged | r2.converged)
