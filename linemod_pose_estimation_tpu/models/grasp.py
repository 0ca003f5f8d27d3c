"""Grasp-pose computation by region growing (SURVEY.md C13).

rgbdDetector::graspingPoseBasedOnRegionGrowing (rgbdDetector.cpp:1133-1244):
smooth the scene cloud (MLS), estimate normals, region-grow by smoothness/
curvature, take the LARGEST region, find the surface point nearest its
centroid, and build a grasp pose whose approach axis opposes the local
surface normal, backed off along the normal by `offset`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import segmentation as seg
from ..utils import pointcloud as pcu


@partial(jax.jit, static_argnames=("knn_normals", "knn_region"))
def grasping_pose_region_growing(
    scene_pts: jnp.ndarray,
    scene_valid: jnp.ndarray,
    normal_thresh_deg: float = 5.0,
    curvature_thresh: float = 1.0,
    offset: float = 0.05,
    knn_normals: int = 50,
    knn_region: int = 30,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (grasp pose (4, 4), region mask (N,)).

    Orientation: rotate the camera/end-effector z axis onto the anti-normal
    (the reference rotates by pi - angle(z, n) about z x n,
    rgbdDetector.cpp:1222-1230; we normalize the rotation axis, which the
    reference passes unnormalized to Eigen::AngleAxis).
    """
    sm = seg.mls_smooth(scene_pts, scene_valid)
    normals, curvature = seg.estimate_normals(sm, scene_valid, k=knn_normals)
    region = seg.region_growing_largest(
        sm, scene_valid, normals, curvature, normal_thresh_deg, curvature_thresh,
        k=knn_region,
    )

    centroid = pcu.masked_centroid(sm, region)
    d = jnp.where(region, jnp.sum((sm - centroid) ** 2, axis=-1), jnp.inf)
    sidx = jnp.argmin(d)
    surf_pt = sm[sidx]
    surf_n = normals[sidx]

    z = jnp.array([0.0, 0.0, 1.0])
    axis = jnp.cross(z, surf_n)
    axis_n = jnp.linalg.norm(axis)
    axis = jnp.where(axis_n > 1e-8, axis / jnp.maximum(axis_n, 1e-8), jnp.array([1.0, 0.0, 0.0]))
    cosang = jnp.clip(jnp.dot(z, surf_n), -1.0, 1.0)
    rot_angle = jnp.pi - jnp.arccos(cosang)

    # Rodrigues for R = AngleAxis(-rot_angle, axis).
    a = -rot_angle
    K = jnp.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = jnp.eye(3) + jnp.sin(a) * K + (1 - jnp.cos(a)) * (K @ K)

    pose = jnp.eye(4)
    pose = pose.at[:3, :3].set(R)
    pose = pose.at[:3, 3].set(surf_pt - offset * surf_n)
    return pose, region
