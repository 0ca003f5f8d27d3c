"""Robot-frame transform chain (SURVEY.md C21) — host-side numpy.

pose_base<-obj = pose_base<-tool0 (robot TF) x pose_tool0<-depth (hand-eye)
              x pose_depth<-obj (the detection), exactly the service node's
chain (service.cpp:1800-1828).  The hand-eye calibration constant ships in
the reference source (service.cpp:1802).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Hand-eye result baked into the reference (service.cpp:1802):
# translation (x, y, z), quaternion (qw, qx, qy, qz).
REFERENCE_HAND_EYE = (0.0672827, -0.0546864, 0.0466534, 0.701074, 2.999e-05, 0.00514592, 0.71307)


@dataclass
class Transform:
    """The wire shape of geometry_msgs/Transform (srv/linemod_pose.srv)."""

    translation: tuple[float, float, float]
    rotation: tuple[float, float, float, float]  # (qx, qy, qz, qw) — ROS order

    @classmethod
    def identity(cls) -> "Transform":
        return cls((0.0, 0.0, 0.0), (0.0, 0.0, 0.0, 1.0))


def quat_to_mat_np(qw: float, qx: float, qy: float, qz: float) -> np.ndarray:
    n = np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )


def mat_to_quat_np(R: np.ndarray) -> tuple[float, float, float, float]:
    """(qx, qy, qz, qw), w >= 0."""
    import jax.numpy as jnp

    from ..utils.geometry import quat_from_matrix

    w, x, y, z = np.asarray(quat_from_matrix(jnp.asarray(R))).tolist()
    return (x, y, z, w)


def make_affine(x, y, z, qw, qx, qy, qz) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = quat_to_mat_np(qw, qx, qy, qz)
    T[:3, 3] = [x, y, z]
    return T


def tool0_to_depth(hand_eye=REFERENCE_HAND_EYE) -> np.ndarray:
    """getTool0toDepthTF (service.cpp:1732-1745)."""
    return make_affine(*hand_eye)


def base_to_object(
    pose_base_tool0: np.ndarray,
    pose_depth_obj: np.ndarray,
    hand_eye=REFERENCE_HAND_EYE,
) -> np.ndarray:
    """The full chain (service.cpp:1814-1821)."""
    return pose_base_tool0 @ tool0_to_depth(hand_eye) @ pose_depth_obj


def affine_to_transform(T: np.ndarray) -> Transform:
    """affineTotrans (service.cpp:1761-1776)."""
    qx, qy, qz, qw = mat_to_quat_np(T[:3, :3])
    t = T[:3, 3]
    return Transform((float(t[0]), float(t[1]), float(t[2])), (qx, qy, qz, qw))
