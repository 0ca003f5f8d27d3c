"""SE(3) / quaternion / camera utilities (pure JAX, fully jit-able).

Re-creates the pose algebra the reference does with Eigen:
- quaternion <-> rotation matrix (ref: Eigen::Quaterniond usage,
  rgbdDetector.cpp:670, 699-704),
- geodesic rotation distance (ref: rgbdDetector::orientationCompare,
  rgbdDetector.cpp:1246-1261),
- hemisphere-aligned quaternion averaging (ref: the raw coefficient
  averaging in getRoughPoseByClustering, rgbdDetector.cpp:659-704),
- 4x4 homogeneous transforms (ref: Eigen::Affine3d compositions, e.g.
  icpPoseRefine rgbdDetector.cpp:1328-1331).

Quaternion convention: (w, x, y, z), unit norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) as (w,x,y,z).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the numerically best (largest pivot) with `jnp.where` so it traces
    cleanly under jit/vmap.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 comp, 4 branch)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-1)[..., 0]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical hemisphere: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_average(qs: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted mean of quaternions (N, 4), hemisphere-aligned to the first.

    The reference averages raw Eigen coefficients of near-identical rotations
    (rgbdDetector.cpp:670); hemisphere alignment makes that well-defined for
    any input signs while giving the same result on clustered rotations.
    """
    if weights is None:
        weights = jnp.ones(qs.shape[0], dtype=qs.dtype)
    ref = qs[0]
    sign = jnp.where(jnp.sum(qs * ref, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    q = jnp.sum(qs * sign * weights[:, None], axis=0)
    n = jnp.linalg.norm(q)
    return jnp.where(n > 1e-12, q / jnp.maximum(n, 1e-12), jnp.array([1.0, 0, 0, 0], qs.dtype))


def rotation_geodesic_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle in degrees between rotations (..., 3, 3).

    Matches rgbdDetector::orientationCompare (rgbdDetector.cpp:1246-1261):
    |angle(R1^-1 * R2)| in degrees.
    """
    Rrel = jnp.swapaxes(R1, -1, -2) @ R2
    tr = jnp.trace(Rrel, axis1=-2, axis2=-1)
    c = (tr - 1.0) / 2.0
    # atan2 form: well-conditioned at small angles where acos((tr-1)/2) loses
    # precision in float32.  sin(theta) = |skew(Rrel)| / 2.
    sx = Rrel[..., 2, 1] - Rrel[..., 1, 2]
    sy = Rrel[..., 0, 2] - Rrel[..., 2, 0]
    sz = Rrel[..., 1, 0] - Rrel[..., 0, 1]
    s = 0.5 * jnp.sqrt(sx * sx + sy * sy + sz * sz)
    return jnp.degrees(jnp.arctan2(s, c))


# ---------------------------------------------------------------------------
# Homogeneous transforms
# ---------------------------------------------------------------------------


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(3,3) rotation + (3,) translation -> (4,4) homogeneous matrix."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4,4) transform to points (..., 3)."""
    return pts @ T[:3, :3].T + T[:3, 3]


def invert_transform(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    return make_transform(R.T, -R.T @ t)


# ---------------------------------------------------------------------------
# Camera model
# ---------------------------------------------------------------------------


def make_K(fx: float, fy: float, cx: float, cy: float, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype)


def project(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels (..., 2) = (u, v).

    OpenCV convention: x right, y down, z forward (the convention of the
    template bank's K matrices — see the shipped renderer_params.yml).
    """
    z = pts_cam[..., 2]
    u = K[0, 0] * pts_cam[..., 0] / z + K[0, 2]
    v = K[1, 1] * pts_cam[..., 1] / z + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def look_at_object(eye: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Object->camera rotation for a camera at `eye` looking at the origin.

    Reproduces the bank's R convention (verified against the shipped
    boxNew renderer_params.yml: row 2 of R is normalize(-eye), and the
    reference's up vector is -row1(R) — rgbdDetector.cpp:649-651, 712-716).

    OpenCV camera axes: z = forward (eye->origin), x = right, y = down.
    """
    fwd = -eye
    fwd = fwd / jnp.linalg.norm(fwd)
    # GL-style basis: s = f x up (right), u_gl = s x f (true up).
    s = jnp.cross(fwd, up)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-12)
    u_gl = jnp.cross(s, fwd)
    # CV convention: y points down = -u_gl.
    return jnp.stack([s, -u_gl, fwd], axis=0)
