"""View-sphere sampling for offline template training.

Reproduces the capability of ORK's RendererIterator (SURVEY.md section 2.2
E2): walk ~uniform points on a view sphere around the object, with in-plane
camera rotations (`angle_step` degrees) and a radius sweep
(`radius_min..radius_max` by `radius_step`); emit the per-view pose metadata
the reference stores per template (renderer.cpp:262-323):

  R     — object->camera rotation ("R_obj" = R_cam^-1),
  T     — negative camera position in object frame,
  D_obj — camera-to-object-origin distance (the bank's Ori_dist).

Sphere points come from a Fibonacci spiral (deterministic, even coverage —
our documented convention; ORK's own point set is not part of the bank
format, only the per-template metadata is, so cross-compatibility holds).
`restricted=True` keeps the upper hemisphere (z >= min_elevation), the moral
equivalent of ORK's `is_restricted` viewport limit for planar objects
(renderer.cpp:270-272).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ViewSphereParams:
    n_points: int = 150
    angle_step: int = 10  # degrees, in-plane rotation step
    radius_min: float = 0.5
    radius_max: float = 1.0
    radius_step: float = 0.1
    restricted: bool = True
    min_elevation: float = 0.1  # z-component floor for restricted sampling
    # In-plane rotation sweep; full turn by default.
    angle_min: float = 0.0
    angle_max: float = 360.0


@dataclass
class View:
    R: np.ndarray  # (3,3) object->camera rotation
    T: np.ndarray  # (3,) negative camera position (bank "T")
    D_obj: float  # camera-to-origin distance (bank "Ori_dist")
    up: np.ndarray  # (3,) GL-style up vector used for the render


def fibonacci_sphere(n: int, hemisphere: bool = False, min_z: float = 0.0) -> np.ndarray:
    """Deterministic ~uniform unit directions (n, 3)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    if hemisphere:
        z = min_z + (1.0 - min_z) * (i / n)  # z in (min_z, 1)
    else:
        z = 1.0 - 2.0 * i / n
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i  # golden angle
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)


def _look_at_np(eye: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Numpy twin of utils.geometry.look_at_object."""
    fwd = -eye / np.linalg.norm(eye)
    s = np.cross(fwd, up)
    sl = np.linalg.norm(s)
    if sl < 1e-9:
        # Degenerate up || view axis; pick another up.
        up = np.array([1.0, 0.0, 0.0]) if abs(fwd[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
        s = np.cross(fwd, up)
        sl = np.linalg.norm(s)
    s = s / sl
    u_gl = np.cross(s, fwd)
    return np.stack([s, -u_gl, fwd], axis=0)


def generate_views(params: ViewSphereParams) -> list[View]:
    """Enumerate the full (radius x in-plane angle x sphere point) grid.

    Iteration order is radius-major then angle then point, mirroring the
    reference's monotonically increasing template ids over the iterator walk
    (renderer.cpp:262).
    """
    dirs = fibonacci_sphere(
        params.n_points, hemisphere=params.restricted, min_z=params.min_elevation
    )
    radii = []
    r = params.radius_min
    while r <= params.radius_max + 1e-9:
        radii.append(r)
        r += params.radius_step
    angles = np.arange(params.angle_min, params.angle_max - 1e-9, float(params.angle_step))

    # Vectorized over the whole (radius x angle x point) grid — the scalar
    # per-view loop cost ~7 s at reference scale (32k views) from numpy
    # cross/norm call overhead alone.  Same formulas elementwise.
    P = dirs.shape[0]
    A = angles.shape[0]
    Rn = len(radii)

    fwd = -dirs  # (P, 3)
    base = np.broadcast_to(np.array([0.0, 0.0, 1.0]), (P, 3)).copy()
    degen = np.abs(fwd[:, 2]) > 0.999
    base[degen] = np.array([0.0, 1.0, 0.0])
    base = base - np.sum(base * fwd, axis=1, keepdims=True) * fwd
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    side = np.cross(fwd, base)  # (P, 3)

    ca = np.cos(np.radians(angles))[:, None, None]  # (A,1,1)
    sa = np.sin(np.radians(angles))[:, None, None]
    up = ca * base[None] + sa * side[None]  # (A, P, 3)

    # look_at: forward = -eye/|eye| = fwd (radius-independent)
    f = np.broadcast_to(fwd[None], (A, P, 3))
    s = np.cross(f, up)
    sl = np.linalg.norm(s, axis=-1, keepdims=True)
    # Degenerate up || view axis: pick another up (matches _look_at_np).
    dg = sl[..., 0] < 1e-9
    if dg.any():
        alt = np.where(
            (np.abs(f[..., 0]) < 0.9)[..., None],
            np.array([1.0, 0.0, 0.0]),
            np.array([0.0, 1.0, 0.0]),
        )
        s = np.where(dg[..., None], np.cross(f, alt), s)
        sl = np.linalg.norm(s, axis=-1, keepdims=True)
    s = s / sl
    u_gl = np.cross(s, f)
    Rmat = np.stack([s, -u_gl, f], axis=2)  # (A, P, 3, 3) rows = s, -u, fwd

    views: list[View] = []
    for ri in range(Rn):
        radius = radii[ri]
        eye = radius * dirs  # (P, 3)
        for ai in range(A):
            for pi in range(P):
                views.append(
                    View(R=Rmat[ai, pi], T=-eye[pi], D_obj=float(radius),
                         up=up[ai, pi])
                )
    return views
