import numpy as np

from linemod_pose_estimation_tpu.utils import stl

STL_DIR = "/root/reference/config/stl"


def test_ascii_stl_memory_chip():
    mesh = stl.load_stl(f"{STL_DIR}/memoryChip2.stl")
    assert mesh.num_triangles > 100
    lo, hi = mesh.bounds()
    # A memory chip: a few centimeters across, roughly centered.
    assert np.all(hi - lo < 0.2)
    assert np.all(hi - lo > 0.0005)
    assert np.linalg.norm(mesh.centroid()) < 0.1
    n = np.linalg.norm(mesh.normals, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_binary_stl_box():
    mesh = stl.load_stl(f"{STL_DIR}/boxNew.stl")
    # binary: 84 + 50*T bytes = 96684 -> 1932 triangles
    assert mesh.num_triangles == (96684 - 84) // 50
    lo, hi = mesh.bounds()
    assert np.all(np.isfinite(mesh.triangles))
    assert np.all(hi - lo < 1.0)


def test_binary_stl_cpu():
    mesh = stl.load_stl(f"{STL_DIR}/cpu_binary.stl")
    assert mesh.num_triangles == (32484 - 84) // 50
    assert np.all(np.isfinite(mesh.triangles))
