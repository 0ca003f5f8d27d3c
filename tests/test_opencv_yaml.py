import numpy as np
import pytest

from linemod_pose_estimation_tpu.utils import opencv_yaml as oy

SHIPPED = "/root/reference/config/data/boxNew_longDistance_linemod_xtion_renderer_params.yml"


def test_parse_shipped_bank():
    doc = oy.load(SHIPPED)
    assert "Template 0" in doc and "Template 2651" in doc
    t0 = doc["Template 0"]
    assert t0["ID"] == 0
    assert t0["R"].shape == (3, 3) and t0["R"].dtype == np.float64
    assert t0["T"].shape == (3, 1)
    assert t0["K"].shape == (3, 3) and t0["K"].dtype == np.float32
    assert t0["Rect"] == [253, 148, 134, 184]
    np.testing.assert_allclose(t0["Ori_dist"], 0.5)
    assert doc["renderer_n_points"] == 150
    assert doc["renderer_width"] == 640
    np.testing.assert_allclose(doc["renderer_focal_length_x"], 535.566011)


def test_roundtrip_through_own_parser(tmp_path):
    doc = {
        "Template 0": {
            "ID": 0,
            "R": oy.CvMatrix(np.eye(3)),
            "T": oy.CvMatrix(np.array([[0.1], [0.2], [0.3]])),
            "K": oy.CvMatrix(np.array([[535.5, 0, 320], [0, 537.1, 240], [0, 0, 1]], np.float32)),
            "D": 0.047,
            "Ori_dist": 0.5,
            "Rect": [1, 2, 3, 4],
        },
        "renderer_n_points": 150,
        "renderer_radius_min": 0.5,
    }
    p = tmp_path / "bank.yml"
    oy.dump(doc, str(p))
    d2 = oy.load(str(p))
    np.testing.assert_allclose(d2["Template 0"]["R"], np.eye(3))
    np.testing.assert_allclose(d2["Template 0"]["K"], doc["Template 0"]["K"].array, rtol=1e-6)
    assert d2["Template 0"]["Rect"] == [1, 2, 3, 4]
    assert d2["renderer_n_points"] == 150


def test_emitted_yaml_readable_by_opencv(tmp_path):
    """Golden cross-check: cv2.FileStorage (the reference's serializer) must
    read our emitted bank identically."""
    cv2 = pytest.importorskip("cv2")
    doc = {
        "Template 0": {
            "ID": 7,
            "R": oy.CvMatrix(np.arange(9, dtype=np.float64).reshape(3, 3) / 7.0),
            "Rect": [276, 205, 89, 67],
        },
        "renderer_radius_step": 0.1,
        "renderer_far": 1000.0,
    }
    p = str(tmp_path / "emit.yml")
    oy.dump(doc, p)
    fs = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
    node = fs.getNode("Template 0")
    assert int(node.getNode("ID").real()) == 7
    np.testing.assert_allclose(node.getNode("R").mat(), doc["Template 0"]["R"].array)
    rect = [int(node.getNode("Rect").at(i).real()) for i in range(4)]
    assert rect == [276, 205, 89, 67]
    np.testing.assert_allclose(fs.getNode("renderer_radius_step").real(), 0.1)
    np.testing.assert_allclose(fs.getNode("renderer_far").real(), 1000.0)
    fs.release()


def test_opencv_written_yaml_readable_by_us(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = str(tmp_path / "cvout.yml")
    fs = cv2.FileStorage(p, cv2.FILE_STORAGE_WRITE)
    fs.write("mat", np.linspace(0, 1, 12).reshape(3, 4))
    fs.write("count", 42)
    fs.write("name", "obj")
    fs.release()
    doc = oy.load(p)
    np.testing.assert_allclose(doc["mat"], np.linspace(0, 1, 12).reshape(3, 4))
    assert doc["count"] == 42
    assert doc["name"] == "obj"
