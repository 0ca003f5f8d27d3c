"""Application-node analogs of the reference's ROS executables (SURVEY.md
L2, C17/C18/C19) plus the offline replay seam.

- StreamingDetector  — the carmine node (linemod_carmine_detect.cpp): every
  fed frame runs the full cascade (with hypothesis verification and z-down
  canonicalization), the best-scored pose goes to the publish callback.
- PollingMultiObjectDetector — the two-object alternator
  (linemod_ensenso_detect_3_mult_detect.cpp:1907-1959): run_once() grabs a
  frame and detects the next object in rotation.
- ReplayFrameSource  — the dormant jpg/pcd replay path the reference
  sketched (mult_detect.cpp:1882-1898): detection without camera hardware,
  from .npz frame fixtures or ASCII .pcd + image files.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from ..models.pipeline import Detection, DetectionPipeline
from ..utils.visualization import StageTimer
from .service import Frame, ObjectConfig


# ---------------------------------------------------------------------------
# Replay sources (E4 stand-in)
# ---------------------------------------------------------------------------


def load_pcd_ascii(path: str, width: int | None = None, height: int | None = None) -> np.ndarray:
    """Minimal ASCII PCD reader -> organized (H, W, 3) float32 cloud.

    Parses the header for WIDTH/HEIGHT/FIELDS; NaNs pass through.
    """
    fields: list[str] = []
    w = h = None
    data = []
    with open(path) as f:
        in_data = False
        for line in f:
            if in_data:
                data.append([float(v) for v in line.split()[:3]])
                continue
            key, *rest = line.split()
            if key == "FIELDS":
                fields = rest
            elif key == "WIDTH":
                w = int(rest[0])
            elif key == "HEIGHT":
                h = int(rest[0])
            elif key == "DATA":
                if rest[0] != "ascii":
                    raise ValueError("only ascii PCD supported by the replay reader")
                in_data = True
    arr = np.array(data, np.float32)
    w = width or w
    h = height or h
    if h and w and h * w == arr.shape[0]:
        return arr.reshape(h, w, 3)
    return arr.reshape(1, -1, 3)


class ReplayFrameSource:
    """Round-robin frames from .npz fixtures ({rgb, cloud}) in a directory,
    or a single (image, pcd) pair — callable like the camera grab."""

    def __init__(self, path: str):
        self.frames: list[Frame] = []
        if os.path.isdir(path):
            for p in sorted(glob.glob(os.path.join(path, "*.npz"))):
                z = np.load(p)
                self.frames.append(Frame(rgb=z["rgb"], cloud=z["cloud"]))
        else:
            z = np.load(path)
            self.frames.append(Frame(rgb=z["rgb"], cloud=z["cloud"]))
        if not self.frames:
            raise FileNotFoundError(f"no replay frames under {path}")
        self._i = 0

    def __call__(self) -> Frame:
        f = self.frames[self._i % len(self.frames)]
        self._i += 1
        return f


def save_replay_frame(path: str, rgb: np.ndarray, cloud: np.ndarray) -> None:
    np.savez_compressed(path, rgb=rgb, cloud=cloud)


# ---------------------------------------------------------------------------
# Nodes
# ---------------------------------------------------------------------------


@dataclass
class StreamingDetector:
    """C17: continuous per-frame detection, best pose published.

    The carmine node sorts hypotheses by score, canonicalizes z-down and
    publishes only cluster_data[0] (carmine:467-513) — configure the
    pipeline's CascadeParams with canonicalize="z_down", enable_hv=True for
    full parity.
    """

    pipeline: DetectionPipeline
    threshold: float = 89.0  # carmine default (carmine:230)
    on_pose: Callable[[Detection], None] | None = None
    timer: StageTimer = field(default_factory=StageTimer)

    def feed(self, frame: Frame) -> Detection | None:
        with self.timer.stage("detect_total"):
            dets = self.pipeline.detect(frame.rgb, frame.cloud, self.threshold)
        if not dets:
            return None
        best = dets[0]
        if self.on_pose is not None:
            self.on_pose(best)
        return best


@dataclass
class PollingMultiObjectDetector:
    """C18: alternate over registered objects, one grab+detect per tick
    (the reference's 1 Hz flage-alternated loop, mult_detect.cpp:1907-1931).
    """

    frame_source: Callable[[], Frame]
    objects: dict[int, ObjectConfig] = field(default_factory=dict)
    on_pose: Callable[[int, Detection], None] | None = None
    _order: list[int] = field(default_factory=list)
    _i: int = 0

    def register_object(self, object_id: int, cfg: ObjectConfig) -> None:
        self.objects[object_id] = cfg
        self._order = sorted(self.objects)

    def run_once(self) -> tuple[int, list[Detection]]:
        if not self._order:
            return -1, []
        oid = self._order[self._i % len(self._order)]
        self._i += 1
        cfg = self.objects[oid]
        frame = self.frame_source()
        dets = cfg.pipeline.detect(frame.rgb, frame.cloud, cfg.threshold)
        if dets and self.on_pose is not None:
            self.on_pose(oid, dets[0])
        return oid, dets
