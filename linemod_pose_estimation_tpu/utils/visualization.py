"""Visualization + diagnostics helpers (SURVEY.md C23).

The reference's per-stage imshow windows, drawResponse feature overlays and
RViz publishers (service.cpp:277-279, 723-748, rgbdDetector.cpp:1751-1797)
map to: numpy image annotation (rect/feature overlays), a dependency-free
PNG writer (no OpenCV needed at runtime), and a StageTimer reproducing the
reference's per-stage getTickCount prints (service.cpp:342-346, 427-435).
"""

from __future__ import annotations

import struct
import time
import zlib
from contextlib import contextmanager

import numpy as np


def write_png(path: str, img: np.ndarray) -> None:
    """Minimal RGB(A)/gray PNG writer (stdlib only)."""
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[i].astype(np.uint8).tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def draw_rect(img: np.ndarray, rect, color=(255, 0, 0), thickness: int = 2) -> np.ndarray:
    """Rectangle overlay (the reference's cv::rectangle on 'display0',
    service.cpp:586-590)."""
    out = img.copy()
    x, y, w, h = (int(v) for v in rect)
    H, W = out.shape[:2]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, W - 1), min(y + h, H - 1)
    for t in range(thickness):
        if y0 + t < H:
            out[y0 + t, x0:x1 + 1] = color
        if 0 <= y1 - t < H:
            out[y1 - t, x0:x1 + 1] = color
        if x0 + t < W:
            out[y0:y1 + 1, x0 + t] = color
        if 0 <= x1 - t < W:
            out[y0:y1 + 1, x1 - t] = color
    return out


def draw_features(
    img: np.ndarray, features: np.ndarray, origin_xy=(0, 0), color=(0, 255, 0)
) -> np.ndarray:
    """Feature-dot overlay — drawResponse (service.cpp:723-748).

    features: (F, 3) rows (y, x, ori) relative to the template bbox origin.
    """
    out = img.copy()
    H, W = out.shape[:2]
    ox, oy = origin_xy
    for f in np.asarray(features):
        y, x = int(f[0]) + oy, int(f[1]) + ox
        if 1 <= y < H - 1 and 1 <= x < W - 1:
            out[y - 1 : y + 2, x - 1 : x + 2] = color
    return out


class StageTimer:
    """Per-stage wall-clock accumulator — the cv::getTickCount bracket
    pattern used around every stage of the reference."""

    def __init__(self, verbose: bool = False):
        self.times: dict[str, float] = {}
        self.verbose = verbose

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self.verbose:
                print(f"Time consumed by {name}: {dt:.4f}s")

    def report(self) -> str:
        return "\n".join(f"{k}: {v * 1000:.2f} ms" for k, v in self.times.items())
