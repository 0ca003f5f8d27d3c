"""Accuracy evaluation harness: render scenes at known poses, run the full
pipeline, report pixel / degree / centimeter error distributions.

The BASELINE acceptance bar is "detections within 1 px / 1 degree of OpenCV
linemod" (BASELINE.md).  Two complementary measurements:

- ground truth: render scenes at known poses, report the planted view's
  bbox-origin match px error, the rotation geodesic deg and translation cm
  of the recovered pose, and detection/miss rates.
- head-to-head vs the GENUINE cv::linemod engine (evaluate_vs_opencv):
  Python cv2 lacks the linemod module, but native/linemod_oracle.cpp links
  the system libopencv_rgbd and exposes the real Detector via ctypes
  (utils.oracle); both engines match identical frames from an identical
  bank (yml interchange) and we report score/px deltas + hit agreement.

tools/run_accuracy_eval writes ACCURACY.json for the judge; tests assert
the acceptance bars on the clean cases.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np


def _stats(v: list[float]) -> dict:
    if not v:
        return {"n": 0}
    a = np.asarray(v, np.float64)
    return {
        "n": int(a.size),
        "mean": float(a.mean()),
        "p50": float(np.percentile(a, 50)),
        "p90": float(np.percentile(a, 90)),
        "max": float(a.max()),
    }


@dataclass
class EvalCase:
    view_id: int
    found: bool
    px_err: float | None = None  # best-scoring match (argmax pick)
    px_err_tie: float | None = None  # nearest among max-score ties — the
    #   orientation-spreading plateau admits several 100% positions, as in
    #   OpenCV; this measures whether the true one is among them
    deg_err: float | None = None
    cm_err: float | None = None
    score: float | None = None


def evaluate_match_px(detector, renderer, meta, view_ids, threshold=85.0,
                      class_id: str | None = None) -> list[EvalCase]:
    """Match-level positional accuracy: re-render each trained view, match,
    and measure the pixel error of the best match against the template's
    own level-0 bbox origin (the quantity OpenCV's Match.x/y carries)."""
    import jax.numpy as jnp

    cid = class_id or detector.class_ids[0]
    cases: list[EvalCase] = []
    for k, vid in enumerate(view_ids):
        out = renderer.render(meta.R[vid], meta.T[vid])
        res = detector.match(np.asarray(out.rgb), threshold, class_ids=[cid])[cid]
        if len(res) == 0:
            cases.append(EvalCase(view_id=vid, found=False))
            continue
        best = int(np.argmax(res.similarity))
        top = float(res.similarity[best])

        def _px(i: int) -> float:
            rx, ry = detector.template_rect0(cid, int(res.template_id[i]))[:2]
            return float(np.hypot(float(res.x[i]) - rx, float(res.y[i]) - ry))

        ties = [i for i in range(len(res)) if res.similarity[i] >= top - 1e-6]
        cases.append(
            EvalCase(view_id=vid, found=True, px_err=_px(best),
                     px_err_tie=min(_px(i) for i in ties), score=top)
        )
    return cases


def evaluate_pose(pipeline, renderer, meta, view_ids, threshold=85.0) -> list[EvalCase]:
    """Pipeline-level 6D accuracy: full cascade on a rendered scene with its
    organized cloud; rotation geodesic (deg) and translation error (cm)
    against the rendering pose."""
    import jax.numpy as jnp

    from .utils import geometry as geo
    from .utils import pointcloud as pcu

    cases: list[EvalCase] = []
    for vid in view_ids:
        out = renderer.render(meta.R[vid], meta.T[vid])
        cloud = np.asarray(
            pcu.depth_to_cloud(np.asarray(out.depth_mm) / 1000.0, renderer.K)
        )
        dets = pipeline.detect(np.asarray(out.rgb), cloud, threshold)
        if not dets:
            cases.append(EvalCase(view_id=vid, found=False))
            continue
        d = dets[0]
        R_gt = meta.R[vid]
        t_gt = R_gt @ meta.T[vid]
        deg = float(
            geo.rotation_geodesic_deg(jnp.asarray(R_gt), jnp.asarray(d.pose[:3, :3]))
        )
        cm = float(np.linalg.norm(d.pose[:3, 3] - t_gt)) * 100.0
        cases.append(
            EvalCase(view_id=vid, found=True, deg_err=deg, cm_err=cm, score=d.score)
        )
    return cases


def evaluate_vs_opencv(detector, renderer, meta, view_ids, threshold=85.0,
                       class_id: str | None = None) -> dict:
    """Head-to-head vs the GENUINE cv::linemod engine on rendered objects.

    The trained bank bridges to a real cv::linemod::Detector through the
    yml interchange (identical templates), then both engines match the same
    re-rendered scenes; reports per-view |score delta| and |position delta|
    distributions.  Requires the oracle (utils.oracle); frame dims must be
    divisible by 5 and 16 (cv::linemod's pyramid constraint).
    """
    import os
    import tempfile

    import numpy as np

    from .utils import oracle as ORC

    if not ORC.available():
        return {"available": False}
    cid = class_id or detector.class_ids[0]
    fd, path = tempfile.mkstemp(suffix=".yml")
    os.close(fd)
    try:
        detector.write(path, cid)
        orc = ORC.LinemodOracle.read(path)
    finally:
        os.unlink(path)

    score_d, px_d, agree, tmpl_mismatch = [], [], 0, 0
    for vid in view_ids:
        out = renderer.render(meta.R[vid], meta.T[vid])
        rgb = np.asarray(out.rgb)
        xyt, sim = orc.match(rgb, threshold)
        ours = detector.match(rgb, threshold, class_ids=[cid])[cid]
        if (len(sim) == 0) != (len(ours) == 0):
            continue  # disagreement on hit/miss — counted by agree below
        agree += 1
        if len(sim) == 0:
            continue
        ob = int(np.argmax(sim))
        ub = int(np.argmax(ours.similarity))
        score_d.append(abs(float(sim[ob]) - float(ours.similarity[ub])))
        # Position deltas only make sense on the SAME template: if the
        # engines prefer different (equally valid) templates, their bbox
        # origins differ by template geometry, not match error.  Pair our
        # best match against the oracle match with the same template id
        # (fall back to counting a template mismatch).
        same = np.flatnonzero(xyt[:, 2] == int(ours.template_id[ub]))
        if same.size:
            ob2 = int(same[np.argmax(sim[same])])
            px_d.append(
                float(np.hypot(float(xyt[ob2][0]) - float(ours.x[ub]),
                               float(xyt[ob2][1]) - float(ours.y[ub])))
            )
        else:
            tmpl_mismatch += 1
    return {
        "available": True,
        "n": len(view_ids),
        "hit_miss_agreement": agree / max(len(view_ids), 1),
        "score_delta": _stats(score_d),
        "px_delta": _stats(px_d),
        "template_mismatches": tmpl_mismatch,
    }


def summarize(match_cases: list[EvalCase], pose_cases: list[EvalCase]) -> dict:
    return {
        "match": {
            "n": len(match_cases),
            "found_rate": (
                sum(c.found for c in match_cases) / len(match_cases)
                if match_cases else 0.0
            ),
            "px_err": _stats([c.px_err for c in match_cases if c.px_err is not None]),
            "px_err_tie": _stats(
                [c.px_err_tie for c in match_cases if c.px_err_tie is not None]
            ),
            "score": _stats([c.score for c in match_cases if c.score is not None]),
        },
        "pose": {
            "n": len(pose_cases),
            "found_rate": (
                sum(c.found for c in pose_cases) / len(pose_cases)
                if pose_cases else 0.0
            ),
            "deg_err": _stats([c.deg_err for c in pose_cases if c.deg_err is not None]),
            "cm_err": _stats([c.cm_err for c in pose_cases if c.cm_err is not None]),
        },
    }


def write_report(path: str, summary: dict) -> None:
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
