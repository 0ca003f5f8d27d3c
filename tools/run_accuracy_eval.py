"""Generate ACCURACY.json: the accuracy-harness report (eval.py) on clean
rendered scenes from the shipped boxNew bank.

Usage: JAX_PLATFORMS=cpu python tools/run_accuracy_eval.py [out.json]
(Host-CPU by default: the renderer + full cascade at small resolution; the
matcher numbers are backend-independent.)
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from linemod_pose_estimation_tpu import eval as EV
from linemod_pose_estimation_tpu.models import cascade as CC
from linemod_pose_estimation_tpu.models.detector import Detector
from linemod_pose_estimation_tpu.models.pipeline import DetectionPipeline
from linemod_pose_estimation_tpu.models.renderer import Renderer
from linemod_pose_estimation_tpu.models.templates import (
    DetectorParams, TemplateBank, TemplateMetadata,
)

BANK = "/root/reference/config/data/boxNew_longDistance_linemod_xtion_renderer_params.yml"
STL = "/root/reference/config/stl/boxNew.stl"
# Divisible by 5 and 16: lets the cv::linemod oracle run on the same frames.
W, H = 320, 240


def main(out_path: str = "ACCURACY.json") -> None:
    meta_full, glob = TemplateBank.read_params_yaml(BANK)
    glob.width, glob.height = W, H
    glob.focal_length_x /= 2
    glob.focal_length_y /= 2
    r = Renderer(STL, W, H, glob.focal_length_x, glob.focal_length_y)
    ids = [40, 41, 42, 43, 44, 50, 60, 70, 80, 90]
    det = Detector(DetectorParams())
    kept = []
    for i in ids:
        out = r.render(meta_full.R[i], meta_full.T[i])
        if det.add_template(np.asarray(out.rgb), np.asarray(out.mask), "boxNew") >= 0:
            kept.append(i)
    meta = TemplateMetadata(
        R=meta_full.R[kept], T=meta_full.T[kept], K=meta_full.K[kept],
        D=meta_full.D[kept], Ori_dist=meta_full.Ori_dist[kept],
        Rect=meta_full.Rect[kept],
    )
    params = CC.CascadeParams(
        canonicalize="none", max_clusters=2, model_cap=512, scene_cap=512,
        icp_max_iter=40, cluster_filter_thresh=0,
    )
    pipe = DetectionPipeline(det, meta, glob, STL, params, render_size=(W, H))

    view_ids = list(range(len(kept)))
    mcases = EV.evaluate_match_px(det, r, meta, view_ids, threshold=85.0)
    pcases = EV.evaluate_pose(pipe, r, meta, view_ids[:5], threshold=85.0)
    s = EV.summarize(mcases, pcases)
    # Head-to-head vs the genuine cv::linemod engine (identical templates
    # through the yml bridge) on the same rendered scenes.
    s["vs_opencv"] = EV.evaluate_vs_opencv(det, r, meta, view_ids, threshold=85.0)

    # Second object: memoryChip2 (ASCII STL), trained from the view sphere
    # (its reference bank is in .MISSING_LARGE_BLOBS, so GT poses come from
    # the trainer's own metadata).
    s["memoryChip2"] = _eval_second_object()
    s["config"] = {
        "bank": "boxNew (shipped reference bank poses) + memoryChip2 (view-sphere)",
        "render": f"{W}x{H}",
        "note": "clean synthetic scenes re-rendered at trained poses",
    }
    EV.write_report(out_path, s)
    print("wrote", out_path)
    import json

    print(json.dumps(s, indent=2))


def _eval_second_object() -> dict:
    from linemod_pose_estimation_tpu.models.trainer import TrainerConfig, train_from_stl
    from linemod_pose_estimation_tpu.models.templates import TemplateMetadata
    from linemod_pose_estimation_tpu.utils.viewsphere import ViewSphereParams

    stl = "/root/reference/config/stl/memoryChip2.stl"
    cfg = TrainerConfig(
        view_sphere=ViewSphereParams(
            n_points=10, angle_step=180, radius_min=0.4, radius_max=0.4,
            radius_step=0.1,
        ),
        width=W, height=H,
        focal_length_x=535.566011 / 2, focal_length_y=537.168115 / 2,
        class_id="memoryChip2",
    )
    det, bank = train_from_stl(stl, cfg, max_views=10)
    if bank.num_templates < 3 or bank.metadata is None:
        return {"n_templates": bank.num_templates, "skipped": True}
    meta = bank.metadata
    from linemod_pose_estimation_tpu.models.renderer import Renderer

    r = Renderer(stl, W, H, cfg.focal_length_x, cfg.focal_length_y)
    ids = list(range(bank.num_templates))
    mcases = EV.evaluate_match_px(det, r, meta, ids, threshold=85.0,
                                  class_id="memoryChip2")
    out = EV.summarize(mcases, [])["match"]
    out["n_templates"] = bank.num_templates
    out["vs_opencv"] = EV.evaluate_vs_opencv(
        det, r, meta, ids, threshold=85.0, class_id="memoryChip2"
    )
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ACCURACY.json")
