"""Train a reference-scale DUAL-MODALITY (ColorGradient + DepthNormal)
boxNew bank — the renderer_node config (renderer.cpp:179-185 trains with
both modalities at T={5,8}) at the shipped bank's 2652-view scale.  Writes
TRAINING_RGBD.json + the two bank ymls; the RGB-D headline bench loads
this bank so its numbers come from a REAL trained bank, not synthetic
random features."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linemod_pose_estimation_tpu.models.templates import DetectorParams
from linemod_pose_estimation_tpu.models.trainer import TrainerConfig, train_and_write
from linemod_pose_estimation_tpu.utils.viewsphere import ViewSphereParams


def main():
    max_views = int(sys.argv[1]) if len(sys.argv) > 1 else 2652
    cfg = TrainerConfig(
        view_sphere=ViewSphereParams(
            n_points=150, angle_step=10, radius_min=0.5, radius_max=1.0,
            radius_step=0.1,
        ),
        detector=DetectorParams(use_depth_normal=True),
    )
    t0 = time.perf_counter()
    det, bank = train_and_write(
        "/root/reference/config/stl/boxNew.stl",
        "/tmp/boxNew_rgbd_templates.yml",
        "/tmp/boxNew_rgbd_params.yml",
        cfg, max_views=max_views,
    )
    dt = time.perf_counter() - t0
    rec = {
        "backend": jax.default_backend(),
        "requested_views": max_views,
        "templates": bank.num_templates,
        "wall_s": round(dt, 2),
        "views_per_s": round(max_views / dt, 2),
        "bank_files": ["/tmp/boxNew_rgbd_templates.yml", "/tmp/boxNew_rgbd_params.yml"],
        "config": ("reference renderer_node scale: n_points=150 angle_step=10 "
                   "radius 0.5-1.0 step 0.1, 640x480, ColorGradient+DepthNormal"),
    }
    print(json.dumps(rec))
    with open("TRAINING_RGBD.json", "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
