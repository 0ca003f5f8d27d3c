"""Offline template trainer: STL -> view-sphere renders -> template bank.

The TPU-native replacement for the reference's renderer_node /
renderer_only_image_node (SURVEY.md C15/C16, renderer.cpp:170-354):

  for each view on the (radius x in-plane-angle x sphere-point) grid:
      render depth/mask/RGB at the view pose          [device, batched]
      extract LINEMOD features (gradient [+ normals]) [host]
      skip views with too few features (addTemplate == -1)
      record {R, T, K, D, Ori_dist, Rect} metadata
  write templates.yml + renderer_params.yml           [C14 formats]

RGB-only mode (`use_depth_normal=False`) corresponds to the Ensenso trainer
(renderer_only_image.cpp); RGB+Depth to the full renderer_node.  Rendering
is batched over views with vmap — the device does all views of a chunk in
one dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.stl import load_stl
from ..utils.viewsphere import ViewSphereParams, generate_views
from .detector import Detector
from .renderer import Renderer
from .templates import (
    DetectorParams,
    RendererGlobals,
    TemplateBank,
    TemplateMetadata,
)


@dataclass
class TrainerConfig:
    view_sphere: ViewSphereParams = field(default_factory=ViewSphereParams)
    width: int = 640
    height: int = 480
    focal_length_x: float = 535.566011
    focal_length_y: float = 537.168115
    near: float = 0.1
    far: float = 1000.0
    detector: DetectorParams = field(default_factory=DetectorParams)
    render_batch: int = 16
    class_id: str = "obj"


def train_from_stl(
    stl_path: str,
    config: TrainerConfig | None = None,
    max_views: int | None = None,
    progress: bool = False,
) -> tuple[Detector, TemplateBank]:
    """The renderer_node main loop (renderer.cpp:262-329), batched."""
    cfg = config or TrainerConfig()
    mesh = load_stl(stl_path)
    r = Renderer(
        mesh, cfg.width, cfg.height, cfg.focal_length_x, cfg.focal_length_y,
        cfg.near, cfg.far,
    )
    views = generate_views(cfg.view_sphere)
    if max_views is not None:
        views = views[:max_views]

    det = Detector(cfg.detector)
    Rs, Ts, Ks, Ds, Ods, Rects = [], [], [], [], [], []

    K_np = np.array(
        [
            [cfg.focal_length_x, 0, cfg.width / 2.0],
            [0, cfg.focal_length_y, cfg.height / 2.0],
            [0, 0, 1.0],
        ],
        np.float32,
    )

    B = cfg.render_batch
    for start in range(0, len(views), B):
        chunk = views[start : start + B]
        Rb = np.stack([v.R for v in chunk]).astype(np.float32)
        Tb = np.stack([v.T for v in chunk]).astype(np.float32)
        out = r.render_batch(Rb, Tb)
        depth = np.asarray(out.depth_mm)
        mask = np.asarray(out.mask)
        rgb = np.asarray(out.rgb)
        rect = np.asarray(out.rect)

        for j, v in enumerate(chunk):
            if rect[j, 2] == 0 or rect[j, 3] == 0:
                continue  # nothing rendered (is_image_valid == false)
            tid = det.add_template(
                rgb[j],
                mask[j],
                cfg.class_id,
                depth_mm=depth[j] if cfg.detector.use_depth_normal else None,
            )
            if tid < 0:
                continue  # too few features -> skip view (renderer.cpp:308-315)
            # distance = D_obj - center surface depth (renderer.cpp:284-285)
            cd = depth[j, cfg.height // 2, cfg.width // 2] / 1000.0
            Rs.append(v.R)
            Ts.append(v.T)
            Ks.append(K_np)
            Ds.append(v.D_obj - float(cd))
            Ods.append(v.D_obj)
            Rects.append(rect[j])
        if progress:
            print(f"trained {det.num_templates(cfg.class_id)} / {start + len(chunk)} views")

    meta = TemplateMetadata(
        R=np.stack(Rs) if Rs else np.zeros((0, 3, 3)),
        T=np.stack(Ts) if Ts else np.zeros((0, 3)),
        K=np.stack(Ks) if Ks else np.zeros((0, 3, 3), np.float32),
        D=np.array(Ds),
        Ori_dist=np.array(Ods),
        Rect=np.stack(Rects).astype(np.int32) if Rects else np.zeros((0, 4), np.int32),
    )
    vs = cfg.view_sphere
    globals_ = RendererGlobals(
        n_points=vs.n_points,
        angle_step=vs.angle_step,
        radius_min=vs.radius_min,
        radius_max=vs.radius_max,
        radius_step=vs.radius_step,
        width=cfg.width,
        height=cfg.height,
        focal_length_x=cfg.focal_length_x,
        focal_length_y=cfg.focal_length_y,
        near=cfg.near,
        far=cfg.far,
    )
    bank = TemplateBank(
        cfg.class_id,
        cfg.detector,
        det._templates[cfg.class_id],
        metadata=meta,
        globals_=globals_,
    )
    det.attach_bank(bank)
    return det, bank


def train_and_write(
    stl_path: str,
    templates_yml: str,
    params_yml: str,
    config: TrainerConfig | None = None,
    max_views: int | None = None,
) -> tuple[Detector, TemplateBank]:
    """Full trainer entry: train + write both YAML banks
    (renderer.cpp:331-349)."""
    det, bank = train_from_stl(stl_path, config, max_views)
    bank.write_templates_yaml(templates_yml)
    bank.write_params_yaml(params_yml)
    return det, bank
