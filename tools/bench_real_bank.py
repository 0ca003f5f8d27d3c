"""Throughput + accuracy of the REAL trained bank (tools/train_full_bank.py
output): cold-start load through the native parser, batched matching on the
live backend, and a rendered-scene detection spot-check.  Writes
REALBANK.json — the headline bench uses synthetic random banks; this is the
same engine on an actual reference-scale bank.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    if len(sys.argv) == 2:
        sys.exit("usage: bench_real_bank.py [templates.yml params.yml] — "
                 "pass BOTH paths or neither (neither = the committed "
                 "reference-scale bank)")
    if len(sys.argv) > 2:
        tpl, prm = sys.argv[1], sys.argv[2]
    else:
        # Default to the committed reference-scale banks (RGB-D preferred),
        # decompressed to /tmp — no prior train run required.
        import bench as BM

        tpl, prm = BM._gunzip_bank()
        assert tpl is not None, "no committed bank under data/"
    B, iters = 16, 30

    from linemod_pose_estimation_tpu.models.detector import Detector
    from linemod_pose_estimation_tpu.models.renderer import Renderer
    from linemod_pose_estimation_tpu.models.serving import BatchedMatcher
    from linemod_pose_estimation_tpu.models.templates import TemplateBank

    t0 = time.perf_counter()
    det = Detector.read(tpl)
    meta, glob = TemplateBank.read_params_yaml(prm)
    load_s = time.perf_counter() - t0
    cid = det.class_ids[0]
    n = det.num_templates(cid)

    # Production configuration: exact hierarchical position pruning
    # (equality-tested vs the exhaustive path in tests/test_prune.py).
    bm = BatchedMatcher(det, cid, threshold=91.0, batch=B, prune=True,
                        prune_pos_cap=128)

    # Scenes: rendered trained views planted on black (one per batch slot).
    r = Renderer("/root/reference/config/stl/boxNew.stl", glob.width,
                 glob.height, glob.focal_length_x, glob.focal_length_y)
    ids = [i * max(n // B, 1) for i in range(B)]
    use_depth = det.params.use_depth_normal
    frames, depth_frames = [], []
    for i in ids:
        out = r.render(meta.R[i], meta.T[i])
        frames.append(np.asarray(out.rgb))
        if use_depth:
            d = np.asarray(out.depth_mm).astype(np.float32)
            depth_frames.append(np.where(d > 0, d, 1500.0))
    rgbs = jnp.asarray(np.stack(frames))
    depths = jnp.asarray(np.stack(depth_frames)) if use_depth else None

    m = bm.match_batch(rgbs, depths)
    jax.block_until_ready(m.similarity)
    t0 = time.perf_counter()
    for _ in range(iters):
        m = bm.match_batch(rgbs, depths)
    jax.block_until_ready(m.similarity)
    dt = (time.perf_counter() - t0) / iters
    fps = B / dt

    # Accuracy spot-check: each slot must find its own view at high score.
    ok = np.asarray(m.valid)
    sims = np.asarray(m.similarity)
    found = int(sum(bool(ok[b].any() and sims[b][ok[b]].max() >= 95.0)
                    for b in range(B)))
    rec = {
        "backend": jax.default_backend(),
        "modalities": "RGB-D" if use_depth else "RGB",
        "templates": n,
        "cold_start_load_s": round(load_s, 2),
        "batch": B,
        "fps_per_chip": round(fps, 2),
        "scenes_found_at_95": f"{found}/{B}",
        "best_scores": [round(float(sims[b][ok[b]].max()), 2) if ok[b].any() else 0.0
                        for b in range(B)],
    }
    print(json.dumps(rec))
    with open("REALBANK.json", "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
