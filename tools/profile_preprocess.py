"""Sub-stage profile of preprocess_frames_batched (the stage PERF.md puts
12x off its HBM floor): quantizers, pyrDown, depth-normal chain, the four
spread/response kernels, and the fused pipeline, at the headline batch on
real scenes.  Prints ms/batch per sub-stage beside analytic floors so the
next kernel fusion targets the real cost.

Usage: python tools/profile_preprocess.py [batch]   (real TPU)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import bench as B  # noqa: E402
from linemod_pose_estimation_tpu.models.renderer import Renderer  # noqa: E402
from linemod_pose_estimation_tpu.models.templates import TemplateBank  # noqa: E402
from linemod_pose_estimation_tpu.ops import features as F  # noqa: E402
from linemod_pose_estimation_tpu.ops import match as M  # noqa: E402
from linemod_pose_estimation_tpu.ops.pallas_kernels import (  # noqa: E402
    spread_response_batched,
)
from linemod_pose_estimation_tpu.ops.pallas_preprocess import (  # noqa: E402
    quantize_color_gradient_pallas,
)

HBM_GBS = 819e9


def thru(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:34s}: {ms:7.3f} ms/batch")
    return ms


def main():
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tpl, prm = B._gunzip_bank()
    meta, glob = TemplateBank.read_params_yaml(prm)
    r = Renderer("/root/reference/config/stl/boxNew.stl", glob.width,
                 glob.height, glob.focal_length_x, glob.focal_length_y)
    rng = np.random.default_rng(3)
    frames, depths_np, _ = B._real_scenes(r, meta, Bsz, glob.height,
                                          glob.width, rng)
    rgbs = jnp.asarray(frames)
    depths = jnp.asarray(depths_np)
    H, W = glob.height, glob.width
    T0, T1 = 5, 8
    weak = 10.0

    # Stage functions (jitted separately so each measures alone).
    q0_f = jax.jit(lambda r_: quantize_color_gradient_pallas(r_, weak))
    pyr_f = jax.jit(lambda r_: jax.vmap(
        lambda rgb: jnp.stack(
            [F.pyr_down(rgb[..., c].astype(jnp.float32)) for c in range(3)],
            axis=-1))(r_))
    dn_f = jax.jit(lambda d: jax.vmap(F.quantize_depth_normal)(d))
    sub_f = jax.jit(M.subsample2_u8)
    sp0_f = jax.jit(lambda q: spread_response_batched(q, T0))
    sp1_f = jax.jit(lambda q: spread_response_batched(q, T1))
    full_f = jax.jit(lambda r_, d: M.preprocess_frames_batched(
        r_, d, T0=T0, T1=T1, use_depth=True, weak_threshold=weak,
        use_pallas_quant=True))

    print(f"batch {Bsz}, {W}x{H}, RGB-D (v5e-1)")
    ms = {}
    ms["quant L0 (pallas)"] = thru(q0_f, rgbs, label="quant L0 (pallas)")
    q0 = q0_f(rgbs)
    ms["pyrDown rgb"] = thru(pyr_f, rgbs, label="pyrDown rgb")
    rgb1 = pyr_f(rgbs)
    ms["quant L1 (pallas)"] = thru(q0_f, rgb1, label="quant L1 (pallas)")
    q1 = q0_f(rgb1)
    ms["depth-normal quant"] = thru(dn_f, depths, label="depth-normal quant")
    n0 = dn_f(depths)
    ms["subsample n0"] = thru(sub_f, n0, label="subsample n0")
    n1 = sub_f(n0)
    ms["spread L0 grad (T0)"] = thru(sp0_f, q0, label="spread L0 grad (T0)")
    ms["spread L1 grad (T1)"] = thru(sp1_f, q1, label="spread L1 grad (T1)")
    ms["spread L0 norm (T0)"] = thru(sp0_f, n0, label="spread L0 norm (T0)")
    ms["spread L1 norm (T1)"] = thru(sp1_f, n1, label="spread L1 norm (T1)")
    tot = sum(ms.values())
    full = thru(full_f, rgbs, depths, label="FULL preprocess (fused jit)")
    print(f"{'sub-stage sum':34s}: {tot:7.3f} ms/batch")

    in_bytes = Bsz * (H * W * 3 + H * W * 4)
    out_bytes = Bsz * 16 * (H * W + (H // 2) * (W // 2))
    print(f"\nHBM floor (inputs once + responses once): "
          f"{(in_bytes + out_bytes) / HBM_GBS * 1e3:.3f} ms")
    print(f"responses bytes/batch: {out_bytes / 1e6:.0f} MB")


if __name__ == "__main__":
    main()
