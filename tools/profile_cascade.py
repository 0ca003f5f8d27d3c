"""Per-stage timing of the post-match cascade on the live backend."""
import time, sys
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial
    from linemod_pose_estimation_tpu.models import cascade as CC
    from linemod_pose_estimation_tpu.models.renderer import _pad_triangles, render as render_fn
    from linemod_pose_estimation_tpu.ops import match as M
    from linemod_pose_estimation_tpu.ops.icp import icp_two_stage
    from linemod_pose_estimation_tpu.utils import pointcloud as pcu

    def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
    def t(fn, *args, iters=10):
        o = fn(*args); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters): o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter()-t0)/iters*1e3

    rng = np.random.default_rng(7)
    p = CC.CascadeParams()
    n_meta = 10240
    K = p.max_matches

    matches = M.Matches(
        template_id=jnp.asarray(rng.integers(0, n_meta, K).astype(np.int32)),
        x=jnp.asarray(rng.integers(0, 600, K).astype(np.int32)),
        y=jnp.asarray(rng.integers(0, 440, K).astype(np.int32)),
        similarity=jnp.asarray(rng.uniform(85, 100, K).astype(np.float32)),
        valid=jnp.ones((K,), bool),
    )
    Od = jnp.asarray(rng.uniform(0.5, 1.0, n_meta).astype(np.float32))
    Rect = jnp.asarray(np.concatenate(
        [rng.integers(0, 400, (n_meta, 2)), rng.integers(40, 120, (n_meta, 2))], 1
    ).astype(np.int32))

    clus = jax.jit(lambda m: CC.cluster_matches(m, Od, Rect, 0.5, 0.1, 20, 2, p.max_cells, p.members_cap))
    log(f"cluster_ms {t(clus, matches):.2f}")
    clusters = clus(matches)
    nms = jax.jit(lambda c: CC.nms_iou(c, 0.4))
    log(f"nms_ms {t(nms, clusters):.2f}")

    v = np.array([[x_, y_, z_] for x_ in (-0.05, 0.05) for y_ in (-0.03, 0.03) for z_ in (-0.015, 0.015)], np.float32)
    fidx = [(0,1,3),(0,3,2),(4,6,7),(4,7,5),(0,4,5),(0,5,1),(2,3,7),(2,7,6),(0,2,6),(0,6,4),(1,5,7),(1,7,3)]
    tris = jnp.asarray(_pad_triangles(v[np.array(fidx)], 64))
    Kr = jnp.array([[535.0,0,320.0],[0,537.0,240.0],[0,0,1.0]], jnp.float32)
    R3 = jnp.eye(3, dtype=jnp.float32)
    T3 = jnp.array([0.0, 0.0, 0.7], jnp.float32)
    rend = jax.jit(lambda R_, T_: render_fn(tris, R_, T_, Kr, 640, 480))
    log(f"render640_ms {t(rend, R3, T3):.2f}")

    cap = p.model_cap
    mp = jnp.asarray(rng.normal(0, 0.03, (cap, 3)).astype(np.float32))
    sp_ = mp + jnp.asarray(np.array([0.01, -0.005, 0.008], np.float32))
    mv = jnp.ones((cap,), bool)
    icp = jax.jit(lambda a, b: icp_two_stage(a, mv, b, mv, coarse_iterations=p.icp_max_iter))
    log(f"icp_two_stage_ms {t(icp, mp, sp_):.2f}")

    sor = jax.jit(lambda a: pcu.statistical_outlier_removal(a, mv, 50, 1.0))
    log(f"sor_ms {t(sor, sp_):.2f}")
    vox = jax.jit(lambda a: pcu.voxel_grid_filter(a, mv, 0.002, cap))
    log(f"voxel_ms {t(vox, sp_):.2f}")
    hv = jax.jit(lambda a, b: pcu.voxel_occupancy_rate(a, mv, b, mv, 0.004))
    log(f"hv_ms {t(hv, mp, sp_):.2f}")

if __name__ == "__main__":
    main()
