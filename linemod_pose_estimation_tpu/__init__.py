"""TPU-native LINEMOD 6D pose-estimation framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of
birlrobotics/linemod_pose_estimation (OpenCV ``cv::linemod`` + ORK renderer +
PCL + ROS) for TPU hardware:

- ``utils``    — geometry, STL meshes, OpenCV-YAML bank I/O, point clouds.
- ``ops``      — device compute: quantized modalities, orientation spreading,
                 response LUTs, the batched template-scoring engine, ICP,
                 voxel ops.  Pure JAX / Pallas, jit-friendly (static shapes,
                 ``lax`` control flow).
- ``models``   — Detector (add_template / match / read / write), the offline
                 view-sphere trainer, the JAX STL rasterizer, and the full
                 detection cascade (voting → NMS → pose → ICP → HV).
- ``parallel`` — device-mesh sharding of the template bank + frame batch
                 (`jax.sharding` / shard_map, ICI collectives for top-k).
- ``api``      — host service surface preserving the reference's
                 ``/linemod_object_pose`` request/response semantics and the
                 robot-frame transform chain.

Reference layer map: see SURVEY.md sections 1-2.
"""

__version__ = "0.1.0"
