"""Multi-camera / multi-host frame ingest: the DCN story.

The reference's inter-process fabric is ROS over TCPROS — one camera daemon
feeding one detector node (SURVEY.md section 2.3 / section 5 "distributed
communication backend").  The TPU-native equivalent splits transport by
physical link:

- host -> its local chips: `jax.device_put` of the host's frame batch
  (PCIe), sharded over the mesh's "data" axis;
- host <-> host (multi-host pods): each process contributes its LOCAL
  cameras' frames as its process-local shard of one GLOBAL batch array via
  `jax.make_array_from_process_local_data` — XLA moves shards over DCN only
  if a later computation requires it (with the detect step's pure-DP layout
  it never does: each host's frames stay on its own chips, and only the
  O(top_k) match records cross ICI/DCN in the collectives);
- chip <-> chip: ICI collectives inside the detect step
  (parallel/sharded_match.py).

`FrameBatcher` is the host-side seam: it polls any number of camera
callables (Ensenso grab services, replay fixtures — E4) round-robin into
fixed-size batches, mirroring the reference's grab_registered_image RPC
loop but N cameras wide.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class FrameBatcher:
    """Round-robin N camera sources into (B, H, W, 3) u8 + (B, H, W, 3) f32
    cloud batches (B = frames per step, typically a multiple of the mesh's
    "data" size)."""

    def __init__(self, sources: Sequence[Callable[[], object]], batch: int):
        if not sources:
            raise ValueError("need at least one frame source")
        self.sources = list(sources)
        self.batch = batch
        self._i = 0

    def next_batch(self) -> tuple[np.ndarray, np.ndarray]:
        rgbs, clouds = [], []
        for _ in range(self.batch):
            f = self.sources[self._i % len(self.sources)]()
            self._i += 1
            rgbs.append(np.asarray(f.rgb))
            clouds.append(np.asarray(f.cloud))
        return np.stack(rgbs), np.stack(clouds)


def put_global_batch(
    mesh: Mesh,
    local_rgbs: np.ndarray,
    local_depths: np.ndarray | None = None,
):
    """Assemble this process's frames into the GLOBAL data-parallel batch.

    Single-host: equivalent to `jax.device_put` with a P("data") sharding.
    Multi-host: every process calls this with its local cameras' frames; the
    returned global arrays have batch size sum(local batches) and shard over
    the global "data" axis without any host gathering — the DCN ingest seam.
    """
    sharding = NamedSharding(mesh, P("data"))
    rgbs = jax.make_array_from_process_local_data(sharding, np.asarray(local_rgbs))
    if local_depths is None:
        return rgbs, None
    depths = jax.make_array_from_process_local_data(
        sharding, np.asarray(local_depths)
    )
    return rgbs, depths
