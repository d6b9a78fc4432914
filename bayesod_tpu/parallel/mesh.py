"""Device mesh + sharding layouts (no reference counterpart — the reference
is single-GPU; SURVEY.md §2 "Parallelism strategies" and §5.8).

Two mesh axes cover this workload:

  * `data`   — batch-parallel images. Gradient all-reduce and sync-BN means
               ride ICI via GSPMD-inserted collectives; nothing manual.
  * `sample` — MC-dropout samples. Default 1 (samples stay in-chip under
               vmap, which XLA batches onto the MXU); >1 shards the vmapped
               sample axis across devices for latency-oriented serving of a
               single image (BASELINE.json:10 "vmap MC samples x
               data-parallel images across a TPU mesh").

All entry points take explicit mesh/sharding arguments — nothing global, so
tests can build an 8-device virtual CPU mesh and production a v5e slice with
the same code path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayesod_tpu.utils.config import MeshConfig


def make_mesh(
    mesh_cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build the (data, sample) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sp = max(1, mesh_cfg.sample_parallel)
    dp = mesh_cfg.data_parallel
    if dp == -1:
        if n % sp:
            raise ValueError(f"{n} devices not divisible by sample_parallel={sp}")
        dp = n // sp
    if dp * sp != n:
        raise ValueError(
            f"mesh {dp}x{sp} != {n} devices (data_parallel x sample_parallel)"
        )
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (mesh_cfg.data_axis, mesh_cfg.sample_axis))


def batch_sharding(mesh: Mesh, mesh_cfg: MeshConfig) -> NamedSharding:
    """Batch dict arrays: leading batch axis split over `data`."""
    return NamedSharding(mesh, P(mesh_cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Model/optimizer state: replicated (ResNet-50 fits in HBM many times
    over; TP would only add collectives — SURVEY.md §2 'N/A: TP/PP/EP')."""
    return NamedSharding(mesh, P())


def sample_sharding(mesh: Mesh, mesh_cfg: MeshConfig) -> NamedSharding:
    """[N_mc, ...] arrays: MC-sample axis split over `sample` (serving)."""
    return NamedSharding(mesh, P(mesh_cfg.sample_axis))


def shard_batch(batch: Dict, mesh: Mesh, mesh_cfg: MeshConfig) -> Dict:
    """device_put a loader batch with the data-parallel layout (overlaps the
    H2D copy of the next batch with compute on the current one).

    Multi-host (multi-process) meshes: each process passes its LOCAL shard
    of the global batch; `jax.make_array_from_process_local_data` assembles
    the logically-global array (SURVEY.md §5.8 — the TPU-native equivalent
    of a distributed data loader; DCN never sees activation data).
    """
    sharding = batch_sharding(mesh, mesh_cfg)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def jit_serving_fn(fn, mesh: Mesh, mesh_cfg: MeshConfig, batch_size: int):
    """jit a `(variables, images, rng) -> out` serving fn with the mesh
    layout: replicated variables/rng, data-sharded batch. The one serving
    jit recipe shared by infer.api.Detector(mesh=...) and
    eval.evaluator.run_inference's mesh route."""
    n_data = mesh.shape[mesh_cfg.data_axis]
    if batch_size % n_data:
        raise ValueError(
            f"batch_size={batch_size} must divide the mesh data axis "
            f"({n_data} devices)"
        )
    return jax.jit(
        fn,
        in_shardings=(
            replicated(mesh),
            batch_sharding(mesh, mesh_cfg),
            replicated(mesh),
        ),
    )


def replicate_state(state, mesh: Mesh):
    """device_put the train state fully replicated over the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
