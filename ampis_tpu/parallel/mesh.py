"""Device mesh + sharding helpers (the framework's entire parallelism story).

The reference's distributed backend is torch DDP/NCCL used only for
data-parallel training with a single comm.synchronize() call (reference
data_utils.py:107; SURVEY.md §2b, §5): data parallelism is the only
strategy the workload needs (a ~44 M-param CNN detector). The TPU-native
equivalent is a 1-D 'data' mesh: the image batch (and every per-image GT
tensor) is sharded along axis 0, parameters are replicated, and XLA emits
the gradient all-reduce over ICI from the sharded jit — no bespoke
communication layer.

Multi-host extension: jax.distributed.initialize() before mesh creation
gives the same code DCN-spanning meshes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices=None, devices=None) -> Mesh:
    """1-D mesh over the fastest collective axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put numpy batch arrays sharded along axis 0 ('data')."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
