"""Device meshes and sharding utilities.

The reference's distributed runtime is torchrun + DDP + NCCL
(trainer/trainer_torchrun.py:67-121). The TPU-native design replaces all of it
with sharding annotations: a `jax.sharding.Mesh` over the slice, batches
sharded on the ``data`` axis, parameters replicated, and GSPMD emitting the
gradient all-reduce over ICI. SyncBatchNorm (trainer_torchrun.py:112-113)
needs no special casing — batch-stat means over a sharded batch axis are
global means under pjit.

The ``spatial`` axis shards the image/cost-volume H dimension for
high-resolution inputs (the SURVEY §5 "long-context" analogue): convolutions
over a spatially-sharded tensor get their halo exchanges inserted by GSPMD.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, spatial: int = 1,
              devices=None) -> Mesh:
    """Mesh with ('data', 'spatial') axes over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial == n, (data, spatial, n)
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: int | None = None,
                   rank: int | None = None) -> NamedSharding:
    """Sharding for a ``[B, ...]`` batch array: B over 'data', optionally one
    spatial dim over 'spatial' (spec trimmed to `rank` when given)."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    n = rank if rank is not None else spatial_axis + 1
    spec = ["data"] + [None] * (n - 1)
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = False) -> dict:
    """Device-put a host batch dict with B sharded over 'data' (and H over
    'spatial' for image-like arrays when requested)."""
    out = {}
    for k, v in batch.items():
        if spatial and v.ndim >= 3:
            sh = batch_sharding(mesh, spatial_axis=1, rank=v.ndim)
        else:
            sh = NamedSharding(mesh, P("data"))
        out[k] = jax.device_put(v, sh)
    return out


def shard_image_hw(x: jax.Array, mesh: Mesh | None = None) -> jax.Array:
    """Inside-jit constraint: shard an ``[B, H, W, C]`` activation's H over
    the 'spatial' mesh axis (no-op without a mesh context)."""
    return jax.lax.with_sharding_constraint(
        x, P("data", "spatial")) if mesh is None else \
        jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", "spatial")))
