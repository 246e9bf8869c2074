"""Spatial (H-axis) sharding for high-resolution stereo.

The reference handles high resolution algorithmically per model (hierarchical
inference, volume downsampling, cascades — SURVEY §5 "long-context"); the
TPU-native answer is to shard the image / cost-volume H axis across chips so
one full-resolution pair uses the whole slice's HBM and compute:

  * `spatial_apply` — the GSPMD path: jit the eval forward with inputs
    sharded ``P(None, 'spatial')``; XLA inserts the conv halo exchanges over
    ICI automatically. Disparity-axis ops (softmax/soft-argmax) and W-axis
    correlation stay local because only H is partitioned.
  * `halo_exchange_h` / `sharded_conv3d_h` — the explicit `shard_map` +
    `ppermute` implementation of the same mechanism (1-row ghost exchange per
    conv layer), kept as a building block for custom kernels and validated
    bitwise against the unsharded conv in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def spatial_apply(apply_fn, mesh: Mesh):
    """Wrap an eval forward so the H axis runs sharded over 'spatial'.

    Args:
      apply_fn: (variables, left, right) → [B, H, W] disparity.
      mesh: mesh with a 'spatial' axis; H must divide its size.

    Returns:
      A function with the same signature; inputs are device_put with
      ``P(None, 'spatial')`` and the output is gathered to ``P()``.
    """
    img_sharding = NamedSharding(mesh, P(None, "spatial"))
    rep = NamedSharding(mesh, P())

    jitted = jax.jit(apply_fn,
                     in_shardings=(rep, img_sharding, img_sharding),
                     out_shardings=rep)

    def run(variables, left, right):
        left = jax.device_put(left, img_sharding)
        right = jax.device_put(right, img_sharding)
        return jitted(variables, left, right)

    return run


def halo_exchange_h(x: jax.Array, axis_name: str, halo: int) -> jax.Array:
    """Concatenate `halo` ghost rows from the H-axis neighbors.

    Inside a shard_map over `axis_name`, x is the local ``[B, H_loc, ...]``
    block; returns ``[B, H_loc + 2*halo, ...]`` with zero rows at the global
    boundaries (matching conv zero padding).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_edge = x[:, :halo]        # rows my top neighbor needs? (see below)
    bot_edge = x[:, -halo:]

    # receive my *previous* shard's bottom rows as my top halo
    up = jax.lax.ppermute(bot_edge, axis_name,
                          [(i, (i + 1) % n) for i in range(n)])
    # receive my *next* shard's top rows as my bottom halo
    down = jax.lax.ppermute(top_edge, axis_name,
                            [(i, (i - 1) % n) for i in range(n)])

    zeros = jnp.zeros_like(up)
    up = jnp.where(idx == 0, zeros, up)
    down = jnp.where(idx == n - 1, zeros, down)
    return jnp.concatenate([up, x, down], axis=1)


def sharded_conv3d_h(x: jax.Array, kernel: jax.Array, mesh: Mesh,
                     strides=(1, 1, 1)) -> jax.Array:
    """3D conv over a ``[B, D, H, W, C]`` volume with H sharded over
    'spatial', via explicit halo exchange.

    kernel: ``[kd, kh, kw, Cin, Cout]``; SAME zero padding; `strides` must
    keep H divisible by the mesh axis (stride_h == 1 for halo correctness).
    """
    kd, kh, kw = kernel.shape[:3]
    assert strides[1] == 1, "H-stride under H-sharding not supported"
    halo = kh // 2

    def local(xb, kb):
        # xb: [B, D, H_loc, W, C] (block over H)
        xb = jnp.swapaxes(xb, 1, 2)  # [B, H_loc, D, W, C] — halo along axis 1
        xb = halo_exchange_h(xb, "spatial", halo)
        xb = jnp.swapaxes(xb, 1, 2)  # [B, D, H_loc+2h, W, C]
        out = jax.lax.conv_general_dilated(
            xb, kb, window_strides=strides,
            padding=((kd // 2, kd // 2), (0, 0), (kw // 2, kw // 2)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(None, None, "spatial"), P()),
                  out_specs=P(None, None, "spatial"))
    return f(x, kernel)
