"""Convolutional GRU cells for iterative refinement models.

Parity targets: models/RAFTStereo/update.py:16-63 (`ConvGRU`, `SepConvGRU`).
Channels-last; all cells are plain linen modules so the recurrent loop can be
a `lax.scan` with the cell applied inside.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Conv2dParams(nn.Module):
    """Registers ``nn.Conv``-compatible params (``kernel`` [+ ``bias``])
    without computing, so callers can fuse several same-input, same-kernel
    convs into ONE ``conv_general_dilated`` with concatenated output
    channels. A GRU's z and r gates read the same ``[h, x]`` — two narrow
    Cout=hidden convs waste MXU columns; the fused conv computes the exact
    same per-channel dot products at twice the output width. Param paths
    stay identical to the unfused ``nn.Conv`` modules, so checkpoints and
    torch imports are unaffected."""
    features: int
    kernel_size: Sequence[int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = tuple(self.kernel_size)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            k + (in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def fused_gate_conv(x: jax.Array, mods: Sequence[Conv2dParams],
                    dtype=None) -> list[jax.Array]:
    """One SAME conv over ``x`` evaluating every gate in ``mods``; returns
    the per-gate outputs (same values as applying each conv separately)."""
    kparts, bparts = zip(*(m(x.shape[-1]) for m in mods))
    kernel = jnp.concatenate(kparts, axis=-1)
    bias = (jnp.concatenate(bparts) if bparts[0] is not None else None)
    x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    outs, off = [], 0
    for m in mods:
        outs.append(y[..., off:off + m.features])
        off += m.features
    return outs


class ConvGRU(nn.Module):
    """GRU cell with 2D conv gates and optional external context biases.

    Parity: models/RAFTStereo/update.py:16-32 — the context network
    contributes per-gate biases (cz, cr, cq) computed once outside the loop.
    """
    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array,
                 context: tuple[jax.Array, jax.Array, jax.Array] | None = None
                 ) -> jax.Array:
        k = (self.kernel_size, self.kernel_size)
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = fused_gate_conv(
            hx, [Conv2dParams(self.hidden_dim, k, name="convz"),
                 Conv2dParams(self.hidden_dim, k, name="convr")],
            dtype=self.dtype)
        if context is not None:
            cz, cr, cq = context
            z = z + cz
            r = r + cr
        z = jax.nn.sigmoid(z)
        r = jax.nn.sigmoid(r)
        q = nn.Conv(self.hidden_dim, k, padding="SAME", dtype=self.dtype,
                    name="convq")(jnp.concatenate([r * h, x], axis=-1))
        if context is not None:
            q = q + context[2]
        q = jnp.tanh(q)
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """Two-pass GRU with separable (1×5 then 5×1) gates.

    Parity: models/RAFTStereo/update.py:34-63.
    """
    hidden_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        for name, k in (("h", (1, 5)), ("v", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z, r = fused_gate_conv(
                hx, [Conv2dParams(self.hidden_dim, k, name=f"convz_{name}"),
                     Conv2dParams(self.hidden_dim, k, name=f"convr_{name}")],
                dtype=self.dtype)
            z = jax.nn.sigmoid(z)
            r = jax.nn.sigmoid(r)
            q = jnp.tanh(nn.Conv(self.hidden_dim, k, padding="SAME",
                                 dtype=self.dtype, name=f"convq_{name}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


def pool2x(x: jax.Array) -> jax.Array:
    """3×3 stride-2 average pool with padding 1 (update.py:89-90)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 2, 2, 1), "VALID")
    return out / 9.0


def pool4x(x: jax.Array) -> jax.Array:
    """5×5 stride-4 average pool with padding 1 (update.py:92-93)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 5, 5, 1),
                                (1, 4, 4, 1), "VALID")
    return out / 25.0
