"""Micro-bench of ACVNet optimization candidates (round-5).

Profile (tools/profile_acvnet.py @1088x1920) attributed the 0.91x deficit
to: BlockAttention3D 11.6 ms x3, classif 32->1 convs 25 ms x2 (0.42 TF/s!),
patch depthwise stack 23 ms. This script measures drop-in lowerings:
  * block attention: current einsum vs jax.nn.dot_product_attention
  * classif conv 32->1: native vs via2d vs pallas conv3d
Usage: python tools/opt_acvnet.py [HxW]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16


class BlockAttnDPA(nn.Module):
    """BlockAttention3D with jax.nn.dot_product_attention core; identical
    params (qkv Dense + proj Conv)."""
    num_heads: int = 16
    block: tuple = (4, 4, 4)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        B, D0, H0, W0, C = x.shape
        bd, bh, bw = self.block
        pd, ph, pw = (-D0) % bd, (-H0) % bh, (-W0) % bw
        x = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
        _, D, H, W, _ = x.shape
        d, h, w = D // bd, H // bh, W // bw
        hd = C // self.num_heads

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, d, bd, h, bh, w, bw, 3, self.num_heads, hd)
        # → [3, B*d*h*w, bd*bh*bw, heads, hd] (BTNH for dot_product_attention)
        qkv = qkv.transpose(7, 0, 1, 3, 5, 2, 4, 6, 8, 9).reshape(
            3, B * d * h * w, bd * bh * bw, self.num_heads, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        mask = None
        if pd or ph or pw:
            valid = jnp.zeros((D, H, W), bool).at[:D0, :H0, :W0].set(True)
            valid = valid.reshape(d, bd, h, bh, w, bw).transpose(
                0, 2, 4, 1, 3, 5).reshape(d * h * w, bd * bh * bw)
            valid = jnp.broadcast_to(valid[None],
                                     (B, d * h * w, bd * bh * bw)).reshape(
                B * d * h * w, 1, 1, bd * bh * bw)
            mask = valid
        out = jax.nn.dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(B, d, h, w, bd, bh, bw, self.num_heads * hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, C)
        out = out[:, :D0, :H0, :W0]
        return nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="proj")(out)


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1088x1920"
    H, W = (int(v) for v in res.split("x"))
    h4, w4 = H // 4, W // 4
    D = 48
    key = jax.random.PRNGKey(0)

    def t(name, fn, *args):
        fn = jax.jit(fn)
        dt = bench_fn(fn, args)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
        return dt

    from stereo_toolbox_tpu.models.acvnet import BlockAttention3D

    c4 = jax.random.normal(key, (1, D // 4, h4 // 4, w4 // 4, 128), DTYPE)
    old = BlockAttention3D(num_heads=16, dtype=DTYPE)
    ov = jax.jit(old.init)(key, c4)
    t("blockattn old (einsum f32)", lambda v, x: old.apply(v, x), ov, c4)
    new = BlockAttnDPA(num_heads=16, dtype=DTYPE)
    # param trees are identical by construction
    t("blockattn dot_product_attention",
      lambda v, x: new.apply(v, x), ov, c4)
    # parity check at small size on this backend is unreliable (readback);
    # CPU test covers it — here only timing.

    vol32 = jax.random.normal(key, (1, D, h4, w4, 32), DTYPE)
    kern = jax.random.normal(key, (3, 3, 3, 32, 1), DTYPE) * 0.1

    def conv_native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    t("classif32->1 native", conv_native, vol32, kern)

    from stereo_toolbox_tpu.ops.conv3d import conv3d_via_2d
    t("classif32->1 via2d",
      lambda x, k: conv3d_via_2d(x, k, (1, 1, 1), (1, 1, 1)), vol32, kern)

    from stereo_toolbox_tpu.ops.pallas.conv3d import conv3d_pallas
    t("classif32->1 pallas", lambda x, k: conv3d_pallas(x, k), vol32, kern)

    # wider-first alternative: 32->16 then 16->1 is not math-equal; skip.
    # im2col-on-D alternative: fold kd into C (3x memory) then 2D conv.
    def conv_kdfold(x, k):
        b, d, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        stack = jnp.concatenate([xp[:, i:i + d] for i in range(3)], -1)
        k2 = k.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * c, 1)
        return jax.lax.conv_general_dilated(
            stack.reshape(b * d, h, w, 3 * c), k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(
            b, d, h, w, 1)
    t("classif32->1 kd-fold conv2d", conv_kdfold, vol32, kern)




def attn_parts(res="1088x1920"):
    """Attribute BlockAttention3D's time: qkv dense, transposes, einsums."""
    H, W = (int(v) for v in res.split("x"))
    D, C, heads = 48, 128, 16
    d4, h4, w4 = D // 4, H // 16, W // 16  # c4 scale
    h4, w4 = -(-h4 // 4) * 4, -(-w4 // 4) * 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, d4, h4, w4, C), DTYPE)
    wq = jax.random.normal(key, (C, 3 * C), DTYPE) * 0.05
    d, h, w = d4 // 4, h4 // 4, w4 // 4
    hd = C // heads

    def t(name, fn, *args):
        fn = jax.jit(fn)
        from stereo_toolbox_tpu.utils.timing import bench_fn
        dt = bench_fn(fn, args)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)

    t("qkv dense alone", lambda x, w: x @ w, x, wq)

    def transpose_old(qkv):
        B = 1
        qkv = qkv.reshape(B, d, 4, h, 4, w, 4, 3, heads, hd)
        return qkv.transpose(7, 0, 1, 3, 5, 8, 2, 4, 6, 9).reshape(
            3, B, d * h * w, heads, 4 * 4 * 4, hd)
    qkv = jax.random.normal(key, (1, d4, h4, w4, 3 * C), DTYPE)
    t("old transpose chain", transpose_old, qkv)

    qt = jax.random.normal(key, (1, d * h * w, heads, 64, hd), DTYPE)

    def attn_core(q):
        k = v = q
        a = jnp.einsum("bnhqc,bnhkc->bnhqk", q, k,
                       preferred_element_type=jnp.float32) * 0.35
        a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
        return jnp.einsum("bnhqk,bnhkc->bnhqc", a, v)
    t("attn einsums + f32 softmax", attn_core, qt)

    def preblocked(x, wq):
        B = 1
        xb = x.reshape(B, d, 4, h, 4, w, 4, C).transpose(
            0, 1, 3, 5, 2, 4, 6, 7).reshape(B, d, h, w, 64, C)
        qkv = (xb @ wq).reshape(B, d, h, w, 64, 3, heads, hd)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        a = jnp.einsum("bdhwqnc,bdhwknc->bdhwnqk", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        a = jax.nn.softmax(a, axis=-1).astype(x.dtype)
        o = jnp.einsum("bdhwnqk,bdhwknc->bdhwqnc", a, v)
        o = o.reshape(B, d, h, w, 4, 4, 4, C).transpose(
            0, 1, 4, 2, 5, 3, 6, 7).reshape(B, d4, h4, w4, C)
        return o
    t("pre-blocked full attention", preblocked, x, wq)




def patch_folded(res="1088x1920"):
    """Patch depthwise stack: current (D folded into conv batch, C=40
    lanes padded 3.2x) vs D-folded-into-CHANNELS (D*C = 1920 = 15 full
    128-lane registers, zero padding waste)."""
    H, W = (int(v) for v in res.split("x"))
    h4, w4 = H // 4, W // 4
    D, C = 48, 40
    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (1, D, h4, w4, C), DTYPE)
    k0 = jax.random.normal(key, (3, 3, C), DTYPE) * 0.1
    k1 = jax.random.normal(key, (3, 3, 8), DTYPE) * 0.1
    k2 = jax.random.normal(key, (3, 3, 16), DTYPE) * 0.1
    k3 = jax.random.normal(key, (3, 3, 16), DTYPE) * 0.1

    def t(name, fn, *args):
        dt = bench_fn(jax.jit(fn), args)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)

    def dw_batch(x, kern, dil):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x.reshape((-1,) + x.shape[2:]), kern[:, :, None, :],
            (1, 1), ((dil, dil), (dil, dil)), rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c).reshape(x.shape)

    def current(vol):
        y = dw_batch(vol, k0, 1)
        p1 = dw_batch(y[..., :8], k1, 1)
        p2 = dw_batch(y[..., 8:24], k2, 2)
        p3 = dw_batch(y[..., 24:40], k3, 3)
        return jnp.concatenate([p1, p2, p3], -1)
    t("patch stack current (D->batch)", current, vol)

    def dw_chan(x, kern, dil):
        # x: [B, H, W, D*c]; kern [3, 3, c] tiled across D
        dc = x.shape[-1]
        kt = jnp.tile(kern, (1, 1, dc // kern.shape[-1]))
        return jax.lax.conv_general_dilated(
            x, kt[:, :, None, :], (1, 1), ((dil, dil), (dil, dil)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=dc)

    def folded(vol):
        B, D_, H_, W_, C_ = vol.shape
        x = vol.transpose(0, 2, 3, 1, 4).reshape(B, H_, W_, D_ * C_)
        y = dw_chan(x, k0, 1)
        y5 = y.reshape(B, H_, W_, D_, C_)
        p1 = dw_chan(y5[..., :8].reshape(B, H_, W_, D_ * 8), k1, 1)
        p2 = dw_chan(y5[..., 8:24].reshape(B, H_, W_, D_ * 16), k2, 2)
        p3 = dw_chan(y5[..., 24:40].reshape(B, H_, W_, D_ * 16), k3, 3)
        out = jnp.concatenate([p1.reshape(B, H_, W_, D_, 8),
                               p2.reshape(B, H_, W_, D_, 16),
                               p3.reshape(B, H_, W_, D_, 16)], -1)
        return out.transpose(0, 3, 1, 2, 4)
    t("patch stack folded (D->channels)", folded, vol)
    a = jax.jit(current)(vol)
    b = jax.jit(folded)(vol)
    import numpy as np
    from stereo_toolbox_tpu.utils.timing import make_sync
    s = make_sync((a, b))
    print("sum check", s((a, b)))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "attn":
        attn_parts(sys.argv[1])
    elif len(sys.argv) > 2 and sys.argv[2] == "patch":
        patch_folded(sys.argv[1])
    else:
        main()
