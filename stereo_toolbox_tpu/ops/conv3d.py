"""Fast 3D convolution for cost volumes: decomposition into 2D convs.

Profiling on TPU v5e shows XLA's native NDHWC `conv_general_dilated` reaches
only ~9% of the MXU roofline for the cost-volume aggregation shapes
(C=32..64, D=48, 3×3×3). Folding the disparity axis into the batch axis and
expressing the kernel as kd 2D convolutions summed with D-shifts maps onto
XLA's mature 2D conv path:

    out[:, do] = Σ_kd  conv2d(x[:, do*sd + kd - pd], W[kd])

Used by `nn.layers.ConvBNAct` for all 3D convs (flag `conv3d_via_2d`).
Parity with `lax.conv_general_dilated` is covered in tests/test_conv3d.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv3d_concat_volume(left: jax.Array, right: jax.Array,
                         kernel: jax.Array, max_disp: int) -> jax.Array:
    """``conv3d(build_concat_volume(left, right, D), kernel, SAME, stride 1)``
    without ever materializing the input volume — exact to within fp
    reassociation (tests/test_conv3d.py::test_conv3d_concat_volume_*).

    The concat volume is structured (SURVEY §7 "hard parts"): its left half
    is d-invariant (``L[h,w]·[w ≥ d]``) and its right half is a pure
    diagonal shift (``R[h, w-d]``), so a 3×3×3 conv over it collapses to
    2D convs plus diagonal bookkeeping:

      * left half  → three 2D convs (one per kd tap) summed per-plane, with
        the d-edge planes using partial sums and the ``w ≈ d`` mask boundary
        patched by four diagonal band corrections;
      * right half → three 3×5 2D convs on zero-extended R (kw−kd becomes a
        plain w offset), read back along diagonals ``w−d``, with a one-column
        correction at ``w = W−1`` where the volume's zero padding differs
        from R's zero extension.

    This turns the most expensive conv of PSMNet-style aggregation
    (models/PSMNet/stackhourglass.py:122, D·H·W·2C·C·27 MACs ≈ 100 GFLOP at
    480×640) into ~3 GFLOP of 2D convs + O(D·H·W·Co) assembly bandwidth.

    Args:
      left, right: ``[B, H, W, C]`` feature maps.
      kernel: ``[3, 3, 3, 2C, Co]`` (left channels first, as the volume).
      max_disp: D.

    Returns:
      ``[B, D, H, W, Co]``.
    """
    b, h, w, c = left.shape
    kd_, kh_, kw_, ci, co = kernel.shape
    assert (kd_, kh_, kw_) == (3, 3, 3) and ci == 2 * c, (kernel.shape, c)
    D = max_disp
    kl = kernel[:, :, :, :c]   # [3, 3, 3, C, Co]
    kr = kernel[:, :, :, c:]

    def conv2d(x2, k2, pad):
        return lax.conv_general_dilated(
            x2, k2, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---- left half: per-kd 2D convs -----------------------------------
    p_kd = [conv2d(left, kl[i], ((1, 1), (1, 1))) for i in range(3)]
    s_full = p_kd[0] + p_kd[1] + p_kd[2]
    s_d0 = p_kd[1] + p_kd[2]          # plane d=0: kd=0 reads the d=-1 pad
    s_dD = p_kd[0] + p_kd[1]          # plane d=D-1: kd=2 reads the d=D pad

    # band corrections at w = d+b, b ∈ {-2,-1,0,1}: the mask [w' ≥ d']
    # zeroes taps with kd-kw > b. KLb = Σ_{kd ≤ b+kw, kd ∈ set} KL[kd].
    lz = jnp.pad(left, ((0, 0), (0, 0), (3, 3), (0, 0)))
    kd_sets = {"full": (0, 1, 2), "d0": (1, 2), "dD": (0, 1)}
    bands = {}  # (set, b) → [B, D, H, Co]
    didx = jnp.arange(D)
    for name, kds in kd_sets.items():
        for bb in (-2, -1, 0, 1):
            acc = None
            for kw in range(3):
                klb = sum((kl[kd, :, kw] for kd in kds if kd - kw <= bb),
                          jnp.zeros_like(kl[0, :, 0]))   # [3, C, Co]
                # gather L columns along the diagonal w = d+b+kw-1
                cols = jnp.take(lz, jnp.clip(didx + bb + kw - 1 + 3, 0,
                                             lz.shape[2] - 1), axis=2)
                # [B, H, D, C] → conv over h with the 3-tap column kernel
                v = conv2d(cols, klb[:, None], ((1, 1), (0, 0)))
                acc = v if acc is None else acc + v
            bands[(name, bb)] = jnp.swapaxes(acc, 1, 2)  # [B, D, H, Co]

    # ---- right half: 3×5 convs on zero-extended R ---------------------
    # G_kd[u] = Σ_{kh,δ} Rz[h+kh-1, u+δ] @ KR[kd, kh, δ+kd-... ] with
    # δ = kw - kd ∈ [-2, 2]; evaluate u ∈ [-2, W-1] (width W+2).
    r2 = jnp.pad(right, ((0, 0), (0, 0), (4, 2), (0, 0)))
    g_kd = []
    for kd in range(3):
        k5 = jnp.zeros((3, 5, c, co), kernel.dtype)
        for kw in range(3):
            k5 = k5.at[:, kw - kd + 2].set(kr[kd, :, kw])
        g_kd.append(conv2d(r2, k5, ((1, 1), (0, 0))))    # [B, H, W+2, Co]
    g_full = g_kd[0] + g_kd[1] + g_kd[2]
    g_d0 = g_kd[1] + g_kd[2]
    g_dD = g_kd[0] + g_kd[1]

    # w = W-1 column correction: G's zero-extended R differs from the
    # volume's zero padding for taps at w' = W (kw = 2, d' ≥ 1).
    c_kd = [conv2d(right, kr[kd, :, 2][:, None], ((1, 1), (0, 0)))
            for kd in range(3)]                          # [B, H, W, Co]
    corr = {}
    for name, kds in kd_sets.items():
        acc = jnp.zeros((b, D, h, co), left.dtype)
        for kd in kds:
            u = w - didx - kd + 1                        # = W - d'
            valid = (u >= 0) & (u < w) & (didx + kd - 1 >= 1)
            vals = jnp.take(c_kd[kd], jnp.clip(u, 0, w - 1), axis=2)
            acc = acc + jnp.swapaxes(vals, 1, 2) * \
                valid[None, :, None, None]
            # vals: [B, H, D, Co] → [B, D, H, Co]
        corr[name] = acc

    # ---- assemble planes (static D loop, like shifted_right_stack) ----
    w_iota = jnp.arange(w)
    planes = []
    for d in range(D):
        name = "d0" if d == 0 else ("dD" if d == D - 1 else "full")
        s = {"full": s_full, "d0": s_d0, "dD": s_dD}[name]
        g = {"full": g_full, "d0": g_d0, "dD": g_dD}[name]

        row = s * (w_iota >= d + 2)[None, None, :, None].astype(s.dtype)
        # right half: row_r[w] = G[:, :, w-d+2] (empty when d ≥ W+2 — the
        # whole plane is then left of the image and reads only zeros)
        i0 = 2 - d
        lo = min(max(i0, 0), w + 2)
        hi = min(max(i0 + w, lo), w + 2)
        src = g[:, :, lo:hi]
        lpad = lo - i0
        if src.shape[2] > 0 and lpad < w:
            row = row + jnp.pad(src, ((0, 0), (0, 0),
                                      (lpad, w - src.shape[2] - lpad),
                                      (0, 0)))
        # left mask bands at w = d+b
        for bb in (-2, -1, 0, 1):
            wpos = d + bb
            if 0 <= wpos < w:
                band = bands[(name, bb)][:, d][:, :, None]  # [B, H, 1, Co]
                row = row + jnp.pad(band, ((0, 0), (0, 0),
                                           (wpos, w - wpos - 1), (0, 0)))
        # w = W-1 right-edge correction
        row = row - jnp.pad(corr[name][:, d][:, :, None],
                            ((0, 0), (0, 0), (w - 1, 0), (0, 0)))
        planes.append(row)
    return jnp.stack(planes, axis=1)


def conv3d_via_2d(x: jax.Array, kernel: jax.Array,
                  strides=(1, 1, 1), padding=None) -> jax.Array:
    """3D conv over ``[B, D, H, W, C]`` with kernel ``[kd, kh, kw, Ci, Co]``.

    `padding`: per-dim symmetric pixels (defaults to (k-1)//2, i.e. SAME for
    odd kernels).
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    sd, sh, sw = strides
    if padding is None:
        padding = ((kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2)
    pd, ph, pw = padding

    d_out = (d + 2 * pd - kd) // sd + 1
    x2 = x.reshape(b * d, h, w, ci)

    # One 2D conv computing all kd taps at once: output width kd*Co keeps the
    # MXU columns busy (Co alone is typically 32 — a 25% ceiling on the
    # 128-wide systolic array).
    k2 = jnp.moveaxis(kernel, 0, 3).reshape(kh, kw, ci, kd * co)
    y = lax.conv_general_dilated(
        x2, k2, (sh, sw), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(b, d, ho, wo, kd, co)

    out = None
    for k in range(kd):
        # out[:, do] += y[:, do*sd + k - pd, ..., k] (zero outside [0, d))
        start = k - pd
        pad_lo = max(-start, 0)
        pad_hi = max((d_out - 1) * sd + start + 1 - d, 0)
        yk = y[:, :, :, :, k]
        yp = jnp.pad(yk, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
        sl = lax.slice_in_dim(yp, start + pad_lo,
                              start + pad_lo + (d_out - 1) * sd + 1,
                              stride=sd, axis=1)
        out = sl if out is None else out + sl
    return out




def conv_transpose_2x_subpixel(x: jax.Array, kernel: jax.Array,
                               bias: jax.Array | None = None) -> jax.Array:
    """``nn.ConvTranspose(Co, (4,)*n, strides=(2,)*n, padding='SAME')``
    as ONE stride-1 2ⁿ-tap conv with ``2ⁿ·Co`` output channels + a subpixel
    interleave — the phase decomposition of a 2× transposed conv.

    With flax's SAME convention (lo pad 2 after lhs-dilation, no kernel
    flip — verified numerically), output phase p ∈ {0,1} per dim obeys

        out[2j+p] = K[p]·x[j-1+p] + K[p+2]·x[j+p]

    so on x padded by (1,1) ALL phases are evaluated by one stride-1 conv
    with the 2ⁿ strided kernel slices ``K[p::2, …]`` stacked along output
    channels, followed by per-phase spatial shifts + interleave. Exact to
    within float reassociation (tests/test_conv3d.py).

    Measured on TPU v5e (bf16, FoundationStereo conv1_up 56→28 at
    52×92×160): 21.2 ms vs 15.6 ms for the native lhs-dilated path — the
    phase-interleave transpose costs more than the denser conv saves, so
    model code keeps ``nn.ConvTranspose``; the op is retained as the
    tested building block should the trade-off flip (e.g. larger Co or
    hardware with cheaper minor-dim shuffles).

    Args:
      x: ``[B, *spatial, Ci]`` (n = 2 or 3 spatial dims).
      kernel: ``[4]*n + [Ci, Co]`` (flax ConvTranspose layout).
      bias: optional ``[Co]``.

    Returns:
      ``[B, *(2·spatial), Co]``.
    """
    n = kernel.ndim - 2
    assert kernel.shape[:n] == (4,) * n, kernel.shape
    ci, co = kernel.shape[-2:]
    b = x.shape[0]
    spatial = x.shape[1:-1]
    phases = [()]
    for _ in range(n):
        phases = [q + (p,) for q in phases for p in (0, 1)]
    slices = [kernel[tuple(slice(p, 4, 2) for p in ph)] for ph in phases]
    k2 = jnp.concatenate(slices, axis=-1)   # [2]*n + [Ci, 2^n·Co]
    dn = {2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[n]
    y = lax.conv_general_dilated(x, k2, (1,) * n, ((1, 1),) * n,
                                 dimension_numbers=dn)
    # y: [B, *(spatial+1), 2^n·Co]; phase ph's output j lives at y[j + ph]
    parts = []
    for i, ph in enumerate(phases):
        idx = (slice(None),) + tuple(
            slice(p, p + s) for p, s in zip(ph, spatial))
        parts.append(y[idx + (slice(i * co, (i + 1) * co),)])
    y = jnp.stack(parts, axis=-2)           # [B, *spatial, 2^n, Co]
    y = y.reshape((b,) + spatial + (2,) * n + (co,))
    perm = [0]
    for i in range(n):
        perm.extend([1 + i, 1 + n + i])
    perm.append(1 + 2 * n)
    y = y.transpose(perm)
    y = y.reshape((b,) + tuple(2 * s for s in spatial) + (co,))
    if bias is not None:
        y = y + bias
    return y
