"""All-pairs correlation, correlation pyramids, and windowed lookup.

This is the shared implementation of the primitives the reference vendors in
`models/RAFTStereo/corr.py:110-188` and `models/IGEVStereo/geometry.py:7-69`,
including the functionality of the *absent* `corr_sampler` CUDA extension
(models/RAFTStereo/corr.py:17-29). On TPU the windowed lookup runs gather-free
as a hat-kernel contraction (see `ops.sampling.sample_1d` method='dense') —
measured ~200× faster than the minor-axis gather XLA otherwise emits, and the
reason the iterative models beat the reference GPU latency.

Layouts:
  * features      ``[B, H, W, C]``
  * all-pairs corr ``[B, H, W1, W2]`` (W2 = right-image x-axis)
  * pyramids      lists of ``[B, H, W1, W2 / 2^i]`` (avg-pooled last axis)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.ops.sampling import sample_1d


def all_pairs_correlation(fmap1: jax.Array, fmap2: jax.Array,
                          normalize: bool = True) -> jax.Array:
    """Per-row all-pairs correlation, optionally scaled by 1/sqrt(C).

    Parity: models/RAFTStereo/corr.py:148-156 (`CorrBlock1D.corr`):
    ``einsum('aijk,aijh->ajkh') / sqrt(D)`` in NCHW == this in NHWC.
    IGEV's variant (models/IGEVStereo/geometry.py:63-70) does NOT normalize
    — pass ``normalize=False`` there.

    Args:
      fmap1: ``[B, H, W1, C]`` left features.
      fmap2: ``[B, H, W2, C]`` right features.

    Returns:
      ``[B, H, W1, W2]``.
    """
    c = fmap1.shape[-1]
    corr = jnp.einsum("bhic,bhjc->bhij", fmap1, fmap2,
                      preferred_element_type=jnp.float32)
    if normalize:
        corr = corr / jnp.sqrt(jnp.asarray(c, corr.dtype))
    return corr


def avg_pool_last(x: jax.Array, window: int = 2) -> jax.Array:
    """Average-pool the last axis by `window` (stride = window, floor)."""
    n = x.shape[-1]
    n_out = n // window
    x = x[..., : n_out * window]
    return x.reshape(x.shape[:-1] + (n_out, window)).mean(axis=-1)


def build_corr_pyramid(corr: jax.Array,
                       num_levels: int) -> list[jax.Array]:
    """List of `num_levels` volumes, each half the last-axis resolution.

    Parity: models/RAFTStereo/corr.py:117-125 (only the first `num_levels`
    entries are ever read by the lookup).
    """
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool_last(corr)
        pyramid.append(corr)
    return pyramid


def corr_lookup_1d(pyramid: Sequence[jax.Array], x: jax.Array,
                   radius: int = 4) -> jax.Array:
    """Sample a ±radius window around position `x` at every pyramid level.

    Parity: models/RAFTStereo/corr.py:127-146 (`CorrBlock1D.__call__`): level i
    is sampled at ``x / 2^i + dx`` for dx in [-r, r], linear interpolation,
    zeros out of range.

    Args:
      pyramid: list of ``[B, H, W1, W2/2^i]``.
      x: ``[B, H, W1]`` real-valued x-positions (level-0 scale).
      radius: half window size r.

    Returns:
      ``[B, H, W1, L*(2r+1)]`` lookup features (level-major, dx ascending).
    """
    dx = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    out = []
    for i, corr in enumerate(pyramid):
        pos = x[..., None] / (2.0 ** i) + dx  # [B, H, W1, 2r+1]
        out.append(sample_1d(corr, pos))
    return jnp.concatenate(out, axis=-1)


def corr_lookup_1d_alt(fmap1: jax.Array, fmap2: jax.Array, x: jax.Array,
                       radius: int = 4, num_levels: int = 4,
                       h_chunk: int = 16,
                       normalize: bool = True) -> jax.Array:
    """Memory-light windowed correlation lookup, computed on the fly.

    The `alt_cuda_corr` role (reference models/RAFTStereo/corr.py:159-188
    `AlternateCorrBlock`, raft_stereo.py:135-144 impl switch): identical
    output to ``corr_lookup_1d(build_corr_pyramid(all_pairs_correlation(...`
    but the ``[B, H, W1, W2]`` volume is never materialized — correlation is
    recomputed per H-row-chunk inside a `lax.map` and immediately reduced to
    the ±radius window, so peak memory is ``O(h_chunk·W1·W2)`` instead of
    ``O(H·W1·W2)``. The recompute is pure MXU matmul work, which is the
    TPU-native trade (HBM capacity/bandwidth for FLOPs); at 1088×1920 eval
    this keeps 32-iteration RAFT inference inside single-chip HBM.

    Args:
      fmap1: ``[B, H, W1, C]`` left features.
      fmap2: ``[B, H, W2, C]`` right features.
      x: ``[B, H, W1]`` real-valued lookup positions (level-0 scale).
      radius, num_levels: window and pyramid config (reference defaults 4, 4).
      h_chunk: rows per recompute tile.

    Returns:
      ``[B, H, W1, num_levels*(2r+1)]`` — identical to `corr_lookup_1d` on
      the precomputed pyramid (parity: tests/test_ops_corr.py).
    """
    b, h, w1, c = fmap1.shape
    hc = min(h_chunk, h)
    pad = (-h) % hc
    if pad:
        fmap1 = jnp.pad(fmap1, ((0, 0), (0, pad), (0, 0), (0, 0)))
        fmap2 = jnp.pad(fmap2, ((0, 0), (0, pad), (0, 0), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    n = (h + pad) // hc

    def chunk(args):
        f1, f2, xc = args  # [B, hc, W1, C], [B, hc, W2, C], [B, hc, W1]
        corr = all_pairs_correlation(f1, f2, normalize=normalize)
        pyr = build_corr_pyramid(corr, num_levels)
        return corr_lookup_1d(pyr, xc, radius)

    def split(a):
        return jnp.moveaxis(
            a.reshape(a.shape[0], n, hc, *a.shape[2:]), 1, 0)

    out = jax.lax.map(chunk, (split(fmap1), split(fmap2), split(x)))
    out = jnp.moveaxis(out, 0, 1).reshape(b, h + pad, w1, -1)
    return out[:, :h]


def _shift_w(a: jax.Array, k: int) -> jax.Array:
    """out[..., w, :] = a[..., w + k, :] with zero fill (axis=2 of BHWC)."""
    if k == 0:
        return a
    w = a.shape[2]
    k = max(min(k, w), -w)
    if k > 0:
        return jnp.pad(a[:, :, k:], ((0, 0), (0, 0), (0, k), (0, 0)))
    return jnp.pad(a[:, :, :w + k], ((0, 0), (0, 0), (-k, 0), (0, 0)))


def band_d_max(d_max: int | None, width: int) -> int:
    """Trace-time effective reach of the banded correlation volumes.

    ``None`` derives full positive-disparity coverage from the feature-map
    width: with ``d_max = width`` the band answers every lookup the
    zero-padded all-pairs path could answer with a non-zero value for
    ``disp >= -margin``, so the 'banded' output equals 'reg' for every
    disparity a stereo model can produce (beyond ``width + margin`` both
    paths read exact zeros — the sample position falls left of the image;
    only ``disp < -margin``, a physically impossible rightward match
    beyond the rectification slack, remains clamped). An int caps the
    band at ``d_max`` (+margin slack): cheaper, but out-of-band lookups
    return zero correlation where the reference's all-pairs volume would
    not. The cap is clamped to ``width`` because coverage beyond the
    image width adds only all-zero columns.
    """
    return width if d_max is None else min(d_max, width)


def band_offsets(num_levels: int, d_max: int, radius: int = 4,
                 margin: int = 8) -> tuple[tuple[int, int], ...]:
    """Static per-level (lo, hi) integer offset bounds for the banded
    correlation volumes (see `build_corr_band_pyramid`).

    Level i must cover lookup offsets ``dx - disp/2^i + frac(w/2^i)`` for
    ``dx ∈ [-radius, radius]`` and ``disp ∈ [-margin, d_max + margin]``:
      lo_i = -ceil((d_max + margin)/2^i) - radius
      hi_i =  radius + 1 + ceil(margin/2^i)
    """
    def ceil_div(a: int, b: int) -> int:
        return -((-a) // b)

    out = []
    for i in range(num_levels):
        s = 2 ** i
        lo = -ceil_div(d_max + margin, s) - radius
        hi = radius + 1 + ceil_div(margin, s)
        out.append((lo, hi))
    return tuple(out)


def build_corr_band_pyramid(fmap1: jax.Array, fmap2: jax.Array,
                            num_levels: int, d_max: int, radius: int = 4,
                            margin: int = 8,
                            normalize: bool = True) -> tuple[jax.Array, ...]:
    """Disparity-banded relative correlation volumes — the TPU-native
    `corr_sampler` (reference models/RAFTStereo/corr.py:17-29).

    Stereo lookups only ever sample the all-pairs volume within ``±radius``
    of ``x - disp`` with ``disp ∈ [0, d_max]``, i.e. inside a ``O(d_max)``
    diagonal band of the ``[W1, W2]`` matrix. Materializing the full volume
    (250 MB at 1088×1920/4) and contracting the whole row per lookup is
    ~7× wasted HBM and VPU work; instead we build, per pyramid level i, only
    the band

      band_i[b, h, w, j] = <f1[b,h,w], f2_i[b,h, floor(w/2^i) + lo_i + j]>

    where ``f2_i`` is fmap2 iteratively 2×-avg-pooled along W (pooling the
    *features* commutes with pooling the correlation — corr is linear in
    f2, so this equals `build_corr_pyramid(all_pairs_correlation(...))[i]`
    restricted to the band, numerically equal up to float reassociation:
    pooling features before the dot product re-associates the sum the
    full-volume path performs after it). Out-of-image offsets are zero,
    exactly like the zero-padded absolute lookup.

    Equality domain: lookups at positions ``(x0 - disp)/2^i + dx`` match
    the full-volume path (up to the reassociation above; bitwise at level
    0, where no pooling is involved) whenever
    ``-margin <= disp <= d_max + margin`` (tests/test_ops_corr.py).
    `band_d_max` documents how models pick ``d_max`` and how ``None``
    recovers full all-pairs coverage.

    Returns:
      tuple of ``[B, H, W1, N_i]`` bands; `band_offsets` gives each level's
      static (lo, hi) with ``N_i = hi - lo + 1``.
    """
    offs = band_offsets(num_levels, d_max, radius, margin)
    c = fmap1.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32)) if normalize else 1.0
    bands = []
    f2 = fmap2
    for i, (lo, hi) in enumerate(offs):
        s = 2 ** i
        if i > 0:
            w2 = f2.shape[2] // 2
            f2 = f2[:, :, : w2 * 2].reshape(
                f2.shape[0], f2.shape[1], w2, 2, f2.shape[-1]).mean(axis=3)
        rep = jnp.repeat(f2, s, axis=2) if s > 1 else f2
        w1 = fmap1.shape[2]
        if rep.shape[2] < w1:  # truncated pooling → zero tail
            rep = jnp.pad(rep, ((0, 0), (0, 0),
                                (0, w1 - rep.shape[2]), (0, 0)))
        else:
            rep = rep[:, :, :w1]
        cols = [
            (fmap1 * _shift_w(rep, j * s)).sum(axis=-1,
                                               dtype=jnp.float32) * scale
            for j in range(lo, hi + 1)
        ]
        bands.append(jnp.stack(cols, axis=-1))
    return tuple(bands)


def corr_lookup_1d_banded(bands: Sequence[jax.Array], x: jax.Array,
                          offs: Sequence[tuple[int, int]],
                          radius: int = 4) -> jax.Array:
    """Windowed lookup into `build_corr_band_pyramid` bands.

    Identical output to `corr_lookup_1d` on the full pyramid for in-band
    positions (see exactness domain above). ``offs`` must be the static
    `band_offsets(...)` used at build time.

    Args:
      bands: tuple of ``[B, H, W1, N_i]``.
      x: ``[B, H, W1]`` absolute positions at level-0 scale (x0 - disp).

    Returns:
      ``[B, H, W1, L*(2r+1)]`` (level-major, dx ascending).
    """
    dx = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    w1 = x.shape[-1]
    out = []
    for i, (band, (lo, _hi)) in enumerate(zip(bands, offs)):
        s = 2 ** i
        base = (jnp.arange(w1) // s).astype(x.dtype)  # floor(w/2^i)
        pos = x[..., None] / s + dx - base[None, None, :, None] - lo
        out.append(sample_1d(band, pos))
    return jnp.concatenate(out, axis=-1)


def volume_lookup_1d(pyramid: Sequence[jax.Array], x: jax.Array,
                     radius: int = 4) -> jax.Array:
    """Windowed lookup into a multi-channel per-pixel volume pyramid.

    Used for IGEV's geometry-encoding-volume lookup
    (models/IGEVStereo/geometry.py:35-49): the volume holds C features per
    (pixel, disparity) and is sampled along the disparity axis.

    Args:
      pyramid: list of ``[B, H, W, D/2^i, C]``.
      x: ``[B, H, W]`` real-valued disparity positions (level-0 scale).

    Returns:
      ``[B, H, W, L*(2r+1)*C]`` (level-major, channel-major, dx-minor — the
      reference's flatten order, geometry.py:48-49).
    """
    dx = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    out = []
    for i, vol in enumerate(pyramid):
        pos = x[..., None] / (2.0 ** i) + dx  # [B, H, W, K]
        # Move channels before the sampled axis: [B, H, W, C, D_i]
        v = jnp.moveaxis(vol, -1, -2)
        samples = sample_1d(v, pos[..., None, :])  # [B, H, W, C, K]
        out.append(samples.reshape(samples.shape[:-2] + (-1,)))
    return jnp.concatenate(out, axis=-1)


def volume_lookup_1d_chunked(pyramid: Sequence[jax.Array], x: jax.Array,
                             radius: int = 4,
                             h_chunk: int = 16) -> jax.Array:
    """H-chunked `volume_lookup_1d` — the `low_memory` role.

    Identical output up to float reassociation (same hat-kernel
    contraction per chunk), but
    the ``[B, H, W, C, K, D]`` sampling intermediates exist only for
    ``h_chunk`` rows at a time inside a `lax.map`, mirroring the
    reference's chunked GEV lookup option
    (models/FoundationStereo/foundation_stereo.py:229-233 `low_memory`)
    and this repo's `corr_lookup_1d_alt`. Use for high-resolution
    IGEV-family inference when the dense lookup's live set pushes past
    HBM (parity: tests/test_ops_corr.py).
    """
    b, h = x.shape[0], x.shape[1]
    hc = min(h_chunk, h)
    pad = (-h) % hc
    if pad:
        def pad_h(a):
            return jnp.pad(a, ((0, 0), (0, pad))
                           + ((0, 0),) * (a.ndim - 2))
        pyramid = [pad_h(v) for v in pyramid]
        x = pad_h(x)
    n = (h + pad) // hc

    def split(a):
        return jnp.moveaxis(
            a.reshape(a.shape[0], n, hc, *a.shape[2:]), 1, 0)

    def chunk(args):
        xs, vols = args
        return volume_lookup_1d(list(vols), xs, radius)

    out = jax.lax.map(chunk, (split(x), tuple(split(v) for v in pyramid)))
    out = jnp.moveaxis(out, 0, 1).reshape(b, h + pad, *out.shape[3:])
    return out[:, :h]


def build_volume_pyramid(volume: jax.Array,
                         num_levels: int) -> list[jax.Array]:
    """Pyramid of a ``[B, H, W, D, C]`` volume, pooled along D.

    Parity: models/IGEVStereo/geometry.py:23-26.
    """
    pyramid = [volume]
    for _ in range(num_levels - 1):
        d = volume.shape[-2] // 2
        v = volume[..., : d * 2, :]
        volume = v.reshape(v.shape[:-2] + (d, 2, v.shape[-1])).mean(axis=-2)
        pyramid.append(volume)
    return pyramid
