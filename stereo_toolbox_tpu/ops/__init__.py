"""Shared op library — the single home for stereo primitives.

The reference re-vendors these per model (SURVEY.md §1); here every model pulls
from one tested, TPU-tuned implementation. All ops are pure functions on
channels-last arrays and are safe under `jit`/`vmap`/`grad`.
"""

from stereo_toolbox_tpu.ops.volume import (
    shifted_right_stack,
    build_concat_volume,
    build_gwc_volume,
    build_gwc_volume_cosine,
    build_norm_correlation_volume,
    build_correlation_volume,
    groupwise_correlation,
    disparity_regression,
    soft_argmax,
    disparity_variance,
)
from stereo_toolbox_tpu.ops.sampling import (
    coords_grid,
    bilinear_sampler,
    warp_right_to_left,
    disp_warp,
)
from stereo_toolbox_tpu.ops.corr import (
    all_pairs_correlation,
    band_offsets,
    build_corr_band_pyramid,
    build_corr_pyramid,
    corr_lookup_1d,
    corr_lookup_1d_alt,
    corr_lookup_1d_banded,
    build_volume_pyramid,
    volume_lookup_1d,
    volume_lookup_1d_chunked,
)
from stereo_toolbox_tpu.ops.conv3d import (
    conv3d_via_2d,
    conv3d_concat_volume,
)
from stereo_toolbox_tpu.ops.dcn import (
    deform_conv2d,
    bilinear_gather_2d,
)
from stereo_toolbox_tpu.ops.upsample import (
    interpolate_bicubic,
    softargmax_trilinear,
    interpolate,
    resize_nearest,
    upsample_disp_bilinear,
    convex_upsample,
    context_upsample,
)
from stereo_toolbox_tpu.ops.volume import (
    pointwise_conv_gwc_concat,
    gather_right_by_samples,
    concat_volume_from_samples,
    gwc_volume_from_samples,
    disparity_variance_confidence,
)

__all__ = [
    "shifted_right_stack",
    "build_concat_volume",
    "pointwise_conv_gwc_concat",
    "build_gwc_volume_cosine",
    "build_gwc_volume",
    "build_norm_correlation_volume",
    "build_correlation_volume",
    "groupwise_correlation",
    "disparity_regression",
    "soft_argmax",
    "disparity_variance",
    "coords_grid",
    "bilinear_sampler",
    "warp_right_to_left",
    "disp_warp",
    "all_pairs_correlation",
    "band_offsets",
    "build_corr_band_pyramid",
    "build_corr_pyramid",
    "corr_lookup_1d",
    "corr_lookup_1d_alt",
    "corr_lookup_1d_banded",
    "build_volume_pyramid",
    "volume_lookup_1d",
    "volume_lookup_1d_chunked",
    "conv3d_via_2d",
    "conv3d_concat_volume",
    "deform_conv2d",
    "bilinear_gather_2d",
    "interpolate",
    "interpolate_bicubic",
    "softargmax_trilinear",
    "upsample_disp_bilinear",
    "convex_upsample",
    "context_upsample",
]
