"""Hand-written Pallas TPU kernels for the hot ops.

Fast paths for the primitives identified in SURVEY §7 step 4 (and the TPU
equivalents of the reference's absent CUDA extensions, SURVEY §2.6):
  * cost-volume builders (HBM-bound: fuse shift + product + group-reduce so
    the feature maps are read once instead of D times)
  * windowed correlation lookup (the `corr_sampler` CUDA ext's job)

Every kernel has an XLA fallback; `use_pallas(x)` gates on the platform.
"""

from stereo_toolbox_tpu.ops.pallas.volume import (
    build_gwc_volume_pallas,
    build_concat_volume_pallas,
)

__all__ = ["build_gwc_volume_pallas", "build_concat_volume_pallas"]
