"""stereo_toolbox_tpu — a TPU-native stereo-matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`stereo_toolbox` reference (deep stereo matching: dataset loaders, cost-volume
models, iterative refinement models, losses, estimators, trainer, evaluation,
visualization) built TPU-first:

- channels-last layouts everywhere (images ``[B, H, W, C]``, cost volumes
  ``[B, D, H, W, C]``) so the C axis rides the 128-wide lane dimension;
- one shared op library (`stereo_toolbox_tpu.ops`) instead of per-model
  vendored primitives;
- functional flax.linen models returning pytrees of predictions;
- `lax.scan` recurrent loops, static shapes, jit-compiled train/eval steps;
- `jax.sharding.Mesh` + sharding constraints for data/spatial parallelism
  (collectives over ICI inserted by GSPMD);
- Pallas kernels for the hot paths (cost-volume build, correlation lookup).

Conventions
-----------
* Disparity maps are ``[B, H, W]`` float32, positive-left convention.
* Dataset samples are dicts ``{left, right, gt_disp, noc_mask, raw_left,
  raw_right}`` mirroring the reference dataloader contract
  (reference: README.md:37-43, datasets/sceneflow.py:96-103); absent GT is
  NaN-filled.
* Models take ImageNet-normalized inputs and de-normalize internally
  (reference: models/RAFTStereo/raft_stereo.py:115-119).
* ``model.apply(..., training=True)`` returns a list (or structured tuple) of
  full-resolution predictions; eval mode returns the single final map
  (reference: README.md:70-72).
"""

__version__ = "0.1.0"
