import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

print('devices:', jax.devices(), flush=True)

from stereo_toolbox_tpu.datasets.base import SyntheticStereoDataset
from stereo_toolbox_tpu.models import create_model
from stereo_toolbox_tpu import metrics

ds = SyntheticStereoDataset(num_samples=2, height=192, width=288, max_disp=48,
                            training=False)
s = ds[0]
print('sample keys:', sorted(s.keys()), flush=True)
print('left', s['left'].shape, s['left'].dtype, 'gt range',
      np.nanmin(s['gt_disp']), np.nanmax(s['gt_disp']), flush=True)

model = create_model('PSMNet', max_disp=48)
left = jnp.asarray(s['left'][None]); right = jnp.asarray(s['right'][None])
t0 = time.time()
variables = jax.jit(model.init, static_argnames='train')(
    jax.random.PRNGKey(0), left, right, train=False)
jax.block_until_ready(variables)
print('init done in %.1fs, params=%d' % (time.time()-t0,
      sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables['params']))), flush=True)

fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
t0 = time.time(); pred = fwd(variables, left, right); pred.block_until_ready()
print('first fwd (compile) %.1fs' % (time.time()-t0), flush=True)
t0 = time.time(); pred = fwd(variables, left, right); pred.block_until_ready()
print('second fwd %.3fs, pred shape %s, range [%.2f, %.2f]' % (
    time.time()-t0, pred.shape, float(pred.min()), float(pred.max())), flush=True)

gt = jnp.asarray(s['gt_disp'][None])
mask = metrics.valid_mask(gt, 48)
res = metrics.epe_and_outliers(pred, gt, mask)
print('untrained EPE %.2f px (random net; sanity only), valid px %d' % (
    float(res['epe'][0]), int(res['valid'][0])), flush=True)

# probe: bad model name
try:
    create_model('NoSuchModel')
except KeyError as e:
    print('probe bad-name ->', e, flush=True)
# probe: odd input size (not divisible by 4)
try:
    bad = jnp.zeros((1, 50, 62, 3))
    jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))(variables, bad, bad)
    print('probe odd-size -> ran (shape tolerant)', flush=True)
except Exception as e:
    print('probe odd-size ->', type(e).__name__, str(e)[:200], flush=True)
