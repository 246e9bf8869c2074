"""PSMNet forward/backward shape and finiteness checks (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest
# full-model compiles dominate CPU runtime; deselect with -m 'not slow'
pytestmark = pytest.mark.slow

from stereo_toolbox_tpu.models import PSMNet
from stereo_toolbox_tpu import losses, metrics


def _tiny_inputs(b=1, h=64, w=96):
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    return left, right


def test_psmnet_forward_shapes():
    left, right = _tiny_inputs()
    model = PSMNet(max_disp=16)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False)
    assert pred.shape == (1, 64, 96)
    assert np.isfinite(np.asarray(pred)).all()
    # soft-argmax output lives in [0, max_disp)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 16.0


def test_psmnet_train_step_grads():
    left, right = _tiny_inputs()
    model = PSMNet(max_disp=16)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    gt = jnp.full((1, 64, 96), 5.0)
    mask = metrics.valid_mask(gt, 16)

    def loss_fn(p):
        preds, updates = model.apply(
            {"params": p, "batch_stats": batch_stats}, left, right,
            train=True, mutable=["batch_stats"])
        assert len(preds) == 3
        loss = losses.multi_head_loss(preds, gt, mask, (0.5, 0.7, 1.0))
        return loss, updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least one nonzero gradient
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
    assert "batch_stats" in updates
