"""Forward/backward checks for the model zoo (tiny shapes, CPU).

Each model: eval forward shape + finiteness, train-mode output structure,
gradient flow through a one-step loss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-model compiles dominate CPU runtime; deselect with -m 'not slow'
pytestmark = pytest.mark.slow

from stereo_toolbox_tpu.models import (ACVNet, GwcNet_G, GwcNet_GC,
                                       RAFTStereo, create_model)
from stereo_toolbox_tpu import losses, metrics
from stereo_toolbox_tpu.trainer import TrainConfig, compute_loss


def _inputs(b=1, h=32, w=64):
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)))


def _grad_check(model, outputs_len, train_kwargs=None, h=32, w=64):
    left, right = _inputs(h=h, w=w)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    gt = jnp.full((1, h, w), 4.0)
    mask = metrics.valid_mask(gt, 16)

    def loss_fn(p):
        v = {"params": p}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"]
            out, _ = model.apply(v, left, right, train=True,
                                 mutable=["batch_stats"])
        else:
            out = model.apply(v, left, right, train=True)
        if isinstance(out, tuple):
            n = len(out[1])
        else:
            n = len(out)
        assert n == outputs_len, (n, outputs_len)
        cfg = TrainConfig(max_disp=16, loss="sequence")
        return compute_loss(out, gt, mask, cfg)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).max()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.5, f"{nonzero}/{len(leaves)} grads firing"


def test_gwcnet_g_eval():
    left, right = _inputs()
    model = GwcNet_G(max_disp=16)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False)
    assert pred.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_gwcnet_gc_train_heads():
    _grad_check(GwcNet_GC(max_disp=16), 4)


def test_acvnet_eval_and_train():
    left, right = _inputs()
    model = ACVNet(max_disp=16)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False)
    assert pred.shape == (1, 32, 64)
    _grad_check(ACVNet(max_disp=16), 4)


def test_acvnet_attn_only():
    left, right = _inputs()
    model = ACVNet(max_disp=16, attn_weights_only=True)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    out = model.apply(variables, left, right, train=True,
                      mutable=["batch_stats"])[0]
    assert len(out) == 1


def test_acvnet_freeze_attn():
    """stop_gradient: attention-branch params get zero gradients."""
    left, right = _inputs()
    model = ACVNet(max_disp=16, freeze_attn_weights=True)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    gt = jnp.full((1, 32, 64), 4.0)
    mask = metrics.valid_mask(gt, 16)

    def loss_fn(p):
        out, _ = model.apply({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             left, right, train=True,
                             mutable=["batch_stats"])
        assert len(out) == 3  # no pred_attention when frozen
        return losses.multi_head_loss(out, gt, mask, (0.5, 0.7, 1.0))

    grads = jax.grad(loss_fn)(variables["params"])
    # the attention-branch classifier must receive zero gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    attn_grads = [v for p, v in flat if "HourglassAttn_0" in str(p)]
    assert attn_grads and all(float(jnp.abs(g).max()) == 0
                              for g in attn_grads)
    # the main branch must receive nonzero gradient
    main_grads = [v for p, v in flat if "HourglassAttn_1" in str(p)]
    assert main_grads and any(float(jnp.abs(g).max()) > 0
                              for g in main_grads)


def test_raft_stereo_eval():
    left, right = _inputs()
    model = RAFTStereo(valid_iters=3)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False)
    assert pred.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_raft_stereo_train_iters():
    model = RAFTStereo(train_iters=4)
    _grad_check(model, 4)


def test_registry_names():
    for name in ("GwcNet_G", "GwcNet_GC", "ACVNet", "RAFTStereo"):
        m = create_model(name)
        assert m is not None
