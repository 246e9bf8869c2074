"""Foundation-tier model checks (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest
# full-model compiles dominate CPU runtime; deselect with -m 'not slow'
pytestmark = pytest.mark.slow


def _inputs(b=1, h=56, w=56):
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)))


def test_depth_anything_v2():
    from stereo_toolbox_tpu.models import DepthAnythingV2
    m = DepthAnythingV2(encoder="vits")
    x = jnp.zeros((1, 70, 84, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    d = m.apply(v, x)
    assert d.shape == (1, 70, 84)
    assert float(d.min()) >= 0.0  # relu'd inverse depth


def test_defom_stereo():
    from stereo_toolbox_tpu.models import DEFOMStereo_S
    left, right = _inputs(h=32, w=64)
    model = DEFOMStereo_S(train_iters=3, valid_iters=3, scale_iters=1)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred)).all()
    out, _ = model.apply(variables, left, right, train=True,
                         mutable=["batch_stats"])
    assert len(out) == 3


def test_monster():
    from stereo_toolbox_tpu.models import MODEL_REGISTRY
    Monster = MODEL_REGISTRY["MonSter"]
    left, right = _inputs(h=64, w=64)
    model = Monster(max_disp=32, train_iters=3, valid_iters=3, mix_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()
    (init_disp, preds, depth_mono), _ = model.apply(
        variables, left, right, train=True, mutable=["batch_stats"])
    assert init_disp.shape == (1, 64, 64)
    assert depth_mono.shape == (1, 64, 64)
    assert len(preds) == 1 + 2 * 2  # (iters-mix) + 2*mix


def test_foundation_stereo():
    from stereo_toolbox_tpu.models import FoundationStereo_S
    left, right = _inputs(h=64, w=64)
    model = FoundationStereo_S(max_disp=64, train_iters=2, valid_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()
    (init_disp, preds), _ = model.apply(variables, left, right, train=True,
                                        mutable=["batch_stats"])
    assert len(preds) == 2


def test_foundation_stereo_hierarchical():
    from stereo_toolbox_tpu.models import FoundationStereo_S
    from stereo_toolbox_tpu.models.foundation_stereo import run_hierarchical
    left, right = _inputs(h=64, w=128)
    model = FoundationStereo_S(max_disp=64, valid_iters=2, train_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    disp = run_hierarchical(model, variables, left, right, iters=2)
    assert disp.shape == (1, 64, 128)


def test_stereoanywhere():
    from stereo_toolbox_tpu.models import StereoAnywhere
    left, right = _inputs(h=32, w=64)
    model = StereoAnywhere(encoder="vits", train_iters=2,
                           valid_iters=2, corr_levels=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_stereoanywhere_vol_downsample():
    """The reference's high-res memory valve (stereoanywhere.py:173-205):
    volumes aggregated at 1/2 scale, upsampled back — output shape and
    finiteness preserved."""
    from stereo_toolbox_tpu.models import StereoAnywhere
    left, right = _inputs(h=32, w=64)
    model = StereoAnywhere(encoder="vits", train_iters=2, valid_iters=2,
                           corr_levels=2, vol_downsample=1)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred)).all()
