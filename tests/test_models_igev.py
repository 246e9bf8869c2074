"""IGEV-Stereo forward/backward checks (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest
# full-model compiles dominate CPU runtime; deselect with -m 'not slow'
pytestmark = pytest.mark.slow

from stereo_toolbox_tpu.models.igev_stereo import IGEVStereo
from stereo_toolbox_tpu import losses, metrics


def _inputs(b=1, h=64, w=64):
    # IGEV needs H, W divisible by 32 (3-scale volume hourglass)
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)))


def test_igev_eval():
    left, right = _inputs()
    model = IGEVStereo(max_disp=32, valid_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_igev_train_structure_and_grads():
    left, right = _inputs()
    model = IGEVStereo(max_disp=32, train_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    gt = jnp.full((1, 64, 64), 4.0)
    mask = metrics.valid_mask(gt, 32)

    def loss_fn(p):
        (init_disp, preds), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"])
        assert init_disp.shape == (1, 64, 64)
        assert len(preds) == 2
        return losses.sequence_loss(preds, gt, mask, init_disp=init_disp)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).max()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.4, f"{nonzero}/{len(leaves)}"


def test_selective_raft():
    from stereo_toolbox_tpu.models import SelectiveRAFT
    left, right = _inputs(h=32, w=64)
    model = SelectiveRAFT(valid_iters=2, train_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)
    pred = model.apply(variables, left, right, train=False)
    assert pred.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred)).all()


def test_selective_igev():
    from stereo_toolbox_tpu.models import SelectiveIGEV
    left, right = _inputs()
    model = SelectiveIGEV(max_disp=32, train_iters=2, valid_iters=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    (init_disp, preds), _ = model.apply(
        variables, left, right, train=True, mutable=["batch_stats"])
    assert init_disp.shape == (1, 64, 64)
    assert len(preds) == 2
    assert np.isfinite(np.asarray(preds[-1])).all()


def test_cfnet():
    from stereo_toolbox_tpu.models import CFNet
    left, right = _inputs()
    model = CFNet(max_disp=32, sample_count_s2=6, sample_count_s3=6)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()
    out, _ = model.apply(variables, left, right, train=True,
                         mutable=["batch_stats"])
    assert len(out) == 9
    assert all(p.shape == (1, 64, 64) for p in out)


def test_pcwnet():
    from stereo_toolbox_tpu.models import PCWNet_GC
    left, right = _inputs()
    model = PCWNet_GC(max_disp=32, refine_radius=6)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(pred)).all()
    out, _ = model.apply(variables, left, right, train=True,
                         mutable=["batch_stats"])
    assert len(out) == 6


def test_sttr():
    from stereo_toolbox_tpu.models import STTR
    left, right = _inputs(h=48, w=96)
    model = STTR(num_attn_layers=2, cal_num_blocks=2)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=True)
    pred = model.apply(variables, left, right, train=False,
                       mutable=["batch_stats"])[0]
    assert pred.shape == (1, 48, 96)
    assert np.isfinite(np.asarray(pred)).all()
    out, _ = model.apply(variables, left, right, train=True,
                         mutable=["batch_stats"])
    assert set(out) == {"disp_pred", "occ_pred", "disp_pred_low_res"}


def test_sttr_train_remat_grads_match():
    """Train-time gradient checkpointing of the alternating attention
    layers (reference STTR/transformer.py:54-66). STTRTransformer holds
    LayerNorms only, so the train flag flips ONLY the remat — outputs and
    gradients must be identical to the un-rematted path. The memory win
    itself is a TPU-scheduler property (measured on-chip: 1618 → 307 MB
    backward temp at W=192/6 layers, BENCH_KERNELS.md; XLA's CPU scheduler
    is not memory-aware, so a CPU memory assertion would be vacuous) —
    see test_sttr_train_remat_memory_tpu below."""
    from stereo_toolbox_tpu.models.sttr import STTRTransformer

    rng = np.random.RandomState(5)
    w, c = 32, 64
    model = STTRTransformer(c, 8, 2)
    fl = jnp.asarray(rng.randn(2, w, c).astype(np.float32))
    fr = jnp.asarray(rng.randn(2, w, c).astype(np.float32))
    pos = jnp.asarray(rng.randn(2 * w - 1, c).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), fl, fr, pos)

    def loss(v, train):
        return (model.apply(v, fl, fr, pos, train)
                .astype(jnp.float32) ** 2).mean()

    g_remat = jax.grad(lambda v: loss(v, True))(variables)
    g_plain = jax.grad(lambda v: loss(v, False))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_remat),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="memory-aware scheduling is a TPU property")
def test_sttr_train_remat_memory_tpu():
    """On the TPU backend the rematted backward's temp allocation must be
    a small fraction of the un-rematted one (measured 307 vs 1618 MB)."""
    from stereo_toolbox_tpu.models.sttr import STTRTransformer

    w, c = 192, 128
    model = STTRTransformer(c, 8, 6)
    fl = jnp.zeros((8, w, c))
    fr = jnp.zeros((8, w, c))
    pos = jnp.zeros((2 * w - 1, c))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), fl, fr, pos)

    def temp_bytes(train):
        fn = jax.jit(jax.grad(lambda v: model.apply(
            v, fl, fr, pos, train).astype(jnp.float32).sum()))
        return fn.lower(variables).compile().memory_analysis() \
            .temp_size_in_bytes

    remat, norem = temp_bytes(True), temp_bytes(False)
    assert remat < 0.5 * norem, (remat, norem)
