"""Spatial-sharding tests on the 8-device CPU mesh: sharded results must
match unsharded ones (the silent-halo-corruption guard, SURVEY §7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_toolbox_tpu.parallel import make_mesh, shard_batch
from stereo_toolbox_tpu.parallel.spatial import (halo_exchange_h,
                                                 sharded_conv3d_h,
                                                 spatial_apply)


def test_sharded_conv3d_matches_unsharded():
    mesh = make_mesh(data=1, spatial=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 16, 12, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 8).astype(np.float32))

    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = sharded_conv3d_h(x, k, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_halo_exchange_boundaries():
    mesh = make_mesh(data=1, spatial=8)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(1, 8, 4)

    f = shard_map(lambda b: halo_exchange_h(b, "spatial", 1),
                  mesh=mesh, in_specs=P(None, "spatial"),
                  out_specs=P(None, "spatial"))
    out = np.asarray(f(x))  # local blocks of 1 row → each becomes 3 rows
    # shard 0's top halo is zeros
    np.testing.assert_allclose(out[0, 0], 0.0)
    # shard 0's bottom halo is shard 1's (only) row
    np.testing.assert_allclose(out[0, 2], np.asarray(x[0, 1]))
    # last shard's bottom halo is zeros
    np.testing.assert_allclose(out[0, -1], 0.0)


def test_spatial_apply_psmnet_matches_single_device():
    from stereo_toolbox_tpu.models import PSMNet
    mesh = make_mesh(data=1, spatial=8)
    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    model = PSMNet(max_disp=16)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    def apply_fn(v, l, r):
        return model.apply(v, l, r, train=False)

    want = np.asarray(jax.jit(apply_fn)(variables, left, right))
    got = np.asarray(spatial_apply(apply_fn, mesh)(variables, left, right))
    # GSPMD is semantics-preserving but not bit-identical: different fusion
    # decisions perturb softmax logits, and the soft-argmax amplifies that on
    # pixels whose probability mass is split between two disparity modes
    # (random-init net on random inputs). Require near-exact values on
    # >=99.9% of pixels and bounded disparity error everywhere.
    close = np.isclose(got, want, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.999, f"{(~close).sum()} of {close.size} mismatch"
    assert np.abs(got - want).max() < 6.0  # mode flips stay within the range
    # Halo-exchange bugs corrupt exactly the rows at shard boundaries, which
    # a global 99.9% threshold could mask: require the same near-exact rate
    # inside every ±2-row boundary band (8 shards over 64 rows → y = 8k).
    h = got.shape[1]
    for y in range(h // 8, h, h // 8):
        band = close[:, max(y - 2, 0):y + 2]
        assert band.mean() > 0.999, f"boundary y={y}: " \
            f"{(~band).sum()}/{band.size} mismatch"


def _band_check(got, want, shards=8, rtol=1e-4, atol=1e-4, max_abs=6.0):
    close = np.isclose(got, want, rtol=rtol, atol=atol)
    assert close.mean() > 0.999, f"{(~close).sum()}/{close.size} mismatch"
    assert np.abs(got - want).max() < max_abs
    h = got.shape[1]
    for y in range(h // shards, h, h // shards):
        band = close[:, max(y - 2, 0):y + 2]
        assert band.mean() > 0.999, f"boundary y={y}: " \
            f"{(~band).sum()}/{band.size} mismatch"


@pytest.mark.slow
def test_spatial_apply_raft_matches_single_device():
    """Iterative (nn.scan) model under H sharding: the banded-correlation
    build and per-iteration lookups must not induce cross-shard gathers or
    wrong halos (round-3 verdict weak #4)."""
    from stereo_toolbox_tpu.models import RAFTStereo
    mesh = make_mesh(data=1, spatial=8)
    rng = np.random.RandomState(2)
    left = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    model = RAFTStereo(valid_iters=3)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    def apply_fn(v, l, r):
        return model.apply(v, l, r, train=False)

    want = np.asarray(jax.jit(apply_fn)(variables, left, right))
    got = np.asarray(spatial_apply(apply_fn, mesh)(variables, left, right))
    _band_check(got, want)


@pytest.mark.slow
def test_spatial_apply_igev_matches_single_device():
    """IGEV under H sharding: GEV hourglass (3D convs with H halos) + the
    combined geo/corr lookup + superpixel upsample, all sharded."""
    from stereo_toolbox_tpu.models import IGEVStereo
    mesh = make_mesh(data=1, spatial=8)
    rng = np.random.RandomState(3)
    left = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    right = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    model = IGEVStereo(max_disp=32, valid_iters=3)
    variables = model.init(jax.random.PRNGKey(0), left, right, train=False)

    def apply_fn(v, l, r):
        out = model.apply(v, l, r, train=False, mutable=["batch_stats"])
        return out[0]

    want = np.asarray(jax.jit(apply_fn)(variables, left, right))
    got = np.asarray(spatial_apply(apply_fn, mesh)(variables, left, right))
    _band_check(got, want)


@pytest.mark.slow
def test_sharded_train_step_raft_8_devices():
    """Sharded data×spatial TRAIN step for an nn.scan model: gradients of
    the banded lookup + GRU recurrence compile and produce finite loss."""
    from stereo_toolbox_tpu.models import RAFTStereo
    from stereo_toolbox_tpu.trainer import (TrainConfig, init_train_state,
                                            make_train_step)
    mesh = make_mesh(data=4, spatial=2)
    config = TrainConfig(lr=1e-4, max_disp=16, loss="sequence",
                         batch_size=4)
    model = RAFTStereo(train_iters=2, valid_iters=2)
    rng = np.random.RandomState(4)
    batch = {
        "left": rng.randn(4, 32, 64, 3).astype(np.float32),
        "right": rng.randn(4, 32, 64, 3).astype(np.float32),
        "gt_disp": np.abs(rng.randn(4, 32, 64) * 4).astype(np.float32),
    }
    state = init_train_state(model, config, batch, total_steps=10)
    step = make_train_step(model, config, mesh=mesh)
    sharded = shard_batch(batch, mesh, spatial=True)
    state, loss = step(state, sharded)
    assert np.isfinite(float(loss))
