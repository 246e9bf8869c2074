"""Evaluation-suite and visualization tests using a fake oracle model."""

import numpy as np
import jax.numpy as jnp

from stereo_toolbox_tpu import evaluation as ev
from stereo_toolbox_tpu import visualization as viz


class _FakeLoader:
    """Two tiny 'images' with known GT."""

    def __init__(self, bias=0.0):
        rng = np.random.RandomState(0)
        self.samples = []
        for _ in range(2):
            gt = rng.uniform(1, 32, (1, 8, 10)).astype(np.float32)
            noc = (rng.rand(1, 8, 10) > 0.3).astype(np.float32)
            self.samples.append({
                "left": gt[..., None].repeat(3, -1),
                "right": gt[..., None].repeat(3, -1),
                "gt_disp": gt,
                "noc_mask": noc,
            })
        self.bias = bias

    def __iter__(self):
        return iter(self.samples)


def _oracle_apply(bias):
    def apply_fn(variables, left, right):
        # "model": reads the GT straight out of the left image channel 0
        return left[..., 0] + bias
    return apply_fn


def test_sceneflow_suite_perfect_and_biased():
    loader = _FakeLoader()
    perfect = ev.sceneflow_test(_oracle_apply(0.0), {}, loader, maxdisp=64)
    np.testing.assert_allclose(perfect, 0.0, atol=1e-5)
    biased = ev.sceneflow_test(_oracle_apply(2.5), {}, loader, maxdisp=64)
    np.testing.assert_allclose(biased[0], 2.5, atol=1e-5)   # EPE
    np.testing.assert_allclose(biased[1], 100.0, atol=1e-5)  # >1px %
    np.testing.assert_allclose(biased[2], 100.0, atol=1e-5)  # >2px %
    np.testing.assert_allclose(biased[3], 0.0, atol=1e-5)    # >3px %


def test_sceneflow_write_back(tmp_path):
    p = str(tmp_path / "metrics.json")
    loader = _FakeLoader()
    ev.sceneflow_test(_oracle_apply(0.0), {}, loader, maxdisp=64,
                      write_json=p)
    import json
    with open(p) as f:
        data = json.load(f)
    assert "sceneflow" in data and len(data["sceneflow"]) == 4


def test_generalization_suite():
    loaders = {"kitti2015": _FakeLoader(), "eth3d": _FakeLoader()}
    out = ev.generalization_eval(_oracle_apply(2.0), {}, loaders,
                                 thresholds={"kitti2015": 3, "eth3d": 1},
                                 maxdisp=64)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0, 0], 2.0, atol=1e-5)   # EPE
    np.testing.assert_allclose(out[0, 1:], 0.0, atol=1e-5)  # 2 < 3px
    np.testing.assert_allclose(out[1, 1:], 100.0, atol=1e-5)  # 2 > 1px


def test_weather_suite():
    loaders = {"sunny": _FakeLoader(), "rainy": _FakeLoader()}
    out = ev.drivingstereo_weather_test(_oracle_apply(0.0), {}, loaders,
                                        maxdisp=64)
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_count_params():
    variables = {"params": {"w": np.zeros((3, 4))},
                 "batch_stats": {"m": np.zeros(7)}}
    total, learnable = ev.count_params(variables)
    assert (total, learnable) == (19, 12)


def test_viz_disparity_maps(tmp_path):
    disp = np.linspace(0, 64, 32 * 48).reshape(32, 48).astype(np.float32)
    a = viz.colored_disparity_map_Spectral_r(disp)
    b = viz.colored_disparity_map_KITTI(disp, save_file=str(
        tmp_path / "sub" / "d.png"))
    assert a.shape == (32, 48, 3) and a.dtype == np.uint8
    assert b.shape == (32, 48, 3) and b.dtype == np.uint8
    assert (tmp_path / "sub" / "d.png").exists()
    # zero disparity is black in the KITTI map
    assert tuple(b[0, 0]) == (0, 0, 0)
    # colors vary across the range
    assert len(np.unique(b.reshape(-1, 3), axis=0)) > 10


def test_viz_error_map():
    gt = np.full((16, 16), 10.0, np.float32)
    gt[:2] = 0  # invalid
    pred = gt + 1.0
    out = viz.colored_error_map_KITTI(pred, gt, threshold=3.0)
    assert out.shape == (16, 16, 3)
    # invalid rows are black
    assert out[:2].max() == 0
    # error/threshold = 1/3 ∈ [0.25, 0.5) bucket → (171, 217, 233)
    assert tuple(out[5, 5]) == (171, 217, 233)
