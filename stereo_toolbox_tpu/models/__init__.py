"""Model zoo registry.

Models are flax.linen modules with the shared contract
(ImageNet-normalized NHWC inputs; `train=True` → list/tuple of predictions,
eval → single ``[B, H, W]`` disparity map; reference README.md:70-72).

`create_model(name)` is the single factory; `MODEL_REGISTRY` maps the
reference's exported model names (reference models/__init__.py:3-17) to
constructors as they come online.
"""

from __future__ import annotations

from typing import Any, Callable

from stereo_toolbox_tpu.models.psmnet import PSMNet
from stereo_toolbox_tpu.models.gwcnet import GwcNet, GwcNet_G, GwcNet_GC
from stereo_toolbox_tpu.models.acvnet import ACVNet
from stereo_toolbox_tpu.models.raft_stereo import RAFTStereo
from stereo_toolbox_tpu.models.igev_stereo import IGEVStereo
from stereo_toolbox_tpu.models.selective import SelectiveIGEV, SelectiveRAFT
from stereo_toolbox_tpu.models.cfnet import CFNet
from stereo_toolbox_tpu.models.pcwnet import PCWNet, PCWNet_G, PCWNet_GC
from stereo_toolbox_tpu.models.sttr import STTR
from stereo_toolbox_tpu.models.depth_anything_v2 import DepthAnythingV2
from stereo_toolbox_tpu.models.monster import Monster
from stereo_toolbox_tpu.models.foundation_stereo import (FoundationStereo,
                                                         FoundationStereo_S,
                                                         FoundationStereo_L)
from stereo_toolbox_tpu.models.stereoanywhere import StereoAnywhere
from stereo_toolbox_tpu.models.defom_stereo import (DEFOMStereo,
                                                    DEFOMStereo_S,
                                                    DEFOMStereo_L)

MODEL_REGISTRY: dict[str, Callable[..., Any]] = {
    "PSMNet": PSMNet,
    "GwcNet_G": GwcNet_G,
    "GwcNet_GC": GwcNet_GC,
    "ACVNet": ACVNet,
    "RAFTStereo": RAFTStereo,
    "IGEVStereo": IGEVStereo,
    "SelectiveRAFT": SelectiveRAFT,
    "SelectiveIGEV": SelectiveIGEV,
    "CFNet": CFNet,
    "PCWNet_G": PCWNet_G,
    "PCWNet_GC": PCWNet_GC,
    "STTR": STTR,
    "DepthAnythingV2": DepthAnythingV2,
    "DEFOMStereo_S": DEFOMStereo_S,
    "DEFOMStereo_L": DEFOMStereo_L,
    "MonSter": Monster,
    "FoundationStereo_S": FoundationStereo_S,
    "FoundationStereo_L": FoundationStereo_L,
    "StereoAnywhere": StereoAnywhere,
}


def register_model(name: str, ctor: Callable[..., Any]) -> None:
    MODEL_REGISTRY[name] = ctor


def create_model(name: str, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)


def load_checkpoint_flexible(params, state_dict):
    """Merge a flat/partial checkpoint into a param pytree, tolerating
    missing or extra keys (reference models/__init__.py:20-51 analogue).

    Keys are '/'-joined paths. Returns (merged_params, loaded, skipped).
    """
    import jax

    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    def path_str(p):
        parts = []
        for k in p:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        return "/".join(parts)

    by_name = {path_str(p): p for p in flat}
    loaded, skipped = [], []
    for name, value in state_dict.items():
        # tolerate a leading "module/" or "params/" prefix
        candidates = [name, name.removeprefix("module/"),
                      name.removeprefix("params/")]
        hit = next((c for c in candidates if c in by_name), None)
        if hit is None or flat[by_name[hit]].shape != value.shape:
            skipped.append(name)
            continue
        flat[by_name[hit]] = value
        loaded.append(name)

    merged = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), list(flat.values()))
    return merged, loaded, skipped


__all__ = ["PSMNet", "MODEL_REGISTRY", "create_model", "register_model",
           "load_checkpoint_flexible"]
