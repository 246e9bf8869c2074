"""Data layer: dataset classes, loader, IO, augmentation.

Mirrors the reference's exported dataset names (reference
datasets/__init__.py:1-16) plus the framework-native `SyntheticStereoDataset`
and `DataLoader`.
"""

from stereo_toolbox_tpu.datasets.base import (StereoDataset,
                                              SyntheticStereoDataset)
from stereo_toolbox_tpu.datasets.loader import (ConcatDataset, DataLoader,
                                                collate)
from stereo_toolbox_tpu.datasets.zoo import (
    SceneFlow_Dataset,
    KITTI2015_Dataset,
    KITTI2012_Dataset,
    MiddleburyEval3_Dataset,
    ETH3D_Dataset,
    DrivingStereo_Dataset,
    Middlebury2021_Dataset,
    Sintel_Dataset,
    HR_VS_Dataset,
    Booster_Dataset,
    InStereo2k_Dataset,
    CREStereo_Dataset,
    Argoverse_Dataset,
    Holopix50k_Dataset,
    MonoTrap_Dataset,
    FallingThings_Dataset,
    VirtualKITTI2_Dataset,
)

__all__ = [
    "StereoDataset", "SyntheticStereoDataset", "DataLoader", "collate",
    "SceneFlow_Dataset", "KITTI2015_Dataset", "KITTI2012_Dataset",
    "MiddleburyEval3_Dataset", "ETH3D_Dataset", "DrivingStereo_Dataset",
    "Middlebury2021_Dataset", "Sintel_Dataset", "HR_VS_Dataset",
    "Booster_Dataset", "InStereo2k_Dataset", "CREStereo_Dataset",
    "Argoverse_Dataset", "Holopix50k_Dataset", "MonoTrap_Dataset",
    "FallingThings_Dataset", "VirtualKITTI2_Dataset",
]
