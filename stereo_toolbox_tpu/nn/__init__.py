"""Shared neural-net building blocks (flax.linen, channels-last)."""

from stereo_toolbox_tpu.nn.layers import (
    ConvBNAct,
    ConvTransposeBN,
    BasicResBlock,
    avg_pool,
    FeatureAtt,
)
from stereo_toolbox_tpu.nn.gru import ConvGRU, SepConvGRU

__all__ = [
    "ConvBNAct",
    "ConvTransposeBN",
    "BasicResBlock",
    "avg_pool",
    "FeatureAtt",
    "ConvGRU",
    "SepConvGRU",
]
