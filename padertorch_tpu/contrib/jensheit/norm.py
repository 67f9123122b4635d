"""Norm builder. Reference parity: ``padertorch/contrib/jensheit/norm.py``."""
from padertorch_tpu.modules.convnet import (
    build_norm, GlobalLayerNorm, ChannelwiseLayerNorm,
)

# Reference names (jensheit/norm.py:10,34): TransposedLayerNorm is a
# LayerNorm over the channel axis of (B, C, T) == cLN;
# GlobalChannelLayerNorm normalizes over (C, T) per example == gLN.
TransposedLayerNorm = ChannelwiseLayerNorm
GlobalChannelLayerNorm = GlobalLayerNorm

__all__ = ['build_norm', 'GlobalLayerNorm', 'ChannelwiseLayerNorm',
           'TransposedLayerNorm', 'GlobalChannelLayerNorm']
