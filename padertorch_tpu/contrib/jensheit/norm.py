"""Norm builder. Reference parity: ``padertorch/contrib/jensheit/norm.py``."""
from padertorch_tpu.modules.convnet import (
    build_norm, GlobalLayerNorm, ChannelwiseLayerNorm,
)

__all__ = ['build_norm', 'GlobalLayerNorm', 'ChannelwiseLayerNorm']
