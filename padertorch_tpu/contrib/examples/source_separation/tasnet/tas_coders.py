"""Reference-layout re-export of the TasNet encoder/decoder pairs."""
from padertorch_tpu.models.tasnet import (
    TasEncoder, TasDecoder, StftEncoder, IstftDecoder,
)

__all__ = ['TasEncoder', 'TasDecoder', 'StftEncoder', 'IstftDecoder']
