"""Import-path compatibility with the reference's vendored NVIDIA
BigVGAN package (``padertorch/contrib/mk/synthesis/vocoder/
nvidia_bigvgan/``): the reference exposes the generator and its
mel/hparam helpers under this module path; here they re-export from
the repo's single JAX implementation in :mod:`.bigvgan` (the reference
name ``BigVGAN`` maps to :class:`BigVGANGenerator`).
"""
from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (  # noqa: F401
    AMPBlock1,
    AMPBlock2,
    BigVGANGenerator,
    BigVGANGenerator as BigVGAN,
    load_bigvgan_generator,
    slaney_mel_filterbank,
    mel_spectrogram,
    get_mel_spectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
    spectral_normalize,
    spectral_de_normalize,
    AttrDict,
    load_hparams_from_json,
    get_padding,
    init_weights,
    scan_checkpoint,
    save_audio,
    plot_spectrogram,
    plot_spectrogram_clipped,
    MAX_WAV_VALUE,
)
from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan_activation import (  # noqa: F401
    Snake,
    SnakeBeta,
    Activation1d,
)

__all__ = [
    'BigVGAN', 'BigVGANGenerator', 'AMPBlock1', 'AMPBlock2',
    'load_bigvgan_generator', 'slaney_mel_filterbank',
    'mel_spectrogram', 'get_mel_spectrogram',
    'dynamic_range_compression', 'dynamic_range_decompression',
    'spectral_normalize', 'spectral_de_normalize', 'AttrDict',
    'load_hparams_from_json', 'get_padding', 'init_weights',
    'scan_checkpoint', 'save_audio', 'plot_spectrogram',
    'plot_spectrogram_clipped', 'MAX_WAV_VALUE',
    'Snake', 'SnakeBeta', 'Activation1d',
]
