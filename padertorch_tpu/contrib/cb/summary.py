"""ReviewSummary: ergonomic review-dict builder.

Reference parity: ``padertorch/contrib/cb/summary.py:19``.
"""
import jax.numpy as jnp

__all__ = ['ReviewSummary']


class ReviewSummary(dict):
    """Dict with add_* helpers for building a model review.

    >>> summary = ReviewSummary()
    >>> summary.add_scalar('a', 1.0)
    >>> summary.add_to_loss(jnp.asarray(2.0))
    >>> sorted(summary.keys())
    ['loss', 'scalars']
    """

    def __init__(self, prefix='', sampling_rate=16000):
        super().__init__()
        self.prefix = prefix
        self.sampling_rate = sampling_rate

    def _tag(self, name):
        return f'{self.prefix}{name}'

    def add_to_loss(self, value):
        self['loss'] = self.get('loss', 0) + value

    def add_scalar(self, name, value):
        self.setdefault('scalars', {})[self._tag(name)] = value

    def add_histogram(self, name, values):
        self.setdefault('histograms', {})[self._tag(name)] = values

    def add_audio(self, name, signal, sampling_rate=None):
        self.setdefault('audios', {})[self._tag(name)] = (
            signal, sampling_rate or self.sampling_rate)

    def add_image(self, name, image):
        self.setdefault('images', {})[self._tag(name)] = image

    def add_stft_image(self, name, stft_signal):
        from padertorch_tpu.summary.tbx_utils import stft_to_image
        self.add_image(name, stft_to_image(stft_signal))

    def add_spectrogram_image(self, name, spectrogram):
        from padertorch_tpu.summary.tbx_utils import spectrogram_to_image
        self.add_image(name, spectrogram_to_image(spectrogram))

    def add_mask_image(self, name, mask):
        from padertorch_tpu.summary.tbx_utils import mask_to_image
        self.add_image(name, mask_to_image(mask))

    def add_text(self, name, text):
        self.setdefault('texts', {})[self._tag(name)] = text

    def add_buffer(self, name, value):
        self.setdefault('buffers', {})[self._tag(name)] = value
