"""ReviewSummary: ergonomic review-dict builder.

Reference parity: ``padertorch/contrib/cb/summary.py:19`` —
mean-aggregating ``add_scalar(name, *values)``, appending
histogram/buffer adders, ``visible_dB`` shared by the image adders,
``batch_first``/``color``/``rearrange`` pass-through, ndim check on
images.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ['ReviewSummary']


class ReviewSummary(dict):
    """Dict with add_* helpers for building a model review.

    >>> summary = ReviewSummary()
    >>> summary.add_scalar('a', 1.0)
    >>> summary.add_scalar('a', 2.0, 3.0)   # extends; SummaryHook means
    >>> summary['scalars']['a']
    [1.0, 2.0, 3.0]
    >>> summary.add_to_loss(jnp.asarray(2.0))
    >>> sorted(summary.keys())
    ['loss', 'scalars']
    >>> summary.add_mask_image(
    ...     'm', np.random.uniform(size=(4, 10, 5)), batch_first=True)
    >>> summary['images']['m'].shape
    (1, 5, 10)
    """

    def __init__(self, prefix='', sampling_rate=16000, visible_dB=60):
        super().__init__()
        self.prefix = prefix
        self.sampling_rate = sampling_rate
        self.visible_dB = visible_dB

    def _tag(self, name):
        return f'{self.prefix}{name}'

    def add_to_loss(self, value):
        self['loss'] = self.get('loss', 0) + value

    def add_scalar(self, name, *value):
        """Append value(s); SummaryHook reports the mean of all added."""
        self.setdefault('scalars', {}).setdefault(
            self._tag(name), []).extend(value)

    def add_histogram(self, name, values):
        self.setdefault('histograms', {}).setdefault(
            self._tag(name), []).append(values)

    def add_audio(self, name, signal, sampling_rate=None,
                  batch_first=None, normalize=True):
        from padertorch_tpu.summary.tbx_utils import audio
        sampling_rate = sampling_rate or self.sampling_rate
        assert sampling_rate is not None, sampling_rate
        self.setdefault('audios', {})[self._tag(name)] = audio(
            signal, sampling_rate=sampling_rate,
            batch_first=bool(batch_first), normalize=normalize)

    def add_image(self, name, image):
        image = np.asarray(image)
        if image.ndim != 3:
            raise AssertionError(
                'Did you forget to call "pt.summary.*_to_image"?\n'
                f'Expect ndim == 3, got shape {image.shape}.')
        self.setdefault('images', {})[self._tag(name)] = image

    @staticmethod
    def _rearrange(array, rearrange):
        if rearrange is None:
            return array
        import einops
        return einops.rearrange(np.asarray(array), rearrange)

    def add_stft_image(self, name, stft_signal, *, batch_first=None,
                       color='viridis', rearrange=None):
        from padertorch_tpu.summary.tbx_utils import stft_to_image
        stft_signal = self._rearrange(stft_signal, rearrange)
        self.add_image(name, stft_to_image(
            stft_signal, batch_first=bool(batch_first), color=color,
            visible_dB=self.visible_dB))

    def add_spectrogram_image(self, name, spectrogram, *,
                              batch_first=None, color='viridis',
                              rearrange=None):
        from padertorch_tpu.summary.tbx_utils import spectrogram_to_image
        spectrogram = self._rearrange(spectrogram, rearrange)
        self.add_image(name, spectrogram_to_image(
            spectrogram, batch_first=bool(batch_first), color=color,
            visible_dB=self.visible_dB))

    def add_mask_image(self, name, mask, *, batch_first=None,
                       color=None, rearrange=None):
        from padertorch_tpu.summary.tbx_utils import mask_to_image
        mask = self._rearrange(mask, rearrange)
        self.add_image(name, mask_to_image(
            mask, batch_first=bool(batch_first), color=color))

    def add_text(self, name, text):
        assert isinstance(text, str), (type(text), text)
        self.setdefault('texts', {})[self._tag(name)] = text

    def add_buffer(self, name, value):
        self.setdefault('buffers', {}).setdefault(
            self._tag(name), []).append(value)
