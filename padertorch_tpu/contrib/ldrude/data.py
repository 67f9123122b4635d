"""MERL/WSJ0-mix style data pipeline for deep-clustering experiments.

Reference parity: ``padertorch/contrib/ldrude/data.py`` — STFT features
plus ideal-binary-mask targets per mixture, batched sorted-by-length
for the deep-clustering / PIT models, with the reference's
``return_keys`` selection.

The reference reads audio through padercontrib's ``AudioReader`` and
computes masks with ``pb_bss.extraction.ideal_binary_mask``; both are
re-implemented here (scipy wav reading, argmax-of-power mask) so the
pipeline is self-contained.
"""
from functools import partial

import numpy as np

from padertorch_tpu.data.utils import collate_fn
from padertorch_tpu.ops._stft import HostSTFT

__all__ = [
    'ideal_binary_mask',
    'pre_batch_transform',
    'post_batch_transform',
    'prepare_iterable',
]


def ideal_binary_mask(signal, source_axis=0):
    """One-hot mask selecting the dominant source per TF bin.

    Args:
        signal: complex or magnitude array with a source axis, e.g.
            ``(K, frames, bins)``.
        source_axis: axis that enumerates the sources.

    >>> S = np.array([[[3.0, 1.0]], [[1.0, 2.0]]])  # (K=2, T=1, F=2)
    >>> ideal_binary_mask(S).tolist()
    [[[1.0, 0.0]], [[0.0, 1.0]]]
    """
    signal = np.asarray(signal)
    power = np.abs(signal) ** 2
    dominant = np.argmax(power, axis=source_axis)
    K = signal.shape[source_axis]
    mask = np.eye(K, dtype=np.float32)[dominant]  # (..., K) at the end
    return np.moveaxis(mask, -1, source_axis)


_stft_cache = {}


def _get_stft(size, shift):
    key = (size, shift)
    if key not in _stft_cache:
        _stft_cache[key] = HostSTFT(
            size, shift, complex_representation='complex')
    return _stft_cache[key]


def pre_batch_transform(inputs, return_keys=None, stft_size=512,
                        stft_shift=128):
    """One example -> feature dict (ref ``ldrude/data.py:12-44``).

    Expects ``inputs['audio_data']['speech_source']`` with shape
    ``(K, samples)`` and ``inputs['audio_data']['observation']`` with
    shape ``(samples,)``.  Emitted keys (filtered by ``return_keys``):
    ``example_id, s, y, Y, X_abs, Y_abs, num_frames,
    cos_phase_difference, target_mask``.
    """
    stft = _get_stft(stft_size, stft_shift)
    s = np.asarray(inputs['audio_data']['speech_source'])
    y = np.asarray(inputs['audio_data']['observation'])
    S = stft(s)  # (K, T, F)
    Y = stft(y)  # (T, F)
    S = np.moveaxis(S, 0, 1)  # (T, K, F) like the reference's rearrange
    X = S  # clean == source for single-channel mixtures (ref comment)
    num_frames = Y.shape[0]

    return_dict = {}

    def maybe_add(key, value):
        if return_keys is None or key in return_keys:
            return_dict[key] = value

    maybe_add('example_id', inputs.get('example_id'))
    maybe_add('s', np.ascontiguousarray(s, np.float32))
    maybe_add('y', np.ascontiguousarray(y, np.float32))
    maybe_add('Y', np.ascontiguousarray(Y, np.complex64))
    maybe_add('X_abs', np.ascontiguousarray(np.abs(X), np.float32))
    maybe_add('Y_abs', np.ascontiguousarray(np.abs(Y), np.float32))
    maybe_add('num_frames', num_frames)
    maybe_add('cos_phase_difference', np.ascontiguousarray(
        np.cos(np.angle(Y[:, None, :]) - np.angle(X)), np.float32))

    if return_keys is None or 'target_mask' in return_keys:
        return_dict['target_mask'] = np.ascontiguousarray(
            ideal_binary_mask(S, source_axis=-2), np.float32)

    return return_dict


def post_batch_transform(batch):
    return batch


def prepare_iterable(
        db, dataset: str, batch_size, return_keys=None, prefetch=True,
        iterator_slice=None, audio_reader=None,
):
    """Build the training iterable (ref ``ldrude/data.py:50-81``).

    Args:
        db: a database exposing ``get_dataset(name)`` (e.g.
            ``padertorch_tpu.data.database.JsonDatabase``).
        dataset: dataset name.
        batch_size: examples per batch.
        return_keys: key subset for :func:`pre_batch_transform`.
        prefetch: thread-prefetch the mapped pipeline.
        iterator_slice: optional slice applied before mapping.
        audio_reader: optional callable example -> example that fills
            ``example['audio_data']`` from audio paths.  If ``None``
            the examples must already carry ``audio_data``.
    """
    iterator = db.get_dataset(dataset)
    if iterator_slice is not None:
        iterator = iterator[iterator_slice]
    if audio_reader is not None:
        iterator = iterator.map(audio_reader)
    iterator = (
        iterator
        .map(partial(pre_batch_transform, return_keys=return_keys))
        .shuffle(reshuffle=False)
        .batch(batch_size)
        .map(lambda batch: sorted(
            batch, key=lambda example: example['num_frames'],
            reverse=True))
        .map(collate_fn)
        .map(post_batch_transform)
        # ref :74 tiles + shuffles to simulate reshuffling; the batched
        # stream is not indexable here, so use the streaming
        # reservoir shuffle over the tiled stream instead
        .tile(reps=50)
        .shuffle(buffer_size=100)
    )
    if prefetch:
        iterator = iterator.prefetch(4, 8)
    return iterator
