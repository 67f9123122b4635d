"""Data provider for the jensheit mask-estimator recipes.

Reference parity: ``padertorch/contrib/jensheit/data.py``
(``MaskTransformer``/``SequenceProvider``) — host-side numpy transforms
feeding the lazy dataset pipeline; the biased binary mask target is a
simplified SNR-threshold variant of ``pb_bss.extraction.mask_module.
biased_binary_mask`` (per-bin speech/noise power comparison in dB with
frequency guards) since pb_bss is not a dependency here.
"""
import functools
from dataclasses import dataclass, field
from random import shuffle
from typing import Dict, List

import numpy as np

from padertorch_tpu.contrib.jensheit.base import Parameterized, dict_func
from padertorch_tpu.contrib.jensheit.batch import Padder
from padertorch_tpu.contrib.jensheit.mask_estimator import MaskKeys as M_K
from padertorch_tpu.data.dataset import FilterException
from padertorch_tpu.data.segment import segment_axis
from padertorch_tpu.ops import STFT

__all__ = ['MaskTransformer', 'SequenceProvider', 'biased_binary_mask']

# example-dict keys (reference padercontrib.database.keys)
OBSERVATION = 'observation'
SPEECH_IMAGE = 'speech_image'
NOISE_IMAGE = 'noise_image'
NUM_SAMPLES = 'num_samples'
NUM_FRAMES = 'num_frames'
EXAMPLE_ID = 'example_id'
AUDIO_DATA = 'audio_data'
SENSOR_POSITION = 'sensor_position'


def biased_binary_mask(signals, low_cut=5, high_cut=-5,
                       threshold_db=0.0, bias_db=(0.0, -10.0)):
    """Binary speech/noise mask targets from parallel stft signals.

    Args:
        signals: stacked stft of [speech_image, noise_image], shape
            (2, ..., T, F) complex.
        low_cut/high_cut: frequency bins outside [low_cut, high_cut) are
            forced to speech=0 / noise=1 (low/high bins carry no speech).
        threshold_db: per-bin decision threshold on the SNR.
        bias_db: bias added to (speech, noise) log-powers before the
            comparison (reference biases the decision per component).

    Returns:
        (target_mask, noise_mask) float arrays shaped like signals[0].
    """
    speech, noise = signals[0], signals[1]
    eps = np.finfo(np.float64).tiny
    speech_db = 10 * np.log10(np.abs(speech) ** 2 + eps) + bias_db[0]
    noise_db = 10 * np.log10(np.abs(noise) ** 2 + eps) + bias_db[1]
    snr = speech_db - noise_db
    target_mask = (snr > threshold_db)
    noise_mask = ~target_mask
    f = speech.shape[-1]
    hi = high_cut if high_cut >= 0 else f + high_cut
    freq = np.arange(f)
    guard = (freq < low_cut) | (freq >= hi)
    target_mask = np.where(guard, False, target_mask)
    noise_mask = np.where(guard, True, noise_mask)
    return (target_mask.astype(np.float32),
            noise_mask.astype(np.float32))


def _as_channels(signal):
    """(T,) or (C, T) -> (C, T)."""
    signal = np.asarray(signal)
    if signal.ndim > 2:
        raise ValueError(
            f'expected a mono or multi-channel signal, '
            f'got shape {signal.shape}')
    return np.atleast_2d(signal)


class MaskTransformer(Parameterized):
    """STFT + mask-target computation mapped over examples.

    Reference parity: ``jensheit/data.py:29`` (same config keys /
    example keys; the mask target is :func:`biased_binary_mask`).
    """

    @dataclass
    class opts:
        low_cut: int = 5
        high_cut: int = -5
        stft: Dict = dict_func({
            'factory': STFT, 'size': 1024, 'shift': 256,
        })

    def __init__(self, stft, **kwargs):
        super().__init__(**kwargs)
        self.stft = stft

    def inverse(self, signal):
        return self.stft.inverse(signal)

    def __call__(self, example):
        many = isinstance(example, (list, tuple)) or hasattr(
            example, '__next__')
        return ([self.transform(ex) for ex in example] if many
                else self.transform(example))

    def _spectrogram(self, example, key):
        return np.asarray(self.stft(_as_channels(example[key])))

    def transform(self, example):
        obs = self._spectrogram(example, OBSERVATION)
        example[M_K.OBSERVATION_STFT] = obs
        example[M_K.OBSERVATION_ABS] = np.abs(obs).astype(np.float32)
        example[NUM_FRAMES] = obs.shape[-2]
        if SPEECH_IMAGE in example and NOISE_IMAGE in example:
            parallel = np.stack([
                self._spectrogram(example, SPEECH_IMAGE),
                self._spectrogram(example, NOISE_IMAGE),
            ])
            (example[M_K.SPEECH_MASK_TARGET],
             example[M_K.NOISE_MASK_TARGET]) = biased_binary_mask(
                parallel, low_cut=self.opts.low_cut,
                high_cut=self.opts.high_cut)
        return example


class SequenceProvider(Parameterized):
    """Train/eval/predict dataset pipelines for sequence models.

    Reference parity: ``jensheit/data.py:82``.  Works on a
    ``data.database``-style database (``get_dataset(name)`` returning a
    lazy dataset of example dicts with audio paths already loaded or an
    ``audio_data`` dict).
    """

    is_training = False

    @dataclass
    class opts:
        # dataset names
        train_dataset: str = 'train'
        validation_dataset: str = 'validation'
        test_dataset: str = 'test'
        # audio loading
        audio_keys: List = field(
            default_factory=lambda: [OBSERVATION])
        reference_channel: int = 0
        # batching / prefetch
        batch_size: int = 1
        batch_size_eval: int = 5
        drop_last: bool = False
        shuffle: bool = True
        num_workers: int = 4
        buffer_size: int = 20
        collate: Dict = dict_func(dict(
            factory=Padder, sort_by_key=NUM_SAMPLES,
            padding=False, padding_keys=None, to_torch=False,
        ))
        # fan-outs
        time_segments: int = None
        time_segments_random_offset: bool = False
        segment_channels: bool = False

    def __init__(self, database, collate, transform=None, **kwargs):
        self.database = database
        self.transform = transform if transform is not None else (
            lambda x: x)
        self.collate = collate
        super().__init__(**kwargs)

    # -- example restructuring --------------------------------------------
    def to_train_structure(self, example):
        out_dict = dict(example[AUDIO_DATA])
        out_dict['audio_keys'] = list(example[AUDIO_DATA].keys())
        if SENSOR_POSITION in example:
            out_dict[SENSOR_POSITION] = example[SENSOR_POSITION]
        out_dict[EXAMPLE_ID] = example[EXAMPLE_ID]
        num_samples = example[NUM_SAMPLES]
        if isinstance(num_samples, dict):
            num_samples = num_samples[OBSERVATION]
        out_dict[NUM_SAMPLES] = num_samples
        return out_dict

    def to_eval_structure(self, example):
        return self.to_train_structure(example)

    def to_predict_structure(self, example):
        return self.to_train_structure(example)

    def read_audio(self, example):
        """Load audio for ``opts.audio_keys`` into example['audio_data'].

        Accepts examples that carry either ready arrays under the audio
        keys or file paths in ``example['audio_path'][key]``.
        """
        from padertorch_tpu.contrib.je.data.transforms import AudioReader
        audio = {}
        for key in self.opts.audio_keys:
            if key in example and isinstance(
                    example[key], np.ndarray):
                audio[key] = example[key]
            else:
                path = example['audio_path'][key]
                reader = AudioReader(average_channels=False)
                if isinstance(path, (list, tuple)):
                    audio[key] = np.stack(
                        [reader.read_file(p) for p in path])
                else:
                    audio[key] = reader.read_file(path)
        example[AUDIO_DATA] = audio
        if NUM_SAMPLES not in example:
            example[NUM_SAMPLES] = audio[OBSERVATION].shape[-1]
        return example

    # -- segmentation ------------------------------------------------------
    #
    # Semantics per the reference provider (jensheit/data.py:141,180):
    # `segment` cuts every audio key into non-overlapping
    # `time_segments`-sample chunks (one shared random phase offset when
    # enabled, tail cut, FilterException for too-short examples) and
    # fans the example out into one shuffled sub-example per chunk;
    # `segment_channels` fans a multi-channel example out into one
    # sub-example per channel (singleton channel axis kept,
    # channels-last arrays transposed first).  The implementation here
    # is the repo's own: one zero-copy strided view per key via
    # ``data.segment.segment_axis`` and a dict-merge fan-out — chunk
    # arrays are materialized per sub-example, everything else is
    # shared (nothing downstream mutates example fields in place).

    @staticmethod
    def _fan_out(shared, per_piece):
        """``shared`` dict + ``{key: [piece_0, piece_1, ...]}`` -> a
        shuffled list of sub-example dicts, one per piece index."""
        counts = {k: len(v) for k, v in per_piece.items()}
        if not counts:
            # all keys excluded: a bare next() would raise
            # StopIteration, which a generator-based pipeline turns
            # into PEP-479 RuntimeError or silent truncation
            raise FilterException('no keys left to fan out')
        n = next(iter(counts.values()))
        if any(c != n for c in counts.values()):
            raise ValueError(
                f'keys disagree on the number of pieces: {counts}')
        out = [
            {**shared, **{k: v[i] for k, v in per_piece.items()}}
            for i in range(n)
        ]
        shuffle(out)
        return out

    def segment(self, example, exclude_keys=None, seg_len=None):
        if isinstance(exclude_keys, str):
            exclude_keys = [exclude_keys]
        exclude = set(exclude_keys or ())
        if seg_len is None:
            seg_len = self.opts.time_segments
        num_samples = example[NUM_SAMPLES]
        keys = [k for k in example['audio_keys'] if k not in exclude]

        offset = 0
        if self.opts.time_segments_random_offset:
            slack = num_samples % seg_len
            if slack:
                offset = np.random.randint(0, slack)

        if num_samples < seg_len:
            raise FilterException('example too short to segment')
        chunked = {
            # repo segment_axis puts the frame axis FIRST:
            # (..., T) -> (n_chunks, ..., seg_len)
            k: segment_axis(
                example[k][..., offset:num_samples],
                seg_len, shift=seg_len, axis=-1, end='cut')
            for k in keys
        }
        if not chunked:
            # all audio keys excluded -> nothing to fan out; surface it
            # as a FilterException so catch_filter_exception pipelines
            # drop the example instead of crashing (the >=1-chunk case
            # is guaranteed: num_samples >= seg_len and the random
            # offset is < num_samples % seg_len)
            raise FilterException('no audio keys left to segment')
        shared = {k: v for k, v in example.items() if k not in keys}
        shared[NUM_SAMPLES] = seg_len
        return self._fan_out(shared, {
            k: [np.ascontiguousarray(v[i]) for i in range(v.shape[0])]
            for k, v in chunked.items()
        })

    def segment_channels(self, example, exclude_keys=None):
        if isinstance(exclude_keys, str):
            exclude_keys = [exclude_keys]
        exclude = set(exclude_keys or ())
        examples = (example if isinstance(example, (list, tuple))
                    else [example])
        num_channels = examples[0][OBSERVATION].shape[0]

        def channels_first(key, signal):
            # channels-last arrays (e.g. masks shaped (T, C)) are
            # transposed; channels-first ones pass through
            if (signal.shape[0] != num_channels and signal.ndim > 1
                    and signal.shape[1] == num_channels):
                signal = signal.swapaxes(0, 1)
            if signal.shape[0] != num_channels:
                raise ValueError(
                    f'{key}: expected {num_channels} channels on either '
                    f'of the first two axes, got shape {signal.shape}')
            return signal

        out = []
        for ex in examples:
            arrays = {
                k: channels_first(k, v) for k, v in ex.items()
                if isinstance(v, np.ndarray) and k not in exclude
            }
            shared = {k: v for k, v in ex.items() if k not in arrays}
            out += self._fan_out(shared, {
                k: [v[c, None] for c in range(num_channels)]
                for k, v in arrays.items()
            })
        shuffle(out)
        return out

    # -- pipelines ----------------------------------------------------------
    #
    # All three public iterators share one step list:
    #   read audio -> restructure -> [shuffle] -> [segment fan-out]
    #   -> transform -> [channel fan-out] -> [prefetch] -> [unbatch]
    #   -> batch -> collate
    # (reference jensheit/data.py:207-268 semantics on the repo's lazy
    # dataset pipeline).

    def _source(self, name, structure):
        ds = self.database.get_dataset(name)
        return ds.map(self.read_audio).map(structure)

    def get_map_iterator(self, iterator, batch_size=None, prefetch=True,
                         unbatch=False, segment_channels=False):
        """Transform + (optional) channel fan-out + prefetch + batch +
        collate — the shared tail of every pipeline below."""
        steps = [self.transform]
        if segment_channels:
            steps.append(segment_channels)
            unbatch = True
        for step in steps:
            iterator = iterator.map(step)
        if prefetch:
            iterator = iterator.prefetch(
                self.opts.num_workers, self.opts.buffer_size,
                catch_filter_exception=True)
        if unbatch:
            iterator = iterator.unbatch()
        batch_size = (self.opts.batch_size if batch_size is None
                      else batch_size)
        if batch_size is not None:
            iterator = iterator.batch(
                batch_size, self.opts.drop_last).map(self.collate)
        return iterator

    def get_train_iterator(self, time_segment=None):
        self.is_training = True
        assert not (self.opts.time_segments and time_segment), \
            'pass time_segments either via opts or per call, not both'
        iterator = self._source(
            self.opts.train_dataset, self.to_train_structure)
        if self.opts.shuffle:
            iterator = iterator.shuffle(reshuffle=True)
        fan_out = (self.opts.time_segments is not None
                   or time_segment is not None)
        if fan_out:
            iterator = iterator.map(functools.partial(
                self.segment, seg_len=time_segment))
        return self.get_map_iterator(
            iterator, self.opts.batch_size, unbatch=fan_out,
            segment_channels=(
                self.segment_channels if self.opts.segment_channels
                else False))

    def get_eval_iterator(self, num_examples=-1):
        self.is_training = False
        iterator = self._source(
            self.opts.validation_dataset, self.to_eval_structure)
        return self.get_map_iterator(
            iterator[:num_examples], self.opts.batch_size_eval)

    def get_predict_iterator(self, dataset=None, num_examples=None,
                             iterable_apply_fn=None, filter_fn=None):
        self.is_training = False
        iterator = self._source(
            dataset if dataset is not None else self.opts.test_dataset,
            self.to_predict_structure)
        if num_examples is not None:
            iterator = iterator[:num_examples]
        if iterable_apply_fn is not None:
            iterator = iterator.apply(iterable_apply_fn)
        iterator = self.get_map_iterator(iterator, prefetch=False)
        return (iterator if filter_fn is None
                else iterator.filter(filter_fn))
