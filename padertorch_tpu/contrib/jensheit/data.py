"""Data provider for the jensheit mask-estimator recipes.

Reference parity: ``padertorch/contrib/jensheit/data.py``
(``MaskTransformer``/``SequenceProvider``) — host-side numpy transforms
feeding the lazy dataset pipeline; the biased binary mask target is a
simplified SNR-threshold variant of ``pb_bss.extraction.mask_module.
biased_binary_mask`` (per-bin speech/noise power comparison in dB with
frequency guards) since pb_bss is not a dependency here.
"""
from copy import deepcopy
from dataclasses import dataclass, field
from functools import partial
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


class MaskTransformer(Parameterized):
    """STFT + mask-target computation mapped over examples.

    Reference parity: ``jensheit/data.py:29``.
    """

    @dataclass
    class opts:
        stft: Dict = dict_func({
            'factory': STFT,
            'shift': 256,
            'size': 1024,
        })
        low_cut: int = 5
        high_cut: int = -5

    def __init__(self, stft, **kwargs):
        super().__init__(**kwargs)
        self.stft = stft

    def inverse(self, signal):
        return self.stft.inverse(signal)

    def __call__(self, example):
        if isinstance(example, (list, tuple)) or hasattr(
                example, '__next__'):
            return [self.transform(ex) for ex in example]
        return self.transform(example)

    def transform(self, example):
        def maybe_add_channel(signal):
            if signal.ndim == 1:
                return np.expand_dims(signal, axis=0)
            elif signal.ndim == 2:
                return signal
            raise ValueError('Either the signal has ndim 1 or 2',
                             signal.shape)

        obs = np.asarray(self.stft(maybe_add_channel(
            np.asarray(example[OBSERVATION]))))
        example[M_K.OBSERVATION_STFT] = obs
        example[M_K.OBSERVATION_ABS] = np.abs(obs).astype(np.float32)
        example[NUM_FRAMES] = obs.shape[-2]
        if SPEECH_IMAGE in example and NOISE_IMAGE in example:
            speech = np.asarray(self.stft(maybe_add_channel(
                np.asarray(example[SPEECH_IMAGE]))))
            noise = np.asarray(self.stft(maybe_add_channel(
                np.asarray(example[NOISE_IMAGE]))))
            target_mask, noise_mask = biased_binary_mask(
                np.stack([speech, noise], axis=0),
                low_cut=self.opts.low_cut,
                high_cut=self.opts.high_cut,
            )
            example[M_K.SPEECH_MASK_TARGET] = target_mask
            example[M_K.NOISE_MASK_TARGET] = noise_mask
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
        reference_channel: int = 0
        collate: Dict = dict_func(dict(
            factory=Padder,
            to_torch=False,
            sort_by_key=NUM_SAMPLES,
            padding=False,
            padding_keys=None,
        ))
        audio_keys: List = field(
            default_factory=lambda: [OBSERVATION])
        segment_channels: bool = False
        shuffle: bool = True
        batch_size: int = 1
        batch_size_eval: int = 5
        num_workers: int = 4
        buffer_size: int = 20
        drop_last: bool = False
        time_segments: int = None
        time_segments_random_offset: bool = False
        train_dataset: str = 'train'
        validation_dataset: str = 'validation'
        test_dataset: str = 'test'

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
    def segment(self, example, exclude_keys=None):
        if exclude_keys is None:
            exclude_keys = []
        elif isinstance(exclude_keys, str):
            exclude_keys = [exclude_keys]
        segment_len = shift = self.opts.time_segments
        num_samples = example[NUM_SAMPLES]
        audio_keys = [key for key in example['audio_keys']
                      if key not in exclude_keys]

        offset = 0
        if self.opts.time_segments_random_offset:
            max_offset = num_samples % segment_len
            if max_offset > 0:
                offset = np.random.randint(0, max_offset)

        for key in audio_keys:
            example[key] = segment_axis(
                example[key][..., offset:num_samples], segment_len,
                shift=shift, axis=-1, end='cut')
        lengths = [example[key].shape[-2] for key in audio_keys]
        assert lengths.count(lengths[-1]) == len(lengths), {
            audio_keys[idx]: length
            for idx, length in enumerate(lengths)}
        length = lengths[0]
        if length == 0:
            raise FilterException('example too short to segment')
        out_list = []
        example[NUM_SAMPLES] = self.opts.time_segments
        for idx in range(length):
            new_example = deepcopy(example)
            for key in audio_keys:
                new_example[key] = new_example[key][..., idx, :]
            out_list.append(new_example)
        shuffle(out_list)
        return out_list

    def segment_channels(self, example, exclude_keys=None):
        if not isinstance(example, (tuple, list)):
            example = [example]
        if exclude_keys is None:
            exclude_keys = []
        elif isinstance(exclude_keys, str):
            exclude_keys = [exclude_keys]
        out_list = []
        num_channels = example[0][OBSERVATION].shape[0]
        for ex in example:
            audio_keys = [key for key, value in ex.items()
                          if isinstance(value, np.ndarray)
                          and key not in exclude_keys]
            for idx in range(num_channels):
                new_example = deepcopy(ex)
                for key in audio_keys:
                    signal = new_example[key]
                    if signal.shape[0] < num_channels:
                        signal = signal.swapaxes(0, 1)
                    assert signal.shape[0] == num_channels, signal.shape
                    new_example[key] = signal[idx, None]
                out_list.append(new_example)
        shuffle(out_list)
        return out_list

    # -- pipelines ----------------------------------------------------------
    def get_map_iterator(self, iterator, batch_size=None, prefetch=True,
                         unbatch=False, segment_channels=False):
        iterator = iterator.map(self.transform)
        if segment_channels:
            iterator = iterator.map(segment_channels)
            unbatch = True
        if prefetch:
            iterator = iterator.prefetch(
                self.opts.num_workers, self.opts.buffer_size,
                catch_filter_exception=True)
        if unbatch:
            iterator = iterator.unbatch()
        if batch_size is None:
            batch_size = self.opts.batch_size
        if batch_size is not None:
            iterator = iterator.batch(batch_size, self.opts.drop_last)
            iterator = iterator.map(self.collate)
        return iterator

    def get_train_iterator(self, time_segment=None):
        self.is_training = True
        iterator = self.database.get_dataset(self.opts.train_dataset)
        iterator = iterator.map(self.read_audio)
        iterator = iterator.map(self.to_train_structure)
        exclude_keys = None
        unbatch = False
        if self.opts.shuffle:
            iterator = iterator.shuffle(reshuffle=True)
        if self.opts.time_segments is not None or time_segment is not None:
            assert not (self.opts.time_segments and time_segment)
            iterator = iterator.map(
                partial(self.segment, exclude_keys=exclude_keys))
            unbatch = True
        if self.opts.segment_channels:
            seg = partial(self.segment_channels,
                          exclude_keys=exclude_keys)
        else:
            seg = False
        return self.get_map_iterator(
            iterator, self.opts.batch_size, segment_channels=seg,
            unbatch=unbatch)

    def get_eval_iterator(self, num_examples=-1):
        self.is_training = False
        iterator = self.database.get_dataset(self.opts.validation_dataset)
        iterator = iterator.map(self.read_audio)
        iterator = iterator.map(self.to_eval_structure)[:num_examples]
        return self.get_map_iterator(iterator, self.opts.batch_size_eval)

    def get_predict_iterator(self, dataset=None, num_examples=None,
                             iterable_apply_fn=None, filter_fn=None):
        self.is_training = False
        if dataset is None:
            dataset = self.opts.test_dataset
        iterator = self.database.get_dataset(dataset)
        iterator = iterator.map(self.read_audio)
        iterator = iterator.map(self.to_predict_structure)
        if num_examples is not None:
            iterator = iterator[:num_examples]
        if iterable_apply_fn is not None:
            iterator = iterator.apply(iterable_apply_fn)
        iterator = self.get_map_iterator(iterator, prefetch=False)
        if filter_fn is not None:
            iterator = iterator.filter(filter_fn)
        return iterator
