"""Host-side data transforms for the recipes.

Reference parity: ``padertorch/contrib/je/data/transforms.py`` —
``AudioReader``, numpy ``STFT``, ``MelTransform`` (host), ``LabelEncoder``
(persists its label map to the storage dir), ``MultiHotEncoder``,
``Collate``.  These run in the prefetch threads, not on device.
"""
import json
from pathlib import Path

import numpy as np

from padertorch_tpu.data.utils import collate_fn, pad_batch

__all__ = [
    'AudioReader',
    'STFT',
    'MelTransform',
    'LabelEncoder',
    'MultiHotEncoder',
    'Collate',
]


class AudioReader:
    """Read (and normalize) audio from example['audio_path'].

    Reference parity: ``je/data/transforms.py:20``.  Uses scipy's wav
    reader (no soundfile dependency in this environment).
    """

    def __init__(self, source_sample_rate=16000, target_sample_rate=16000,
                 average_channels=True, normalization_domain=None):
        self.source_sample_rate = source_sample_rate
        self.target_sample_rate = target_sample_rate
        self.average_channels = average_channels
        self.normalization_domain = normalization_domain

    def read_file(self, filepath):
        from scipy.io import wavfile
        sr, data = wavfile.read(filepath)
        if data.dtype.kind == 'i':
            data = data / np.iinfo(data.dtype).max
        data = np.asarray(data, dtype=np.float32)
        if data.ndim == 2:
            data = data.T  # (channels, samples)
        if sr != self.target_sample_rate:
            from scipy.signal import resample_poly
            import math
            g = math.gcd(sr, self.target_sample_rate)
            data = resample_poly(
                data, self.target_sample_rate // g, sr // g, axis=-1)
        return data

    def __call__(self, example):
        audio = self.read_file(example['audio_path'])
        if audio.ndim == 2 and self.average_channels:
            audio = audio.mean(0)
        if self.normalization_domain == 'instance':
            audio = audio / (np.abs(audio).max() + 1e-6)
        example['audio_data'] = audio
        example['seq_len'] = audio.shape[-1]
        return example


class STFT:
    """Host numpy STFT (same parameters as the device op).

    Reference parity: ``je/data/transforms.py:193``.
    """

    def __init__(self, shift, size, window_length=None, pad=True,
                 fading='full', window='blackman'):
        from padertorch_tpu.ops._stft import STFT as DeviceSTFT
        self._stft = DeviceSTFT(
            size=size, shift=shift, window_length=window_length, pad=pad,
            fading=fading, window=window,
            complex_representation='stacked')
        self.shift = shift
        self.size = size

    def __call__(self, example):
        audio = np.asarray(example['audio_data'])
        stft = np.asarray(self._stft(audio))
        example['stft'] = stft.astype(np.float32)
        if 'seq_len' in example:
            example['seq_len'] = self._stft.samples_to_frames(
                example['seq_len'])
        return example

    def samples_to_frames(self, samples):
        return self._stft.samples_to_frames(samples)


class MelTransform:
    """Host log-mel from stacked-complex STFT. Reference: transforms.py:332."""

    def __init__(self, sample_rate, stft_size, number_of_filters,
                 lowest_frequency=50, highest_frequency=None, log=True):
        from padertorch_tpu.contrib.je.modules.features import get_fbanks
        fbanks = get_fbanks(
            sample_rate, stft_size, number_of_filters,
            lowest_frequency=lowest_frequency,
            highest_frequency=highest_frequency,
        ).astype(np.float32)
        fbanks = fbanks / (fbanks.sum(axis=-1, keepdims=True) + 1e-6)
        self.fbanks = fbanks.T
        self.log = log

    def __call__(self, example):
        stft = example['stft']
        power = (stft[..., 0] ** 2 + stft[..., 1] ** 2)
        mel = power @ self.fbanks
        if self.log:
            mel = np.log(mel + 1e-12)
        example['mel'] = mel.astype(np.float32)
        return example


class LabelEncoder:
    """Map labels to indices; persists the map into the storage dir.

    Reference parity: ``je/data/transforms.py:343``.
    """

    def __init__(self, label_key='label', storage_dir=None, to_array=False):
        self.label_key = label_key
        self.storage_dir = storage_dir
        self.to_array = to_array
        self.label_mapping = None
        self.inverse_label_mapping = None

    def initialize_labels(self, labels=None, dataset=None, verbose=False):
        filename = f'{self.label_key}s.json'
        filepath = None if self.storage_dir is None \
            else Path(self.storage_dir) / filename
        if filepath and filepath.exists():
            labels = json.loads(filepath.read_text())
            if verbose:
                print(f'Restored {self.label_key}s from {filepath}')
        else:
            if labels is None:
                labels = set()
                for example in dataset:
                    value = example[self.label_key]
                    if isinstance(value, (list, tuple)):
                        labels.update(value)
                    else:
                        labels.add(value)
                labels = sorted(labels)
            if filepath:
                filepath.parent.mkdir(parents=True, exist_ok=True)
                filepath.write_text(json.dumps(labels))
                if verbose:
                    print(f'Saved {self.label_key}s to {filepath}')
        self.label_mapping = {
            label: i for i, label in enumerate(labels)}
        self.inverse_label_mapping = {
            i: label for label, i in self.label_mapping.items()}
        return self

    def __call__(self, example):
        value = example[self.label_key]
        if isinstance(value, (list, tuple)):
            encoded = [self.label_mapping[v] for v in value]
        else:
            encoded = self.label_mapping[value]
        if self.to_array:
            encoded = np.asarray(encoded)
        example[self.label_key] = encoded
        return example

    def inverse_transform(self, indices):
        if isinstance(indices, (list, tuple, np.ndarray)):
            return [self.inverse_label_mapping[int(i)] for i in indices]
        return self.inverse_label_mapping[int(indices)]


class MultiHotEncoder(LabelEncoder):
    """Multi-hot label vectors. Reference: ``je/data/transforms.py:402``."""

    def __init__(self, label_key='events', storage_dir=None):
        super().__init__(label_key=label_key, storage_dir=storage_dir)

    def __call__(self, example):
        values = example[self.label_key]
        if not isinstance(values, (list, tuple)):
            values = [values]
        multi_hot = np.zeros(len(self.label_mapping), dtype=np.float32)
        for v in values:
            multi_hot[self.label_mapping[v]] = 1.0
        example[self.label_key] = multi_hot
        return example


class Collate:
    """Batch list -> dict of padded stacks. Reference: transforms.py:537."""

    def __init__(self, to_tensor=False, pad_keys=None, pad_axis=0):
        self.to_tensor = to_tensor
        self.pad_keys = pad_keys
        self.pad_axis = pad_axis

    def __call__(self, batch):
        batch = collate_fn(batch)
        out = {}
        for key, values in batch.items():
            if isinstance(values, (list, tuple)) and len(values) > 0 \
                    and isinstance(values[0], np.ndarray):
                if self.pad_keys is None or key in self.pad_keys:
                    stacked, lens = pad_batch(
                        list(values), axis=self.pad_axis)
                    out[key] = stacked
                    continue
            if isinstance(values, (list, tuple)) and len(values) > 0 \
                    and np.isscalar(values[0]):
                out[key] = np.asarray(values)
            else:
                out[key] = values
        return out
