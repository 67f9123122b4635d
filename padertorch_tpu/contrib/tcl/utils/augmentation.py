"""Dynamic waveform augmentation (additive noise/music/speech + reverb).

Reference parity: ``padertorch/contrib/tcl/utils/augmentation.py:11``
(``AugmentationHelper``) — a data-pipeline map that, with probability
``p_augment``, mixes a randomly chosen augmentation signal into the
observation at a random SNR, and with probability ``p_reverb``
convolves a randomly chosen room impulse response first.  Runs
host-side in the (numpy) data pipeline, exactly where it belongs on
TPU: the training graph stays static while augmentation happens in the
async prefetch workers.

Differences from the reference: augmentation examples may carry
in-memory audio under ``audio_data`` (preferred in this zero-egress
environment) or file paths under ``audio_path`` (loaded with
``soundfile`` when available); deterministic mode hashes the
``example_id`` into the RNG seed instead of paderbox's
``str_to_random_state``.
"""
import hashlib
import typing as tp

import numpy as np
from scipy.signal import fftconvolve

from padertorch_tpu.data import dataset as lazy

__all__ = ['AugmentationHelper']


def _str_to_rng(s: str) -> np.random.RandomState:
    digest = hashlib.sha256(s.encode()).digest()
    return np.random.RandomState(
        int.from_bytes(digest[:4], 'little'))


def _load_audio(example, key):
    """Fetch augmentation audio: in-memory ``audio_data`` first, else
    load ``audio_path`` from disk."""
    if 'audio_data' in example and key in example['audio_data']:
        return np.asarray(example['audio_data'][key], np.float64)
    path = example['audio_path'][key]
    import soundfile  # gated: only needed for on-disk datasets
    data, _ = soundfile.read(path)
    return np.asarray(data, np.float64).T


class AugmentationHelper:
    """Map over a dataset of examples with
    ``example['audio_data'][augmentation_key]`` (1-D observation).

    Args:
        augmentation_datasets: dict type -> Dataset (or list of
            Datasets, concatenated) of augmentation examples; the
            ``'reverb'`` entry holds RIR examples under
            ``audio_path/audio_data['rir']``.
        p_augment: probability to apply additive augmentation.
        p_reverb: probability to reverberate (defaults to p_augment).
        augmentation_type: subset of
            ('noise', 'music', 'speech', 'speech_single', 'reverb').
        deterministic: derive the RNG from ``example_id``.
        augmentation_key: key of the observation to augment.
        target_key: key under which the clean signal is preserved.
    """

    def __init__(self, augmentation_datasets: tp.Dict = None,
                 p_augment: float = 0., p_reverb=None,
                 augmentation_type=('noise', 'music', 'speech',
                                    'reverb'),
                 deterministic: bool = False,
                 augmentation_key='observation',
                 target_key='speech_image'):
        self.augmentation_dataset = dict(augmentation_datasets or {})
        for k, v in self.augmentation_dataset.items():
            if isinstance(v, (list, tuple)):
                ds = v[0]
                for d in v[1:]:
                    ds = ds + d
                self.augmentation_dataset[k] = ds
            assert isinstance(self.augmentation_dataset[k],
                              lazy.Dataset), (k, type(v))
        self.p_augment = p_augment
        self.p_reverb = p_augment if p_reverb is None else p_reverb
        self.deterministic = deterministic
        self.augmentation_key = augmentation_key
        self.target_key = target_key
        # per-type SNR ranges / example counts (MUSAN conventions,
        # ref augmentation.py:45)
        self.augment_options = {
            'noise': {},
            'music': {},
            'speech_single': {'snr': (10, 20)},
            'speech': {'snr': (13, 20), 'n_examples': (3, 7)},
        }
        self.augment_types = []
        self.reverb = False
        for aug in augmentation_type:
            if aug == 'reverb':
                self.reverb = True
            else:
                self.augment_types.append(aug)

    def __call__(self, example):
        example['audio_data'][self.target_key] = \
            example['audio_data'][self.augmentation_key][None, ...]
        if self.deterministic:
            rng = _str_to_rng(example['example_id'])
        else:
            rng = np.random.RandomState()
        if self.reverb and rng.uniform() < self.p_reverb:
            example = self.reverb_augmentation(example, rng)
        if self.augment_types and rng.uniform() < self.p_augment:
            aug_type = rng.choice(self.augment_types)
            example = self.additive_augmentation(
                example, rng, aug_type,
                **self.augment_options.get(aug_type, {}))
        return example

    @staticmethod
    def pad_and_sum(audio_data, rng=np.random):
        """Sum variable-length signals at random offsets into the
        longest one's span (ref augmentation.py:82)."""
        max_len = max(len(x) for x in audio_data)
        out = np.zeros(max_len)
        for x in audio_data:
            slack = max_len - len(x)
            offset = rng.randint(0, slack) if slack > 0 else 0
            out[offset:offset + len(x)] += x
        return out

    @staticmethod
    def get_scaling_factor(observation, augmentation, snr):
        """Gain applied to the augmentation so the mixture hits the
        requested SNR given current powers (ref augmentation.py:95)."""
        obs_power = np.mean(observation ** 2, keepdims=True)
        aug_power = np.maximum(
            np.mean(augmentation ** 2, keepdims=True), 1e-30)
        current_snr = 10 * np.log10(
            np.maximum(obs_power, 1e-30) / aug_power)
        factor = 10 ** (-(snr - current_snr) / 20)
        factor = np.asarray(factor)
        while factor.ndim > 1:
            factor = factor[0]
        return factor

    def reverb_augmentation(self, example, rng):
        rir_example = self.augmentation_dataset['reverb'].random_choice(
            1, rng_state=rng)[0]
        rir = _load_audio(rir_example, 'rir')
        rir = np.atleast_2d(rir)
        if rir.ndim == 3:  # (positions, channels, taps)
            rir = rir[rng.randint(0, len(rir))]
        rir = rir[rng.randint(0, rir.shape[0])]
        example['audio_data']['rir'] = rir
        example['audio_data'][self.augmentation_key] = fftconvolve(
            rir, example['audio_data'][self.augmentation_key])
        return example

    def additive_augmentation(self, example, rng, augmentation_type,
                              snr=(0, 15), n_examples=1):
        if isinstance(n_examples, tuple):
            n_examples = rng.randint(*n_examples)
        ds = self.augmentation_dataset[augmentation_type]
        picked = ds.random_choice(
            n_examples, rng_state=rng,
            # sample with replacement when the pool is smaller than
            # the draw (tiny augmentation sets would otherwise raise)
            replace=n_examples > len(ds))
        signals = [_load_audio(ex, self.augmentation_key)
                   for ex in picked]
        if n_examples > 1:
            augmentation = self.pad_and_sum(signals, rng=rng)
        else:
            augmentation = signals[0]
        snr_value = rng.uniform(*snr)
        obs = example['audio_data'][self.augmentation_key]
        scale = self.get_scaling_factor(obs, augmentation, snr_value)
        augmentation = augmentation * scale
        n = len(obs)
        if len(augmentation) >= n:
            example['audio_data'][self.augmentation_key] = \
                obs + augmentation[:n]
        else:
            offset = rng.randint(0, n - len(augmentation))
            obs = np.array(obs)
            obs[offset:offset + len(augmentation)] += augmentation
            example['audio_data'][self.augmentation_key] = obs
        return example
