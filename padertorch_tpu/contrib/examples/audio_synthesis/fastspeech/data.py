"""Synthetic token -> mel data for the FastSpeech recipe.

Each token id owns a fixed spectral template (a smooth bump whose mel
position scales with the id plus a harmonic); an utterance is a random
token sequence where every token is held for a random integer number
of frames — so teacher durations are exact by construction and the
acoustic mapping is deterministic (learnable to near-zero error).
"""
import numpy as np

from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.data.utils import collate_fn, pad_batch

N_MELS = 80
VOCAB_SIZE = 12  # ids 1..11; 0 is padding


def _token_template(token, n_mels=N_MELS):
    """Deterministic per-token spectral envelope (log-mel-like)."""
    bins = np.arange(n_mels)
    center = 6.0 * token + 4.0
    env = np.exp(-0.5 * ((bins - center) / 3.0) ** 2)
    env = env + 0.4 * np.exp(-0.5 * ((bins - 2 * center) / 5.0) ** 2)
    return np.log(env + 1e-3).astype('float32')


def synthetic_database(num_examples=32, min_tokens=3, max_tokens=8,
                       min_dur=4, max_dur=10, seed=0):
    rng = np.random.RandomState(seed)
    examples = {}
    for i in range(num_examples):
        n = rng.randint(min_tokens, max_tokens + 1)
        tokens = rng.randint(1, VOCAB_SIZE, size=n)
        durations = rng.randint(min_dur, max_dur + 1, size=n)
        mel = np.concatenate([
            np.tile(_token_template(t), (d, 1))
            for t, d in zip(tokens, durations)
        ], axis=0)  # (T, M)
        mel = mel + 0.05 * rng.randn(*mel.shape).astype('float32')
        examples[f'utt_{i}'] = {
            'example_id': f'utt_{i}',
            'tokens': tokens.astype('int32'),
            'durations': durations.astype('int32'),
            'mel': mel.astype('float32'),
        }
    return lazy.from_dict(examples)


def post_batch(batch):
    batch = collate_fn(batch)
    tokens, token_lengths = pad_batch(batch['tokens'], axis=-1)
    durations, _ = pad_batch(batch['durations'], axis=-1)
    mel, num_frames = pad_batch(batch['mel'], axis=0)
    return {
        'example_id': list(batch['example_id']),
        'tokens': tokens,
        'token_lengths': np.asarray(token_lengths, dtype='int32'),
        'durations': durations,
        'mel': mel,
        'num_frames': np.asarray(num_frames, dtype='int32'),
    }


def prepare_dataset(dataset, batch_size=8, shuffle=True, prefetch=True):
    if shuffle:
        dataset = dataset.shuffle(buffer_size=64)
    dataset = dataset.batch(batch_size).map(post_batch)
    if prefetch:
        dataset = dataset.prefetch(4, 8)
    return dataset
