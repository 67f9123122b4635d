"""Test database fixtures.

Reference parity: ``padertorch/testing/test_db.py:144`` (``MnistDatabase``).
The reference downloads real MNIST from a mirror; this environment has no
egress, so a deterministic synthetic stand-in with the same API and example
schema (``{'image': float32 [28, 28], 'digit': int64, 'example_id': str}``)
is generated instead: each class has a fixed random template and examples
are noisy template variations — linearly separable, so the burn test's
"loss must change" assertion and classifier recipes behave like on MNIST.
"""
import numpy as np

from padertorch_tpu.data import dataset as lazy

__all__ = ['MnistDatabase']


class MnistDatabase:
    """Synthetic MNIST-like database exposed as lazy datasets."""

    dataset_names = ('train', 'test')

    def __init__(self, num_train=256, num_test=64, num_classes=10, seed=0):
        self.num_train = num_train
        self.num_test = num_test
        self.num_classes = num_classes
        self.seed = seed
        self._cache = {}

    def _generate(self, name):
        if name in self._cache:
            return self._cache[name]
        assert name in self.dataset_names, (name, self.dataset_names)
        rng = np.random.RandomState(self.seed)
        templates = rng.rand(self.num_classes, 28, 28).astype(np.float32)
        n = self.num_train if name == 'train' else self.num_test
        # distinct noise per split
        split_rng = np.random.RandomState(
            self.seed + (1 if name == 'train' else 2))
        examples = {}
        for i in range(n):
            digit = int(split_rng.randint(self.num_classes))
            noise = split_rng.rand(28, 28).astype(np.float32)
            image = np.clip(0.7 * templates[digit] + 0.3 * noise, 0, 1)
            examples[f'{name}_{i}'] = {
                'example_id': f'{name}_{i}',
                'image': image,
                'digit': digit,
            }
        self._cache[name] = examples
        return examples

    def get_dataset(self, name):
        if isinstance(name, (list, tuple)):
            parts = [self.get_dataset(n) for n in name]
            out = parts[0]
            for p in parts[1:]:
                out = out + p
            return out
        return lazy.from_dict(self._generate(name))
