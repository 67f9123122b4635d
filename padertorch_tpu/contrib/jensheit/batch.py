"""Batch collation with optional per-key padding.

Reference parity: ``padertorch/contrib/jensheit/batch.py`` (``Padder``).
The reference's ``to_torch`` converts to torch tensors; here batches stay
numpy (host side) — device transfer happens in the Trainer — so the flag
only controls whether stacked arrays are produced at all.
"""
import numpy as np

from padertorch_tpu.configurable import Configurable
from padertorch_tpu.data.utils import collate_fn, pad_tensor

__all__ = ['Padder']


class Padder(Configurable):
    def __init__(self, to_torch: bool = False, sort_by_key: str = None,
                 padding: bool = True, padding_keys: list = None):
        """
        Args:
            to_torch: parity flag (reference converts to torch here);
                arrays stay numpy — the Trainer moves them to device.
            sort_by_key: sort the batch by this key, descending (the
                reference needs it for PackedSequence; masks here don't,
                but deterministic order helps bucketing).
            padding: if False only collate; if True pad every numpy
                array with exactly one varying dim size.
            padding_keys: restrict padding to these keys (default: all).
        """
        assert not (to_torch and not padding), (
            'to_torch requires padding=True (reference semantics)')
        self.to_torch = to_torch
        self.padding = padding
        self.padding_keys = padding_keys
        self.sort_by_key = sort_by_key

    def pad_batch(self, batch):
        if isinstance(batch[0], np.ndarray):
            if batch[0].ndim > 0:
                dims = np.array(
                    [[idx for idx in array.shape] for array in batch]).T
                axis = [idx for idx, dim in enumerate(dims)
                        if not all(dim == dim[0])]
                assert len(axis) in [0, 1], (
                    f'only one axis is allowed to differ, '
                    f'axis={axis} and dims={dims}')
                dtypes = [vec.dtype for vec in batch]
                assert dtypes.count(dtypes[-1]) == len(dtypes), dtypes
                if len(axis) == 1:
                    axis = axis[0]
                    pad = max(dims[axis])
                    array = np.stack(
                        [pad_tensor(vec, pad, axis) for vec in batch],
                        axis=0)
                else:
                    array = np.stack(batch, axis=0)
                return array.astype(dtypes[0])
            return np.array(batch)
        elif isinstance(batch[0], int):
            return np.array(batch)
        return batch

    def sort(self, batch):
        return sorted(
            batch, key=lambda x: x[self.sort_by_key], reverse=True)

    def __call__(self, unsorted_batch):
        """Collate a list of example dicts; optionally pad."""
        batch = self.sort(unsorted_batch) if self.sort_by_key \
            else unsorted_batch
        nested_batch = collate_fn(batch)

        if not self.padding:
            assert self.padding_keys is None or not self.padding_keys, (
                'Padding keys have to be None or empty if padding is '
                'False, but they are:', self.padding_keys)
            return nested_batch

        if self.padding_keys is None:
            padding_keys = nested_batch.keys()
        else:
            assert len(self.padding_keys) > 0, (
                'Empty padding key list was provided, default is None')
            padding_keys = self.padding_keys

        def nested_padding(value, key):
            if isinstance(value, dict):
                return {k: nested_padding(v, k) for k, v in value.items()}
            if key in padding_keys:
                return self.pad_batch(value)
            return value

        return {key: nested_padding(value, key)
                for key, value in nested_batch.items()}
