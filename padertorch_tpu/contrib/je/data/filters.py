"""Example filter predicates for dataset pipelines.

Reference parity: ``padertorch/contrib/je/data/utils.py``/filters — small
predicates used with ``dataset.filter``.
"""

from padertorch_tpu.utils.misc import to_list

__all__ = ['MinLengthFilter', 'MaxLengthFilter', 'KeyPresenceFilter',
           'DiscardLabelsFilter', 'RestrictLabelsFilter']


class DiscardLabelsFilter:
    """Drop examples whose ``key`` contains any of ``names``
    (reference ``je/data/filters.py:4``).

    >>> DiscardLabelsFilter('events', 'dog')({'events': ['cat', 'dog']})
    False
    >>> DiscardLabelsFilter('events', 'dog')({'events': 'cat'})
    True
    """

    def __init__(self, key, names):
        self.key = key
        self.names = to_list(names)

    def __call__(self, example):
        return not any(
            name in to_list(example[self.key]) for name in self.names)


class RestrictLabelsFilter:
    """Keep only examples whose ``key`` contains one of ``names``
    (reference ``je/data/filters.py:13``).

    >>> RestrictLabelsFilter('events', 'dog')({'events': ['cat', 'dog']})
    True
    >>> RestrictLabelsFilter('events', 'dog')({'events': 'cat'})
    False
    """

    def __init__(self, key, names):
        self.key = key
        self.names = to_list(names)

    def __call__(self, example):
        return any(
            name in to_list(example[self.key]) for name in self.names)


class MinLengthFilter:
    """Keep examples at least ``min_length`` long.

    >>> MinLengthFilter(5)({'num_samples': 10})
    True
    """

    def __init__(self, min_length, key='num_samples'):
        self.min_length = min_length
        self.key = key

    def __call__(self, example):
        return example[self.key] >= self.min_length


class MaxLengthFilter:
    def __init__(self, max_length, key='num_samples'):
        self.max_length = max_length
        self.key = key

    def __call__(self, example):
        return example[self.key] <= self.max_length


class KeyPresenceFilter:
    def __init__(self, keys):
        from padertorch_tpu.utils.misc import to_list
        self.keys = to_list(keys)

    def __call__(self, example):
        return all(k in example for k in self.keys)
