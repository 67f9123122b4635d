"""Experiment bookkeeping helpers.

Reference parity: ``padertorch/contrib/jensheit/utils.py``.
"""
import json
from pathlib import Path
from warnings import warn

from padertorch_tpu.configurable import class_to_str
from padertorch_tpu.utils.nested import flatten

__all__ = ['dict_compare', 'compare_configs', 'get_experiment_name']


def dict_compare(d1, d2):
    """-> (added, removed, modified, same, are_equal) of two flat dicts.

    >>> added, removed, modified, same, eq = dict_compare(
    ...     {'a': 1, 'b': 2}, {'b': 3, 'c': 4})
    >>> sorted(added), sorted(removed), sorted(modified), eq
    (['a'], ['c'], ['b'], False)
    """
    d1_keys = set(d1.keys())
    d2_keys = set(d2.keys())
    intersect = d1_keys & d2_keys
    added = d1_keys - d2_keys
    removed = d2_keys - d1_keys
    modified = {o: (d1[o], d2[o]) for o in intersect if d1[o] != d2[o]}
    same = set(o for o in intersect if d1[o] == d2[o])
    are_equal = not added and not removed and not modified
    return added, removed, modified, same, are_equal


def compare_configs(storage_dir, trainer_opts, provider_opts):
    """Warn about option drift vs the stored ``init.json``; return the
    stored (trainer_opts, provider_opts)."""
    opts = flatten(trainer_opts)
    opts.update(flatten(provider_opts))
    init = json.loads((Path(storage_dir) / 'init.json').read_text())

    added, removed, modified, _, _ = dict_compare(opts, flatten(init))
    if added:
        warn(f'The following options were added to the model: {added}')
    if removed:
        warn(f'The following options were removed from the model: '
             f'{removed}')
    return init['trainer_opts'], init['provider_opts']


def get_experiment_name(model_opts, submodel=None):
    """``<ModelClass>/<SubmodelClass-or-baseline>`` experiment name."""
    model_name = class_to_str(model_opts['factory'])
    assert isinstance(model_name, str), (model_name, type(model_name))
    model_name = model_name.split('.')[-1]
    if submodel is not None:
        sub_name = class_to_str(model_opts[submodel]['factory'])
        assert isinstance(sub_name, str), (sub_name, type(sub_name))
        sep_name = sub_name.split('.')[-1]
    else:
        sep_name = 'baseline'
    return f'{model_name}/{sep_name}'
