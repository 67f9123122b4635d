"""Pickle-free checkpoint serialization.

Replaces the reference's ``torch.save``/``torch.load`` (pickle-based) with a
zip of ``arrays.npz`` + a JSON structure descriptor — safe to load from
untrusted storage, fast for large arrays, and independent of class layouts
(the state is plain nested dicts/lists of arrays and scalars, like torch
state dicts).
"""
import io
import json
import zipfile
from pathlib import Path

import numpy as np

__all__ = ['dump_state', 'load_state']

_MAGIC = 'padertorch_tpu-state-v1'


def _encode(obj, arrays):
    if isinstance(obj, dict):
        return {
            'k': 'dict',
            'items': [[k, _encode(v, arrays)] for k, v in obj.items()],
        }
    if isinstance(obj, (list, tuple)):
        return {
            'k': 'list' if isinstance(obj, list) else 'tuple',
            'items': [_encode(v, arrays) for v in obj],
        }
    if isinstance(obj, np.generic):
        obj = obj.item()
    if hasattr(obj, 'shape') and hasattr(obj, 'dtype'):
        idx = len(arrays)
        arrays.append(np.asarray(obj))
        return {'k': 'array', 'i': idx}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {'k': 'json', 'v': obj}
    raise TypeError(
        f'Cannot serialize object of type {type(obj).__name__}: {obj!r}. '
        'Checkpoint states must be nested dicts/lists of arrays and '
        'JSON-serializable scalars.'
    )


def _decode(enc, arrays):
    kind = enc['k']
    if kind == 'dict':
        return {k: _decode(v, arrays) for k, v in enc['items']}
    if kind == 'list':
        return [_decode(v, arrays) for v in enc['items']]
    if kind == 'tuple':
        return tuple(_decode(v, arrays) for v in enc['items'])
    if kind == 'array':
        return arrays[f'a{enc["i"]}']
    if kind == 'json':
        return enc['v']
    raise ValueError(f'Unknown state entry kind {kind!r}')


def dump_state(state, path):
    """Write a nested state (dicts/lists of arrays + scalars) to ``path``.

    The write is atomic: a temp file is renamed into place, so a crash
    mid-checkpoint never corrupts an existing checkpoint.
    """
    path = Path(path)
    arrays = []
    structure = _encode(state, arrays)
    buf = io.BytesIO()
    np.savez(buf, **{f'a{i}': a for i, a in enumerate(arrays)})
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + '.tmp')
    with zipfile.ZipFile(tmp, 'w', zipfile.ZIP_STORED) as zf:
        zf.writestr('MAGIC', _MAGIC)
        zf.writestr('structure.json', json.dumps(structure))
        zf.writestr('arrays.npz', buf.getvalue())
    tmp.replace(path)
    return path


def load_state(path):
    """Load a state written by :func:`dump_state`.

    ``path`` may also be a file-like object (e.g. a ``BytesIO`` of
    broadcast checkpoint bytes in multi-process runs).
    """
    if not hasattr(path, 'read'):
        path = Path(path)
    with zipfile.ZipFile(path, 'r') as zf:
        magic = zf.read('MAGIC').decode()
        if magic != _MAGIC:
            raise ValueError(f'Not a padertorch_tpu state file: {path}')
        structure = json.loads(zf.read('structure.json'))
        with zf.open('arrays.npz') as f:
            arrays = np.load(io.BytesIO(f.read()))
            return _decode(structure, arrays)


# -- orbax backend (multi-host / sharded / production checkpoints) --------
def _split_arrays(state, _path=()):
    """Split a nested dict into (array tree, json-able metadata tree)."""
    import numpy as np
    import jax
    arrays = {}
    meta = {}
    for key, value in state.items():
        if isinstance(value, dict):
            a, m = _split_arrays(value, _path + (key,))
            if a:
                arrays[key] = a
            meta[key] = m
        elif isinstance(value, (jax.Array, np.ndarray)):
            arrays[key] = value
            meta[key] = '__array__'
        else:
            meta[key] = value
    return arrays, meta


def _merge_arrays(meta, arrays):
    out = {}
    for key, value in meta.items():
        if isinstance(value, dict):
            out[key] = _merge_arrays(value, arrays.get(key, {}))
        elif value == '__array__':
            out[key] = arrays[key]
        else:
            out[key] = value
    return out


def dump_state_orbax(state, path):
    """Save a trainer/module state dict with orbax.

    Arrays go through ``orbax.checkpoint`` (sharded arrays are written
    distributed — each host saves its shards, unlike the npz backend
    which gathers to one host); everything else lands in
    ``meta.json``.  ``path`` becomes a directory.

    Atomic: writes into a sibling tmp directory and renames it into
    place, so a crash mid-save never destroys an existing checkpoint
    (matching the ptt backend's tmp+rename).  Non-JSON meta values fail
    loudly at save time instead of being silently stringified.
    """
    import json
    import os
    import shutil
    import orbax.checkpoint as ocp
    from pathlib import Path
    path = Path(path).absolute()
    tmp = path.with_name(f'{path.name}.tmp{os.getpid()}')
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    try:
        arrays, meta = _split_arrays(state)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(tmp / 'arrays', arrays)
        ckptr.wait_until_finished()
        try:
            meta_json = json.dumps(meta, allow_nan=True)
        except TypeError as e:
            raise TypeError(
                f'Checkpoint meta state contains a non-JSON value; '
                f'refusing to save a checkpoint that cannot restore. '
                f'({e})') from e
        (tmp / 'meta.json').write_text(meta_json)
        if path.exists():
            old = path.with_name(f'{path.name}.old{os.getpid()}')
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
        else:
            os.rename(tmp, path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_state_orbax(path):
    """Load a state dict written by :func:`dump_state_orbax`."""
    import json
    import orbax.checkpoint as ocp
    from pathlib import Path
    path = Path(path).absolute()
    meta = json.loads((path / 'meta.json').read_text())
    ckptr = ocp.StandardCheckpointer()
    arrays = ckptr.restore(path / 'arrays')
    return _merge_arrays(meta, arrays)
