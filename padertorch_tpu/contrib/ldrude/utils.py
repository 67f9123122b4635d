"""Experiment folder helpers. Reference parity: ``padertorch/contrib/ldrude/utils.py``."""
import re
from pathlib import Path

from padertorch_tpu.io import get_new_subdir

__all__ = ['get_new_folder', 'get_last_sacred_dir', 'get_last_child',
           'has_checkpoints', 'represents_int',
           'decorator_append_file_storage_observer_with_lazy_basedir']


def represents_int(s):
    """True when ``s`` parses as int (ref ldrude/utils.py:100)."""
    try:
        int(s)
        return True
    except ValueError:
        return False


def _natural_key(path):
    return [int(t) if t.isdigit() else t
            for t in re.split(r'(\d+)', path.name)]


def get_last_child(path, glob_string='*', condition_fn=None):
    """Naturally-last matching child of ``path``, or None.

    Reference parity: ``ldrude/utils.py:108`` (natsort by name).
    """
    candidates = [
        p for p in sorted(Path(path).glob(glob_string), key=_natural_key)
        if condition_fn is None or condition_fn(p)
    ]
    return candidates[-1] if candidates else None


def has_checkpoints(model_dir):
    """True when ``model_dir/checkpoints`` holds ``ckpt_*`` files
    (ref ldrude/utils.py:129; repo checkpoint contract
    ``train/trainer.py`` storage layout)."""
    checkpoint_dir = Path(model_dir) / 'checkpoints'
    return checkpoint_dir.is_dir() \
        and len(list(checkpoint_dir.glob('ckpt_*'))) > 0


def get_new_folder(basedir, try_id=None, mkdir=True):
    del try_id
    return get_new_subdir(basedir, id_naming='index', mkdir=mkdir)


def get_last_sacred_dir(basedir):
    """Highest-numbered existing run dir (reference ldrude/utils.py:120)."""
    basedir = Path(basedir)
    candidates = [
        (int(p.name), p) for p in basedir.glob('*')
        if re.fullmatch(r'\d+', p.name)
    ]
    assert candidates, f'No numbered sub dirs in {basedir}'
    return max(candidates)[1]


def decorator_append_file_storage_observer_with_lazy_basedir(
        experiment, *, consider_mpi=False, observer_cls=None):
    """Append a FileStorageObserver whose basedir is resolved lazily by
    a captured function (reference ldrude/utils.py:134): the observer
    is registered at module-import time, but the storage dir usually
    depends on config values that only exist once the run starts.

    ``experiment`` is a sacred-style object exposing ``capture`` and
    ``observers``.  ``observer_cls`` defaults to sacred's
    ``FileStorageObserver``; pass any class accepting ``basedir=None``
    to use the lazy-resolution machinery without sacred installed.
    """
    import functools
    import os as _os

    if observer_cls is None:
        try:
            from sacred.observers import FileStorageObserver as observer_cls
        except ImportError:
            raise ImportError(
                'decorator_append_file_storage_observer_with_lazy_basedir '
                'needs sacred (or pass observer_cls=...).') from None

    def wrapper(func):
        captured_func = experiment.capture(func)

        class FileStorageObserverLazyBasedir(observer_cls):
            @property
            @functools.lru_cache()
            def basedir(self):
                basedir = captured_func()
                if basedir is None:
                    raise ValueError(
                        f'Captured function {func} returned None.\n'
                        'Expect that it returns the basedir for the '
                        'observer.')
                if not _os.path.exists(basedir):
                    _os.makedirs(basedir)
                return Path(basedir).expanduser().resolve()

            @basedir.setter
            def basedir(self, value):
                assert value is None, value

            def __hash__(self):
                return id(self)

        observer = FileStorageObserverLazyBasedir(basedir=None)
        if consider_mpi:
            from padertorch_tpu.evaluation.parallel import RANK
            if RANK != 0:
                return func
        experiment.observers.append(observer)
        return func

    return wrapper
