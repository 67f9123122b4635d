"""Experiment folder helpers. Reference parity: ``padertorch/contrib/ldrude/utils.py``."""
import re
from pathlib import Path

from padertorch_tpu.io import get_new_subdir

__all__ = ['get_new_folder', 'get_last_sacred_dir', 'get_last_child',
           'has_checkpoints', 'represents_int']


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
