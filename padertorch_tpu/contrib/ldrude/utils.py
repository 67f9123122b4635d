"""Experiment folder helpers. Reference parity: ``padertorch/contrib/ldrude/utils.py``."""
import re
from pathlib import Path

from padertorch_tpu.io import get_new_subdir

__all__ = ['get_new_folder', 'get_last_sacred_dir']


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
