"""Filesystem helpers.

Reference parity: ``padertorch/contrib/mk/io.py``.
"""
import os
from pathlib import Path
from typing import List, Tuple

__all__ = ['run_fast_scandir']


def run_fast_scandir(dir: Path, ext: List[str]) -> Tuple[list, list]:
    """Recursively scan ``dir``; return (subfolders, files with a suffix
    in ``ext``).  ``ext`` entries include the dot, e.g. ``['.wav']``.

    >>> import tempfile, os
    >>> d = tempfile.mkdtemp()
    >>> os.makedirs(f'{d}/a/b')
    >>> _ = open(f'{d}/a/x.wav', 'w'); _ = open(f'{d}/a/b/y.txt', 'w')
    >>> subfolders, files = run_fast_scandir(d, ['.wav'])
    >>> [f.name for f in files]
    ['x.wav']
    >>> len(subfolders)
    2
    """
    subfolders, files = [], []
    for f in os.scandir(dir):
        if f.is_dir():
            subfolders.append(f.path)
        if f.is_file():
            if os.path.splitext(f.name)[1].lower() in ext:
                files.append(Path(f.path))
    for sub in list(subfolders):
        sf, fl = run_fast_scandir(sub, ext)
        subfolders.extend(sf)
        files.extend(fl)
    return subfolders, files
