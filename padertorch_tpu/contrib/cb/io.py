"""Experiment folder + Makefile helpers.

Reference parity: ``padertorch/contrib/cb/io.py`` — ``get_new_folder``
and ``SimpleMakefile`` (written into experiment dirs so re-run/eval
commands are one ``make`` away).
"""
from pathlib import Path

from padertorch_tpu.io import get_new_subdir

__all__ = ['get_new_folder', 'SimpleMakefile']


def get_new_folder(basedir, try_id=None, mkdir=True, consider_mpi=False):
    """Successively numbered new folder under basedir (cb/io.py:11)."""
    del try_id
    return get_new_subdir(
        basedir, id_naming='index', mkdir=mkdir, consider_mpi=consider_mpi)


class SimpleMakefile:
    """Collect make targets and write a Makefile (cb/io.py:105).

    >>> m = SimpleMakefile()
    >>> m += 'train:'
    >>> m += '\\tpython -m myexp.train'
    >>> m.text == 'train:\\n\\tpython -m myexp.train\\n'
    True
    """

    def __init__(self):
        self.lines = []

    def __iadd__(self, line):
        self.lines.append(line)
        return self

    @property
    def text(self):
        return '\n'.join(self.lines) + '\n'

    def dump(self, path):
        path = Path(path)
        if path.is_dir():
            path = path / 'Makefile'
        path.write_text(self.text)
        return path
