"""Run every module-level doctest in the package.

Reference parity: the reference CI runs ``pytest --doctest-modules``
over the package (SURVEY.md §4).  Here modules are auto-discovered (any
``.py`` under ``padertorch_tpu`` containing a ``>>>`` prompt) and each
runs as one parametrized test, so a failing example names its module.
"""
import doctest
import importlib
import pkgutil
from pathlib import Path

import pytest

import padertorch_tpu

PKG_ROOT = Path(padertorch_tpu.__file__).parent

# modules whose import or doctests need resources this environment
# doesn't have (network weights, real databases, matplotlib display)
SKIP = set()


def _modules_with_doctests():
    names = []
    for path in sorted(PKG_ROOT.rglob('*.py')):
        try:
            text = path.read_text()
        except OSError:  # pragma: no cover
            continue
        if '>>> ' not in text:
            continue
        rel = path.relative_to(PKG_ROOT.parent).with_suffix('')
        name = '.'.join(rel.parts)
        if name.endswith('.__init__'):
            name = name[:-len('.__init__')]
        if name in SKIP:
            continue
        names.append(name)
    return names


@pytest.mark.parametrize('module_name', _modules_with_doctests())
def test_module_doctests(module_name):
    module = importlib.import_module(module_name)
    from padertorch_tpu import random as ptrandom
    ptrandom.seed(0)
    result = doctest.testmod(
        module, optionflags=doctest.NORMALIZE_WHITESPACE
        | doctest.ELLIPSIS)
    assert result.failed == 0, (
        f'{result.failed}/{result.attempted} doctests failed '
        f'in {module_name}')
