"""Platform skip helper. Reference parity: ``padertorch/testing/windows.py``.

The trainer's checkpoint directory contract uses file symlinks
(``ckpt_latest``/``ckpt_best_<metric>``), which non-admin Windows users
cannot create — tests exercising training skip there.
"""
import sys

__all__ = ['skip_on_windows']


def skip_on_windows():
    """Skip the current pytest test when running on Windows."""
    if sys.platform.startswith('win'):
        import pytest
        pytest.skip(
            'Training is not possible on Windows: the checkpoint '
            'directory contract needs file symlinks, which are '
            'unavailable for non-admin users.')
