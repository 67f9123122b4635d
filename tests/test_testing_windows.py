"""Tests for the platform skip helper (ref: padertorch/testing/windows.py)."""
import sys
import pytest

from padertorch_tpu.testing import skip_on_windows


def test_noop_off_windows():
    assert not sys.platform.startswith('win')
    skip_on_windows()  # must not raise / skip here


def test_skips_on_windows(monkeypatch):
    monkeypatch.setattr(sys, 'platform', 'win32')
    with pytest.raises(pytest.skip.Exception):
        skip_on_windows()
