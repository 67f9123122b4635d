"""Tests for contrib/mk utility modules + cb InspectorHook."""
import os
import socket
import textwrap

import numpy as np
import pytest

from padertorch_tpu.contrib.mk.alignments import (
    TextGridAlignmentReader, read_textgrid)
from padertorch_tpu.contrib.mk.tbx_utils import (
    batch_image_to_grid, make_grid, tensor_to_image)
from padertorch_tpu.contrib.mk.utils import compute_receptive_field_1d
from padertorch_tpu.contrib.mk.visualization import (
    compute_receptive_field_region)
from padertorch_tpu.data.dataset import FilterException


TEXTGRID_LONG = textwrap.dedent('''\
    File type = "ooTextFile"
    Object class = "TextGrid"

    xmin = 0
    xmax = 2.5
    tiers? <exists>
    size = 1
    item []:
        item [1]:
            class = "IntervalTier"
            name = "phones"
            xmin = 0
            xmax = 2.5
            intervals: size = 3
            intervals [1]:
                xmin = 0
                xmax = 0.5
                text = "SIL"
            intervals [2]:
                xmin = 0.5
                xmax = 1.5
                text = "AA1"
            intervals [3]:
                xmin = 1.5
                xmax = 2.5
                text = "B"
    ''')


@pytest.fixture
def ali_root(tmp_path):
    d = tmp_path / 'spk1'
    d.mkdir()
    (d / 'utt1.TextGrid').write_text(TEXTGRID_LONG)
    return tmp_path


def test_read_textgrid(ali_root):
    tiers, types = read_textgrid(ali_root / 'spk1' / 'utt1.TextGrid')
    assert types['phones'] == 'IntervalTier'
    assert tiers['phones'] == [
        (0.0, 0.5, 'SIL'), (0.5, 1.5, 'AA1'), (1.5, 2.5, 'B')]


def test_alignment_reader(ali_root):
    reader = TextGridAlignmentReader(
        ali_root=ali_root, label_key='phones', drop_silence=True)
    ex = {'example_id': 'utt1', 'speaker_id': 'spk1'}
    assert reader.filter_fn(ex)
    out = reader(dict(ex))
    assert out['phones'] == ['AA', 'B']  # digits reduced, SIL dropped
    assert out['phones_start_times'] == [0.5, 1.5]
    assert out['phones_stop_times'] == [1.5, 2.5]

    missing = {'example_id': 'nope', 'speaker_id': 'spk1'}
    assert not reader.filter_fn(missing)
    with pytest.raises(FilterException):
        reader(missing)


def test_receptive_field():
    assert compute_receptive_field_1d([3, 3, 3]) == [7, 5, 3]
    rf, start = compute_receptive_field_1d([3, 3], center_index=0)
    assert rf == [5, 3] and start == -2
    assert compute_receptive_field_region([3, 3]) == (-2, 2)


def test_make_grid_and_batch_image_to_grid():
    grid = make_grid(np.random.rand(4, 3, 32, 32), nrow=1)
    assert grid.shape == (3, 138, 36)
    g2 = batch_image_to_grid(
        np.random.rand(4, 32, 32), input_shape_format='b h w')
    assert g2.shape == (138, 36)
    img = tensor_to_image(np.random.rand(8, 8), 'image')
    assert img.dtype == np.uint8


def test_inspector_hook(tmp_path):
    from padertorch_tpu.contrib.cb.hooks import InspectorHook, PyroHook
    assert PyroHook is InspectorHook

    class FakeTrainer:
        iteration = 42
        storage_dir = str(tmp_path)

    hook = InspectorHook()
    hook.pre_step(FakeTrainer())
    sock_path = os.path.join(str(tmp_path), 'inspect.sock')
    if hook._server is None:
        pytest.skip('unix sockets unavailable in sandbox')
    client = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    client.settimeout(5)
    client.connect(sock_path)
    client.sendall(b'trainer.iteration\n')
    reply = client.makefile().readline().strip()
    client.close()
    hook.close(None)
    assert reply == '42', reply
