"""Serving export (``padertorch_tpu/serve.py``): dynamic axes,
multi-platform lowering, artifact directories."""
import numpy as np
import jax.numpy as jnp
import pytest

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.serve import export_model, load_exported, dump_exported


class SeqModel(pt.Model):
    """Length-agnostic model: per-frame linear + masked pooling."""

    def __init__(self):
        self.lin = nn.Linear(4, 2)

    def forward(self, batch):
        x = batch['audio']                     # (B, T, 4)
        frames = self.lin(x)                   # (B, T, 2)
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :] < batch['seq_len'][:, None])
        pooled = (frames * mask[..., None]).sum(1) \
            / jnp.maximum(batch['seq_len'], 1)[:, None]
        return {'frames': frames, 'pooled': pooled}

    def review(self, batch, outputs):
        return {'loss': outputs['pooled'].sum()}


def _model():
    ptrandom.seed(0)
    return SeqModel().eval()


def _batch(b, t):
    rng = np.random.RandomState(b * 100 + t)
    return {
        'audio': rng.randn(b, t, 4).astype('float32'),
        'seq_len': np.full((b,), t, 'int32'),
    }


def test_dynamic_axes_batch_and_time():
    m = _model()
    blob = export_model(
        m, _batch(2, 8),
        dynamic_axes={'audio': {0: 'b', 1: 't'}, 'seq_len': {0: 'b'}})
    served = load_exported(blob)
    for b, t in [(2, 8), (3, 17), (1, 40)]:
        batch = _batch(b, t)
        out = served(batch)
        want = m(batch)
        assert np.asarray(out['frames']).shape == (b, t, 2)
        np.testing.assert_allclose(
            np.asarray(out['pooled']), np.asarray(want['pooled']),
            rtol=1e-5, atol=1e-6)


def test_dynamic_axes_shared_name_ties_dims():
    m = _model()
    blob = export_model(
        m, _batch(2, 8),
        dynamic_axes={'audio': {0: 'b'}, 'seq_len': {0: 'b'}})
    served = load_exported(blob)
    # matching batch works; mismatched batch must fail
    served(_batch(5, 8))
    with pytest.raises(Exception):
        bad = _batch(5, 8)
        bad['seq_len'] = bad['seq_len'][:3]
        served(bad)


def test_multi_platform_export_runs_on_cpu():
    m = _model()
    blob = export_model(
        m, _batch(2, 8), platforms=('cpu', 'tpu'))
    out = load_exported(blob)(_batch(4, 8))
    assert np.asarray(out['pooled']).shape == (4, 2)


def test_dump_exported_directory_round_trip(tmp_path):
    m = _model()
    path = dump_exported(
        m, _batch(2, 8), tmp_path / 'artifact',
        dynamic_axes={'audio': {0: 'b', 1: 't'}, 'seq_len': {0: 'b'}})
    assert (path / 'forward.jaxexport').exists()
    import json
    meta = json.loads((path / 'meta.json').read_text())
    assert meta['format'] == 'padertorch_tpu.serve.v1'
    assert meta['model'].endswith('SeqModel')
    served = load_exported(path)
    out = served(_batch(3, 12))
    assert np.asarray(out['frames']).shape == (3, 12, 2)
