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


def test_export_generate_round_trip(tmp_path):
    from padertorch_tpu import nn
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerDecoder)
    from padertorch_tpu.serve import export_generate, load_exported
    import jax.numpy as jnp

    ptrandom.seed(40)
    dec = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, num_kv_heads=2,
        use_rope=True).eval()
    emb_w = jnp.asarray(
        np.random.default_rng(41).normal(size=(9, 16)).astype('f'))
    head = nn.Linear(16, 9)
    memory = np.random.default_rng(42).normal(
        size=(2, 5, 16)).astype('float32')

    blob = export_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=6, eos_id=1)
    fn = load_exported(blob)

    # batch-polymorphic: serve a different batch size
    big = np.random.default_rng(43).normal(
        size=(3, 5, 16)).astype('float32')
    tokens, lengths = fn(big)
    assert tokens.shape == (3, 6) and lengths.shape == (3,)

    # the artifact must agree with in-process generation
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)
    want_tokens, want_lengths = autoregressive_generate(
        dec, jnp.asarray(big), embed=lambda t: emb_w[t],
        logits_head=head, bos_id=0, max_len=6, eos_id=1)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(want_tokens))
    np.testing.assert_array_equal(np.asarray(lengths),
                                  np.asarray(want_lengths))


def test_export_generate_with_memory_lens():
    from padertorch_tpu import nn
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerDecoder)
    from padertorch_tpu.serve import export_generate, load_exported
    import jax.numpy as jnp

    ptrandom.seed(41)
    dec = TransformerDecoder(
        d_model=16, num_layers=1, num_heads=4).eval()
    emb_w = jnp.asarray(
        np.random.default_rng(44).normal(size=(7, 16)).astype('f'))
    head = nn.Linear(16, 7)
    memory = np.random.default_rng(45).normal(
        size=(2, 6, 16)).astype('float32')
    blob = export_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=5, eos_id=1, memory_seq_len=[4, 6])
    fn = load_exported(blob)
    tokens, lengths = fn(
        {'memory': memory, 'memory_seq_len': np.asarray([3, 5])})
    assert tokens.shape == (2, 5)


def test_export_polymorphic_batch_with_pallas_rnn_backend():
    """Regression: shape-polymorphic export of a model whose RNN uses
    ``backend='pallas'``.  The kernel's VMEM guard compares
    ``rows * gates`` against a budget — with a symbolic batch dim that
    comparison is inconclusive (InconclusiveDimensionOperation);
    ``_pallas_shape_ok`` must detect the symbolic dim and fall back to
    the scan path so the artifact stays portable."""
    from padertorch_tpu.modules.recurrent import LSTM

    class M(pt.Model):
        def __init__(self):
            self.rnn = LSTM(8, 16, num_layers=1, bidirectional=True)
            self.rnn.backend = 'pallas'
            self.head = nn.Linear(32, 4)

        def forward(self, inputs):
            out, _ = self.rnn(inputs['x'])
            return self.head(out)

        def review(self, inputs, outputs):
            return {'loss': jnp.mean(outputs ** 2)}

    ptrandom.seed(0)
    m = M()
    ex = {'x': jnp.asarray(
        np.random.RandomState(0).randn(2, 10, 8), 'float32')}
    blob = export_model(m, ex)          # polymorphic batch (default)
    fn = load_exported(blob)
    # runs at the traced batch size AND another one
    assert fn({'x': ex['x']}).shape == (2, 10, 4)
    x5 = jnp.asarray(np.random.RandomState(1).randn(5, 10, 8),
                     'float32')
    got = fn({'x': x5})
    assert got.shape == (5, 10, 4)
    # the exported graph (scan fallback) matches the eager pallas model
    want = m({'x': x5})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_export_model_with_bf16_compute_policy():
    """A model carrying compute_dtype='bfloat16' exports and the
    artifact reproduces the eager model at another batch size."""
    from padertorch_tpu.modules.recurrent import LSTM

    class M(pt.Model):
        def __init__(self):
            self.rnn = LSTM(8, 16, num_layers=1, bidirectional=True)
            self.rnn.compute_dtype = 'bfloat16'
            self.head = nn.Linear(32, 4)

        def forward(self, inputs):
            out, _ = self.rnn(inputs['x'])
            return self.head(out)

        def review(self, inputs, outputs):
            return {'loss': jnp.mean(outputs ** 2)}

    ptrandom.seed(0)
    m = M()
    ex = {'x': jnp.asarray(
        np.random.RandomState(0).randn(2, 10, 8), 'float32')}
    fn = load_exported(export_model(m, ex))
    x5 = jnp.asarray(np.random.RandomState(1).randn(5, 10, 8),
                     'float32')
    np.testing.assert_allclose(
        np.asarray(fn({'x': x5})), np.asarray(m({'x': x5})), atol=1e-4)
