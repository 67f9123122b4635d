"""Native wav2vec2: shapes, lengths, attention variants, and numerics
vs HuggingFace's torch ``Wav2Vec2Model`` on a tiny random-init config
(no network access needed)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
    Wav2Vec2Model, load_hf_wav2vec2, alibi_bias, kerple_log_bias,
    longformer_bias,
)


def _tiny(**kw):
    cfg = dict(conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
               d_model=16, num_layers=2, num_heads=2, d_ff=32)
    cfg.update(kw)
    return cfg


def test_forward_shapes_and_lengths():
    ptrandom.seed(0)
    m = Wav2Vec2Model(**_tiny()).eval()
    x, seq_len = m(jnp.zeros((2, 400)), sequence_lengths=[400, 301])
    assert x.shape == (2, 39, 16)
    np.testing.assert_array_equal(seq_len, [39, 29])
    # latents short-circuit
    z, zl = m(jnp.zeros((2, 400)), sequence_lengths=[400, 301],
              return_latents=True)
    assert z.shape == (2, 39, 8)
    np.testing.assert_array_equal(zl, [39, 29])


def test_layer_selection():
    ptrandom.seed(0)
    m = Wav2Vec2Model(**_tiny(), layer=None).eval()
    xs, _ = m(jnp.zeros((1, 400)))
    assert isinstance(xs, list) and len(xs) == 2
    m.layer = 1
    x1, _ = m(jnp.zeros((1, 400)))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xs[0]),
                               rtol=1e-6)
    m.layer = 13
    with pytest.raises(ValueError, match=r'\[1, 2\]'):
        m(jnp.zeros((1, 400)))


def test_add_padding_covers_all_samples():
    ptrandom.seed(0)
    m = Wav2Vec2Model(**_tiny()).eval()
    # window=12? for kernels (10,3) strides (5,2): window=(3-1)*5+10=20,
    # shift=10
    assert m.window_size == 20 and m.downsample_factor == 10
    sig = np.ones((2, 95), np.float32)
    padded, seq = m.add_padding([95, 63], signal=sig, fading='half')
    assert padded.shape[-1] == int(np.max(seq))
    # every padded length fits the conv stack exactly:
    # (L - window) % shift == 0 and L >= window
    for n in np.asarray(seq):
        assert n >= 20 and (n - 20) % 10 == 0, n
    # front fading of (window - shift) // 2 = 5 zeros
    np.testing.assert_array_equal(np.asarray(padded)[0, :5], 0)
    assert np.asarray(padded)[0, 5] == 1


def test_attention_variant_biases():
    b = alibi_bias(2, 5)
    assert b.shape == (1, 2, 5, 5)
    assert float(b[0, 0, 0, 0]) == 0           # zero on the diagonal
    assert float(b[0, 1, 0, 4]) == -4 * 8.0    # last head slope 8
    kb = kerple_log_bias(jnp.ones((2, 1, 1)), jnp.ones((2, 1, 1)), 4)
    assert kb.shape == (1, 2, 4, 4)
    assert float(kb[0, 0, 2, 1]) == pytest.approx(-np.log(2))
    assert float(kb[0, 0, 1, 2]) == 0          # upper triangle untouched
    lb = longformer_bias(2, 4)
    assert lb.shape == (1, 1, 4, 4)
    assert float(lb[0, 0, 0, 1]) == 0          # inside window
    assert float(lb[0, 0, 0, 3]) < -1e30       # outside window


@pytest.mark.parametrize('attention_type',
                         ['alibi', 'kerple', 'longformer', 'rope'])
def test_attention_variants_run(attention_type):
    ptrandom.seed(0)
    m = Wav2Vec2Model(
        **_tiny(), attention_type=attention_type).eval()
    x, seq_len = m(jnp.zeros((2, 400)), sequence_lengths=[400, 350])
    assert x.shape == (2, 39, 16)
    assert np.isfinite(np.asarray(x)).all()


def test_longformer_flash_backend_matches_dense():
    # the banded window path under the fused attention backend equals
    # the dense masked path (the band is pruned, not materialized)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        set_attention_backend)
    import numpy as np
    ptrandom.seed(0)
    m = Wav2Vec2Model(
        **_tiny(), attention_type='longformer',
        attention_window=8).eval()
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 400).astype('float32'))
    ref, lens = m(wav, sequence_lengths=[400, 350])
    set_attention_backend(m, use_flash=True)
    out, _ = m(wav, sequence_lengths=[400, 350])
    # compare valid frames only: padded rows whose whole band lies
    # beyond the valid keys are fully masked — flash returns 0 there,
    # dense softmax returns a (meaningless) uniform average
    for b, n in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(
            np.asarray(out[b, :n]), np.asarray(ref[b, :n]), atol=3e-5)


def test_jit_compatible():
    ptrandom.seed(0)
    m = Wav2Vec2Model(**_tiny()).eval()
    from padertorch_tpu.module import partition, combine
    params, static = partition(m)

    @jax.jit
    def fn(params, audio):
        return combine(params, static)(audio)[0]

    out = fn(params, jnp.zeros((1, 400)))
    assert out.shape == (1, 39, 16)


# ---- HF torch equivalence --------------------------------------------

_HF_TINY = dict(
    vocab_size=32, hidden_size=16, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=32,
    conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
    conv_bias=False, feat_extract_norm='group',
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    do_stable_layer_norm=False, hidden_dropout=0.0,
    attention_dropout=0.0, feat_proj_dropout=0.0,
    hidden_act='gelu', layerdrop=0.0,
)


def _hf_equivalence(stable, norm):
    torch = pytest.importorskip('torch')
    transformers = pytest.importorskip('transformers')
    cfg = transformers.Wav2Vec2Config(
        **{**_HF_TINY, 'do_stable_layer_norm': stable,
           'feat_extract_norm': norm,
           'conv_bias': norm == 'layer'})
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd.pop('masked_spec_embed', None)

    model = load_hf_wav2vec2(sd, config=dict(
        conv_dim=tuple(cfg.conv_dim), conv_kernel=tuple(cfg.conv_kernel),
        conv_stride=tuple(cfg.conv_stride), conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        d_model=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        d_ff=cfg.intermediate_size,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
    ))

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 800)).astype(np.float32)
    with torch.inference_mode():
        want = hf(torch.as_tensor(audio)).last_hidden_state.numpy()
    got, _ = model(jnp.asarray(audio))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_hf_equivalence_base_style():
    _hf_equivalence(stable=False, norm='group')


def test_hf_equivalence_large_style():
    _hf_equivalence(stable=True, norm='layer')

