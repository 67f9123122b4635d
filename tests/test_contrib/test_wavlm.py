"""Native WavLM (gated relative position bias) and HuBERT import:
numerics vs HuggingFace's torch models on tiny random-init configs
(no network access needed)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.mk.modules.features.wavlm import (
    WavLMModel, load_hf_wavlm, relative_positions_bucket,
)
from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
    load_hf_hubert,
)


_TINY = dict(conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
             d_model=16, num_layers=2, num_heads=2, d_ff=32)

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


def test_bucket_function_matches_hf():
    torch = pytest.importorskip('torch')
    from transformers.models.wavlm.modeling_wavlm import WavLMAttention
    att = WavLMAttention(16, 2, num_buckets=32, max_distance=64)
    rp = torch.arange(23)[None, :] - torch.arange(23)[:, None]
    np.testing.assert_array_equal(
        att._relative_positions_bucket(rp).numpy(),
        relative_positions_bucket(23, num_buckets=32, max_distance=64))


def test_forward_shapes_and_lengths():
    ptrandom.seed(0)
    m = WavLMModel(**_TINY, num_buckets=32,
                   max_bucket_distance=64).eval()
    x, seq_len = m(jnp.zeros((2, 400)), sequence_lengths=[400, 301])
    assert x.shape == (2, 39, 16)
    np.testing.assert_array_equal(seq_len, [39, 29])
    # only the first layer owns the embedding table
    assert m.encoder.layers[0].attention.rel_attn_embed is not None
    assert m.encoder.layers[1].attention.rel_attn_embed is None


def test_jit_compatible():
    ptrandom.seed(0)
    m = WavLMModel(**_TINY, num_buckets=32,
                   max_bucket_distance=64).eval()
    from padertorch_tpu.module import partition, combine
    params, static = partition(m)

    @jax.jit
    def fn(params, audio):
        return combine(params, static)(audio)[0]

    out = fn(params, jnp.zeros((1, 400)))
    assert out.shape == (1, 39, 16)


def _wavlm_equivalence(stable, norm, seq_lens=None):
    torch = pytest.importorskip('torch')
    transformers = pytest.importorskip('transformers')
    cfg = transformers.WavLMConfig(
        **{**_HF_TINY, 'do_stable_layer_norm': stable,
           'feat_extract_norm': norm, 'conv_bias': norm == 'layer',
           'num_buckets': 32, 'max_bucket_distance': 64})
    torch.manual_seed(0)
    hf = transformers.WavLMModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd.pop('masked_spec_embed', None)

    model = load_hf_wavlm(sd, config=dict(
        conv_dim=tuple(cfg.conv_dim), conv_kernel=tuple(cfg.conv_kernel),
        conv_stride=tuple(cfg.conv_stride), conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        d_model=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        d_ff=cfg.intermediate_size,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        num_buckets=cfg.num_buckets,
        max_bucket_distance=cfg.max_bucket_distance,
    ))

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 800)).astype(np.float32)
    mask = None
    if seq_lens is not None:
        idx = np.arange(audio.shape[-1])[None, :]
        mask = torch.as_tensor(
            (idx < np.asarray(seq_lens)[:, None]).astype(np.int64))
    with torch.inference_mode():
        want = hf(torch.as_tensor(audio),
                  attention_mask=mask).last_hidden_state.numpy()
    got, out_len = model(jnp.asarray(audio), sequence_lengths=seq_lens)
    assert got.shape == want.shape
    if seq_lens is None:
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
    else:
        # compare valid frames only (padded frames are unspecified)
        for b, n in enumerate(np.asarray(out_len)):
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], want[b, :n], atol=2e-4)


def test_hf_equivalence_base_style():
    _wavlm_equivalence(stable=False, norm='group')


def test_hf_equivalence_large_style():
    _wavlm_equivalence(stable=True, norm='layer')


def test_hf_equivalence_padded_batch():
    _wavlm_equivalence(stable=False, norm='group', seq_lens=[800, 620])


def test_hubert_equivalence():
    torch = pytest.importorskip('torch')
    transformers = pytest.importorskip('transformers')
    cfg = transformers.HubertConfig(**_HF_TINY)
    torch.manual_seed(0)
    hf = transformers.HubertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd.pop('masked_spec_embed', None)

    model = load_hf_hubert(sd, config=dict(
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
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
