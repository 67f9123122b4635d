"""Tests for the mk/je symbol-parity tail (round-3 symbol sweep):
griffin-lim functional API + parametric import path, pwg Vocoder /
load_vocoder_model, mk ScaledDotProductAttention / TransformerNormBlock
/ EncoderLayer, wav2vec2 named attention variants, je conv_utils
helpers, DynamicExtendedTimeSeriesBucket name.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestGriffinLimFunctional:
    def test_fast_griffin_lim_recovers_magnitude(self):
        from padertorch_tpu.ops import STFT
        from padertorch_tpu.contrib.mk.synthesis.parametric.griffin_lim \
            import fast_griffin_lim
        t = np.linspace(0, 1, num=8000)
        sine = np.sin(2 * np.pi * 200 * t).astype('float32')
        stft = STFT(512, 128, complex_representation='complex',
                    dtype='float32')
        mag = np.abs(np.asarray(stft(sine[None])))
        y = np.asarray(fast_griffin_lim(mag, stft, iterations=60))
        assert y.ndim == 2 and abs(y.shape[1] - 8000) <= 512, y.shape
        mag2 = np.abs(np.asarray(stft(y[:, :8000])))
        n = min(mag2.shape[1], mag.shape[1])
        rel = (np.abs(mag2[:, :n] - mag[:, :n]).mean()
               / mag[:, :n].mean())
        assert rel < 0.06, rel

    def test_griffin_lim_step_projection(self):
        from padertorch_tpu.ops import STFT
        from padertorch_tpu.contrib.mk.synthesis.griffin_lim import (
            griffin_lim_step)
        stft = STFT(256, 64, complex_representation='complex',
                    dtype='float32')
        x = np.random.RandomState(0).randn(1, 4000).astype('float32')
        spec = np.asarray(stft(x))
        mag = np.abs(spec)
        # a consistent spectrogram is (nearly) a fixed point
        out, audio = griffin_lim_step(mag, spec, stft)
        np.testing.assert_allclose(
            np.abs(np.asarray(out)), mag, atol=2e-2)

    def test_reshape_complex_layouts(self):
        from padertorch_tpu.contrib.mk.synthesis.griffin_lim import (
            reshape_complex)
        z = jnp.asarray(np.random.RandomState(1).randn(3, 4)
                        + 1j * np.random.RandomState(2).randn(3, 4))
        assert reshape_complex(z, 'complex') is z
        stacked = reshape_complex(z, 'stacked')
        assert stacked.shape == (3, 4, 2)
        np.testing.assert_allclose(stacked[..., 0], z.real)
        concat = reshape_complex(z, 'concat')
        assert concat.shape == (3, 8)
        np.testing.assert_allclose(concat[..., 4:], z.imag)

    def test_parametric_import_path(self):
        from padertorch_tpu.contrib.mk.synthesis import parametric
        from padertorch_tpu.contrib.mk.synthesis.griffin_lim import FGLA
        assert parametric.FGLA is FGLA


class TestPwgTail:
    def test_vocoder_alias(self):
        from padertorch_tpu.contrib.mk.synthesis.vocoder.pwg import (
            Vocoder, PWGVocoder)
        assert Vocoder is PWGVocoder

    def test_load_vocoder_model(self, tmp_path):
        import torch
        from padertorch_tpu.contrib.mk.synthesis.vocoder.pwg import (
            ParallelWaveGANGenerator, load_vocoder_model)
        # author a tiny torch state dict in the kan-bayashi layout by
        # exporting from a random JAX generator (round trip)
        gen = ParallelWaveGANGenerator(
            layers=2, stacks=1, residual_channels=4, gate_channels=8,
            skip_channels=4, aux_channels=5, upsample_scales=(2, 2),
            aux_context_window=1)
        sd = {}

        def put(prefix, conv):
            sd[f'{prefix}.weight'] = torch.tensor(np.asarray(conv.weight))
            if getattr(conv, 'bias', None) is not None:
                sd[f'{prefix}.bias'] = torch.tensor(np.asarray(conv.bias))

        put('first_conv', gen.first_conv)
        for i, block in enumerate(gen.blocks):
            put(f'conv_layers.{i}.conv', block.conv)
            put(f'conv_layers.{i}.conv1x1_aux', block.conv_aux)
            put(f'conv_layers.{i}.conv1x1_out', block.conv_out)
            put(f'conv_layers.{i}.conv1x1_skip', block.conv_skip)
        put('last_conv_layers.1', gen.last_conv1)
        put('last_conv_layers.3', gen.last_conv2)
        put('upsample_net.conv_in', gen.upsample_net.conv_in)
        for i, conv in enumerate(gen.upsample_net.up_convs):
            put(f'upsample_net.upsample.up_layers.{2 * i + 1}', conv)
        torch.save({'model': {'generator': sd}},
                   tmp_path / 'checkpoint-1000steps.pkl')
        (tmp_path / 'config.yml').write_text(
            'sampling_rate: 16000\n'
            'generator_params:\n'
            '  stacks: 1\n')
        np.save(tmp_path / 'stats.npy',
                np.stack([np.zeros(5), np.ones(5)]))

        loaded, sr = load_vocoder_model(tmp_path)
        assert sr == 16000
        c = jnp.asarray(
            np.random.RandomState(0).randn(5, 6).astype('float32'))
        y1 = loaded.inference(c, key=jax.random.PRNGKey(0))
        assert y1.shape == (6 * 4,)


class TestMkTransformerTail:
    def test_sdpa_matches_naive(self):
        from padertorch_tpu.contrib.mk.modules.transformer import (
            ScaledDotProductAttention)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 4, 6, 8).astype('f'))
        out = np.asarray(ScaledDotProductAttention()(q, q, q,
                                                     is_causal=True))
        logits = np.einsum('bhqd,bhkd->bhqk', q, q) / np.sqrt(8)
        mask = np.tril(np.ones((6, 6), bool))
        logits = np.where(mask, logits, -np.inf)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        ref = np.einsum('bhqk,bhkd->bhqd', w, np.asarray(q))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_sdpa_bool_and_float_masks(self):
        from padertorch_tpu.contrib.mk.modules.transformer import (
            ScaledDotProductAttention)
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 1, 4, 8).astype('f'))
        m_bool = jnp.asarray(np.triu(np.ones((4, 4), bool)))
        out_b = ScaledDotProductAttention()(q, q, q, attn_mask=m_bool)
        m_add = jnp.where(m_bool, 0.0, -jnp.inf)
        out_f = ScaledDotProductAttention()(q, q, q, attn_mask=m_add)
        np.testing.assert_allclose(out_b, out_f, atol=1e-6)

    def test_norm_block_plain_and_cond(self):
        from padertorch_tpu.contrib.mk.modules.transformer import (
            TransformerNormBlock)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 5, 8)
                        .astype('f'))
        y = TransformerNormBlock('layer', 8)(x)
        assert y.shape == x.shape
        h, ls = TransformerNormBlock('layer', 8, cond_dim=3)(
            x, cond=jnp.ones((2, 3)))
        assert h.shape == x.shape and ls.shape[-1] == 8

    def test_encoder_layer_alias(self):
        from padertorch_tpu.contrib.mk.modules.transformer import (
            EncoderLayer, TransformerEncoderLayer)
        assert EncoderLayer is TransformerEncoderLayer


class TestWav2Vec2NamedAttention:
    def test_longformer_attention_equals_additive_band(self):
        from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
            LongformerAttention, longformer_bias)
        from padertorch_tpu.contrib.mk.modules.transformer import (
            MultiheadAttention)
        from padertorch_tpu.module import state_dict, load_state_dict
        x = jnp.asarray(np.random.RandomState(3).randn(2, 12, 16)
                        .astype('f'))
        lf = LongformerAttention(16, 4, window_size=4)
        plain = load_state_dict(MultiheadAttention(16, 4), state_dict(lf))
        out_named = lf(x)
        out_bias = plain(x, attn_bias=longformer_bias(4, 12))
        np.testing.assert_allclose(out_named, out_bias, atol=1e-5)

    def test_kerple_and_rope_run(self):
        from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
            KerpleLogAttention, RoPEAttention, ALiBi)
        x = jnp.asarray(np.random.RandomState(4).randn(2, 10, 16)
                        .astype('f'))
        assert KerpleLogAttention(16, 4)(x).shape == x.shape
        assert RoPEAttention(16, 4)(x).shape == x.shape
        assert ALiBi(4)(7).shape == (1, 4, 7, 7)


class TestJeConvUtilsTail:
    def test_helpers_consistent_with_layer(self):
        from padertorch_tpu.contrib.je.modules.conv import (
            Conv1d, compute_conv_output_shape,
            compute_conv_output_sequence_lengths)
        shape = compute_conv_output_shape((4, 3, 100), 8, 5, 1, 2, 'both')
        lens = compute_conv_output_sequence_lengths(
            np.array([50, 100]), 5, 1, 'both', 2)
        c = Conv1d(3, 8, 5, stride=2, pad_type='both')
        y, out_lens = c(jnp.ones((4, 3, 100)),
                        seq_len=np.array([50, 100, 100, 100]))
        assert tuple(shape) == tuple(y.shape)
        np.testing.assert_array_equal(np.asarray(out_lens[:2]), lens)

    def test_transpose_shapes(self):
        from padertorch_tpu.contrib.je.modules.conv import (
            compute_conv_output_shape, compute_transpose_out_size)
        shape = compute_conv_output_shape(
            (2, 4, 25), 3, 4, 1, 2, 'both', transpose=True)
        assert shape[2] == compute_transpose_out_size(25, 4, 1, 2, 'both')

    def test_to_pair_and_activation(self):
        from padertorch_tpu.contrib.je.modules.conv import (
            to_pair, map_activation_fn)
        assert to_pair(3) == (3, 3)
        assert to_pair((1, 2)) == (1, 2)
        relu = map_activation_fn('relu')
        assert float(relu(jnp.asarray(-2.0))) == 0.0
        ident = map_activation_fn(None)
        assert float(ident(jnp.asarray(-2.0))) == -2.0
        with pytest.raises(ValueError):
            map_activation_fn(3)

    def test_bucket_reference_name(self):
        from padertorch_tpu.contrib.je.data import utils as jdu
        assert jdu.DynamicExtendedTimeSeriesBucket is jdu._ExtendedBucket
