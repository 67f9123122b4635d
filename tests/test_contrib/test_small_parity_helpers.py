"""Round-3 long-tail parity helpers.

Covers: je TimeWarping (ref ``je/modules/augment.py:42``), channel-
inclusive pack/unpack (ref ``ops/sequence/pack_module.py:37``),
``packed_batch_sizes_to_sequence_lengths``, mk ``Logarithm``
(ref ``mk/modules/features/timefreq.py:37``), ``apply_examplewise``
(ref ``modules/dual_path_rnn.py:258``), ldrude folder helpers
(ref ``contrib/ldrude/utils.py:100-131``), jensheit norm aliases.
"""
import numpy as np
import jax.numpy as jnp

from padertorch_tpu.contrib.je.modules.augment import TimeWarping
from padertorch_tpu.ops.sequence.pack_module import (
    pack_sequence_include_channel, unpack_sequence_include_channel_like,
)
from padertorch_tpu.ops.sequence.reduction import (
    packed_batch_sizes_to_sequence_lengths,
)
from padertorch_tpu.contrib.mk.modules.features.timefreq import Logarithm
from padertorch_tpu.modules.dual_path_rnn import apply_examplewise
from padertorch_tpu.contrib.ldrude.utils import (
    get_last_child, has_checkpoints, represents_int,
)
from padertorch_tpu.contrib.jensheit import norm as jens_norm


class TestTimeWarping:
    @staticmethod
    def _warp(factors):
        factors = np.asarray(factors)

        def warping_fn(seq_len):
            t = max(seq_len)
            return (
                np.minimum(np.arange(t) / factors[:, None], t - 1),
                np.minimum(factors * np.array(seq_len), t),
            )
        return warping_fn

    def test_reference_doctest_values(self):
        # the reference doctest's printed values correspond to factors
        # [1, 2, 3] (its source says [1, 2, .5] — stale doctest, like
        # its eval_sad doctests); we pin the values its code produces
        # for [1, 2, 3]
        x = jnp.cumsum(jnp.ones((3, 1, 4, 5)), -1) - 1
        warp = TimeWarping(warping_fn=self._warp([1, 2, 3]))
        y, seq_len = warp(x, seq_len=[3, 4, 5])
        np.testing.assert_allclose(
            np.asarray(y[0, 0, 0]), [0, 1, 2, 3, 4], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(y[1, 0, 0]), [0, .5, 1, 1.5, 2], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(y[2, 0, 0]), [0, 1 / 3, 2 / 3, 1, 4 / 3],
            atol=1e-5)
        np.testing.assert_array_equal(np.asarray(seq_len), [3, 5, 5])

    def test_speedup_factor_caps_indices(self):
        x = jnp.cumsum(jnp.ones((1, 5)), -1) - 1
        warp = TimeWarping(warping_fn=self._warp([.5]))
        y, seq_len = warp(x, seq_len=[5])
        np.testing.assert_allclose(
            np.asarray(y[0]), [0, 2, 4, 4, 4], atol=1e-6)
        np.testing.assert_allclose(np.asarray(seq_len), [2.5])

    def test_eval_passthrough(self):
        x = jnp.ones((2, 3, 4))
        warp = TimeWarping(warping_fn=self._warp([2, 2]))
        warp.eval()
        y, seq_len = warp(x, seq_len=[4, 4])
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_multiple_tensors_warped_consistently(self):
        x = jnp.arange(8.).reshape(2, 4)
        z = jnp.arange(8.).reshape(2, 4) * 10
        warp = TimeWarping(warping_fn=self._warp([.5, .5]))
        y1, y2, seq_len = warp(x, z, seq_len=[4, 4])
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1) * 10,
                                   atol=1e-5)


class TestChannelPack:
    def test_round_trip(self):
        xs = [np.zeros([2, 4, 5]), np.ones([2, 3, 5])]
        packed, lens = pack_sequence_include_channel(xs)
        assert packed.shape == (4, 4, 5)
        assert lens.tolist() == [4, 4, 3, 3]
        zero, one = unpack_sequence_include_channel_like(
            (packed, lens), like=xs)
        np.testing.assert_array_equal(np.asarray(zero), xs[0])
        np.testing.assert_array_equal(np.asarray(one), xs[1])

    def test_batch_sizes_to_lengths(self):
        # torch doctest case: batch_sizes [4, 4, 4, 2] -> [4, 4, 3, 3]
        out = packed_batch_sizes_to_sequence_lengths([4, 4, 4, 2])
        assert out.tolist() == [4, 4, 3, 3]


class TestLogarithm:
    def test_bases_and_inverse(self):
        x = jnp.asarray([0.01, 1.0, 100.0])
        for base in (None, 'e', 10, 2, 7.5):
            log = Logarithm(log_base=base)
            y = log(x)
            np.testing.assert_allclose(
                np.asarray(log.inverse(y)), np.asarray(x),
                rtol=1e-5)
        log10 = Logarithm(log_base=10)
        np.testing.assert_allclose(np.asarray(log10(x)), [-2, 0, 2],
                                   atol=1e-6)

    def test_disabled_and_eps(self):
        x = jnp.asarray([0.0, 1.0])
        off = Logarithm(log_base=False)
        np.testing.assert_array_equal(np.asarray(off(x)), np.asarray(x))
        ln = Logarithm(log_base=None, eps=1e-3)
        assert np.isfinite(np.asarray(ln(x))).all()
        np.testing.assert_allclose(float(ln(x)[0]), np.log(1e-3))


class TestApplyExamplewise:
    def test_matches_per_example_norm(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 10, 4))
        lens = [4, 7, 10]

        def norm(v):  # stats over valid time only
            m = v.mean(axis=(1, 2), keepdims=True)
            s = v.std(axis=(1, 2), keepdims=True)
            return (v - m) / s

        out = np.asarray(apply_examplewise(norm, x, lens))
        for b, l in enumerate(lens):
            expected = np.asarray(norm(x[b:b + 1, :l]))[0]
            np.testing.assert_allclose(out[b, :l], expected, atol=1e-6)
            np.testing.assert_array_equal(out[b, l:], 0)

    def test_none_lengths_whole_batch(self):
        x = jnp.ones((2, 3))
        out = apply_examplewise(lambda v: v * 2, x, None)
        np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((2, 3)))


class TestLdrudeHelpers:
    def test_represents_int(self):
        assert represents_int('17') and represents_int('-3')
        assert not represents_int('17a')

    def test_get_last_child_natural_order(self, tmp_path):
        for name in ('run_2', 'run_10', 'run_1'):
            (tmp_path / name).mkdir()
        assert get_last_child(tmp_path).name == 'run_10'
        assert get_last_child(tmp_path, 'none*') is None
        assert get_last_child(
            tmp_path, condition_fn=lambda p: p.name != 'run_10'
        ).name == 'run_2'

    def test_has_checkpoints(self, tmp_path):
        assert not has_checkpoints(tmp_path)
        ckpt = tmp_path / 'checkpoints'
        ckpt.mkdir()
        assert not has_checkpoints(tmp_path)
        (ckpt / 'ckpt_100.ptt').touch()
        assert has_checkpoints(tmp_path)


def test_jensheit_norm_aliases():
    assert jens_norm.TransposedLayerNorm is jens_norm.ChannelwiseLayerNorm
    assert jens_norm.GlobalChannelLayerNorm is jens_norm.GlobalLayerNorm
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6))
    y = jens_norm.TransposedLayerNorm(4)(x)
    np.testing.assert_allclose(
        np.asarray(y.mean(axis=1)), np.zeros((2, 6)), atol=1e-5)
