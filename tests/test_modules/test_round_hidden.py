"""``round_hidden_to_mxu``: the lane-padded model must be numerically
identical to the unpadded one (pad lanes are exact zero fixed points of
the recurrence, their weights receive zero gradients).

doc/performance.md "MXU tiling": the H=640 flagship measurement showed
+16% MFU purely from tile-aligned GEMMs; this flag gives existing
H=600-style configs that tiling without changing the model.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.recurrent import LSTM, GRU
from padertorch_tpu.module import partition, combine


def _pair(cls, **kwargs):
    """(unpadded, padded) modules with identical logical weights."""
    ptrandom.seed(0)
    plain = cls(**kwargs)
    ptrandom.seed(0)
    padded = cls(**kwargs, round_hidden_to_mxu=True)
    return plain, padded


def _x(b=3, t=11, f=13, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, f).astype('float32'))
    lens = jnp.asarray([t, t - 3, 5])
    return x, lens


@pytest.mark.parametrize('cls', [LSTM, GRU])
@pytest.mark.parametrize('bidirectional', [False, True])
def test_forward_equivalence(cls, bidirectional):
    plain, padded = _pair(
        cls, input_size=13, hidden_size=20, num_layers=2,
        bidirectional=bidirectional)
    assert padded.run_hidden_size == 128
    assert plain.run_hidden_size == 20
    x, lens = _x()
    out_p, state_p = plain(x, seq_lens=lens)
    out_q, state_q = padded(x, seq_lens=lens)
    np.testing.assert_allclose(out_p, out_q, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_p),
                    jax.tree_util.tree_leaves(state_q)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_forward_equivalence_pallas_backend():
    plain, padded = _pair(
        LSTM, input_size=13, hidden_size=20, num_layers=2,
        bidirectional=True)
    plain.backend = padded.backend = 'pallas'
    x, lens = _x()
    out_p, _ = plain(x, seq_lens=lens)
    out_q, _ = padded(x, seq_lens=lens)
    np.testing.assert_allclose(out_p, out_q, atol=1e-5)


def test_state_round_trip():
    # passing a logical-width state into the padded model works and the
    # returned state is logical-width again
    plain, padded = _pair(LSTM, input_size=13, hidden_size=20,
                          bidirectional=True)
    x, lens = _x()
    _, state = plain(x, seq_lens=lens)
    out_p, state_p = plain(x, seq_lens=lens, state=state)
    out_q, state_q = padded(x, seq_lens=lens, state=state)
    np.testing.assert_allclose(out_p, out_q, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_p),
                    jax.tree_util.tree_leaves(state_q)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_gradients_zero_on_padding_and_equal_on_logical():
    plain, padded = _pair(LSTM, input_size=13, hidden_size=20,
                          num_layers=2, bidirectional=True)
    x, lens = _x()

    def loss(module):
        params, static = partition(module)

        def fn(p):
            out, _ = combine(p, static)(x, seq_lens=lens)
            return jnp.sum(out ** 2)
        return jax.grad(fn)(params)

    g_plain = loss(plain)
    g_pad = loss(padded)
    h, rh = 20, 128
    for i in range(len(plain.w_hh)):
        gw_plain = np.asarray(getattr(g_plain, 'w_hh')[i])
        gw_pad = np.asarray(getattr(g_pad, 'w_hh')[i])
        # logical block equal (per-gate columns)
        for gate in range(4):
            np.testing.assert_allclose(
                gw_plain[:, gate * h:(gate + 1) * h],
                gw_pad[:h, gate * rh:gate * rh + h], atol=1e-5)
        # padding rows/cols: identically zero gradient
        assert np.all(gw_pad[h:, :] == 0)
        for gate in range(4):
            assert np.all(gw_pad[:, gate * rh + h:(gate + 1) * rh] == 0)


def test_training_keeps_padding_zero():
    # one full fused train step through the Trainer: the padded slots
    # must remain exactly zero afterwards (Adam on zero grads)
    import tempfile
    import padertorch_tpu as pt
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel

    ptrandom.seed(0)
    model = PermutationInvariantTrainingModel(
        F=17, recurrent_layers=1, units=20, K=2,
        round_hidden_to_mxu=True).train()
    rng = np.random.RandomState(0)
    batch = {
        'Y_abs': jnp.asarray(np.abs(rng.randn(2, 12, 17)), 'float32'),
        'X_abs': jnp.asarray(np.abs(rng.randn(2, 12, 2, 17)), 'float32'),
        'cos_phase_difference': jnp.asarray(
            np.cos(rng.randn(2, 12, 2, 17)), 'float32'),
        'num_frames': jnp.asarray([12, 9]),
    }
    with tempfile.TemporaryDirectory() as tmp:
        trainer = pt.Trainer(
            model=model, storage_dir=tmp,
            optimizer=pt.Adam(gradient_clipping=10.0, lr=1e-2),
            loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 1.0},
        )
        trainer.iteration = 0
        params, static = partition(trainer.model)
        step = trainer._get_fn('train', trainer._make_train_step)
        out = step(params, static, trainer._opt_states, batch,
                   jax.random.PRNGKey(0), trainer._loss_weight_arrays())
        new_params = out[0]
    h, rh = 20, 128
    for i in range(len(model.blstm.w_hh)):
        w = np.asarray(getattr(new_params, 'blstm').w_hh[i])
        assert w.shape == (rh, 4 * rh)
        assert np.all(w[h:, :] == 0), 'padding rows drifted'
        for gate in range(4):
            assert np.all(w[:, gate * rh + h:(gate + 1) * rh] == 0), \
                'padding cols drifted'
