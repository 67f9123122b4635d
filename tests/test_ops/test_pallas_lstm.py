"""Equivalence of the Pallas LSTM cell-scan kernel vs the lax.scan path.

On CPU the kernel runs in interpret mode (same code path the TPU compiles);
numerics must match the scan backend, including masked variable-length
batches, bidirectional direction stacking, and gradients.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.module import partition, combine
from padertorch_tpu.modules.recurrent import LSTM
from padertorch_tpu.ops.pallas.lstm import lstm_cell_scan


def _ref_cell_scan(gates_x, w_hh, mask, h0, c0):
    def step(carry, inp):
        h, c = carry
        gx, m = inp
        gates = gx + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, -1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if m is not None:
            mm = m[:, None]
            h_new = jnp.where(mm > 0, h_new, h)
            c_new = jnp.where(mm > 0, c_new, c)
            return (h_new, c_new), h_new * mm
        return (h_new, c_new), h_new

    if mask is None:
        (h_t, c_t), out = jax.lax.scan(
            lambda c, gx: step(c, (gx, None)), (h0, c0), gates_x)
    else:
        (h_t, c_t), out = jax.lax.scan(step, (h0, c0), (gates_x, mask))
    return out, h_t, c_t


@pytest.mark.parametrize('use_mask', [False, True])
def test_kernel_matches_scan(use_mask):
    t, b, h = 10, 8, 128
    rng = np.random.RandomState(int(use_mask))
    gates_x = jnp.asarray(rng.randn(t, b, 4 * h) * 0.3, 'float32')
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.1, 'float32')
    h0 = jnp.asarray(rng.randn(b, h) * 0.1, 'float32')
    c0 = jnp.asarray(rng.randn(b, h) * 0.1, 'float32')
    mask = None
    if use_mask:
        lens = rng.randint(1, t + 1, b)
        mask = jnp.asarray(np.arange(t)[:, None] < lens[None, :],
                           'float32')

    out_p = lstm_cell_scan(gates_x, w_hh, mask, h0, c0, True)
    out_r = _ref_cell_scan(gates_x, w_hh, mask, h0, c0)
    for a, b_ in zip(out_p, out_r):
        np.testing.assert_allclose(a, b_, atol=1e-5)

    def loss(fn):
        def wrapped(gx, w, h0_, c0_):
            o, ht, ct = fn(gx, w, mask, h0_, c0_)
            return jnp.sum(o ** 2) + jnp.sum(ht) + jnp.sum(ct * 0.5)
        return jax.grad(wrapped, argnums=(0, 1, 2, 3))

    pallas_fn = lambda gx, w, m, a, c: lstm_cell_scan(  # noqa: E731
        gx, w, m, a, c, True)
    g_p = loss(pallas_fn)(gates_x, w_hh, h0, c0)
    g_r = loss(_ref_cell_scan)(gates_x, w_hh, h0, c0)
    for a, b_, name in zip(g_p, g_r, ['dgx', 'dw_hh', 'dh0', 'dc0']):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=1e-4,
                                   err_msg=name)


@pytest.mark.parametrize('bidirectional', [False, True])
def test_lstm_backend_pallas_matches_scan(bidirectional):
    """Module-level: LSTM(backend='pallas') == LSTM(backend='scan'),
    outputs and parameter gradients, with variable lengths."""
    ptrandom.seed(7)
    lstm = LSTM(32, 64, num_layers=2, bidirectional=bidirectional)
    b, t = 4, 12
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, t, 32), 'float32')
    seq_lens = jnp.asarray([12, 7, 9, 3])

    def run(backend, xx):
        lstm.backend = backend
        out, (h, c) = lstm(xx, seq_lens=seq_lens)
        return out, h, c

    out_s, h_s, c_s = run('scan', x)
    out_p, h_p, c_p = run('pallas', x)
    np.testing.assert_allclose(out_p, out_s, atol=1e-5)
    np.testing.assert_allclose(h_p, h_s, atol=1e-5)
    np.testing.assert_allclose(c_p, c_s, atol=1e-5)

    # parameter + input gradients
    def grads(backend):
        lstm.backend = backend
        params, static = partition(lstm)

        def loss(params, xx):
            m = combine(params, static)
            out, (h, c) = m(xx, seq_lens=seq_lens)
            return jnp.sum(out ** 2) + jnp.sum(h) + jnp.sum(c)

        return jax.grad(loss, argnums=(0, 1))(params, x)

    gp_s, gx_s = grads('scan')
    gp_p, gx_p = grads('pallas')
    np.testing.assert_allclose(gx_p, gx_s, atol=2e-4, rtol=1e-4)
    flat_s = jax.tree_util.tree_leaves(gp_s)
    flat_p = jax.tree_util.tree_leaves(gp_p)
    assert len(flat_s) == len(flat_p)
    for a, b_ in zip(flat_p, flat_s):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize('bidirectional', [False, True])
def test_gru_backend_pallas_matches_scan(bidirectional):
    """GRU(backend='pallas') == GRU(backend='scan'), outputs + grads."""
    from padertorch_tpu.modules.recurrent import GRU
    ptrandom.seed(9)
    gru = GRU(12, 24, num_layers=2, bidirectional=bidirectional)
    b, t = 4, 9
    x = jnp.asarray(np.random.RandomState(4).randn(b, t, 12), 'float32')
    seq_lens = jnp.asarray([9, 3, 7, 9])

    def run(backend):
        gru.backend = backend
        return gru(x, seq_lens=seq_lens)

    out_s, h_s = run('scan')
    out_p, h_p = run('pallas')
    np.testing.assert_allclose(out_p, out_s, atol=1e-5)
    np.testing.assert_allclose(h_p, h_s, atol=1e-5)

    def grads(backend):
        gru.backend = backend
        params, static = partition(gru)

        def loss(p, xx):
            o, h = combine(p, static)(xx, seq_lens=seq_lens)
            return jnp.sum(o ** 2) + jnp.sum(h)

        return jax.grad(loss, argnums=(0, 1))(params, x)

    gp, gx_p = grads('pallas')
    gs, gx_s = grads('scan')
    np.testing.assert_allclose(gx_p, gx_s, atol=2e-4, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(gp),
                     jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=1e-4)


def test_kernel_bf16_streams():
    """bf16 ``gates_x`` selects bf16 HBM streams (out/residuals/dgx) —
    the storage mode the module enables under the bf16 policy on TPU
    (``_RNNBase._pallas_stream_dtype``).  Final states and dW stay f32;
    values track the f32-stream kernel within bf16 rounding."""
    from padertorch_tpu.ops.pallas.gru import gru_cell_scan

    t, b, h = 10, 4, 16
    rng = np.random.RandomState(0)
    lens = rng.randint(1, t + 1, b)
    mask = jnp.asarray(np.arange(t)[:, None] < lens[None, :], 'float32')

    def check(cell, gh, n_state):
        gates_f32 = jnp.asarray(rng.randn(t, b, gh) * 0.3, 'float32')
        inits = [jnp.asarray(rng.randn(b, h) * 0.1, 'float32')
                 for _ in range(n_state)]
        w_hh = jnp.asarray(rng.randn(h, gh) * 0.1, 'float32')

        def run(gx):
            outs = cell(gx, w_hh, mask, *inits, True, 'bfloat16')
            return outs

        outs16 = run(gates_f32.astype(jnp.bfloat16))
        outs32 = run(gates_f32)
        assert outs16[0].dtype == jnp.bfloat16      # out stream
        assert outs32[0].dtype == jnp.float32
        for s16, s32 in zip(outs16[1:], outs32[1:]):  # final states
            assert s16.dtype == s32.dtype == jnp.float32
            np.testing.assert_allclose(
                np.asarray(s16), np.asarray(s32), atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(outs16[0], 'float32'), np.asarray(outs32[0]),
            atol=5e-2)

        def loss(gx, w):
            outs = cell(gx, w, mask, *inits, True, 'bfloat16')
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in outs)

        g16 = jax.grad(loss, argnums=(0, 1))(
            gates_f32.astype(jnp.bfloat16), w_hh)
        g32 = jax.grad(loss, argnums=(0, 1))(gates_f32, w_hh)
        assert g16[0].dtype == jnp.bfloat16         # dgx cotangent
        assert g16[1].dtype == jnp.float32          # dW stays f32
        np.testing.assert_allclose(
            np.asarray(g16[0], 'float32'), np.asarray(g32[0]),
            atol=0.2, rtol=0.05)
        np.testing.assert_allclose(
            np.asarray(g16[1]), np.asarray(g32[1]), atol=0.5,
            rtol=0.05)

    check(lstm_cell_scan, 4 * h, 2)
    check(gru_cell_scan, 3 * h, 1)


def test_kernel_gradients_with_leading_masked_steps_and_state():
    """Regression: a VALID step following masked steps (leading-padded
    masks — the flipped backward direction of a bidirectional layer)
    reads ``out[t-1] = 0`` for h_{t-1}, but the true carry is the
    FROZEN initial state.  dW_hh (and the GRU's dgx, whose kernel
    consumes h_prev) were silently wrong whenever h0 was nonzero.
    The segment-start h0 correction makes them exact for contiguous
    masks; pinned here against lax.scan references."""
    import functools

    t, b, h = 8, 4, 16
    rng = np.random.RandomState(0)
    mask_np = np.ones((t, b), np.float32)
    mask_np[:3] = 0.0                       # leading-masked prefix
    mask = jnp.asarray(mask_np)
    h0 = jnp.asarray(rng.randn(b, h) * 0.5, 'float32')
    c0 = jnp.asarray(rng.randn(b, h) * 0.5, 'float32')

    # LSTM
    gx = jnp.asarray(rng.randn(t, b, 4 * h) * 0.3, 'float32')
    w = jnp.asarray(rng.randn(h, 4 * h) * 0.1, 'float32')

    def loss_l(fn, gx, w):
        o, hT, cT = fn(gx, w, mask, h0, c0)
        return jnp.sum(o ** 2) + jnp.sum(hT) + jnp.sum(cT)

    pal = functools.partial(lstm_cell_scan, interpret=True)
    for arg, name in ((0, 'dgx'), (1, 'dW_hh')):
        gp = jax.grad(lambda gx, w: loss_l(pal, gx, w), arg)(gx, w)
        gr = jax.grad(
            lambda gx, w: loss_l(_ref_cell_scan, gx, w), arg)(gx, w)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=2e-5, err_msg=name)

    # GRU
    from padertorch_tpu.ops.pallas.gru import gru_cell_scan
    gxg = jnp.asarray(rng.randn(t, b, 3 * h) * 0.3, 'float32')
    wg = jnp.asarray(rng.randn(h, 3 * h) * 0.1, 'float32')

    def ref_gru(gx, w, mask, h0):
        def step(hh, inp):
            g, m = inp
            gh = hh @ w
            r = jax.nn.sigmoid(g[:, :h] + gh[:, :h])
            z = jax.nn.sigmoid(g[:, h:2 * h] + gh[:, h:2 * h])
            n = jnp.tanh(g[:, 2 * h:] + r * gh[:, 2 * h:])
            h_new = (1 - z) * n + z * hh
            mm = m[:, None]
            h_new = jnp.where(mm > 0, h_new, hh)
            return h_new, h_new * mm
        hT, out = jax.lax.scan(step, h0, (gx, mask))
        return out, hT

    def loss_g(fn, gx, w):
        o, hT = fn(gx, w, mask, h0)
        return jnp.sum(o ** 2) + jnp.sum(hT)

    palg = lambda gx, w, m, a: gru_cell_scan(  # noqa: E731
        gx, w, m, a, True)
    for arg, name in ((0, 'dgx'), (1, 'dW_hh')):
        gp = jax.grad(lambda gx, w: loss_g(palg, gx, w), arg)(gxg, wg)
        gr = jax.grad(
            lambda gx, w: loss_g(ref_gru, gx, w), arg)(gxg, wg)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=2e-5, err_msg=name)
