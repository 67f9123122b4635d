"""LSTM/GRU tests against torch's cuDNN-free CPU implementation (oracle).

Mirrors the reference's reliance on torch.nn.LSTM: we load identical
weights into both implementations and require matching outputs, including
PackedSequence semantics for variable lengths."""
import numpy as np
import pytest

import jax.numpy as jnp

import padertorch_tpu.modules.recurrent as rec
from padertorch_tpu import random as ptrandom

torch = pytest.importorskip('torch')


def copy_weights_to_torch(ours, t_rnn, num_directions):
    sd = {}
    g = ours.gates
    h = ours.hidden_size
    for layer in range(ours.num_layers):
        for d in range(num_directions):
            i = layer * num_directions + d
            suffix = '_reverse' if d == 1 else ''
            # torch stores (gH, in) with gate order matching ours
            sd[f'weight_ih_l{layer}{suffix}'] = torch.tensor(
                np.asarray(ours.w_ih[i]).T.copy())
            sd[f'weight_hh_l{layer}{suffix}'] = torch.tensor(
                np.asarray(ours.w_hh[i]).T.copy())
            b = np.asarray(ours.b[i])
            sd[f'bias_ih_l{layer}{suffix}'] = torch.tensor(b.copy())
            sd[f'bias_hh_l{layer}{suffix}'] = torch.tensor(
                np.zeros_like(b))
    t_rnn.load_state_dict(sd)


@pytest.mark.parametrize('bidirectional', [False, True])
@pytest.mark.parametrize('num_layers', [1, 2])
def test_lstm_matches_torch(bidirectional, num_layers):
    ptrandom.seed(0)
    ours = rec.LSTM(6, 5, num_layers=num_layers,
                    bidirectional=bidirectional)
    t_rnn = torch.nn.LSTM(6, 5, num_layers=num_layers,
                          bidirectional=bidirectional, batch_first=True)
    copy_weights_to_torch(ours, t_rnn, 2 if bidirectional else 1)
    x = np.random.RandomState(0).randn(3, 7, 6).astype(np.float32)
    out, (h, c) = ours.eval()(jnp.asarray(x))
    t_out, (t_h, t_c) = t_rnn(torch.tensor(x))
    np.testing.assert_allclose(
        np.asarray(out), t_out.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h), t_h.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c), t_c.detach().numpy(), atol=1e-5)


@pytest.mark.parametrize('bidirectional', [False, True])
def test_lstm_variable_lengths_match_packed(bidirectional):
    ptrandom.seed(1)
    ours = rec.LSTM(4, 3, bidirectional=bidirectional)
    t_rnn = torch.nn.LSTM(4, 3, bidirectional=bidirectional,
                          batch_first=True)
    copy_weights_to_torch(ours, t_rnn, 2 if bidirectional else 1)
    x = np.random.RandomState(0).randn(3, 8, 4).astype(np.float32)
    lens = [5, 8, 3]
    out, (h, c) = ours.eval()(jnp.asarray(x), seq_lens=lens)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), lens, batch_first=True, enforce_sorted=False)
    t_packed_out, (t_h, t_c) = t_rnn(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        t_packed_out, batch_first=True, total_length=8)
    np.testing.assert_allclose(
        np.asarray(out), t_out.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h), t_h.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c), t_c.detach().numpy(), atol=1e-5)


def test_gru_matches_torch():
    ptrandom.seed(2)
    ours = rec.GRU(4, 3, bidirectional=True)
    t_rnn = torch.nn.GRU(4, 3, bidirectional=True, batch_first=True)
    copy_weights_to_torch(ours, t_rnn, 2)
    x = np.random.RandomState(0).randn(2, 6, 4).astype(np.float32)
    out, h = ours.eval()(jnp.asarray(x))
    t_out, t_h = t_rnn(torch.tensor(x))
    np.testing.assert_allclose(
        np.asarray(out), t_out.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h), t_h.detach().numpy(), atol=1e-5)


def test_stateful_lstm_streams():
    ptrandom.seed(3)
    s = rec.StatefulLSTM(4, 3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4), 'float32')
    y1 = s(x)
    assert s.states is not None
    y2 = s(x)
    # state carried over -> different output for same input
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    del s.states
    y3 = s(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y3), atol=1e-6)


def test_reverse_padded():
    x = jnp.asarray([[1, 2, 0, 0], [1, 2, 3, 4]])
    got = rec.reverse_padded(x, jnp.asarray([2, 4]))
    np.testing.assert_array_equal(
        np.asarray(got), [[2, 1, 0, 0], [4, 3, 2, 1]])


def test_conv_transpose_matches_torch():
    from padertorch_tpu import nn as ptnn
    ptrandom.seed(5)
    for stride, pad, dil in [(2, 0, 1), (3, 2, 1), (2, 1, 2)]:
        ours = ptnn.ConvTranspose1d(4, 3, 5, stride=stride, padding=pad,
                                    dilation=dil)
        t_conv = torch.nn.ConvTranspose1d(4, 3, 5, stride=stride,
                                          padding=pad, dilation=dil)
        # torch stores (in, out, k); ours (out, in, k)
        with torch.no_grad():
            t_conv.weight.copy_(torch.tensor(
                np.asarray(ours.weight).transpose(1, 0, 2).copy()))
            t_conv.bias.copy_(torch.tensor(np.asarray(ours.bias)))
        x = np.random.RandomState(0).randn(2, 4, 11).astype(np.float32)
        got = np.asarray(ours(jnp.asarray(x)))
        want = t_conv(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_matches_torch():
    from padertorch_tpu import nn as ptnn
    ptrandom.seed(6)
    for stride, pad, dil, groups in [(1, 0, 1, 1), (2, 3, 1, 1),
                                     (1, 2, 2, 1), (1, 1, 1, 4)]:
        ours = ptnn.Conv1d(4, 8, 3, stride=stride, padding=pad,
                           dilation=dil, groups=groups)
        t_conv = torch.nn.Conv1d(4, 8, 3, stride=stride, padding=pad,
                                 dilation=dil, groups=groups)
        with torch.no_grad():
            t_conv.weight.copy_(torch.tensor(np.asarray(ours.weight)))
            t_conv.bias.copy_(torch.tensor(np.asarray(ours.bias)))
        x = np.random.RandomState(0).randn(2, 4, 11).astype(np.float32)
        got = np.asarray(ours(jnp.asarray(x)))
        want = t_conv(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_lstm_bf16_compute_close_to_f32():
    ptrandom.seed(9)
    f32 = rec.LSTM(8, 16, bidirectional=True).eval()
    bf16 = rec.LSTM.__new__(rec.LSTM)
    bf16.__dict__.update(f32.__dict__)
    bf16.compute_dtype = 'bfloat16'
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 8), 'float32')
    y32, _ = f32(x)
    y16, _ = bf16(x)
    err = np.abs(np.asarray(y32) - np.asarray(y16)).max()
    assert err < 0.05, err  # bf16 gate matmuls, f32 accumulation/carry


def test_remat_matches_no_remat():
    """jax.checkpoint per layer must not change outputs or grads."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.module import partition, combine
    from padertorch_tpu.modules.recurrent import LSTM

    ptrandom.seed(11)
    lstm = LSTM(8, 16, num_layers=2, bidirectional=True)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 10, 8), 'float32')
    lens = jnp.asarray([10, 6, 8])

    def run(remat, backend):
        lstm.remat = remat
        lstm.backend = backend
        params, static = partition(lstm)

        def loss(p, xx):
            out, (h, c) = combine(p, static)(xx, seq_lens=lens)
            return jnp.sum(out ** 2) + jnp.sum(h) + jnp.sum(c)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        return val, grads

    for backend in ('scan', 'pallas'):
        v0, g0 = run(False, backend)
        v1, g1 = run(True, backend)
        np.testing.assert_allclose(v1, v0, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_bfloat16_inputs_keep_f32_carries():
    """A low-precision input stream (the trainer's bfloat16 policy casts
    example leaves) must not leak into the recurrent state: carries are
    f32 (the cell accumulates in f32, and a bf16 init would mismatch the
    f32 carry the cell emits and break the scan), while the layer
    OUTPUT is cast back to the input dtype so the policy's
    activation-memory savings survive the stack."""
    import padertorch_tpu as pt
    from padertorch_tpu.modules.recurrent import LSTM, GRU

    for cls in (LSTM, GRU):
        pt.random.seed(0)
        rnn = cls(input_size=6, hidden_size=5, num_layers=2,
                  bidirectional=True)
        # the policy casts params too — mirror it
        import jax.tree_util as jtu
        for i, w in enumerate(rnn.w_ih):
            rnn.w_ih[i] = w.astype(jnp.bfloat16)
        for i, w in enumerate(rnn.w_hh):
            rnn.w_hh[i] = w.astype(jnp.bfloat16)
        rnn.b = [None if b is None else b.astype(jnp.bfloat16)
                 for b in rnn.b]
        x = jnp.asarray(
            np.random.RandomState(0).randn(3, 11, 6), jnp.bfloat16)
        out, state = rnn(x, seq_lens=jnp.asarray([11, 7, 4]))
        assert out.dtype == jnp.bfloat16, out.dtype
        for leaf in jtu.tree_leaves(state):
            assert leaf.dtype == jnp.float32, leaf.dtype
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
        # streaming round trip: feeding the f32 state back works, and a
        # (user-held) bf16 state is promoted instead of crashing
        out2, _ = rnn(x, state=state)
        bf_state = jtu.tree_map(
            lambda s: s.astype(jnp.bfloat16), state)
        out3, _ = rnn(x, state=bf_state)
        assert out2.dtype == out3.dtype == jnp.bfloat16

        # gradients flow (f32 loss over bf16 activations)
        import jax

        def loss(x):
            return jnp.sum(rnn(x)[0].astype(jnp.float32))

        g = jax.grad(loss)(x)
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_pallas_time_major_stack_equals_batch_major():
    """The Pallas bidirectional fast path keeps the inter-layer stream
    time-major (one transpose at stack entry/exit instead of one per
    layer).  Outputs, final states and input gradients must equal the
    batch-major route exactly (same kernel, same math, different
    layout)."""
    import jax
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.modules.recurrent import LSTM

    ptrandom.seed(5)
    rnn = LSTM(6, 8, num_layers=3, bidirectional=True)
    rnn.backend = 'pallas'
    x = jnp.asarray(np.random.RandomState(2).randn(3, 11, 6), 'float32')
    lens = jnp.asarray([11, 7, 4])
    assert rnn._use_time_major_stack(3, 2)

    def run(tm_enabled):
        if not tm_enabled:
            # force the batch-major per-layer route
            orig = LSTM._use_time_major_stack
            LSTM._use_time_major_stack = lambda self, b, d: False
        try:
            out, state = rnn(x, seq_lens=lens)

            def loss(x):
                return jnp.sum(rnn(x, seq_lens=lens)[0] ** 2)

            grad = jax.grad(loss)(x)
        finally:
            if not tm_enabled:
                LSTM._use_time_major_stack = orig
        return out, state, grad

    out_tm, state_tm, grad_tm = run(True)
    out_bm, state_bm, grad_bm = run(False)
    np.testing.assert_allclose(
        np.asarray(out_tm), np.asarray(out_bm), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad_tm), np.asarray(grad_bm), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_tm),
                    jax.tree_util.tree_leaves(state_bm)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6)
    # streaming state round trip through the tm path
    out2, _ = rnn(x, seq_lens=lens, state=state_tm)
    assert out2.shape == out_tm.shape


def test_gru_pallas_time_major_stack_equals_batch_major():
    """Same layout-equivalence contract for the GRU fast path."""
    import jax
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.modules.recurrent import GRU

    ptrandom.seed(6)
    rnn = GRU(5, 7, num_layers=2, bidirectional=True)
    rnn.backend = 'pallas'
    x = jnp.asarray(np.random.RandomState(3).randn(2, 9, 5), 'float32')
    lens = jnp.asarray([9, 5])
    assert rnn._use_time_major_stack(2, 2)

    out_tm, state_tm = rnn(x, seq_lens=lens)
    grad_tm = jax.grad(
        lambda x: jnp.sum(rnn(x, seq_lens=lens)[0] ** 2))(x)

    orig = GRU._use_time_major_stack
    GRU._use_time_major_stack = lambda self, b, d: False
    try:
        out_bm, state_bm = rnn(x, seq_lens=lens)
        grad_bm = jax.grad(
            lambda x: jnp.sum(rnn(x, seq_lens=lens)[0] ** 2))(x)
    finally:
        GRU._use_time_major_stack = orig

    np.testing.assert_allclose(
        np.asarray(out_tm), np.asarray(out_bm), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad_tm), np.asarray(grad_bm), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_tm),
                    jax.tree_util.tree_leaves(state_bm)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_bf16_policy_backends_agree():
    """Under the bf16 compute policy the pallas and scan backends stay
    close (on TPU the pallas path additionally stores its HBM streams
    in bfloat16 — the kernel-level contract for that is pinned in
    tests/test_ops/test_pallas_lstm.py; on CPU the stream decision
    resolves to f32, see ``_pallas_stream_dtype``)."""
    import jax
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.modules.recurrent import GRU, LSTM

    for cls in (LSTM, GRU):
        ptrandom.seed(7)
        rnn = cls(6, 8, num_layers=2, bidirectional=True)
        rnn.compute_dtype = 'bfloat16'
        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 12, 6), 'float32')
        lens = jnp.asarray([12, 8])

        def run(backend):
            # jit: XLA-CPU's eager DotThunk can't execute the bf16
            # batched gates einsum op-by-op (works compiled, and the
            # trainer always jits)
            rnn.backend = backend
            out, state = jax.jit(
                lambda x: rnn(x, seq_lens=lens))(x)
            grad = jax.jit(jax.grad(
                lambda x: jnp.sum(rnn(x, seq_lens=lens)[0] ** 2)))(x)
            return out, state, grad

        out_p, state_p, grad_p = run('pallas')
        out_s, state_s, grad_s = run('scan')
        # states stay f32 under the policy (both backends)
        for leaf in jax.tree_util.tree_leaves((state_p, state_s)):
            assert leaf.dtype == jnp.float32, leaf.dtype
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_s), atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(grad_p), np.asarray(grad_s), atol=0.35,
            rtol=0.05)
        # stream decision: bf16 requires BOTH the policy and a TPU
        # backend (CPU's DotThunk can't run the bf16 dW_ih layouts)
        want = (jnp.bfloat16 if jax.default_backend() == 'tpu'
                else None)
        assert rnn._pallas_stream_dtype() == want
        rnn.compute_dtype = None
        assert rnn._pallas_stream_dtype() is None
