"""Recurrent layers as ``lax.scan`` over fused-gate matmuls.

TPU has no cuDNN RNN kernels, so the design goal is to keep the MXU busy:

- The input projection ``x @ W_ih`` for **all** timesteps is one large
  batched matmul hoisted out of the scan (the dominant FLOPs).
- The scan body is a single ``(B, H) @ (H, 4H)`` matmul + fused gate
  pointwise math, which XLA compiles into one while-loop step.
- Variable lengths use masks: the carry freezes beyond a sequence's length
  (so final states match PackedSequence semantics) and outputs are zeroed
  in the padded region.  The backward direction of a bidirectional RNN
  reverses only the *valid* part of each sequence, exactly like packed
  sequences in the reference.

Reference parity: ``padertorch/modules/recurrent.py`` (``StatefulLSTM``)
plus the torch.nn.LSTM/GRU functionality the reference models build on.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module
from padertorch_tpu import random as ptrandom
from padertorch_tpu import nn

__all__ = ['LSTM', 'GRU', 'StatefulLSTM', 'reverse_padded']


def reverse_padded(x, seq_lens, time_axis=1):
    """Reverse the valid part of padded sequences along ``time_axis``.

    >>> import jax.numpy as jnp
    >>> x = jnp.asarray([[1, 2, 0, 0], [1, 2, 3, 4]])
    >>> reverse_padded(x, jnp.asarray([2, 4]), time_axis=1).tolist()
    [[2, 1, 0, 0], [4, 3, 2, 1]]
    """
    if seq_lens is None:
        return jnp.flip(x, axis=time_axis)
    t = x.shape[time_axis]
    idx = jnp.arange(t)
    lens = jnp.asarray(seq_lens)
    # position i maps to (len - 1 - i) for i < len, else stays i
    batch_idx = lens[:, None] - 1 - idx[None, :]
    batch_idx = jnp.where(batch_idx >= 0, batch_idx, idx[None, :])
    # gather along time axis per batch entry (batch axis assumed 0)
    assert time_axis in (1, -x.ndim + 1), (
        'reverse_padded expects batch-first (B, T, ...) input')
    expand = (...,) + (None,) * (x.ndim - 2)
    return jnp.take_along_axis(x, batch_idx[expand].astype(jnp.int32),
                               axis=1)


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(
        key, shape, minval=-bound, maxval=bound, dtype=dtype)


class _RNNBase(Module):
    """Shared machinery: per-layer/direction weights + scan driver."""

    gates: int = 4  # LSTM

    def __init__(self, input_size, hidden_size, num_layers=1,
                 bidirectional=False, dropout=0.0, batch_first=True,
                 bias=True, dtype='float32'):
        assert batch_first, (
            'padertorch_tpu RNNs are batch-first (B, T, D); '
            'batch_first=False is not supported.')
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.dropout_p = dropout
        self.batch_first = batch_first
        self.bias = bias
        num_directions = 2 if bidirectional else 1
        g = self.gates
        bound = 1.0 / jnp.sqrt(hidden_size).item()
        self.w_ih = []
        self.w_hh = []
        self.b = []
        for layer in range(num_layers):
            in_size = input_size if layer == 0 \
                else hidden_size * num_directions
            for _ in range(num_directions):
                self.w_ih.append(_uniform(
                    ptrandom.init_key(), (in_size, g * hidden_size),
                    bound, dtype))
                self.w_hh.append(_uniform(
                    ptrandom.init_key(), (hidden_size, g * hidden_size),
                    bound, dtype))
                if bias:
                    self.b.append(_uniform(
                        ptrandom.init_key(), (g * hidden_size,),
                        bound, dtype))
                else:
                    self.b.append(None)

    # -- single direction scan ------------------------------------------------
    def _cell_init(self, batch, dtype):
        raise NotImplementedError

    def _cell_step(self, carry, gates_x, w_hh):
        raise NotImplementedError

    def _scan_direction(self, x, mask, w_ih, w_hh, b, init_carry):
        """x: (B, T, D); mask: (B, T) or None. Returns (out (B, T, H), carry)."""
        # Hoist the big matmul out of the scan: all timesteps at once.
        gates_x = x @ w_ih  # (B, T, G*H)
        if b is not None:
            gates_x = gates_x + b
        gates_x_t = jnp.swapaxes(gates_x, 0, 1)  # (T, B, G*H)
        mask_t = None if mask is None else jnp.swapaxes(mask, 0, 1)

        def step(carry, inp):
            if mask_t is None:
                gx = inp
                new_carry, h_out = self._cell_step(carry, gx, w_hh)
                return new_carry, h_out
            gx, m = inp
            new_carry, h_out = self._cell_step(carry, gx, w_hh)
            m = m[:, None]
            new_carry = jax.tree_util.tree_map(
                lambda new, old: jnp.where(m, new, old), new_carry, carry)
            return new_carry, h_out * m

        xs = gates_x_t if mask_t is None else (gates_x_t, mask_t)
        carry, out_t = jax.lax.scan(step, init_carry, xs)
        return jnp.swapaxes(out_t, 0, 1), carry

    def forward(self, x, seq_lens=None, state=None):
        """x: (B, T, input_size) -> (B, T, H * num_directions).

        Returns (output, final_state); final_state layout mirrors torch:
        a pytree with leading axis (num_layers * num_directions, B, H).
        """
        batch = x.shape[0]
        num_directions = 2 if self.bidirectional else 1
        mask = None
        if seq_lens is not None:
            lens = jnp.asarray(seq_lens)
            mask = (jnp.arange(x.shape[1])[None, :]
                    < lens[:, None]).astype(x.dtype)
        finals = []
        out = x
        for layer in range(self.num_layers):
            outs = []
            for direction in range(num_directions):
                i = layer * num_directions + direction
                inp = out
                if direction == 1:
                    inp = reverse_padded(inp, seq_lens)
                if state is not None:
                    init = jax.tree_util.tree_map(
                        lambda s: s[i], state)
                else:
                    init = self._cell_init(batch, x.dtype)
                o, carry = self._scan_direction(
                    inp, mask, self.w_ih[i], self.w_hh[i], self.b[i], init)
                if direction == 1:
                    o = reverse_padded(o, seq_lens)
                outs.append(o)
                finals.append(carry)
            out = outs[0] if num_directions == 1 else jnp.concatenate(
                outs, axis=-1)
            if self.dropout_p and self.training \
                    and layer < self.num_layers - 1:
                keep = 1.0 - self.dropout_p
                m = jax.random.bernoulli(
                    ptrandom.next_key(), keep, out.shape)
                out = jnp.where(m, out / keep, 0).astype(out.dtype)
        final_state = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *finals)
        return out, final_state

    def extra_repr(self):
        return (f'{self.input_size}, {self.hidden_size}, '
                f'num_layers={self.num_layers}, '
                f'bidirectional={self.bidirectional}')


class LSTM(_RNNBase):
    """Multi-layer (bi)LSTM; returns (output, (h, c))."""

    gates = 4

    def _cell_init(self, batch, dtype):
        h = jnp.zeros((batch, self.hidden_size), dtype)
        c = jnp.zeros((batch, self.hidden_size), dtype)
        return (h, c)

    def _cell_step(self, carry, gates_x, w_hh):
        h, c = carry
        gates = gates_x + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h


class GRU(_RNNBase):
    """Multi-layer (bi)GRU; returns (output, h)."""

    gates = 3

    def _cell_init(self, batch, dtype):
        return jnp.zeros((batch, self.hidden_size), dtype)

    def _cell_step(self, carry, gates_x, w_hh):
        h = carry
        # torch GRU: r, z from summed projections; n uses r * (W_hn h + b_hn)
        gx_r, gx_z, gx_n = jnp.split(gates_x, 3, axis=-1)
        gh = h @ w_hh
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        n = jnp.tanh(gx_n + r * gh_n)
        h = (1 - z) * n + z * h
        return h, h


class StatefulLSTM(Module):
    """LSTM that keeps hidden state across calls (streaming).

    Reference parity: ``modules/recurrent.py:5``.  The state persists as a
    (functional) buffer: attribute writes in forward are captured by the
    trainer's re-partitioning, so streaming works inside jit.
    """

    def __init__(self, input_size, hidden_size, num_layers=1,
                 bidirectional=False, dropout=0.0, batch_first=True,
                 save_states=True):
        self.lstm = LSTM(
            input_size, hidden_size, num_layers=num_layers,
            bidirectional=bidirectional, dropout=dropout,
            batch_first=batch_first)
        self.hidden_size = hidden_size
        self.bidirectional = bidirectional
        self.num_layers = num_layers
        self.batch_first = batch_first
        self.save_states = save_states
        self._states = None

    @property
    def states(self):
        return self._states

    @states.setter
    def states(self, states):
        self._states = states

    @states.deleter
    def states(self):
        self._states = None

    def forward(self, x):
        h, states = self.lstm(x, state=self._states)
        self._states = states if self.save_states else None
        return h
