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
import functools

import numpy as np

import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module
from padertorch_tpu import random as ptrandom
from padertorch_tpu import nn

__all__ = ['LSTM', 'GRU', 'StatefulLSTM', 'reverse_padded',
           'set_rnn_backend']


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
                 bias=True, dtype='float32', compute_dtype=None,
                 round_hidden_to_mxu=False):
        """``compute_dtype='bfloat16'`` runs the gate matmuls in bf16 on
        the MXU (params stay in ``dtype``; accumulation and the recurrent
        carry stay float32) — ~2-4x faster on TPU with negligible quality
        impact for speech models.

        ``round_hidden_to_mxu=True`` runs the whole network at the
        128-lane-aligned hidden width (e.g. 600 -> 640) with
        STRUCTURALLY-ZERO padding: pad lanes are exact zero fixed points
        of the recurrence, their weights receive identically zero
        gradients (so training keeps them zero), and outputs/states are
        sliced back to ``hidden_size`` — numerically identical to the
        unpadded model while every GEMM (including the inter-layer
        contraction dims, which kernel-boundary padding alone cannot
        align — doc/performance.md "MXU tiling") tiles onto the MXU.
        """
        assert batch_first, (
            'padertorch_tpu RNNs are batch-first (B, T, D); '
            'batch_first=False is not supported.')
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.round_hidden_to_mxu = bool(round_hidden_to_mxu)
        self._run_hidden = hidden_size
        if round_hidden_to_mxu and hidden_size % self.mxu_lane_multiple:
            self._run_hidden = (-(-hidden_size // self.mxu_lane_multiple)
                                * self.mxu_lane_multiple)
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.dropout_p = dropout
        self.batch_first = batch_first
        self.bias = bias
        self.compute_dtype = compute_dtype
        # static unroll factor of the time scan: trades compile time and
        # code size for less loop overhead on latency-bound small batches
        self.scan_unroll = 1
        # 'scan' (lax.scan) or 'pallas' (ops.pallas.lstm fused cell-scan
        # kernel; LSTM only).  The Pallas kernel's custom VJP makes the
        # *training* path ~1.75x faster (it reuses stored activations
        # instead of replaying the recurrence); forward-only is at parity.
        self.backend = 'scan'
        # per-layer jax.checkpoint: recompute layer activations in
        # backward instead of storing them (long-sequence memory)
        self.remat = False
        num_directions = 2 if bidirectional else 1
        g = self.gates
        bound = 1.0 / jnp.sqrt(hidden_size).item()
        self.w_ih = []
        self.w_hh = []
        self.b = []
        rh = self._run_hidden
        for layer in range(num_layers):
            in_size = input_size if layer == 0 \
                else hidden_size * num_directions
            for _ in range(num_directions):
                # draw at the LOGICAL shapes (same init stream as an
                # unpadded model), then structurally zero-pad
                w_ih = _uniform(
                    ptrandom.init_key(), (in_size, g * hidden_size),
                    bound, dtype)
                w_hh = _uniform(
                    ptrandom.init_key(), (hidden_size, g * hidden_size),
                    bound, dtype)
                b = _uniform(
                    ptrandom.init_key(), (g * hidden_size,),
                    bound, dtype) if bias else None
                if rh != hidden_size:
                    w_ih = self._pad_gate_axis(w_ih)
                    if layer > 0:
                        # layer input = direction-concat of padded
                        # hiddens: pad each direction's row block
                        w_ih = self._pad_row_blocks(w_ih, num_directions)
                    w_hh = self._pad_gate_axis(
                        jnp.pad(w_hh, ((0, rh - hidden_size), (0, 0))))
                    if b is not None:
                        b = self._pad_gate_axis(b)
                self.w_ih.append(w_ih)
                self.w_hh.append(w_hh)
                self.b.append(b)

    # MXU lane width; ``round_hidden_to_mxu`` rounds the hidden size up
    # to a multiple of this
    mxu_lane_multiple = 128

    @property
    def run_hidden_size(self):
        """Internal (possibly lane-padded) hidden width."""
        return getattr(self, '_run_hidden', self.hidden_size)

    def _pad_gate_axis(self, w):
        """Zero-pad each gate block of a (..., G*H) array to (..., G*Hp)."""
        h, rh = self.hidden_size, self._run_hidden
        parts = jnp.split(w, self.gates, axis=-1)
        pad = [(0, 0)] * (w.ndim - 1) + [(0, rh - h)]
        return jnp.concatenate([jnp.pad(p, pad) for p in parts], -1)

    def _pad_row_blocks(self, w, blocks):
        """Zero-pad each of ``blocks`` row groups of (blocks*H, ...) to
        (blocks*Hp, ...)."""
        h, rh = self.hidden_size, self._run_hidden
        parts = jnp.split(w, blocks, axis=0)
        pad = [(0, rh - h)] + [(0, 0)] * (w.ndim - 1)
        return jnp.concatenate([jnp.pad(p, pad) for p in parts], 0)

    # -- Pallas helpers (shared by LSTM/GRU backends) ---------------------
    @staticmethod
    def _pallas_interpret():
        # the kernels are TPU-only; run the interpreter on CPU so tests
        # and the virtual multi-chip dryrun execute the same code path
        return jax.default_backend() != 'tpu'

    def _pallas_gates_x(self, x, w_ih, b, einsum=None, stream=False):
        """Big input projection outside the kernel (bf16-able, batched
        over T), in the kernel's time-major layout.  Accumulation (and
        the bias add) is f32; with ``stream=True`` the RESULT is
        down-cast to the policy's stream dtype (bf16 under the bf16
        policy) — XLA folds the cast into the GEMM epilogue, so the
        (T, B, 4H) gates tensor is written to HBM at half width and the
        kernel DMAs it at half width."""
        if jax.default_backend() == 'tpu':
            if self.compute_dtype is not None:
                cd = jnp.dtype(self.compute_dtype)
                x = x.astype(cd)
                w_ih = w_ih.astype(cd)
        else:
            # XLA-CPU's DotThunk cannot execute the bf16 x bf16 -> f32
            # dot this kernel-layout einsum ('...tbg', output
            # transposed) lowers to when an operand is a traced value
            # (runtime UNIMPLEMENTED; the scan path's plain-layout
            # projection is fine).  The CPU pallas route is a
            # functional fallback (like interpret mode itself): run
            # the projection in f32 even when the precision policy
            # already cast the stream/params to bf16.
            x = x.astype(jnp.float32)
            w_ih = w_ih.astype(jnp.float32)
            if b is not None:
                b = b.astype(jnp.float32)
        if einsum is None:
            gates_x = jnp.dot(
                x, w_ih, preferred_element_type=jnp.float32)
        else:
            gates_x = jnp.einsum(
                einsum, x, w_ih, preferred_element_type=jnp.float32)
        if b is not None:
            gates_x = gates_x + b
        sd = self._pallas_stream_dtype() if stream else None
        if sd is not None:
            gates_x = gates_x.astype(sd)
        return gates_x

    def _pallas_stream_dtype(self):
        """bf16 under the bf16 policy ON TPU, else None (f32 streams).

        TPU-only because XLA-CPU's DotThunk cannot execute the fused
        transpose+dot layouts its own autodiff emits for the dW_ih
        contraction when BOTH operands are bf16 (UNIMPLEMENTED at
        runtime, shape/fusion-dependent) — the kernels themselves
        handle bf16 streams fine in interpret mode (tested)."""
        if (self.compute_dtype is not None
                and jnp.dtype(self.compute_dtype) == jnp.bfloat16
                and jax.default_backend() == 'tpu'):
            return jnp.bfloat16
        return None

    # -- single direction scan ------------------------------------------------
    def _cell_init(self, batch, dtype):
        raise NotImplementedError

    def _cell_step(self, carry, gates_x, w_hh):
        raise NotImplementedError

    # Pallas cell-scan guard: the kernel keeps a (rows, gates) block +
    # residuals + weights resident in VMEM per grid step; beyond this
    # rows*gates product Mosaic's scoped-vmem stack overflows (observed
    # at rows=1600, gates=512 on v5e: 17.2 MB > 16 MB).  Fall back to
    # the lax.scan path for such shapes (identical numerics, tested).
    pallas_max_rows_x_gates = 600_000

    def _pallas_shape_ok(self, rows, gates):
        if not isinstance(rows, (int, np.integer)):
            # shape-polymorphic tracing (serve.export_model with
            # polymorphic_batch=True) gives symbolic batch dims, for
            # which this VMEM guard is inconclusive — take the scan
            # path, which is shape-polymorphic-safe
            return False
        # account for hidden-padding: the kernel sees the padded width
        hp = getattr(self, '_pad_target', lambda: None)()
        if hp is not None:
            gates = getattr(self, 'gates', 4) * hp
        return rows * gates <= self.pallas_max_rows_x_gates

    def _scan_direction(self, x, mask, w_ih, w_hh, b, init_carry):
        """x: (B, T, D); mask: (B, T) or None. Returns (out (B, T, H), carry)."""
        if (self.backend == 'pallas'
                and hasattr(self, '_pallas_direction')
                and self._pallas_shape_ok(x.shape[0],
                                          w_hh.shape[-1])):
            return self._pallas_direction(
                x, mask, w_ih, w_hh, b, init_carry)
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            x = x.astype(cd)
            w_ih = w_ih.astype(cd)
            w_hh = w_hh.astype(cd)
        # Hoist the big matmul out of the scan: all timesteps at once.
        gates_x = jnp.dot(
            x, w_ih, preferred_element_type=jnp.float32)  # (B, T, G*H)
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

    def _can_batch_directions(self, layer):
        """Both directions of a layer share input size -> batchable."""
        i = layer * 2
        return self.w_ih[i].shape == self.w_ih[i + 1].shape

    # -- time-major stack (Pallas bidirectional fast path) ----------------
    #
    # The cell-scan kernels consume and emit TIME-major (T, rows, ...)
    # arrays, but the module API and the inter-layer stream are
    # batch-major — so the default path pays one HBM relayout of the
    # activations per layer each way (the "9% layout copies" in
    # doc/performance.md's flagship profile).  When every layer runs
    # the direction-batched Pallas route, the whole stack can instead
    # stay time-major: ONE transpose at stack entry and exit, flips
    # and direction-concats operate on the time axis for free, and the
    # gates einsum reads the time-major stream directly.

    def _use_time_major_stack(self, batch, num_directions):
        if (self.backend != 'pallas' or num_directions != 2
                or not hasattr(self, '_pallas_two_directions_tm')):
            return False
        if not all(self._can_batch_directions(layer)
                   for layer in range(self.num_layers)):
            return False
        return self._pallas_shape_ok(2 * batch, self.w_hh[0].shape[-1])

    def _forward_time_major(self, x, mask, mask_b, state, batch, dtype):
        """The layer loop of :meth:`forward` with a time-major stream.

        Semantically identical to the batch-major loop over
        ``_layer_forward`` (tested against it); only the activation
        layout between layers differs.
        """
        out_t = jnp.swapaxes(x, 0, 1)                 # one entry copy
        mask_t = None if mask is None else jnp.swapaxes(mask, 0, 1)
        mask_bt = (None if mask_b is None
                   else jnp.swapaxes(mask_b, 0, 1))
        finals = []
        for layer in range(self.num_layers):
            layer_fn = functools.partial(
                self._layer_forward_tm, layer, mask_t=mask_t,
                mask_bt=mask_bt, state=state, batch=batch, dtype=dtype)
            if self.remat:
                layer_fn = jax.checkpoint(layer_fn)
            out_t, layer_finals = layer_fn(out_t)
            finals.extend(layer_finals)
            if self.dropout_p and self.training \
                    and layer < self.num_layers - 1:
                keep = 1.0 - self.dropout_p
                m = jax.random.bernoulli(
                    ptrandom.next_key(), keep, out_t.shape)
                out_t = jnp.where(m, out_t / keep, 0).astype(out_t.dtype)
        return jnp.swapaxes(out_t, 0, 1), finals      # one exit copy

    def _layer_forward_tm(self, layer, out_t, *, mask_t, mask_bt,
                          state, batch, dtype):
        """One direction-batched layer on a (T, B, D) stream."""
        in_dtype = out_t.dtype
        i_f = layer * 2
        i_b = i_f + 1
        rev = jnp.flip(out_t, axis=0)
        x_pair = jnp.stack([out_t, rev])              # (2, T, B, D)
        mask2_t = None if mask_t is None else jnp.concatenate(
            [mask_t, mask_bt], axis=1)                # (T, 2B)
        if state is not None:
            init = jax.tree_util.tree_map(
                lambda s: jnp.concatenate(
                    [s[i_f], s[i_b]], 0).astype(dtype),
                state)
        else:
            init = self._cell_init(2 * batch, dtype)
        w_ih = jnp.concatenate(
            [self.w_ih[i_f][None], self.w_ih[i_b][None]])
        w_hh = jnp.concatenate(
            [self.w_hh[i_f][None], self.w_hh[i_b][None]])
        b = None if self.b[i_f] is None else jnp.stack(
            [self.b[i_f], self.b[i_b]])
        o_t2, carry2 = self._pallas_two_directions_tm(
            x_pair, mask2_t, w_ih, w_hh, b, init, batch)
        o_f = o_t2[:, :batch]
        o_b = jnp.flip(o_t2[:, batch:], axis=0)
        out_t = jnp.concatenate([o_f, o_b], axis=-1).astype(in_dtype)
        finals = [
            jax.tree_util.tree_map(lambda c: c[:batch], carry2),
            jax.tree_util.tree_map(lambda c: c[batch:], carry2),
        ]
        return out_t, finals

    def _scan_two_directions(self, x2, mask2, w_ih2, w_hh2, b2, init,
                             batch):
        """One scan over the direction-stacked batch (2B, T, D).

        w_ih2/w_hh2: (2, D, GH); the input projection uses a block einsum
        so each half of the batch hits its direction's weights.
        """
        if (self.backend == 'pallas'
                and hasattr(self, '_pallas_two_directions')
                and self._pallas_shape_ok(x2.shape[0],
                                          w_hh2.shape[-1])):
            return self._pallas_two_directions(
                x2, mask2, w_ih2, w_hh2, b2, init, batch)
        b2b = x2.shape[0]
        x_pair = x2.reshape(2, b2b // 2, *x2.shape[1:])  # (2, B, T, D)
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            x_pair = x_pair.astype(cd)
            w_ih2 = w_ih2.astype(cd)
            w_hh2 = w_hh2.astype(cd)
        gates_x = jnp.einsum(
            'dbtf,dfg->dbtg', x_pair, w_ih2,
            preferred_element_type=jnp.float32)
        if b2 is not None:
            gates_x = gates_x + b2[:, None, None, :]
        gates_x = gates_x.reshape(b2b, *gates_x.shape[2:])
        gates_x_t = jnp.swapaxes(gates_x, 0, 1)  # (T, 2B, GH)
        mask_t = None if mask2 is None else jnp.swapaxes(mask2, 0, 1)
        # recurrent weights as a block-diagonal single matmul input:
        # h (2B, H): first B rows use w_hh[0], rest w_hh[1]
        w_hh_blocks = w_hh2

        def step(carry, inp):
            gx, m = inp if mask_t is not None else (inp, None)
            new_carry, h_out = self._cell_step_two(
                carry, gx, w_hh_blocks, batch)
            if m is not None:
                m = m[:, None]
                new_carry = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(m, new, old),
                    new_carry, carry)
                h_out = h_out * m
            return new_carry, h_out

        xs = gates_x_t if mask_t is None else (gates_x_t, mask_t)
        carry, out_t = jax.lax.scan(
            step, init, xs, unroll=self.scan_unroll)
        return jnp.swapaxes(out_t, 0, 1), carry

    def _cell_step_two(self, carry, gates_x, w_hh2, batch):
        raise NotImplementedError

    def forward(self, x, seq_lens=None, state=None):
        """x: (B, T, input_size) -> (B, T, H * num_directions).

        Returns (output, final_state); final_state layout mirrors torch:
        a pytree with leading axis (num_layers * num_directions, B, H).
        """
        batch = x.shape[0]
        num_directions = 2 if self.bidirectional else 1
        h, rh = self.hidden_size, self.run_hidden_size
        if state is not None and rh != h:
            # user states come in at the logical width
            state = jax.tree_util.tree_map(
                lambda s: jnp.pad(s, ((0, 0), (0, 0), (0, rh - h))),
                state)
        mask = None
        if seq_lens is not None:
            lens = jnp.asarray(seq_lens)
            mask = (jnp.arange(x.shape[1])[None, :]
                    < lens[:, None]).astype(x.dtype)
        finals = []
        out = x
        # Backward direction via plain flips instead of per-row
        # reversal gathers (take_along_axis lowers to a TPU while loop,
        # ~1 ms/layer at B=16, T=500): flip the sequence AND the mask.
        # The masked carry freezes through the leading padded region,
        # then the valid samples are processed in reverse order;
        # flipping the output back restores forward alignment with
        # zeros in the padding — exactly packed-sequence semantics.
        mask_b = None if mask is None else jnp.flip(mask, axis=1)
        # Carries are ALWAYS float32: the cell math accumulates in f32
        # (preferred_element_type) so a low-precision input (e.g. the
        # trainer's bfloat16 policy casting examples) must not leak
        # into the recurrent state — a bf16 init would also mismatch
        # the f32 carry the cell emits and break the scan.  Outputs
        # are cast back to the input dtype per layer (below) so the
        # policy's activation-memory savings survive the RNN.
        carry_dtype = (x.dtype if jnp.dtype(x.dtype).itemsize >= 4
                       else jnp.dtype(jnp.float32))
        if self._use_time_major_stack(batch, num_directions):
            out, finals = self._forward_time_major(
                x, mask, mask_b, state, batch, carry_dtype)
            return self._finish_forward(out, finals, num_directions)
        for layer in range(self.num_layers):
            layer_fn = functools.partial(
                self._layer_forward, layer, mask=mask, mask_b=mask_b,
                state=state, batch=batch, dtype=carry_dtype,
                num_directions=num_directions)
            if self.remat:
                # per-layer rematerialization: drop this layer's
                # activations after the forward pass and recompute them
                # during backward — trades FLOPs for HBM on long
                # sequences (saves (B, T, 2H) per layer)
                layer_fn = jax.checkpoint(layer_fn)
            out, layer_finals = layer_fn(out)
            finals.extend(layer_finals)
            if self.dropout_p and self.training \
                    and layer < self.num_layers - 1:
                keep = 1.0 - self.dropout_p
                m = jax.random.bernoulli(
                    ptrandom.next_key(), keep, out.shape)
                out = jnp.where(m, out / keep, 0).astype(out.dtype)
        return self._finish_forward(out, finals, num_directions)

    def _finish_forward(self, out, finals, num_directions):
        h, rh = self.hidden_size, self.run_hidden_size
        final_state = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *finals)
        if rh != h:
            # slice the lane padding back off (pad lanes are exact
            # zeros, so this is the identity on the logical model)
            if num_directions == 2:
                out = jnp.concatenate(
                    [out[..., :h], out[..., rh:rh + h]], axis=-1)
            else:
                out = out[..., :h]
            final_state = jax.tree_util.tree_map(
                lambda s: s[..., :h], final_state)
        return out, final_state

    def _layer_forward(self, layer, out, *, mask, mask_b, state, batch,
                       dtype, num_directions):
        """One (bi)directional layer: ``out -> (out, [carries])``.

        ``dtype`` is the carry dtype (float32 for low-precision
        inputs); the layer output is cast back to the input dtype so
        a bfloat16 activation stream stays bfloat16 across layers.
        """
        in_dtype = out.dtype
        if num_directions == 2 and self._can_batch_directions(layer):
            # TPU optimization: run both directions in ONE scan by
            # stacking them into the batch axis — halves the number
            # of sequential loops and doubles the M dimension of the
            # recurrent matmul (better MXU utilization at small B).
            i_f = layer * 2
            i_b = i_f + 1
            rev = jnp.flip(out, axis=1)
            inp = jnp.concatenate([out, rev], axis=0)  # (2B, T, D)
            mask2 = None if mask is None else jnp.concatenate(
                [mask, mask_b], axis=0)
            if state is not None:
                init = jax.tree_util.tree_map(
                    lambda s: jnp.concatenate(
                        [s[i_f], s[i_b]], 0).astype(dtype),
                    state)
            else:
                init = self._cell_init(2 * batch, dtype)
            w_ih = jnp.concatenate(
                [self.w_ih[i_f][None], self.w_ih[i_b][None]])
            w_hh = jnp.concatenate(
                [self.w_hh[i_f][None], self.w_hh[i_b][None]])
            b = None if self.b[i_f] is None else jnp.stack(
                [self.b[i_f], self.b[i_b]])
            o2, carry2 = self._scan_two_directions(
                inp, mask2, w_ih, w_hh, b, init, batch)
            o_f, o_b = o2[:batch], o2[batch:]
            o_b = jnp.flip(o_b, axis=1)
            out = jnp.concatenate([o_f, o_b], axis=-1).astype(in_dtype)
            finals = [
                jax.tree_util.tree_map(lambda c: c[:batch], carry2),
                jax.tree_util.tree_map(lambda c: c[batch:], carry2),
            ]
            return out, finals
        outs = []
        finals = []
        for direction in range(num_directions):
            i = layer * num_directions + direction
            inp = out
            m = mask
            if direction == 1:
                inp = jnp.flip(inp, axis=1)
                m = mask_b
            if state is not None:
                init = jax.tree_util.tree_map(
                    lambda s: s[i].astype(dtype), state)
            else:
                init = self._cell_init(batch, dtype)
            o, carry = self._scan_direction(
                inp, m, self.w_ih[i], self.w_hh[i], self.b[i], init)
            if direction == 1:
                o = jnp.flip(o, axis=1)
            outs.append(o)
            finals.append(carry)
        out = outs[0] if num_directions == 1 else jnp.concatenate(
            outs, axis=-1)
        return out.astype(in_dtype), finals

    def extra_repr(self):
        return (f'{self.input_size}, {self.hidden_size}, '
                f'num_layers={self.num_layers}, '
                f'bidirectional={self.bidirectional}')


class LSTM(_RNNBase):
    """Multi-layer (bi)LSTM; returns (output, (h, c))."""

    gates = 4

    def _cell_init(self, batch, dtype):
        h = jnp.zeros((batch, self.run_hidden_size), dtype)
        c = jnp.zeros((batch, self.run_hidden_size), dtype)
        return (h, c)

    def _cell_step(self, carry, gates_x, w_hh):
        h, c = carry
        gates = gates_x + jnp.dot(
            h.astype(w_hh.dtype), w_hh,
            preferred_element_type=jnp.float32)
        return self._gates_to_state(gates, c)

    def _cell_step_two(self, carry, gates_x, w_hh2, batch):
        h, c = carry  # (2B, H)
        h_pair = h.reshape(2, batch, -1).astype(w_hh2.dtype)
        gh = jnp.einsum('dbh,dhg->dbg', h_pair, w_hh2,
                        preferred_element_type=jnp.float32)
        gates = gates_x + gh.reshape(2 * batch, -1)
        return self._gates_to_state(gates, c)

    def _gates_to_state(self, gates, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # MXU-tile alignment: when set (e.g. 128), the Pallas path pads the
    # hidden dimension up to a multiple so the gate GEMMs and the
    # kernel's lane dimension tile onto the 128-wide MXU/VPU.  Padded
    # lanes carry EXACT zeros through time (zero weights -> i=f=o=0.5,
    # g=0 -> c=h=0 fixed point), outputs/carries are sliced back, and
    # gradients on the padding are identically zero — bit-equal
    # semantics (tested).  Performance note: on the flagship this knob
    # alone measured neutral (doc/performance.md "MXU tiling" follow-up
    # — the H=640 win needs aligned *contraction* dims, i.e. a
    # full-width model); it exists for shapes where the kernel's lane
    # misalignment itself dominates.
    pallas_pad_hidden_multiple = None

    def _pad_target(self):
        m = getattr(self, 'pallas_pad_hidden_multiple', None)
        h = self.run_hidden_size  # round_hidden_to_mxu already aligned it
        if not m or h % m == 0:
            return None
        return -(-h // m) * m

    @staticmethod
    def _pad_gate_cols(w, h, hp):
        """Per-gate zero-pad of a (..., 4H) -> (..., 4Hp) array."""
        parts = jnp.split(w, 4, axis=-1)
        pad = [(0, 0)] * (w.ndim - 1) + [(0, hp - h)]
        return jnp.concatenate([jnp.pad(p, pad) for p in parts], -1)

    def _pad_for_pallas(self, w_ih, w_hh, b, h0, c0):
        """Pad weights/bias/carries to the tile-aligned hidden width
        (no-op when no padding applies).  Returns (hp, ...padded)."""
        hp = self._pad_target()
        if hp is None:
            return None, w_ih, w_hh, b, h0, c0
        h = self.run_hidden_size
        w_ih = self._pad_gate_cols(w_ih, h, hp)
        row_pad = [(0, 0)] * (w_hh.ndim - 2) + [(0, hp - h), (0, 0)]
        w_hh = self._pad_gate_cols(jnp.pad(w_hh, row_pad), h, hp)
        if b is not None:
            b = self._pad_gate_cols(b, h, hp)
        h0 = jnp.pad(h0, ((0, 0), (0, hp - h)))
        c0 = jnp.pad(c0, ((0, 0), (0, hp - h)))
        return hp, w_ih, w_hh, b, h0, c0

    def _slice_from_pallas(self, hp, out_t, h_t, c_t):
        if hp is None:
            return out_t, h_t, c_t
        h = self.run_hidden_size
        return out_t[..., :h], h_t[..., :h], c_t[..., :h]

    def _pallas_direction(self, x, mask, w_ih, w_hh, b, init_carry):
        from padertorch_tpu.ops.pallas.lstm import lstm_cell_scan
        h0, c0 = init_carry
        hp, w_ih, w_hh, b, h0, c0 = self._pad_for_pallas(
            w_ih, w_hh, b, h0, c0)
        # produce gates directly in the kernel's (T, B, 4H) layout --
        # a post-hoc transpose costs a full HBM copy of the gates
        gates_x_t = self._pallas_gates_x(
            x, w_ih, b, einsum='btf,fg->tbg', stream=True)
        mask_t = None if mask is None else jnp.swapaxes(mask, 0, 1)
        out_t, h_t, c_t = lstm_cell_scan(
            gates_x_t, w_hh.astype(jnp.float32), mask_t,
            h0.astype(jnp.float32), c0.astype(jnp.float32),
            self._pallas_interpret(), self.compute_dtype)
        out_t, h_t, c_t = self._slice_from_pallas(hp, out_t, h_t, c_t)
        return jnp.swapaxes(out_t, 0, 1), (h_t, c_t)

    def _pallas_two_directions(self, x2, mask2, w_ih2, w_hh2, b2, init,
                               batch):
        from padertorch_tpu.ops.pallas.lstm import lstm_cell_scan
        b2b = x2.shape[0]
        h0, c0 = init
        hp, w_ih2, w_hh2, b2, h0, c0 = self._pad_for_pallas(
            w_ih2, w_hh2, b2, h0, c0)
        x_pair = x2.reshape(2, b2b // 2, *x2.shape[1:])  # (2, B, T, D)
        bias = None if b2 is None else b2[None, :, None, :]
        # (T, 2, B, 4H) straight from the einsum: reshaping to the
        # kernel's (T, 2B, 4H) is then layout-free, where transposing a
        # (2B, T, 4H) result costs a ~300 MB HBM copy per layer
        gates_x = self._pallas_gates_x(
            x_pair, w_ih2, bias, einsum='dbtf,dfg->tdbg', stream=True)
        gates_x_t = gates_x.reshape(gates_x.shape[0], b2b, -1)
        mask_t = None if mask2 is None else jnp.swapaxes(mask2, 0, 1)
        out_t, h_t, c_t = lstm_cell_scan(
            gates_x_t, w_hh2.astype(jnp.float32), mask_t,
            h0.astype(jnp.float32), c0.astype(jnp.float32),
            self._pallas_interpret(), self.compute_dtype)
        out_t, h_t, c_t = self._slice_from_pallas(hp, out_t, h_t, c_t)
        return jnp.swapaxes(out_t, 0, 1), (h_t, c_t)

    def _pallas_two_directions_tm(self, x_pair_t, mask2_t, w_ih2, w_hh2,
                                  b2, init, batch):
        """Time-major variant: x_pair_t (2, T, B, D), mask2_t (T, 2B);
        returns (out_t (T, 2B, H), carry) with NO batch-major
        round trip (see ``_forward_time_major``)."""
        from padertorch_tpu.ops.pallas.lstm import lstm_cell_scan
        h0, c0 = init
        hp, w_ih2, w_hh2, b2, h0, c0 = self._pad_for_pallas(
            w_ih2, w_hh2, b2, h0, c0)
        bias = None if b2 is None else b2[None, :, None, :]
        gates_x = self._pallas_gates_x(
            x_pair_t, w_ih2, bias, einsum='dtbf,dfg->tdbg', stream=True)
        gates_x_t = gates_x.reshape(
            gates_x.shape[0], 2 * x_pair_t.shape[2], -1)
        out_t, h_t, c_t = lstm_cell_scan(
            gates_x_t, w_hh2.astype(jnp.float32), mask2_t,
            h0.astype(jnp.float32), c0.astype(jnp.float32),
            self._pallas_interpret(), self.compute_dtype)
        out_t, h_t, c_t = self._slice_from_pallas(hp, out_t, h_t, c_t)
        return out_t, (h_t, c_t)


class GRU(_RNNBase):
    """Multi-layer (bi)GRU; returns (output, h)."""

    gates = 3

    def _cell_init(self, batch, dtype):
        return jnp.zeros((batch, self.run_hidden_size), dtype)

    def _cell_step(self, carry, gates_x, w_hh):
        h = carry
        gh = jnp.dot(h.astype(w_hh.dtype), w_hh,
                     preferred_element_type=jnp.float32)
        return self._gates_to_state(gates_x, gh, h)

    def _cell_step_two(self, carry, gates_x, w_hh2, batch):
        h = carry  # (2B, H)
        h_pair = h.reshape(2, batch, -1).astype(w_hh2.dtype)
        gh = jnp.einsum('dbh,dhg->dbg', h_pair, w_hh2,
                        preferred_element_type=jnp.float32)
        return self._gates_to_state(gates_x, gh.reshape(h.shape[0], -1),
                                    h)

    def _gates_to_state(self, gates_x, gh, h):
        # torch GRU: r, z from summed projections; n uses r * (W_hn h + b_hn)
        gx_r, gx_z, gx_n = jnp.split(gates_x, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        n = jnp.tanh(gx_n + r * gh_n)
        h = (1 - z) * n + z * h
        return h, h

    # -- Pallas fused cell-scan backend (ops/pallas/gru.py) ---------------
    def _pallas_direction(self, x, mask, w_ih, w_hh, b, init_carry):
        from padertorch_tpu.ops.pallas.gru import gru_cell_scan
        gates_x_t = self._pallas_gates_x(
            x, w_ih, b, einsum='btf,fg->tbg', stream=True)
        mask_t = None if mask is None else jnp.swapaxes(mask, 0, 1)
        out_t, h_t = gru_cell_scan(
            gates_x_t, w_hh.astype(jnp.float32), mask_t,
            init_carry.astype(jnp.float32),
            self._pallas_interpret(), self.compute_dtype)
        return jnp.swapaxes(out_t, 0, 1), h_t

    def _pallas_two_directions(self, x2, mask2, w_ih2, w_hh2, b2, init,
                               batch):
        from padertorch_tpu.ops.pallas.gru import gru_cell_scan
        b2b = x2.shape[0]
        x_pair = x2.reshape(2, b2b // 2, *x2.shape[1:])
        bias = None if b2 is None else b2[None, :, None, :]
        gates_x = self._pallas_gates_x(
            x_pair, w_ih2, bias, einsum='dbtf,dfg->tdbg', stream=True)
        gates_x_t = gates_x.reshape(gates_x.shape[0], b2b, -1)
        mask_t = None if mask2 is None else jnp.swapaxes(mask2, 0, 1)
        out_t, h_t = gru_cell_scan(
            gates_x_t, w_hh2.astype(jnp.float32), mask_t,
            init.astype(jnp.float32),
            self._pallas_interpret(), self.compute_dtype)
        return jnp.swapaxes(out_t, 0, 1), h_t

    def _pallas_two_directions_tm(self, x_pair_t, mask2_t, w_ih2, w_hh2,
                                  b2, init, batch):
        """Time-major variant (see ``LSTM._pallas_two_directions_tm``):
        x_pair_t (2, T, B, D), mask2_t (T, 2B) -> (out_t (T, 2B, H),
        carry) with no batch-major round trip."""
        from padertorch_tpu.ops.pallas.gru import gru_cell_scan
        bias = None if b2 is None else b2[None, :, None, :]
        gates_x = self._pallas_gates_x(
            x_pair_t, w_ih2, bias, einsum='dtbf,dfg->tdbg', stream=True)
        gates_x_t = gates_x.reshape(
            gates_x.shape[0], 2 * x_pair_t.shape[2], -1)
        out_t, h_t = gru_cell_scan(
            gates_x_t, w_hh2.astype(jnp.float32), mask2_t,
            init.astype(jnp.float32),
            self._pallas_interpret(), self.compute_dtype)
        return out_t, h_t


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


def set_rnn_backend(module, backend, remat=None, compute_dtype='keep'):
    """Set the time-loop backend on every RNN inside a module tree.

    >>> from padertorch_tpu.modules.dual_path_rnn import DPRNN
    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> dprnn = set_rnn_backend(
    ...     DPRNN(16, 8, window_length=10, hop_size=5, num_blocks=1),
    ...     'pallas')
    >>> dprnn.dprnn_blocks[0].intra_chunk_rnn.rnn.backend
    'pallas'

    Args:
        module: any Module tree (model, separator, ...).
        backend: 'scan' or 'pallas' (pallas applies to LSTMs; GRUs
            keep the scan path).
        remat: optionally also set per-layer rematerialization.
        compute_dtype: 'keep' leaves each RNN's compute dtype; any
            other value (e.g. 'bfloat16' or None) overrides it.

    Returns the module (mutated in place) for chaining.
    """
    n = 0
    for _, sub in module.modules():
        if isinstance(sub, _RNNBase):
            sub.backend = backend
            if remat is not None:
                sub.remat = remat
            if compute_dtype != 'keep':
                sub.compute_dtype = compute_dtype
            n += 1
    assert n > 0, 'no RNN modules found in the tree'
    return module
