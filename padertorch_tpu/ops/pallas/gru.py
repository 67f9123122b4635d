"""Pallas GRU cell-scan kernel (forward + custom VJP).

Same design as :mod:`padertorch_tpu.ops.pallas.lstm` (see its module
docstring for the rationale): the whole time recurrence runs in one
Pallas program with the recurrent weights pinned in VMEM, the grid
blocked over time, and a custom VJP that replays *stored* activations
in a reverse-order kernel.  The dW_hh reduction is a streaming XLA
einsum outside the kernel.

GRU specifics (torch semantics — ``modules/recurrent.py:GRU``):

    gh  = h_prev @ W_hh                  # (B, 3H): r, z, n blocks
    r   = sigmoid(gx_r + gh_r)
    z   = sigmoid(gx_z + gh_z)
    n   = tanh(gx_n + r * gh_n)
    h   = (1 - z) * n + z * h_prev

Residuals for backward: (r, z, n) per step plus ``gh_n`` (the reset
gate needs it: dr = da_n * gh_n) and ``h_prev`` (reconstructed from the
shifted output sequence plus a segment-start h0 term — exact for
contiguous-valid masks, the packed-sequence contract; see the
reconstruction comment in ``_bwd_call``).  ``dW_hh`` columns for the
n block use ``da_n * r`` as the pre-activation gradient; r/z blocks
use their own.

Used by ``modules.recurrent.GRU`` when ``backend='pallas'``.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from padertorch_tpu.ops.pallas.lstm import (
    _compiler_params, _dir_matmul, _norm_w, _pick_block_t,
)

__all__ = ['gru_cell_scan']


def _fwd_kernel(gx_ref, w_ref, mask_ref, h0_ref,
                out_ref, acts_ref, ghn_ref, hT_ref,
                h_scr, *, use_mask, n_dir, cast, block_t,
                with_residuals=True):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    hdim = h.shape[-1]
    for j in range(block_t):
        gh = _dir_matmul(h, w_ref, n_dir, cast=cast)
        gx = gx_ref[j].astype(jnp.float32)
        r = jax.nn.sigmoid(gx[:, :hdim] + gh[:, :hdim])
        z = jax.nn.sigmoid(
            gx[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
        gh_n = gh[:, 2 * hdim:]
        n = jnp.tanh(gx[:, 2 * hdim:] + r * gh_n)
        h_new = (1 - z) * n + z * h
        if use_mask:
            m = mask_ref[j]  # (B, 1)
            h_new = jnp.where(m > 0, h_new, h)
            h_out = h_new * m
        else:
            h_out = h_new
        # residuals in the stream dtype (bf16 under the bf16 policy —
        # halves HBM traffic; the f32 h carry in scratch is unaffected)
        if with_residuals:
            acts_ref[j] = jnp.concatenate(
                [r, z, n], axis=-1).astype(acts_ref.dtype)
            ghn_ref[j] = gh_n.astype(ghn_ref.dtype)
        out_ref[j] = h_out.astype(out_ref.dtype)
        h = h_new
    h_scr[:] = h
    nprog = pl.num_programs(0)

    @pl.when(t == nprog - 1)
    def _():
        hT_ref[:] = h


def _bwd_kernel(acts_ref, ghn_ref, hprev_ref, w_ref, mask_ref,
                dout_ref, dhT_ref,
                dgx_ref, dgh_ref, dh0_ref,
                dh_scr, *, use_mask, n_dir, cast, block_t):
    """Reverse-order grid; emits pre-activation grads dgx AND dgh
    (dgh feeds the dW_hh einsum outside; dgx feeds dW_ih/dx)."""
    t = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhT_ref[:]

    hdim = dh_scr.shape[-1]
    dh_carry = dh_scr[:]
    for j in reversed(range(block_t)):
        acts = acts_ref[j].astype(jnp.float32)
        r = acts[:, :hdim]
        z = acts[:, hdim:2 * hdim]
        n = acts[:, 2 * hdim:]
        gh_n = ghn_ref[j].astype(jnp.float32)
        h_prev = hprev_ref[j].astype(jnp.float32)

        dh = dh_carry + dout_ref[j].astype(jnp.float32)
        if use_mask:
            m = mask_ref[j]  # (B, 1)
        dz_pre = dh * (h_prev - n) * z * (1 - z)
        dn = dh * (1 - z)
        da_n = dn * (1 - n * n)
        dr = da_n * gh_n
        da_r = dr * r * (1 - r)
        dgh_n = da_n * r
        # pre-activation grads: gx blocks use (da_r, dz_pre, da_n);
        # gh blocks use (da_r, dz_pre, da_n * r)
        dgx = jnp.concatenate([da_r, dz_pre, da_n], axis=-1)
        dgh = jnp.concatenate([da_r, dz_pre, dgh_n], axis=-1)
        if use_mask:
            dgx = dgx * m
            dgh = dgh * m
        dh_prev = (_dir_matmul(dgh, w_ref, n_dir, transpose=True,
                               cast=cast)
                   + dh * z)
        if use_mask:
            dh_prev = jnp.where(m > 0, dh_prev, dh_carry)
        dgx_ref[j] = dgx.astype(dgx_ref.dtype)
        dgh_ref[j] = dgh.astype(dgh_ref.dtype)
        dh_carry = dh_prev
    dh_scr[:] = dh_carry

    @pl.when(t == nprog - 1)
    def _():
        dh0_ref[:] = dh_carry



def _fwd_call(gates_x, w_hh, mask, h0, interpret, compute_dtype=None,
              with_residuals=True):
    t, b, gh3 = gates_x.shape
    w3, n_dir, _ = _norm_w(w_hh)
    h = gh3 // 3
    use_mask = mask is not None
    cast = None if compute_dtype is None else jnp.dtype(compute_dtype)
    if interpret:
        # CPU DotThunk can't run bf16 while-body dots (see lstm.py);
        # interpret-mode recurrence compute stays f32
        cast = None
    if cast is not None:
        w3 = w3.astype(cast)
    # HBM streams (out + residuals) follow gates_x's dtype (see lstm.py)
    stream = gates_x.dtype
    bt = _pick_block_t(t, b, gh3)
    # unused mask: one constant block, not a streamed (T, b, 1) tensor
    mask_arg = (mask[..., None].astype(jnp.float32) if use_mask
                else jnp.zeros((bt, b, 1), jnp.float32))
    kernel = functools.partial(
        _fwd_kernel, use_mask=use_mask, n_dir=n_dir, cast=cast,
        block_t=bt, with_residuals=with_residuals)
    gx_spec = pl.BlockSpec((bt, b, gh3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (bt, b, 1),
        (lambda i: (i, 0, 0)) if use_mask else (lambda i: (0, 0, 0)),
        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((bt, b, h), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    state = pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((b, h), jnp.float32)]
    if not with_residuals:
        def lean_kernel(gx_ref, w_ref, mask_ref, h0_ref,
                        out_ref, hT_ref, h_scr):
            class _Null:
                def __setitem__(self, *a):
                    pass
            kernel(gx_ref, w_ref, mask_ref, h0_ref,
                   out_ref, _Null(), _Null(), hT_ref, h_scr)
        out, h_t = pl.pallas_call(
            lean_kernel,
            grid=(t // bt,),
            in_specs=[gx_spec, full, mask_spec, full],
            out_shape=[
                jax.ShapeDtypeStruct((t, b, h), stream),
                jax.ShapeDtypeStruct((b, h), jnp.float32),
            ],
            out_specs=[h_spec, state],
            scratch_shapes=scratch,
            interpret=interpret,
            **_compiler_params(interpret, w3),
        )(gates_x, w3, mask_arg, h0)
        return out, None, None, h_t
    acts_spec = pl.BlockSpec((bt, b, gh3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out, acts, ghn, h_t = pl.pallas_call(
        kernel,
        grid=(t // bt,),
        in_specs=[gx_spec, full, mask_spec, full],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h), stream),
            jax.ShapeDtypeStruct((t, b, gh3), stream),
            jax.ShapeDtypeStruct((t, b, h), stream),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        out_specs=[h_spec, acts_spec, h_spec, state],
        scratch_shapes=scratch,
        interpret=interpret,
        **_compiler_params(interpret, w3),
    )(gates_x, w3, mask_arg, h0)
    return out, acts, ghn, h_t


def _bwd_call(residuals, cotangents, interpret, compute_dtype=None):
    # gates_x is not a residual (only its shape/dtype are needed,
    # which `acts` shares) — see lstm.py's note on residual liveness
    (w_hh, mask, h0, out, acts, ghn) = residuals
    d_out, dh_t = cotangents
    t, b, gh3 = acts.shape
    w3, n_dir, squeeze = _norm_w(w_hh)
    h = gh3 // 3
    use_mask = mask is not None
    cast = None if compute_dtype is None else jnp.dtype(compute_dtype)
    if interpret:
        cast = None  # see _fwd_call: CPU DotThunk bf16 limitation
    w_bwd = w3 if cast is None else w3.astype(cast)
    bt = _pick_block_t(t, b, gh3)
    nb = t // bt
    mask_arg = (mask[..., None].astype(jnp.float32) if use_mask
                else jnp.zeros((bt, b, 1), jnp.float32))
    # h_prev sequence: h0 then out[:-1].  out is masked (zeros in
    # padding), so a VALID step following a masked one would read 0
    # instead of its true frozen carry; for contiguous-valid masks
    # (the packed-sequence contract — see lstm.py's dW note) that
    # happens only at the segment start, where the true carry is h0 —
    # added below as an elementwise `starts` term at zero cost.  h0 is
    # cast DOWN to the stream dtype: a mixed-dtype concatenate would
    # silently promote the whole bf16 out stream back to a full-width
    # f32 HBM copy.
    h0s = h0.astype(out.dtype)
    h_prev_seq = jnp.concatenate([h0s[None], out[:-1]], axis=0)
    if use_mask:
        starts = (mask[1:] * (1.0 - mask[:-1]))[..., None]
        h_prev_seq = h_prev_seq.at[1:].add(
            (starts * h0s[None]).astype(out.dtype))
    kernel = functools.partial(_bwd_kernel, use_mask=use_mask,
                               n_dir=n_dir, cast=cast, block_t=bt)
    rev = lambda i: (nb - 1 - i, 0, 0)  # noqa: E731
    g_spec = pl.BlockSpec((bt, b, gh3), rev, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((bt, b, h), rev, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (bt, b, 1), rev if use_mask else (lambda i: (0, 0, 0)),
        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    state = pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    dgx, dgh, dh0 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[g_spec, h_spec, h_spec, full, mask_spec, h_spec,
                  full],
        out_shape=[
            # dgx matches gates_x (custom-VJP cotangent contract);
            # dgh is internal — stream dtype feeds the dW einsum
            jax.ShapeDtypeStruct((t, b, gh3), acts.dtype),
            jax.ShapeDtypeStruct((t, b, gh3), acts.dtype),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        out_specs=[g_spec, g_spec, state],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
        **_compiler_params(interpret, w_bwd),
    )(acts, ghn, h_prev_seq, w_bwd, mask_arg, d_out, dh_t)
    # dW_hh = sum_t h_{t-1}^T dgh_t (streaming MXU einsum)
    hp = h_prev_seq
    dz = dgh
    if cast is not None:
        hp = hp.astype(cast)
        dz = dz.astype(cast)
    if n_dir == 1:
        dw = jnp.einsum('tbh,tbg->hg', hp, dz,
                        preferred_element_type=jnp.float32)
        if not squeeze:
            dw = dw[None]
    else:
        bd = b // n_dir
        dw = jnp.stack([
            jnp.einsum(
                'tbh,tbg->hg',
                hp[:, d * bd:(d + 1) * bd],
                dz[:, d * bd:(d + 1) * bd],
                preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ])
    return dgx, dw, dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_cell_scan(gates_x, w_hh, mask, h0, interpret=False,
                  compute_dtype=None):
    """Run the GRU cell recurrence over time in one Pallas program.

    Args:
        gates_x: (T, B, 3H) precomputed ``x@W_ih + b`` (f32); for a
            direction-stacked call B = D * B_single.
        w_hh: (H, 3H) recurrent weights, or (D, H, 3H) per-direction.
            NOTE: torch's GRU has a separate hidden bias ``b_hh`` that
            multiplies with r inside tanh; fold it into ``w_hh`` by
            appending a ones-column to h, or keep bias-free recurrent
            weights (this framework's GRU convention).
        mask: (T, B) validity mask or None.
        h0: (B, H) initial state.

    Returns:
        (out (T, B, H), h_T)
    """
    out, _, _, h_t = _fwd_call(
        gates_x, w_hh, mask, h0, interpret, compute_dtype,
        with_residuals=False)
    return out, h_t


def _vjp_fwd(gates_x, w_hh, mask, h0, interpret, compute_dtype=None):
    out, acts, ghn, h_t = _fwd_call(
        gates_x, w_hh, mask, h0, interpret, compute_dtype)
    residuals = (w_hh, mask, h0, out, acts, ghn)
    return (out, h_t), residuals


def _vjp_bwd(interpret, compute_dtype, residuals, cotangents):
    dgx, dw, dh0 = _bwd_call(
        residuals, cotangents, interpret, compute_dtype)
    return dgx, dw, None, dh0


gru_cell_scan.defvjp(_vjp_fwd, _vjp_bwd)
