"""Persistent-VMEM WaveNet autoregressive sampler (Pallas).

The TPU analog of the reference's nv-wavenet *persistent* CUDA kernels
(``nv_wavenet_persistent.cuh``): ALL network weights stay resident in
VMEM for the whole synthesis, per-layer ring buffers live in VMEM
scratch, and the entire sample loop runs inside one Pallas program —
no per-step while-loop machinery, no HBM round-trips for activations.

Per sample step (mirrors ``modules/wavenet/wavenet.py:sample``):

- embedding of the previous index as a one-hot (B, 256) @ (256, R)
  MXU matmul (no gather),
- 16 dilated k=2 conv layers as two (B, R) @ (R, 2R) matmuls against
  the ring-buffered past + current input, gated tanh/sigmoid,
  residual and skip 1x1 convs,
- two output 1x1 convs, then greedy argmax or Gumbel-max sampling
  with the on-core PRNG (``pltpu.prng_random_bits``).

Greedy/teacher-forced outputs match the lax.scan sampler exactly;
stochastic sampling uses the hardware PRNG stream (a different stream
than ``jax.random.categorical`` — same distribution, different draws).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['wavenet_sample']


def _uniform_from_bits(bits):
    """int32 PRNG bits -> uniform float32 in [0, 1).

    ``pltpu.prng_random_bits`` returns SIGNED int32; a bare
    ``bits >> 8`` is an ARITHMETIC shift whose sign extension makes
    the result negative for half the draws — fed into
    ``log(u + eps)`` that is NaN, and the Gumbel argmax returned
    garbage.  Masking to the low 24 bits of the shifted value keeps a
    uniform [0, 2^24) integer regardless of sign
    (tested: ``tests/test_ops/test_pallas_wavenet.py``)."""
    return ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) / (1 << 24)


def _dot(a, b):
    # f32 MXU matmuls default to a single bf16 pass inside Mosaic;
    # the AR feedback loop amplifies that loss, so force the
    # 3-pass f32 algorithm (measured: logits match XLA at ~2e-4)
    return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _kernel(cond_ref, forced_ref, wprev_ref, wcurr_ref, bdil_ref,
            wres_ref, bres_ref, wskip_ref, bskip_ref, wout_ref,
            wend_ref, embed_ref, seed_ref,
            idx_ref, logits_ref,
            buf_scr, prev_scr, *, dilations, offsets, block_t,
            use_forced, do_sample, with_logits, n_classes):
    t0 = pl.program_id(0) * block_t
    n_layers = len(dilations)
    r = embed_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        buf_scr[:] = jnp.zeros_like(buf_scr)
        prev_scr[:] = jnp.full_like(prev_scr, 128)  # mu-law zero
        if do_sample:
            pltpu.prng_seed(seed_ref[0])

    prev_idx = prev_scr[:]  # (B, 1) int32
    b = prev_idx.shape[0]
    class_iota = jax.lax.broadcasted_iota(
        jnp.int32, (b, n_classes), 1)
    for j in range(block_t):
        t = t0 + j
        if use_forced:
            cur_idx = forced_ref[j]  # (B, 1)
        else:
            cur_idx = prev_idx
        # embedding via one-hot matmul (gathers don't vectorize on TPU)
        onehot = (class_iota == cur_idx).astype(jnp.float32)
        x = _dot(onehot, embed_ref[:])  # (B, R)
        skip_sum = None
        for i in range(n_layers):
            d = dilations[i]
            slot = offsets[i] + jax.lax.rem(t, d)
            x_past = buf_scr[pl.ds(slot, 1)][0]  # (B, R)
            in_act = (
                _dot(x_past, wprev_ref[i])
                + _dot(x, wcurr_ref[i])
                + bdil_ref[i] + cond_ref[j, :, i, :]
            )
            t_act = jnp.tanh(in_act[:, :r])
            s_act = jax.nn.sigmoid(in_act[:, r:])
            acts = t_act * s_act
            # step 0 is the phantom pre-shift position: keep zeros
            write_x = x * (t > 0).astype(x.dtype)
            buf_scr[pl.ds(slot, 1)] = write_x[None]
            s = _dot(acts, wskip_ref[i]) + bskip_ref[i]
            skip_sum = s if skip_sum is None else skip_sum + s
            if i < n_layers - 1:
                x = _dot(acts, wres_ref[i]) \
                    + bres_ref[i] + x
        out = jax.nn.relu(skip_sum)
        out = jax.nn.relu(_dot(out, wout_ref[:]))
        logits = _dot(out, wend_ref[:])  # (B, C)
        if do_sample:
            bits = pltpu.prng_random_bits((b, n_classes))
            u = _uniform_from_bits(bits)
            gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            choice = logits + gumbel
        else:
            choice = logits
        new_idx = jnp.argmax(choice, axis=-1).astype(jnp.int32)
        new_idx = new_idx[:, None]  # (B, 1)
        idx_ref[j] = new_idx
        if with_logits:
            logits_ref[j] = logits
        prev_idx = new_idx
    prev_scr[:] = prev_idx


@functools.partial(
    jax.jit, static_argnames=('dilations', 'sample', 'return_logits',
                              'block_t', 'interpret'))
def wavenet_sample(cond_acts, weights, dilations, *, seed=0,
                   sample=False, forced_input=None,
                   return_logits=False, block_t=None, interpret=False):
    """Run the WaveNet AR sample loop in one persistent Pallas program.

    Args:
        cond_acts: (T, B, L, 2R) pre-shifted conditioning activations
            (position t must hold cond of t-1; step 0 zeros — exactly
            the tensor the scan sampler consumes).
        weights: dict with stacked arrays ``w_prev/w_curr (L, R, 2R)``,
            ``b_dil (L, 2R)``, ``w_res (L-1, R, R)``, ``b_res (L-1, R)``,
            ``w_skip (L, R, S)``, ``b_skip (L, S)``, ``w_out (S, O)``,
            ``w_end (O, O)``, ``embed (C, R)``.
        dilations: static per-layer dilation list.
        sample: Gumbel-max sampling with the on-core PRNG; False =
            greedy argmax (matches the scan sampler bit-for-bit).
        forced_input: optional (T, B) int32 teacher-forcing indices.

    Returns:
        (T, B) int32 indices, or ((T, B), (T, B, O) logits).
    """
    t, b, n_layers, two_r = cond_acts.shape
    r = two_r // 2
    n_classes = weights['embed'].shape[0]
    s_dim = weights['w_skip'].shape[-1]
    o_dim = weights['w_end'].shape[-1]
    offsets = []
    off = 0
    for d in dilations:
        offsets.append(off)
        off += d
    total_slots = off
    if block_t is None:
        block_t = max(k for k in (64, 32, 16, 8, 4, 2, 1) if t % k == 0)
    if sample and interpret:
        raise NotImplementedError(
            'stochastic sampling uses the TPU on-core PRNG, which '
            'has no interpret-mode lowering; use greedy '
            '(sample=False) on CPU or the lax.scan sampler')
    use_forced = forced_input is not None
    forced = (forced_input.astype(jnp.int32)[..., None] if use_forced
              else jnp.zeros((t, b, 1), jnp.int32))

    kernel = functools.partial(
        _kernel, dilations=tuple(dilations), offsets=tuple(offsets),
        block_t=block_t, use_forced=use_forced, do_sample=sample,
        with_logits=return_logits, n_classes=n_classes)

    step = lambda i: (i, 0, 0, 0)  # noqa: E731
    step3 = lambda i: (i, 0, 0)  # noqa: E731
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((t, b, 1), jnp.int32)]
    out_specs = [pl.BlockSpec((block_t, b, 1), step3,
                              memory_space=pltpu.VMEM)]
    if return_logits:
        out_shapes.append(
            jax.ShapeDtypeStruct((t, b, o_dim), jnp.float32))
        out_specs.append(pl.BlockSpec((block_t, b, o_dim), step3,
                                      memory_space=pltpu.VMEM))
    else:
        out_shapes.append(jax.ShapeDtypeStruct((1, b, o_dim),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((1, b, o_dim), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))

    results = pl.pallas_call(
        kernel,
        grid=(t // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, b, n_layers, two_r), step,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, b, 1), step3,
                         memory_space=pltpu.VMEM),
            full, full, full, full, full, full, full, full, full, full,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((total_slots, b, r), jnp.float32),
            pltpu.VMEM((b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        cond_acts.astype(jnp.float32), forced,
        weights['w_prev'], weights['w_curr'], weights['b_dil'],
        weights['w_res'], weights['b_res'],
        weights['w_skip'], weights['b_skip'],
        weights['w_out'], weights['w_end'], weights['embed'],
        jnp.asarray(seed, jnp.int32).reshape(1),
    )
    idx = results[0][..., 0]
    if return_logits:
        return idx, results[1]
    return idx
