"""Fused mask-application + iSTFT (overlap-add) as a Pallas TPU kernel.

The separation/enhancement inference hot path is ``mask * STFT ->
iSTFT`` (reference: masking models produce (..., frames, F) masks that
multiply the mixture STFT, then ``padertorch/ops/_stft.py:176``
``STFT.inverse`` reconstructs time signals).  The XLA composition
materializes the masked spectrogram in HBM, re-reads it, forms the
doubled-channel full-spectrum tensor, and runs a transposed conv whose
overlap-add re-touches every output sample ``ratio`` times.

This kernel keeps the whole chain in VMEM per frame block:

- the mask multiply happens on the VPU right next to the synthesis
  matmul's operand read (the masked spectrogram never exists in HBM);
- the per-frame time segments come from two MXU matmuls
  ``(N, F) @ (F, L)`` against precomputed synthesis matrices that
  already fold in the onesided->full spectrum reflection and the
  biorthogonal window;
- overlap-add runs on the (N + ratio - 1, shift) reshaped timeline via
  aligned rolls (the logmel kernel's framing trick, transposed), with a
  ``(ratio - 1, shift)`` VMEM carry streaming the block boundary to the
  next grid step — the TPU grid is sequential, so the carry is exact;
- only the final time samples are written back (one shift-wide row per
  frame plus one tail block per batch row).

Numerics match ``stft.inverse(spec * mask)`` to float32 accuracy
(tested against the jnp oracle via ``interpret=True`` on CPU).

Constraint (same as the logmel kernel): ``shift | window_length``
(true for all recipe configs: 512/128, 1024/256, 800/200).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from padertorch_tpu.ops._stft import get_istft_kernel

__all__ = ['masked_istft', 'get_synthesis_matrices']


def _fold_onesided(k_real, k_imag, size):
    """Fold the full-spectrum iSTFT kernels to onesided synthesis
    matrices: bins 1..size/2-1 also appear (conjugated) at channel
    size-f, so their rows fold in with the imag part negated.  The ONE
    copy of this subtle reflection math — both the public
    ``get_synthesis_matrices`` and ``masked_istft``'s cached-kernel
    path call it."""
    f = size // 2 + 1
    sr = np.asarray(k_real, np.float64)[:f].copy()
    si = np.asarray(k_imag, np.float64)[:f].copy()
    sr[1:size // 2] += np.asarray(k_real)[size - 1:size // 2:-1]
    si[1:size // 2] -= np.asarray(k_imag)[size - 1:size // 2:-1]
    return sr.astype(np.float32), si.astype(np.float32)


def get_synthesis_matrices(size, shift, window):
    """Onesided synthesis matrices ``(Sr, Si)``, each ``(F, L)``.

    ``segment = re @ Sr + im @ Si`` reproduces one frame's time-domain
    contribution of the conv-transpose iSTFT exactly: the reflection
    that rebuilds the full spectrum from the onesided one
    (``re[size - f] = re[f]``, ``im[size - f] = -im[f]``) is folded
    into the matrices, as is the biorthogonal window and the 1/size
    normalization (see ``get_istft_kernel``).
    """
    k_real, k_imag = get_istft_kernel(size, shift, window)  # (size, L)
    return _fold_onesided(k_real, k_imag, size)


def _kernel(re_ref, im_ref, m_ref, sr_ref, si_ref,
            out_ref, tail_ref, carry, *, n_block, ratio, shift,
            masked):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    re = re_ref[0]
    im = im_ref[0]
    if masked:
        m = m_ref[0]
        re = re * m
        im = im * m
    # Precision.HIGHEST: Mosaic's default lowers f32 MXU dots to one
    # bf16 pass (backend-dependent — one session's relay measured
    # 1.7e-3 rel error against the f32 oracle, another 4.8e-07); the
    # synthesis must be true f32 since the host oracle gates at 1e-4.
    # The kernel is DMA-bound, so the extra passes are free.
    seg = (
        jnp.dot(re, sr_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(im, si_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )  # (N, L) time segments, one per frame

    # overlap-add on the (N + ratio - 1, shift) reshaped timeline:
    # frame n's k-th shift-chunk lands on row n + k.  Zero-pad then
    # roll keeps every operand offset-0 aligned (cf. the logmel
    # kernel's framing rolls, here transposed).
    r1 = ratio - 1
    acc = jnp.pad(carry[:], ((0, n_block), (0, 0)))  # carry -> rows 0..r1-1
    for k in range(ratio):
        chunk = seg[:, k * shift:(k + 1) * shift]        # (N, shift)
        padded = jnp.pad(chunk, ((0, r1), (0, 0)))
        if k:
            padded = pltpu.roll(padded, k, axis=0)
        acc = acc + padded
    out_ref[0] = acc[:n_block]
    new_carry = acc[n_block:]
    carry[:] = new_carry
    # the last block's carry is the signal tail; writing every step is
    # cheap ((ratio-1) x shift) and the final write is the correct one
    tail_ref[0] = new_carry


@functools.partial(
    jax.jit, static_argnames=('shift', 'ratio', 'n_block', 'interpret'))
def _masked_istft_rows(re, im, mask, sr, si, *, shift, ratio, n_block,
                       interpret=False):
    b, tf_padded, f = re.shape
    nblocks = tf_padded // n_block
    masked = mask is not None
    kernel = functools.partial(
        _kernel, n_block=n_block, ratio=ratio, shift=shift,
        masked=masked)
    spec_block = pl.BlockSpec(
        (1, n_block, f), lambda i, j: (i, j, 0),
        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    main, tail = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, tf_padded, shift), jnp.float32),
            jax.ShapeDtypeStruct((b, ratio - 1, shift), jnp.float32),
        ),
        grid=(b, nblocks),
        in_specs=[spec_block, spec_block,
                  spec_block if masked else full, full, full],
        out_specs=(
            pl.BlockSpec((1, n_block, shift), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ratio - 1, shift), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ratio - 1, shift), jnp.float32),
        ],
        interpret=interpret,
    )(re, im,
      mask if masked else jnp.zeros((1, 1), jnp.float32), sr, si)
    return main.reshape(b, tf_padded * shift), tail.reshape(b, -1)


def masked_istft(stft_signal, mask=None, *, stft, n_block=128,
                 interpret=False):
    """``stft.inverse(stft_signal * mask)`` as one fused Pallas kernel.

    Args:
        stft_signal: STFT frames, layout per
            ``stft.complex_representation`` — ``(..., frames, F, 2)``
            stacked, ``(..., frames, 2 F)`` concat or
            ``(..., frames, F)`` complex.  Note remote-TPU relays may
            not support complex inputs; stacked/concat are native.
        mask: optional real mask, shape broadcastable to
            ``(..., frames, F)`` (e.g. per-source masks with an extra
            leading axis). ``None`` = plain iSTFT.
        stft: the :class:`padertorch_tpu.ops.STFT` whose ``inverse``
            this kernel fuses (provides window/shift/fading).
        n_block: frames per grid step (VMEM working-set knob).
        interpret: run on the Pallas CPU interpreter (tests).

    Returns:
        Time signal, identical in shape and numerics (float32) to
        ``stft.inverse(stft_signal * mask_expanded)``.
    """
    if stft.window_length % stft.shift:
        raise ValueError(
            'the fused kernel requires shift | window_length; got '
            f'{stft.window_length} % {stft.shift} — use stft.inverse')
    if stft.window_length == stft.shift:
        raise ValueError(
            'no frame overlap (window_length == shift) — the carry '
            'buffer would be empty; use stft.inverse')
    rep = stft.complex_representation
    if rep == 'stacked':
        re, im = stft_signal[..., 0], stft_signal[..., 1]
    elif rep == 'concat':
        re, im = jnp.split(stft_signal, 2, axis=-1)
    else:
        re, im = jnp.real(stft_signal), jnp.imag(stft_signal)
    if mask is not None:
        re, im, mask = jnp.broadcast_arrays(re, im, mask)
        mask = mask.astype(jnp.float32)
    org_shape = re.shape            # (..., frames, F)
    tf, f = org_shape[-2:]
    re = re.astype(jnp.float32).reshape(-1, tf, f)
    im = im.astype(jnp.float32).reshape(-1, tf, f)
    if mask is not None:
        mask = mask.reshape(-1, tf, f)

    shift = stft.shift
    ratio = stft.window_length // shift
    n_block = min(n_block, max(8, tf))
    pad_frames = -tf % n_block
    if pad_frames:
        pad = ((0, 0), (0, pad_frames), (0, 0))
        re = jnp.pad(re, pad)
        im = jnp.pad(im, pad)
        if mask is not None:
            mask = jnp.pad(mask, pad)

    if not hasattr(stft, '_synthesis_matrices'):
        # STFT does not keep the raw window, so fold the reflection
        # into its (numpy) conv istft kernels via the shared
        # _fold_onesided helper (get_synthesis_matrices starts from
        # the window instead).  The numpy copies matter: this may run
        # under an outer jit, where any op on the stft's jnp
        # attributes would return a tracer.
        k_real, k_imag = stft._istft_kernel_np
        stft._synthesis_matrices = _fold_onesided(
            k_real, k_imag, stft.size)
    sr, si = stft._synthesis_matrices

    main, tail = _masked_istft_rows(
        re, im, mask, sr, si, shift=shift, ratio=ratio,
        n_block=n_block, interpret=interpret)
    full = jnp.concatenate([main, tail], axis=-1)
    length = (tf + ratio - 1) * shift    # == (tf - 1) * shift + L
    full = full[:, :length]

    time_signal = full.reshape(*org_shape[:-2], length)
    if stft.fading not in [None, False]:
        pad_width = stft.window_length - stft.shift
        if stft.fading == 'half':
            pad_width /= 2
        cut_off = time_signal.shape[-1] - int(np.ceil(pad_width))
        time_signal = time_signal[..., int(pad_width):cut_off]
    return time_signal
