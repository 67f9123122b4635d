"""Streaming (online) STFT analysis and synthesis.

Online deployment (live speech enhancement, ASR frontends, incremental
vocoding) processes audio in fixed-size chunks at a fixed latency.  The
offline :class:`~padertorch_tpu.ops._stft.STFT` pads the whole utterance
(fading) and convolves once; these wrappers carry the overlap across
chunk boundaries instead, so that streaming a signal chunk by chunk
yields frames / samples numerically identical to the offline transform
(up to XLA reduction order).

TPU-first design: the carried state is a fixed-size device array
(``window_length - shift`` samples for analysis, the not-yet-final
overlap-add tail for synthesis), and ``step`` is a pure jittable
function with static shapes — one compiled program per chunk size is
reused for the whole stream.  Chunk lengths must be multiples of
``shift`` (pad the final chunk and track true lengths, as everywhere
else in this framework).

Reference parity: the offline operator mirrors
``padertorch/ops/_stft.py``; the reference has no streaming mode —
this module is a beyond-reference addition, equality-tested against
the offline transform.

Example (analysis)::

    stft = STFT(512, 128, fading='full')
    streamer = StreamingSTFT(stft)
    state = streamer.init_state(batch_shape=(B,))
    step = jax.jit(streamer.step)
    for chunk in chunks:                  # (B, S), S % shift == 0
        state, frames = step(state, chunk)
    tail = streamer.finalize(state)
    # concat(frames..., tail) == stft(concat(chunks...))
"""
import copy

import jax.numpy as jnp
from jax import lax

from padertorch_tpu.ops._stft import STFT

__all__ = ['StreamingSTFT', 'StreamingISTFT']


def _inner_nofade(stft: STFT) -> STFT:
    """The same transform without fading/end padding (shared kernels)."""
    inner = copy.copy(stft)
    inner.fading = None
    inner.pad = False
    return inner


def _check_fading(fading):
    if fading == 'half':
        raise NotImplementedError(
            "fading='half' pads (window_length - shift) // 2 samples, "
            'which is not a whole number of shifts — stream with '
            "fading='full' (the default) or fading=None.")
    return fading in [True, 'full']


class StreamingSTFT:
    """Chunkwise STFT analysis, equal to the offline ``STFT``.

    The state is the last ``window_length - shift`` samples of the
    (conceptually zero-prefixed) stream.  For ``fading='full'`` the
    zero-initialised state *is* the offline fading pad, so the very
    first chunk already yields offline frames.  For ``fading=None``
    the first :attr:`warmup_frames` frames of the stream cover the
    synthetic zero prefix and must be dropped (requires
    ``(window_length - shift) % shift == 0``).
    """

    def __init__(self, stft: STFT):
        self._full_fading = _check_fading(stft.fading)
        self.stft = stft
        self.shift = stft.shift
        self.overlap = stft.window_length - stft.shift
        assert self.overlap >= 0, (stft.window_length, stft.shift)
        self._inner = _inner_nofade(stft)
        if not self._full_fading and self.overlap % self.shift:
            raise ValueError(
                f'fading=None streaming needs shift '
                f'({self.shift}) to divide window_length - shift '
                f'({self.overlap}) so the warmup frames align.')

    @property
    def warmup_frames(self) -> int:
        """Leading stream frames to drop (0 for ``fading='full'``)."""
        return 0 if self._full_fading else self.overlap // self.shift

    def init_state(self, batch_shape=(), dtype=None):
        return jnp.zeros((*batch_shape, self.overlap),
                         dtype or self.stft.dtype)

    def step(self, state, chunk):
        """(state, [..., S]) -> (state, [..., S // shift, bins])."""
        assert chunk.shape[-1] % self.shift == 0, (
            f'chunk length {chunk.shape[-1]} must be a multiple of '
            f'shift={self.shift}')
        assert chunk.shape[-1] >= self.shift
        x = jnp.concatenate([state, chunk.astype(state.dtype)], axis=-1)
        frames = self._inner(x)
        new_state = x[..., x.shape[-1] - self.overlap:]
        return new_state, frames

    @property
    def _tail_zeros(self) -> int:
        """Trailing zeros the offline transform appends after the data."""
        if self._full_fading:
            tail = self.overlap  # fading pad
            if self.stft.pad:
                tail += (-self.overlap) % self.shift
        else:
            tail = (self.overlap % self.shift) if self.stft.pad else 0
        return tail

    @property
    def finalize_frames(self) -> int:
        """Number of frames :meth:`finalize` emits."""
        n = (self.overlap + self._tail_zeros
             - self.stft.window_length) // self.shift + 1
        return max(0, n)

    def finalize(self, state):
        """Emit the frames that cover the offline end padding."""
        if self.finalize_frames <= 0:
            bins = self.stft.size // 2 + 1
            shape = {
                'complex': (0, bins), 'concat': (0, 2 * bins),
                'stacked': (0, bins, 2),
            }[self.stft.complex_representation]
            dtype = (jnp.complex64
                     if self.stft.complex_representation == 'complex'
                     else state.dtype)
            return jnp.zeros((*state.shape[:-1], *shape), dtype)
        pad = jnp.zeros((*state.shape[:-1], self._tail_zeros), state.dtype)
        return self._inner(jnp.concatenate([state, pad], axis=-1))

    @property
    def _frames_axis(self) -> int:
        return (-3 if self.stft.complex_representation == 'stacked'
                else -2)

    def process(self, signal, chunk_size):
        """Reference (non-jitted) driver: stream ``signal`` and return
        the concatenated frames; equals ``self.stft(signal)``."""
        assert signal.shape[-1] % chunk_size == 0, (
            signal.shape, chunk_size)
        state = self.init_state(signal.shape[:-1], signal.dtype)
        outs = []
        for start in range(0, signal.shape[-1], chunk_size):
            state, frames = self.step(
                state, signal[..., start:start + chunk_size])
            outs.append(frames)
        outs.append(self.finalize(state))
        frames = jnp.concatenate(outs, axis=self._frames_axis)
        if self.warmup_frames:
            axis = frames.ndim + self._frames_axis
            frames = lax.slice_in_dim(
                frames, self.warmup_frames, frames.shape[axis], axis=axis)
        return frames


class StreamingISTFT:
    """Chunkwise iSTFT synthesis, equal to ``STFT.inverse``.

    The state is the ``window_length - shift`` sample overlap-add tail
    that future frames still contribute to.  Each ``step`` consumes
    ``F`` frames and emits exactly ``F * shift`` finalized samples.
    For ``fading='full'`` the first :attr:`warmup_samples` emitted
    samples are the reconstruction of the fading pad the offline
    inverse cuts off — drop them; :meth:`finalize` then emits nothing
    (the tail is the trailing fade).  For ``fading=None`` nothing is
    dropped and :meth:`finalize` emits the tail.
    """

    def __init__(self, stft: STFT):
        self._full_fading = _check_fading(stft.fading)
        self.stft = stft
        self.shift = stft.shift
        self.overlap = stft.window_length - stft.shift
        self._inner = _inner_nofade(stft)

    @property
    def warmup_samples(self) -> int:
        return self.overlap if self._full_fading else 0

    def init_state(self, batch_shape=(), dtype=None):
        return jnp.zeros((*batch_shape, self.overlap),
                         dtype or self.stft.dtype)

    def step(self, state, frames):
        """(state, [..., F, bins]) -> (state, [..., F * shift])."""
        y = self._inner.inverse(frames)  # [..., F*shift + overlap]
        emit_len = y.shape[-1] - self.overlap
        assert emit_len >= 1, (y.shape, self.overlap)
        if self.overlap:
            y = y.at[..., :self.overlap].add(state.astype(y.dtype))
        emit = y[..., :emit_len]
        new_state = y[..., emit_len:]
        return new_state, emit

    def finalize(self, state):
        """Remaining samples after the last frame (may be 0-length)."""
        keep = 0 if self._full_fading else self.overlap
        return state[..., :keep]

    def process(self, frames, chunk_frames):
        """Reference (non-jitted) driver; equals
        ``self.stft.inverse(frames)``."""
        frames_axis = (-3 if self.stft.complex_representation == 'stacked'
                       else -2)
        frames_moved = jnp.moveaxis(frames, frames_axis, 0)
        n = frames_moved.shape[0]  # the last chunk may be shorter
        batch_shape = frames.shape[:frames_axis]
        state = self.init_state(batch_shape)
        outs = []
        for start in range(0, n, chunk_frames):
            chunk = jnp.moveaxis(
                frames_moved[start:start + chunk_frames], 0, frames_axis)
            state, emit = self.step(state, chunk)
            outs.append(emit)
        outs.append(self.finalize(state))
        signal = jnp.concatenate(outs, axis=-1)
        return signal[..., self.warmup_samples:]
