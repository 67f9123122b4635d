"""WaveNet vocoder: training graph + TPU-native autoregressive sampling.

Reference parity: ``padertorch/modules/wavenet/wavenet.py`` (structure
follows NVIDIA's nv-wavenet: embedding, k=2 dilated causal convs, cond
upsampling via transposed conv with fading crop, res/skip, two output
convs, mu-law in/out).

The reference's CUDA inference engine (``nv_wavenet/*.cuh``, 3.3k LoC of
persistent-kernel CUDA) is replaced by :meth:`WaveNet.sample`, a
``lax.scan`` over samples with per-layer **ring buffers** holding exactly
the activations the k=2 dilated convs need — the same dataflow the
persistent CUDA kernel implements with spin-synchronized thread blocks,
expressed as a compiled XLA loop.  Chunked inference with overlap
(``infer``) matches the reference's chunking.
"""
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.ops.mu_law import mu_law_encode, mu_law_decode

__all__ = ['WaveNet', 'Conv']


class Conv(Module):
    """Conv1d with optional causal padding and xavier init.

    Reference parity: ``wavenet.py:41``.
    """

    def __init__(self, in_channels, out_channels, kernel_size=1, stride=1,
                 dilation=1, bias=True, w_init_gain='linear',
                 is_causal=False):
        self.is_causal = is_causal
        self.kernel_size = kernel_size
        self.dilation = dilation
        self.conv = nn.Conv1d(
            in_channels, out_channels, kernel_size=kernel_size,
            stride=stride, dilation=dilation, bias=bias)
        # xavier-uniform with torch gain conventions
        gain = {
            'linear': 1.0, 'tanh': 5.0 / 3.0, 'relu': math.sqrt(2.0),
            'sigmoid': 1.0,
        }[w_init_gain]
        fan_in = in_channels * kernel_size
        fan_out = out_channels * kernel_size
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        self.conv.weight = jax.random.uniform(
            ptrandom.init_key(), self.conv.weight.shape,
            minval=-bound, maxval=bound, dtype=self.conv.weight.dtype)

    def forward(self, signal):
        if self.is_causal:
            pad = int((self.kernel_size - 1) * self.dilation)
            signal = jnp.pad(signal, ((0, 0), (0, 0), (pad, 0)))
        return self.conv(signal)


class WaveNet(Module):
    """See module docstring. Reference parity: ``wavenet.py:68``."""

    def __init__(
            self, n_cond_channels, upsamp_window, upsamp_stride,
            n_in_channels=256, n_layers=16, max_dilation=128,
            n_residual_channels=64, n_skip_channels=256,
            n_out_channels=256, fading='full',
    ):
        self.n_layers = n_layers
        self.max_dilation = max_dilation
        self.n_residual_channels = n_residual_channels
        self.n_out_channels = n_out_channels
        self.upsamp_stride = upsamp_stride
        self.upsamp_window = upsamp_window
        self.upsample = nn.ConvTranspose1d(
            n_cond_channels, n_cond_channels, upsamp_window, upsamp_stride)
        self.fading = fading
        self.cond_layers = Conv(
            n_cond_channels, 2 * n_residual_channels * n_layers,
            w_init_gain='tanh')
        self.dilate_layers = []
        self.res_layers = []
        self.skip_layers = []
        self.embed = nn.Embedding(n_in_channels, n_residual_channels)
        self.conv_out = Conv(
            n_skip_channels, n_out_channels, bias=False, w_init_gain='relu')
        self.conv_end = Conv(
            n_out_channels, n_out_channels, bias=False,
            w_init_gain='linear')

        loop_factor = math.floor(math.log2(max_dilation)) + 1
        self.dilations = []
        for i in range(n_layers):
            dilation = int(2 ** (i % loop_factor))
            self.dilations.append(dilation)
            self.dilate_layers.append(Conv(
                n_residual_channels, 2 * n_residual_channels,
                kernel_size=2, dilation=dilation, w_init_gain='tanh',
                is_causal=True))
            if i < n_layers - 1:
                self.res_layers.append(Conv(
                    n_residual_channels, n_residual_channels,
                    w_init_gain='linear'))
            self.skip_layers.append(Conv(
                n_residual_channels, n_skip_channels, w_init_gain='relu'))

    # ------------------------------------------------------------------ #
    def forward(self, features, audio):
        """Teacher-forced training graph.

        Args:
            features: (B, n_cond_channels, frames) local conditioning.
            audio: (B, T) in [-1, 1].

        Returns:
            (logits (B, 256, T) — shifted so position t predicts sample t,
             quantized targets (B, T))
        """
        quantized = mu_law_encode(audio)
        cond_input = self.get_cond_input(features)
        assert self.upsamp_stride > (
            cond_input.shape[-1] - quantized.shape[1]) >= 0, (
            quantized.shape, cond_input.shape)
        cond_input = cond_input[:, :, :quantized.shape[1]]

        forward_input = self.embed(quantized)  # (B, T, R)
        forward_input = jnp.swapaxes(forward_input, 1, 2)  # (B, R, T)

        cond_acts = cond_input.reshape(
            cond_input.shape[0], self.n_layers, -1, cond_input.shape[2])
        output = None
        for i in range(self.n_layers):
            in_act = self.dilate_layers[i](forward_input)
            in_act = in_act + cond_acts[:, i, :, :]
            t_act = jnp.tanh(in_act[:, :self.n_residual_channels, :])
            s_act = jax.nn.sigmoid(in_act[:, self.n_residual_channels:, :])
            acts = t_act * s_act
            if i < len(self.res_layers):
                res_acts = self.res_layers[i](acts)
                forward_input = res_acts + forward_input
            if i == 0:
                output = self.skip_layers[i](acts)
            else:
                output = self.skip_layers[i](acts) + output

        output = jax.nn.relu(output)
        output = self.conv_out(output)
        output = jax.nn.relu(output)
        output = self.conv_end(output)

        # Position t must not see sample t: shift right, zero the first.
        last = output[:, :, -1:]
        output = jnp.concatenate([last * 0.0, output[:, :, :-1]], axis=2)
        return output, quantized

    def get_cond_input(self, features):
        """Upsample features to sample rate and crop the fading region."""
        cond_input = self.upsample(features)
        if self.fading is not None:
            assert self.fading in ['half', 'full'], self.fading
            pad_width = self.upsamp_window - self.upsamp_stride
            # non-overlapping upsamplers (window == stride) have no
            # fading region; a [0:-0] slice would be EMPTY, not a no-op
            if pad_width > 0:
                if self.fading == 'half':
                    front = pad_width // 2
                    back = math.ceil(pad_width / 2)
                    cond_input = cond_input[..., front:-back]
                else:
                    cond_input = cond_input[
                        ..., pad_width:-pad_width]
        return self.cond_layers(cond_input)

    def export_weights(self):
        """Weight dict for external samplers (reference ``wavenet.py:199``)."""
        model = {
            'embedding_prev': np.zeros(
                (self.n_out_channels, self.n_residual_channels), 'float32'),
            'embedding_curr': np.asarray(self.embed.weight),
            'conv_out_weight': np.asarray(self.conv_out.conv.weight),
            'conv_end_weight': np.asarray(self.conv_end.conv.weight),
            'dilate_weights': [np.asarray(l.conv.weight)
                               for l in self.dilate_layers],
            'dilate_biases': [np.asarray(l.conv.bias)
                              for l in self.dilate_layers],
            'max_dilation': self.max_dilation,
            'res_weights': [np.asarray(l.conv.weight)
                            for l in self.res_layers],
            'res_biases': [np.asarray(l.conv.bias)
                           for l in self.res_layers],
            'skip_weights': [np.asarray(l.conv.weight)
                             for l in self.skip_layers],
            'skip_biases': [np.asarray(l.conv.bias)
                            for l in self.skip_layers],
            'use_embed_tanh': False,
        }
        return model

    # ------------------------------------------------------------------ #
    # autoregressive sampling (nv_wavenet equivalent)                     #
    # ------------------------------------------------------------------ #
    def sample(self, cond_acts, key=None, sample=True, forced_input=None,
               return_logits=False):
        """Generate mu-law sample indices for one chunk.

        Args:
            cond_acts: (B, n_layers, 2R, T) pre-computed conditioning
                activations (output of :meth:`get_cond_input`, reshaped).
            key: PRNG key for categorical sampling (required if sample).
            sample: draw from the softmax (like nv-wavenet); otherwise
                greedy argmax.

        Returns:
            (B, T) int32 mu-law indices.

        Dataflow = nv_wavenet_persistent.cuh:465 without the spin locks:
        per layer a ring buffer of size ``dilation`` holds the past
        residual activations; each scan step does k=2 dilated convs as two
        (B, R) x (R, 2R) matmuls, gates, res/skip, the two output convs,
        softmax sampling, and rotates the buffers.
        """
        b, n_layers, two_r, t_total = cond_acts.shape
        r = self.n_residual_channels
        assert two_r == 2 * r, (two_r, r)
        if key is None:
            key = jax.random.PRNGKey(0)

        # Pre-transpose weights to matmul layout.
        # dilate conv weight: (2R, R, 2) -> prev (R, 2R), curr (R, 2R)
        w_prev = [jnp.swapaxes(l.conv.weight[:, :, 0], 0, 1)
                  for l in self.dilate_layers]
        w_curr = [jnp.swapaxes(l.conv.weight[:, :, 1], 0, 1)
                  for l in self.dilate_layers]
        b_dil = [l.conv.bias for l in self.dilate_layers]
        w_res = [jnp.swapaxes(l.conv.weight[:, :, 0], 0, 1)
                 for l in self.res_layers]
        b_res = [l.conv.bias for l in self.res_layers]
        w_skip = [jnp.swapaxes(l.conv.weight[:, :, 0], 0, 1)
                  for l in self.skip_layers]
        b_skip = [l.conv.bias for l in self.skip_layers]
        w_out = jnp.swapaxes(self.conv_out.conv.weight[:, :, 0], 0, 1)
        w_end = jnp.swapaxes(self.conv_end.conv.weight[:, :, 0], 0, 1)
        embed = self.embed.weight  # (256, R)

        cond_t = jnp.transpose(cond_acts, (3, 0, 1, 2))  # (T, B, L, 2R)
        # The training graph shifts its output right by one (position t is
        # predicted from conv position t-1), so the sampler's step t must
        # see cond[t-1]; step 0 sees zeros (no information, like training).
        cond_t = jnp.concatenate(
            [jnp.zeros_like(cond_t[:1]), cond_t[:-1]], axis=0)

        buffers = [
            jnp.zeros((d, b, r), cond_acts.dtype) for d in self.dilations
        ]

        # AR sampling is precision-sensitive: under jit, XLA lowers
        # f32 matmuls to a single bf16 pass by default (O(1) logit
        # error after 16 gated layers); force the 3-pass algorithm so
        # jitted == eager == the Pallas kernel (~1.5e-4 of f64 truth).
        dot = functools.partial(
            jnp.matmul, precision=jax.lax.Precision.HIGHEST)

        def step(carry, xs):
            if forced_input is None:
                cond_step = xs
            else:
                cond_step, forced_prev = xs
            buffers, prev_idx, key, t = carry
            if forced_input is not None:
                prev_idx = forced_prev  # teacher forcing (for testing)
            x = jnp.take(embed, prev_idx, axis=0)  # (B, R)
            skip_sum = 0.0
            new_buffers = []
            for i in range(n_layers):
                d = self.dilations[i]
                buf = buffers[i]
                slot = jax.lax.rem(t, d)
                x_past = jax.lax.dynamic_index_in_dim(
                    buf, slot, axis=0, keepdims=False)  # (B, R)
                in_act = (dot(x_past, w_prev[i])
                          + dot(x, w_curr[i]) + b_dil[i]
                          + cond_step[:, i, :])
                t_act = jnp.tanh(in_act[:, :r])
                s_act = jax.nn.sigmoid(in_act[:, r:])
                acts = t_act * s_act
                # Write the *input* of this layer into the ring buffer.
                # Step 0 is the phantom pre-shift position (training zeroes
                # it via causal padding), so its writes must stay zero.
                write_x = x * (t > 0).astype(x.dtype)
                new_buffers.append(jax.lax.dynamic_update_index_in_dim(
                    buf, write_x, slot, axis=0))
                if i < len(w_res):
                    x = dot(acts, w_res[i]) + b_res[i] + x
                skip_sum = skip_sum + dot(acts, w_skip[i]) \
                    + b_skip[i]
            out = jax.nn.relu(skip_sum)
            out = jax.nn.relu(dot(out, w_out))
            logits = dot(out, w_end)  # (B, 256)
            key, sub = jax.random.split(key)
            if sample:
                idx = jax.random.categorical(sub, logits, axis=-1)
            else:
                idx = jnp.argmax(logits, axis=-1)
            idx = idx.astype(jnp.int32)
            out = (idx, logits) if return_logits else idx
            return (new_buffers, idx, key, t + 1), out

        init_idx = jnp.full((b,), 128, jnp.int32)  # mu-law zero
        xs = cond_t if forced_input is None else (
            cond_t, jnp.swapaxes(forced_input, 0, 1))
        (_, _, _, _), out = jax.lax.scan(
            step, (buffers, init_idx, key, jnp.int32(0)), xs)
        if return_logits:
            samples, logits = out
            return (jnp.swapaxes(samples, 0, 1),
                    jnp.transpose(logits, (1, 2, 0)))  # (B, 256, T)
        return jnp.swapaxes(out, 0, 1)  # (B, T)

    def sample_pallas(self, cond_acts, seed=0, sample=True,
                      forced_input=None, return_logits=False,
                      interpret=None):
        """Persistent-VMEM Pallas AR sampler (``ops/pallas/wavenet.py``)
        — all weights resident in VMEM, ring buffers in scratch, the
        whole loop one kernel.  Greedy/teacher-forced output matches
        :meth:`sample` exactly; stochastic sampling uses the on-core
        PRNG stream.

        Args/returns match :meth:`sample` (``seed`` replaces ``key``).
        """
        from padertorch_tpu.ops.pallas.wavenet import wavenet_sample
        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        b, n_layers, two_r, t_total = cond_acts.shape
        w = {
            'w_prev': jnp.stack([
                jnp.swapaxes(l.conv.weight[:, :, 0], 0, 1)
                for l in self.dilate_layers]),
            'w_curr': jnp.stack([
                jnp.swapaxes(l.conv.weight[:, :, 1], 0, 1)
                for l in self.dilate_layers]),
            'b_dil': jnp.stack([l.conv.bias
                                for l in self.dilate_layers]),
            'w_res': jnp.stack([
                jnp.swapaxes(l.conv.weight[:, :, 0], 0, 1)
                for l in self.res_layers]),
            'b_res': jnp.stack([l.conv.bias for l in self.res_layers]),
            'w_skip': jnp.stack([
                jnp.swapaxes(l.conv.weight[:, :, 0], 0, 1)
                for l in self.skip_layers]),
            'b_skip': jnp.stack([l.conv.bias
                                 for l in self.skip_layers]),
            'w_out': jnp.swapaxes(self.conv_out.conv.weight[:, :, 0],
                                  0, 1),
            'w_end': jnp.swapaxes(
                self.conv_end.conv.weight[:, :, 0], 0, 1),
            'embed': self.embed.weight,
        }
        cond_t = jnp.transpose(cond_acts, (3, 0, 1, 2))  # (T, B, L, 2R)
        cond_t = jnp.concatenate(
            [jnp.zeros_like(cond_t[:1]), cond_t[:-1]], axis=0)
        fi = None if forced_input is None else jnp.swapaxes(
            jnp.asarray(forced_input), 0, 1)
        out = wavenet_sample(
            cond_t, w, tuple(self.dilations), seed=seed,
            sample=sample,
            forced_input=fi, return_logits=return_logits,
            interpret=interpret)
        if return_logits:
            idx, logits = out
            return (jnp.swapaxes(idx, 0, 1),
                    jnp.transpose(logits, (1, 2, 0)))  # (B, 256, T)
        return jnp.swapaxes(out, 0, 1)

    def _best_sampler(self, batch, sample, key, seed):
        """Pick the Pallas persistent sampler when it is usable: on
        TPU, with a batch whose VMEM ring buffers fit (~<= 32 rows).
        It is ~5x faster single-stream AND avoids an observed O(1)
        logit drift of the jitted scan sampler on this TPU backend
        (the scan path matches f64 truth eagerly and on CPU, but
        drifts when jitted on TPU; the kernel uses explicit
        HIGHEST-precision dots)."""
        if jax.default_backend() == 'tpu' and batch <= 32:
            # seed stays a traced scalar -> one compiled kernel for
            # any key (no per-call recompilation)
            return lambda c, k: self.sample_pallas(
                c, seed=jax.random.randint(k, (), 0, 2 ** 30),
                sample=sample, interpret=False)
        return lambda c, k: self.sample(c, key=k, sample=sample)

    def infer(self, x, chunk_length=None, chunk_overlap=0, key=None,
              sample=True, parallel=False):
        """Chunked autoregressive synthesis (reference ``wavenet.py:249``).

        Args:
            x: (B, n_cond_channels, frames) conditioning features.
            parallel: synthesize all chunks **in one batched sampling
                pass** instead of sequentially.  Chunks are independent
                (each conditions only on its local features, with
                ``chunk_overlap`` warm-up samples discarded), so this
                amortizes the per-step loop overhead over all chunks —
                on TPU this is the difference between ~1.5x and ~20x
                real time (see doc/performance.md).
        Returns:
            (B, T) float audio in [-1, 1].
        """
        x = self.get_cond_input(x)
        x = x.reshape(x.shape[0], self.n_layers, -1, x.shape[2])
        length = x.shape[-1]
        if chunk_length is None or length <= chunk_length:
            chunks = [x]
            n_chunks = 1
        else:
            n_chunks = math.ceil(
                (length - chunk_overlap) / (chunk_length - chunk_overlap))
            chunk_length = math.ceil(length / n_chunks) + chunk_overlap
            chunks = None  # parallel path gathers; sequential slices
        if key is None:
            key = jax.random.PRNGKey(0)

        sampler = self._best_sampler(
            x.shape[0] if not parallel else
            x.shape[0] * n_chunks, sample, key, 0)

        if parallel and n_chunks > 1:
            # On-device chunking: ONE gather builds all overlapping
            # chunk windows, one sampler call runs them as a batch, one
            # reshape+slice reassembles.  (A python slice-per-chunk loop
            # costs hundreds of host->device dispatches — measured 20x
            # slower end-to-end on a remote-relay backend.)
            b = x.shape[0]
            hop = chunk_length - chunk_overlap
            starts = np.arange(n_chunks) * hop
            tail = int(starts[-1] + chunk_length - length)
            if tail > 0:
                x = jnp.pad(x, ((0, 0),) * 3 + ((0, tail),))
            win = starts[:, None] + np.arange(chunk_length)[None, :]
            windows = x[..., win]              # (B, L, 2R, N, C)
            stacked = jnp.moveaxis(windows, 3, 0).reshape(
                n_chunks * b, self.n_layers, -1, chunk_length)
            si = sampler(stacked, key)
            si = mu_law_decode(si, self.n_out_channels)
            si = si.reshape(n_chunks, b, chunk_length)
            # chunk 0 keeps its head; later chunks drop the warm-up
            head = si[0]
            rest = jnp.moveaxis(
                si[1:, :, chunk_overlap:], 0, 1).reshape(b, -1)
            return jnp.concatenate([head, rest], axis=-1)[..., :length]

        if chunks is None:
            chunks = [
                x[..., onset:onset + chunk_length]
                for onset in range(0, length - chunk_overlap,
                                   chunk_length - chunk_overlap)
            ]

        audio = []
        for i, xi in enumerate(chunks):
            key, sub = jax.random.split(key)
            si = sampler(xi, sub)
            si = mu_law_decode(si, self.n_out_channels)
            if i > 0:
                si = si[..., chunk_overlap:]
            audio.append(si)
        return jnp.concatenate(audio, axis=-1)
