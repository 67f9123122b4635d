"""Conformer speech recognizers: CTC and RNN-T (transducer).

Beyond-reference recipe models (padertorch ships no ASR example): the
two canonical speech-recognition stacks over a shared acoustic encoder
— normalized log-mel frontend with SpecAugment, 4x convolutional time
subsampling, conformer encoder — assembled from the framework's
primitives:

- frontend: :class:`padertorch_tpu.contrib.je.modules.features.
  NormalizedLogMelExtractor` (jit-safe SpecAugment in train mode);
- encoder: :class:`padertorch_tpu.modules.conformer.ConformerEncoder`
  (masked batch norm, RoPE attention; rides the fused Pallas attention
  kernel via ``set_attention_backend``, and supports causal/windowed
  variants for streaming);
- losses: :func:`padertorch_tpu.ops.losses.ctc_loss` /
  :func:`padertorch_tpu.ops.losses.rnnt_loss` (pure-XLA lattice
  forwards — each train step is one compiled program).
"""
import jax
import jax.numpy as jnp
import numpy as np

from padertorch_tpu.base import Model
from padertorch_tpu.module import Module
from padertorch_tpu import nn
from padertorch_tpu.contrib.je.modules.features import (
    NormalizedLogMelExtractor,
)
from padertorch_tpu.modules.conformer import ConformerEncoder
from padertorch_tpu.modules.recurrent import LSTM
from padertorch_tpu.ops.losses.ctc import (
    ctc_loss, ctc_greedy_decode, edit_distance,
)
from padertorch_tpu.ops.losses.rnnt import rnnt_loss

__all__ = ['AcousticEncoder', 'ConformerCTC', 'TransducerASR',
           'AttentionASR']

_FRONTEND_DEFAULTS = {
    'factory': NormalizedLogMelExtractor,
    'sample_rate': 8000,
    'stft_size': 256,
    'number_of_filters': 40,
    # SpecAugment (train mode only; jit-safe)
    'n_time_masks': 2,
    'max_masked_time_steps': 20,
    'n_frequency_masks': 1,
    'max_masked_frequency_bands': 8,
}


class AcousticEncoder(Module):
    """Log-mel frames -> conv subsample (4x) -> conformer states."""

    def __init__(self, feature_extractor, d_model=96, num_layers=2,
                 num_heads=4, d_ff=None, kernel_size=15, dropout=0.0,
                 conv_norm='batch_norm', causal=False, attn_window=None,
                 subsample_channels=32):
        self.feature_extractor = feature_extractor
        c = subsample_channels
        # two stride-2 convs over (mel, time): 4x frame-rate reduction,
        # the standard conformer front.  Padding is applied explicitly in
        # forward: kernel 3 / stride 2 / total time pad 2 gives ceil(T/2)
        # either way, but the causal variant puts both pad frames on the
        # LEFT so no output frame sees the future (exact prefix property,
        # like the encoder's left-padded depthwise convs).
        self.subsample_convs = [
            nn.Conv2d(1, c, 3, stride=(2, 2), padding=0),
            nn.Conv2d(c, c, 3, stride=(2, 2), padding=0),
        ]
        self.causal = causal
        mels = feature_extractor.mel_transform.number_of_filters
        reduced_mels = -(-(-(-mels // 2)) // 2)  # ceil(ceil(M/2)/2)
        self.encoder = ConformerEncoder(
            d_model=d_model, num_layers=num_layers, num_heads=num_heads,
            d_ff=d_ff, kernel_size=kernel_size, dropout=dropout,
            conv_norm=conv_norm, causal=causal, attn_window=attn_window,
            input_size=c * reduced_mels,
        )
        self.d_model = d_model

    def forward(self, stft, seq_len=None):
        """(B, 1, T, F, 2) stacked STFT -> ((B, T', d_model), (B,))."""
        x, seq_len = self.feature_extractor(
            stft, seq_len=seq_len)  # (B, 1, M, T)
        t_pad = (2, 0) if self.causal else (1, 1)
        h = x
        for conv in self.subsample_convs:
            h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), t_pad))
            h = jax.nn.relu(conv(h))
        b, c, m, t = h.shape
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, t, c * m)
        if seq_len is not None:
            seq_len = jnp.asarray(seq_len)
            seq_len = -(-seq_len // 2)
            seq_len = -(-seq_len // 2)
        return self.encoder(h, seq_len=seq_len), seq_len

    # ---- carried-state streaming (online recognition) ---------------
    # The causal variant's whole stack streams with O(chunk) work per
    # call: the frontend is per-frame in eval mode (running-stat input
    # normalization, no deltas), the two stride-2 subsample convs carry
    # their last 2 input frames (zero-init == the causal left pad), and
    # the encoder streams on its KV caches + conv left contexts
    # (``ConformerEncoder.stream_step``).  Chunked == one-shot causal
    # forward (tested); chunks must be multiples of 4 STFT frames so
    # the stride-2 convs stay aligned.

    def init_stream(self, batch_size, max_frames, dtype=jnp.float32):
        """State for :meth:`stream_step`; ``max_frames`` counts INPUT
        STFT frames (the encoder cache holds ``max_frames / 4``)."""
        assert self.causal, 'streaming requires the --causal variant'
        mels = self.feature_extractor.mel_transform.number_of_filters
        c = self.subsample_convs[0].out_channels
        m1 = -(-mels // 2)
        return {
            'sub1': jnp.zeros((batch_size, 1, mels, 2), dtype),
            'sub2': jnp.zeros((batch_size, c, m1, 2), dtype),
            'encoder': self.encoder.init_stream_state(
                batch_size, -(-max_frames // 4), dtype),
        }

    def stream_step(self, stft_chunk, state, frame_index):
        """Encode a chunk of STFT frames at absolute input positions
        ``[frame_index, frame_index + Tc)`` (``Tc`` and ``frame_index``
        multiples of 4).  Returns ``(encoder_frames, new_state)``."""
        x, _ = self.feature_extractor(stft_chunk)  # (B, 1, M, Tc)
        h = x
        for conv, key in zip(self.subsample_convs, ('sub1', 'sub2')):
            cat = jnp.concatenate([state[key], h], axis=-1)
            state = dict(state, **{key: cat[..., -2:]})
            cat = jnp.pad(cat, ((0, 0), (0, 0), (1, 1), (0, 0)))
            h = jax.nn.relu(conv(cat))
        b, c, m, t = h.shape
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, t, c * m)
        h, enc_state = self.encoder.stream_step(
            h, state['encoder'], frame_index // 4)
        return h, dict(state, encoder=enc_state)


def _decode_results(batch, hyps):
    """Per-example reference/hypothesis bookkeeping shared by both
    decoders (WER = Levenshtein distance / reference length)."""
    results = {}
    labels = np.asarray(batch['labels'])
    label_lengths = np.asarray(batch['label_lengths'])
    for i, example_id in enumerate(batch['example_id']):
        ref = labels[i, :label_lengths[i]].tolist()
        hyp = list(hyps[i])
        results[example_id] = {
            'reference': ref,
            'hypothesis': hyp,
            'num_errors': edit_distance(ref, hyp),
            'num_tokens': len(ref),
        }
    return results


class ConformerCTC(Model):
    """Acoustic encoder -> linear CTC head.

    ``vocab_size`` counts real tokens; the head has ``vocab_size + 1``
    outputs with blank = 0 (labels are ids in ``1..vocab_size``).
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['feature_extractor'] = dict(_FRONTEND_DEFAULTS)

    def __init__(self, feature_extractor, vocab_size,
                 d_model=96, num_layers=2, num_heads=4, d_ff=None,
                 kernel_size=15, dropout=0.0, conv_norm='batch_norm',
                 causal=False, attn_window=None,
                 subsample_channels=32):
        self.acoustic = AcousticEncoder(
            feature_extractor, d_model=d_model, num_layers=num_layers,
            num_heads=num_heads, d_ff=d_ff, kernel_size=kernel_size,
            dropout=dropout, conv_norm=conv_norm, causal=causal,
            attn_window=attn_window,
            subsample_channels=subsample_channels)
        self.head = nn.Linear(d_model, vocab_size + 1)
        self.vocab_size = vocab_size
        self.blank = 0

    # recipe helpers reach the frontend through the model
    @property
    def feature_extractor(self):
        return self.acoustic.feature_extractor

    @property
    def causal(self):
        return self.acoustic.causal

    def forward(self, inputs):
        h, seq_len = self.acoustic(
            inputs['stft'], seq_len=inputs.get('seq_len'))
        logits = self.head(h)  # (B, T', V+1)
        return {'logits': logits, 'logit_lengths': seq_len}

    def review(self, inputs, outputs):
        logits = outputs['logits']
        logit_lengths = outputs['logit_lengths']
        if logit_lengths is None:
            logit_lengths = jnp.full(
                (logits.shape[0],), logits.shape[1], dtype='int32')
        label_lengths = jnp.asarray(inputs['label_lengths'])
        nll = ctc_loss(
            logits, logit_lengths, jnp.asarray(inputs['labels']),
            label_lengths, blank=self.blank)
        per_token = nll / jnp.maximum(label_lengths, 1)
        return {
            'loss': jnp.mean(per_token),
            'scalars': {
                'per_utt_nll': jnp.mean(nll),
                'blank_rate': jnp.mean(
                    (jnp.argmax(logits, -1) == self.blank)
                    .astype('float32')),
            },
        }

    def decode(self, batch, beam_width=None, lm_fn=None, lm_weight=0.0):
        """Transcriptions + token error rates for a batch.

        ``beam_width=None`` -> greedy best-path; otherwise prefix beam
        search (sums over alignments, optional LM shallow fusion via
        ``lm_fn(prefix, token) -> logp``)."""
        outputs = self(batch)
        logits = np.asarray(outputs['logits'])
        logit_lengths = np.asarray(outputs['logit_lengths'])
        if beam_width is None:
            hyps = ctc_greedy_decode(
                logits, logit_lengths, blank=self.blank)
        else:
            from padertorch_tpu.ops.losses.ctc import \
                ctc_beam_search_decode
            hyps = ctc_beam_search_decode(
                logits, logit_lengths, blank=self.blank,
                beam_width=beam_width, lm_fn=lm_fn, lm_weight=lm_weight)
        return _decode_results(batch, hyps)


class TransducerASR(Model):
    """Acoustic encoder + LSTM prediction network + additive joint,
    trained with the RNN-T loss (streaming-capable architecture: with
    ``causal=True`` both networks are causal and decoding is
    frame-synchronous).

    The joint is computed for the full (T', U+1) lattice during
    training — one compiled step, no per-(t, u) host loop.
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['feature_extractor'] = dict(_FRONTEND_DEFAULTS)

    def __init__(self, feature_extractor, vocab_size,
                 d_model=96, num_layers=2, num_heads=4, d_ff=None,
                 kernel_size=15, dropout=0.0, conv_norm='batch_norm',
                 causal=False, attn_window=None, subsample_channels=32,
                 pred_hidden=96, joint_dim=96):
        self.acoustic = AcousticEncoder(
            feature_extractor, d_model=d_model, num_layers=num_layers,
            num_heads=num_heads, d_ff=d_ff, kernel_size=kernel_size,
            dropout=dropout, conv_norm=conv_norm, causal=causal,
            attn_window=attn_window,
            subsample_channels=subsample_channels)
        # prediction network: blank-started label history -> states
        self.embed = nn.Embedding(vocab_size + 1, pred_hidden)
        self.pred_rnn = LSTM(pred_hidden, pred_hidden)
        # additive joint
        self.enc_proj = nn.Linear(d_model, joint_dim)
        self.pred_proj = nn.Linear(pred_hidden, joint_dim)
        self.joint_out = nn.Linear(joint_dim, vocab_size + 1)
        self.vocab_size = vocab_size
        self.blank = 0

    @property
    def feature_extractor(self):
        return self.acoustic.feature_extractor

    def _predict(self, label_history):
        """(B, U+1) blank-started ids -> (B, U+1, H) states."""
        h = self.embed(label_history)
        out, _ = self.pred_rnn(h)
        return out

    def _joint(self, enc, pred):
        """(B, T', E), (B, U+1, H) -> (B, T', U+1, V+1)."""
        e = self.enc_proj(enc)[:, :, None, :]
        p = self.pred_proj(pred)[:, None, :, :]
        return self.joint_out(jnp.tanh(e + p))

    def forward(self, inputs):
        enc, seq_len = self.acoustic(
            inputs['stft'], seq_len=inputs.get('seq_len'))
        labels = jnp.asarray(inputs['labels'])
        history = jnp.pad(
            labels, ((0, 0), (1, 0)), constant_values=self.blank)
        pred = self._predict(history)  # (B, U+1, H)
        logits = self._joint(enc, pred)
        return {'logits': logits, 'logit_lengths': seq_len}

    def review(self, inputs, outputs):
        logits = outputs['logits']
        logit_lengths = outputs['logit_lengths']
        if logit_lengths is None:
            logit_lengths = jnp.full(
                (logits.shape[0],), logits.shape[1], dtype='int32')
        label_lengths = jnp.asarray(inputs['label_lengths'])
        nll = rnnt_loss(
            logits, logit_lengths, jnp.asarray(inputs['labels']),
            label_lengths, blank=self.blank)
        per_token = nll / jnp.maximum(label_lengths, 1)
        return {
            'loss': jnp.mean(per_token),
            'scalars': {'per_utt_nll': jnp.mean(nll)},
        }

    def decode(self, batch, max_symbols_per_frame=4, beam_width=None):
        """Frame-synchronous transducer decoding (host loop over
        frames; the prediction network is re-run on the emitted prefix —
        prefix lengths are few and small, so each shape compiles once).

        ``beam_width=None`` -> greedy; otherwise depth-synchronous beam
        search (:func:`padertorch_tpu.ops.losses.rnnt.rnnt_beam_search`).
        """
        model = self.eval()
        enc, seq_len = model.acoustic(
            batch['stft'], seq_len=batch.get('seq_len'))
        enc = np.asarray(enc)
        seq_len = np.asarray(seq_len)
        if beam_width is not None:
            from padertorch_tpu.ops.losses.rnnt import rnnt_beam_search
            import jax

            @jax.jit
            def _score_level(frame, history, last_idx):
                # history: (K, L+1) blank-started padded prefixes
                pred = model._predict(history)  # (K, L+1, H)
                last = jnp.take_along_axis(
                    pred, last_idx[:, None, None], axis=1)  # (K, 1, H)
                k = history.shape[0]
                e = jnp.broadcast_to(
                    frame[None, None, :], (k, 1, frame.shape[-1]))
                return model._joint(e, last)[:, 0, 0, :]  # (K, V+1)

            def _bucket(n, multiple):
                return -(-max(n, 1) // multiple) * multiple

            def joint_batch_fn(frame, prefixes):
                # bucket (K, L) to bound recompiles to a handful
                k_pad = _bucket(len(prefixes), 8)
                l_pad = _bucket(max(len(p) for p in prefixes) + 1, 8)
                history = np.full((k_pad, l_pad), model.blank, 'int32')
                last_idx = np.zeros((k_pad,), 'int32')
                for j, p in enumerate(prefixes):
                    history[j, 1:1 + len(p)] = p
                    last_idx[j] = len(p)
                scores = _score_level(
                    jnp.asarray(frame, dtype=enc.dtype),
                    jnp.asarray(history), jnp.asarray(last_idx))
                return np.asarray(scores)[:len(prefixes)]

            hyps = rnnt_beam_search(
                None, enc, logit_lengths=seq_len, blank=model.blank,
                beam_width=beam_width,
                max_symbols_per_frame=max_symbols_per_frame,
                joint_batch_fn=joint_batch_fn)
            return _decode_results(batch, hyps)
        hyps = []
        for i in range(enc.shape[0]):
            seq = []
            for t in range(int(seq_len[i])):
                for _ in range(max_symbols_per_frame):
                    history = jnp.asarray(
                        [[model.blank] + seq], dtype='int32')
                    pred = model._predict(history)[:, -1:, :]
                    scores = model._joint(
                        jnp.asarray(enc[i:i + 1, t:t + 1]), pred)
                    token = int(np.asarray(scores).ravel().argmax())
                    if token == model.blank:
                        break
                    seq.append(token)
            hyps.append(seq)
        return _decode_results(batch, hyps)

    def stream_decode(self, stft_chunks, max_symbols_per_frame=4,
                      max_frames=4096):
        """Online (streaming) greedy recognition of ONE utterance.

        Requires the ``causal=True`` variant.  Each incoming chunk of
        STFT frames (a multiple of 4, shape ``(Tc, F, 2)`` or
        ``(1, 1, Tc, F, 2)``) costs O(chunk) encoder work via the
        carried-state :meth:`AcousticEncoder.stream_step`; emitted
        tokens are final as soon as their frame arrives (the encoder is
        strictly causal, so the transcript-so-far never changes).
        Equal to the offline greedy :meth:`decode` transcript (tested).

        Args:
            stft_chunks: iterable of chunks.
            max_symbols_per_frame: transducer expansion bound.
            max_frames: upper bound on total INPUT frames (sizes the
                preallocated attention cache).

        Returns:
            list of token ids.
        """
        model = self.eval()
        state = model.acoustic.init_stream(1, max_frames)
        seq = []
        frame_index = 0
        for chunk in stft_chunks:
            chunk = jnp.asarray(chunk)
            if chunk.ndim == 3:
                chunk = chunk[None, None]
            enc, state = model.acoustic.stream_step(
                chunk, state, frame_index)
            frame_index += chunk.shape[2]
            enc = np.asarray(enc)
            for t in range(enc.shape[1]):
                for _ in range(max_symbols_per_frame):
                    history = jnp.asarray(
                        [[model.blank] + seq], dtype='int32')
                    pred = model._predict(history)[:, -1:, :]
                    scores = model._joint(
                        jnp.asarray(enc[:, t:t + 1]), pred)
                    token = int(np.asarray(scores).ravel().argmax())
                    if token == model.blank:
                        break
                    seq.append(token)
        return seq


class AttentionASR(Model):
    """Attention encoder-decoder (AED / LAS-style) recognizer.

    The third canonical speech-recognition head next to CTC and the
    transducer: the shared acoustic encoder feeds a KV-cache
    transformer decoder through cross-attention.  Training is
    teacher-forced label-smoothed cross-entropy; decoding rides the
    framework's single-program generation loops
    (:func:`..mk.modules.transformer.autoregressive_generate` /
    :func:`..mk.modules.transformer.beam_search_generate`) — the whole
    greedy or beam search compiles to ONE ``lax.scan``.

    Token ids are shared with the other heads: real tokens are
    ``1..vocab_size``.  ``0`` doubles as BOS (it is never a target)
    and ``vocab_size + 1`` is EOS, so the output head has
    ``vocab_size + 2`` classes.
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['feature_extractor'] = dict(_FRONTEND_DEFAULTS)

    def __init__(self, feature_extractor, vocab_size,
                 d_model=96, num_layers=2, num_heads=4, d_ff=None,
                 kernel_size=15, dropout=0.0, conv_norm='batch_norm',
                 causal=False, attn_window=None, subsample_channels=32,
                 decoder_layers=2, label_smoothing=0.1,
                 max_decode_len=32):
        from padertorch_tpu.contrib.mk.modules.transformer import (
            TransformerDecoder,
        )
        self.acoustic = AcousticEncoder(
            feature_extractor, d_model=d_model, num_layers=num_layers,
            num_heads=num_heads, d_ff=d_ff, kernel_size=kernel_size,
            dropout=dropout, conv_norm=conv_norm, causal=causal,
            attn_window=attn_window,
            subsample_channels=subsample_channels)
        self.embed = nn.Embedding(vocab_size + 2, d_model)
        self.decoder = TransformerDecoder(
            d_model, decoder_layers, num_heads, d_ff=d_ff,
            dropout=dropout, d_memory=d_model)
        self.head = nn.Linear(d_model, vocab_size + 2)
        self.vocab_size = vocab_size
        self.bos = 0
        self.eos = vocab_size + 1
        self.label_smoothing = label_smoothing
        self.max_decode_len = max_decode_len

    @property
    def feature_extractor(self):
        return self.acoustic.feature_extractor

    def forward(self, inputs):
        enc, seq_len = self.acoustic(
            inputs['stft'], seq_len=inputs.get('seq_len'))
        labels = jnp.asarray(inputs['labels'])
        # teacher forcing: decoder input = [BOS, y_1 .. y_U]; padding
        # rows sit after every valid target, so causal self-attention
        # of valid positions never sees them
        history = jnp.pad(
            labels, ((0, 0), (1, 0)), constant_values=self.bos)
        h = self.decoder(
            self.embed(history), enc, memory_seq_len=seq_len)
        return {'logits': self.head(h),        # (B, U+1, V+2)
                'encoder_lengths': seq_len}

    def _targets_and_mask(self, inputs, num_positions):
        """Shift-by-one targets with EOS appended at ``label_length``.

        Returns ``(targets, mask)``: (B, U+1) int32 target ids and a
        float mask selecting positions ``0 .. label_length`` (the EOS
        prediction is a real target — the model must learn to stop).
        """
        labels = jnp.asarray(inputs['labels'])
        label_lengths = jnp.asarray(inputs['label_lengths'])
        positions = jnp.arange(num_positions)[None, :]
        targets = jnp.pad(labels, ((0, 0), (0, 1)))[:, :num_positions]
        targets = jnp.where(
            positions == label_lengths[:, None], self.eos, targets)
        mask = (positions <= label_lengths[:, None]).astype('float32')
        return targets.astype('int32'), mask

    def review(self, inputs, outputs):
        logits = outputs['logits']
        targets, mask = self._targets_and_mask(inputs, logits.shape[1])
        logp = jax.nn.log_softmax(logits.astype('float32'), axis=-1)
        nll = -jnp.take_along_axis(
            logp, targets[..., None], axis=-1)[..., 0]
        if self.label_smoothing:
            eps = self.label_smoothing
            # uniform smoothing over all classes (standard AED recipe)
            nll = (1.0 - eps) * nll + eps * (-jnp.mean(logp, axis=-1))
        # per-utterance token mean, then batch mean (matches the other
        # heads' per-token normalization)
        per_utt = jnp.sum(nll * mask, 1) / jnp.maximum(mask.sum(1), 1.0)
        correct = (jnp.argmax(logits, -1) == targets).astype('float32')
        return {
            'loss': jnp.mean(per_utt),
            'scalars': {
                'teacher_forced_accuracy':
                    jnp.sum(correct * mask) / jnp.maximum(mask.sum(), 1.0),
            },
        }

    def decode(self, batch, beam_width=None, max_len=None,
               length_penalty=0.0):
        """Transcriptions + token error rates for a batch.

        ``beam_width=None`` -> greedy; otherwise KV-cache beam search.
        Both run as one compiled ``lax.scan`` over ``max_len`` steps
        (default: the model's static ``max_decode_len``, so every batch
        reuses one program).
        """
        from padertorch_tpu.contrib.mk.modules.transformer import (
            autoregressive_generate, beam_search_generate,
        )
        model = self.eval()
        if max_len is None:
            max_len = model.max_decode_len
        enc, seq_len = model.acoustic(
            batch['stft'], seq_len=batch.get('seq_len'))
        if beam_width is None:
            tokens, lengths = autoregressive_generate(
                model.decoder, enc, embed=model.embed,
                logits_head=model.head, bos_id=model.bos,
                max_len=max_len, memory_seq_len=seq_len,
                eos_id=model.eos)
        else:
            tokens, _, lengths = beam_search_generate(
                model.decoder, enc, embed=model.embed,
                logits_head=model.head, bos_id=model.bos,
                max_len=max_len, beam_size=beam_width,
                eos_id=model.eos, memory_seq_len=seq_len,
                length_penalty=length_penalty)
            tokens, lengths = tokens[:, 0], lengths[:, 0]
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        hyps = []
        for i in range(tokens.shape[0]):
            n = int(lengths[i])
            seq = tokens[i, :n].tolist()
            hyps.append(self._clean_hyp(seq))
        return _decode_results(batch, hyps)

    def _clean_hyp(self, seq):
        if seq and seq[-1] == self.eos:  # strip the stop token
            seq = seq[:-1]
        return [t for t in seq if 1 <= t <= self.vocab_size]

    def serve_decode(self, batch, num_slots=4, max_len=None):
        """Greedy decode through the continuous-batching server path
        (:class:`padertorch_tpu.serve.ContinuousBatcher`): each
        utterance is an independent request in a fixed slot pool —
        short utterances leave early and free their slot, the step
        program compiles once for the pool.  Transcripts are exactly
        the greedy :meth:`decode` transcripts (tested)."""
        from padertorch_tpu.serve import ContinuousBatcher
        model = self.eval()
        if max_len is None:
            max_len = model.max_decode_len
        enc, seq_len = model.acoustic(
            batch['stft'], seq_len=batch.get('seq_len'))
        enc = np.asarray(enc)
        seq_len = np.asarray(seq_len)
        batcher = ContinuousBatcher(
            model.decoder, embed=model.embed, logits_head=model.head,
            num_slots=num_slots, max_len=max_len,
            max_memory_len=enc.shape[1], d_memory=enc.shape[-1],
            bos_id=model.bos, eos_id=model.eos,
            max_new_tokens=max_len)
        ids = [batcher.submit(enc[i], memory_len=int(seq_len[i]))
               for i in range(enc.shape[0])]
        outputs = batcher.run_until_done()
        hyps = [self._clean_hyp(outputs[rid]) for rid in ids]
        return _decode_results(batch, hyps)
