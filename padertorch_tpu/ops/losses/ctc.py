"""CTC loss, greedy decoding, and edit distance.

Beyond-reference ops (padertorch ships no ASR ops): the loss wraps
``optax.ctc_loss`` (a pure-XLA forward-backward over the label lattice
— one ``lax.scan`` over time, no host sync) behind the framework's
lengths-based convention (padded batches + ``sequence_lengths``, like
every other op in ``padertorch_tpu.ops``).  Parity with
``torch.nn.functional.ctc_loss`` is pinned in
``tests/test_ops/test_ctc.py``.
"""
import numpy as np
import jax.numpy as jnp
import optax

__all__ = ['ctc_loss', 'ctc_greedy_decode',
           'ctc_beam_search_decode', 'edit_distance']


def ctc_loss(logits, logit_lengths, labels, label_lengths, blank=0):
    """Per-example CTC negative log likelihood.

    Args:
        logits: (B, T, V) unnormalized scores (softmax is internal).
        logit_lengths: (B,) valid frames per example.
        labels: (B, N) padded label ids (values != ``blank``).
        label_lengths: (B,) valid labels per example.
        blank: blank label id.

    Returns:
        (B,) loss (sum over frames, not averaged — divide by
        ``label_lengths`` for the torch ``reduction='mean'`` number).

    >>> import jax.numpy as jnp
    >>> logits = jnp.zeros((1, 4, 3))
    >>> l = ctc_loss(logits, jnp.array([4]), jnp.array([[1, 2]]),
    ...              jnp.array([2]))
    >>> l.shape
    (1,)
    """
    b, t, _ = logits.shape
    n = labels.shape[1]
    logit_paddings = (
        jnp.arange(t)[None, :] >= jnp.asarray(logit_lengths)[:, None]
    ).astype(logits.dtype)
    label_paddings = (
        jnp.arange(n)[None, :] >= jnp.asarray(label_lengths)[:, None]
    ).astype(logits.dtype)
    # optax requires blank == 0; remap labels when the caller uses
    # another id (swap blank <-> 0 in the class axis and label ids)
    if blank != 0:
        perm = list(range(logits.shape[-1]))
        perm[0], perm[blank] = perm[blank], perm[0]
        logits = logits[..., jnp.asarray(perm)]
        labels = jnp.where(labels == 0, blank,
                           jnp.where(labels == blank, 0, labels))
    return optax.ctc_loss(logits, logit_paddings, labels,
                          label_paddings)


def ctc_greedy_decode(logits, logit_lengths=None, blank=0):
    """Best-path decoding: framewise argmax, collapse repeats, drop
    blanks.  Host-side (numpy) — use at evaluation time.

    >>> import numpy as np
    >>> logits = np.zeros((1, 5, 3))
    >>> logits[0, np.arange(5), [1, 1, 0, 2, 2]] = 5.0
    >>> ctc_greedy_decode(logits)
    [[1, 2]]
    """
    logits = np.asarray(logits)
    assert logits.ndim == 3, logits.shape
    path = logits.argmax(-1)  # (B, T)
    out = []
    for b in range(path.shape[0]):
        t = (int(logit_lengths[b]) if logit_lengths is not None
             else path.shape[1])
        seq, prev = [], blank
        for token in path[b, :t]:
            token = int(token)
            if token != blank and token != prev:
                seq.append(token)
            prev = token
        out.append(seq)
    return out


def edit_distance(reference, hypothesis):
    """Levenshtein distance between two token sequences.

    >>> edit_distance([1, 2, 3], [1, 3])
    1
    >>> edit_distance('kitten', 'sitting')
    3
    """
    r, h = list(reference), list(hypothesis)
    d = np.arange(len(h) + 1)
    for i, rt in enumerate(r, 1):
        prev_diag, d[0] = d[0], i
        for j, ht in enumerate(h, 1):
            cur = min(
                d[j] + 1,          # deletion
                d[j - 1] + 1,      # insertion
                prev_diag + (rt != ht),  # substitution
            )
            prev_diag, d[j] = d[j], cur
    return int(d[-1])


def ctc_beam_search_decode(
        logits, logit_lengths=None, blank=0, beam_width=16,
        lm_fn=None, lm_weight=0.0, prune_log_threshold=-12.0,
):
    """CTC prefix beam search (Hannun et al. 2014).  Host-side (numpy).

    Sums the posterior over ALL alignments of each label prefix (the
    thing greedy best-path decoding gets wrong) by tracking per-prefix
    blank/non-blank ending probabilities in log space, with optional
    shallow fusion of an external language model.

    Args:
        logits: (B, T, V) unnormalized scores.
        logit_lengths: (B,) valid frames.
        blank: blank id.
        beam_width: number of prefixes kept per frame.
        lm_fn: optional ``lm_fn(prefix_tuple, next_token) -> logp`` —
            conditional LM log-probability used when a prefix is
            EXTENDED by ``next_token`` (shallow fusion).
        lm_weight: weight of the LM term in the beam score.
        prune_log_threshold: per-frame emission pruning — tokens with
            log-posterior below ``max - |threshold|`` are skipped
            (speed; set to ``None`` to disable).

    Returns:
        list of B label-id lists (the best prefix per example).

    >>> import numpy as np
    >>> logits = np.zeros((1, 5, 3))
    >>> logits[0, np.arange(5), [1, 1, 0, 2, 2]] = 5.0
    >>> ctc_beam_search_decode(logits, beam_width=4)
    [[1, 2]]
    """
    logits = np.asarray(logits, dtype=np.float64)
    assert logits.ndim == 3, logits.shape
    log_probs = logits - _logsumexp(logits, axis=-1, keepdims=True)
    b, t_max, vocab = log_probs.shape
    neg_inf = -np.inf

    def lse(a, bb):
        if a == neg_inf:
            return bb
        if bb == neg_inf:
            return a
        m = max(a, bb)
        return m + np.log(np.exp(a - m) + np.exp(bb - m))

    out = []
    for i in range(b):
        t_len = int(logit_lengths[i]) if logit_lengths is not None \
            else t_max
        # prefix -> [log P(prefix, ends in blank), log P(..., non-blank)]
        beams = {(): [0.0, neg_inf]}
        lm_scores = {(): 0.0}  # accumulated LM log-prob per prefix
        for t in range(t_len):
            frame = log_probs[i, t]
            if prune_log_threshold is not None:
                keep = np.flatnonzero(
                    frame >= frame.max() - abs(prune_log_threshold))
            else:
                keep = np.arange(vocab)
            nxt = {}
            nxt_lm = {}

            def _get(prefix):
                if prefix not in nxt:
                    nxt[prefix] = [neg_inf, neg_inf]
                return nxt[prefix]

            for prefix, (pb, pnb) in beams.items():
                p_tot = lse(pb, pnb)
                for k in keep:
                    k = int(k)
                    pk = frame[k]
                    if k == blank:
                        cell = _get(prefix)
                        cell[0] = lse(cell[0], p_tot + pk)
                        nxt_lm.setdefault(prefix, lm_scores[prefix])
                    elif prefix and k == prefix[-1]:
                        # repeat: collapses unless a blank separated it
                        cell = _get(prefix)
                        cell[1] = lse(cell[1], pnb + pk)
                        nxt_lm.setdefault(prefix, lm_scores[prefix])
                        ext = prefix + (k,)
                        cell = _get(ext)
                        cell[1] = lse(cell[1], pb + pk)
                        if ext not in nxt_lm:
                            nxt_lm[ext] = lm_scores[prefix] + (
                                float(lm_fn(prefix, k)) if lm_fn else 0.0)
                    else:
                        ext = prefix + (k,)
                        cell = _get(ext)
                        cell[1] = lse(cell[1], p_tot + pk)
                        if ext not in nxt_lm:
                            nxt_lm[ext] = lm_scores[prefix] + (
                                float(lm_fn(prefix, k)) if lm_fn else 0.0)

            def score(item):
                prefix, (pb, pnb) = item
                return lse(pb, pnb) + lm_weight * nxt_lm[prefix]

            ranked = sorted(nxt.items(), key=score, reverse=True)
            beams = dict(ranked[:beam_width])
            lm_scores = {p: nxt_lm[p] for p in beams}
        best = max(
            beams.items(),
            key=lambda kv: lse(kv[1][0], kv[1][1])
            + lm_weight * lm_scores[kv[0]])
        out.append(list(best[0]))
    return out


def _logsumexp(x, axis=None, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    s = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return s if keepdims else np.squeeze(s, axis=axis)
