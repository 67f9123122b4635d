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

__all__ = ['ctc_loss', 'ctc_greedy_decode', 'edit_distance']


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
