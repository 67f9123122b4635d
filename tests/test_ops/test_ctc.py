"""CTC loss parity vs torch.nn.functional.ctc_loss, greedy decode,
edit distance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from padertorch_tpu.ops.losses.ctc import (
    ctc_loss, ctc_greedy_decode, edit_distance,
)


def _random_case(seed, B=3, T=12, V=7, N=5, blank=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype('float32')
    logit_lens = np.array([T, T - 2, T - 4][:B])
    ids = [i for i in range(V) if i != blank]
    labels = rng.choice(ids, size=(B, N))
    label_lens = np.array([N, 3, 2][:B])
    return logits, logit_lens, labels, label_lens


def _torch_ctc(logits, logit_lens, labels, label_lens, blank):
    import torch
    log_probs = torch.log_softmax(
        torch.tensor(logits).transpose(0, 1), dim=-1)
    return torch.nn.functional.ctc_loss(
        log_probs, torch.tensor(labels),
        torch.tensor(logit_lens), torch.tensor(label_lens),
        blank=blank, reduction='none').numpy()


@pytest.mark.parametrize('blank', [0, 6])
def test_ctc_loss_torch_parity(blank):
    logits, logit_lens, labels, label_lens = _random_case(
        0, blank=blank)
    ours = np.asarray(ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_lens),
        jnp.asarray(labels), jnp.asarray(label_lens), blank=blank))
    ref = _torch_ctc(logits, logit_lens, labels, label_lens, blank)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_ctc_loss_grads_finite_and_match_torch():
    import torch
    logits, logit_lens, labels, label_lens = _random_case(1)

    g = jax.grad(lambda lg: jnp.sum(ctc_loss(
        lg, jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens))))(jnp.asarray(logits))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))

    t_logits = torch.tensor(logits, requires_grad=True)
    log_probs = torch.log_softmax(t_logits.transpose(0, 1), dim=-1)
    loss = torch.nn.functional.ctc_loss(
        log_probs, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=0, reduction='sum')
    loss.backward()
    np.testing.assert_allclose(g, t_logits.grad.numpy(), atol=1e-4)


def test_greedy_decode_collapses_and_respects_lengths():
    V = 4
    path = np.array([[1, 1, 0, 2, 2, 0, 2, 3]])
    logits = np.full((1, 8, V), -5.0, 'float32')
    logits[0, np.arange(8), path[0]] = 5.0
    assert ctc_greedy_decode(logits) == [[1, 2, 2, 3]]
    assert ctc_greedy_decode(logits, logit_lengths=[5]) == [[1, 2]]


def test_edit_distance_golden():
    assert edit_distance([], []) == 0
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], []) == 3
    assert edit_distance('kitten', 'sitting') == 3
    assert edit_distance([1, 2, 3, 4], [2, 3, 4, 5]) == 2
