"""NGramLM: hand-counted probabilities, normalization, fusion effect."""
import numpy as np

from padertorch_tpu.evaluation import NGramLM
from padertorch_tpu.ops.losses.ctc import ctc_beam_search_decode


def test_bigram_counts_by_hand():
    lm = NGramLM(order=2, add_k=0.0 + 1e-12).fit(
        [[1, 2, 1, 2], [1, 3]])
    # after 1: {2: 2, 3: 1} of 3
    np.testing.assert_allclose(np.exp(lm((1,), 2)), 2 / 3, atol=1e-6)
    np.testing.assert_allclose(np.exp(lm((1,), 3)), 1 / 3, atol=1e-6)
    # sentence start: {1: 2} of 2
    np.testing.assert_allclose(np.exp(lm((), 1)), 1.0, atol=1e-6)


def test_trigram_context_and_smoothing():
    lm = NGramLM(order=3, add_k=1.0).fit([[1, 2, 3], [1, 2, 4]])
    # context (1, 2): {3: 1, 4: 1} of 2, vocab = {1, 2, 3, 4}
    np.testing.assert_allclose(
        np.exp(lm((1, 2), 3)), (1 + 1) / (2 + 4), atol=1e-6)
    np.testing.assert_allclose(
        np.exp(lm((1, 2), 1)), (0 + 1) / (2 + 4), atol=1e-6)
    # longer prefixes only use the last order-1 tokens
    assert lm((9, 9, 1, 2), 3) == lm((1, 2), 3)


def test_normalization_over_vocab():
    rng = np.random.RandomState(0)
    seqs = [rng.randint(1, 6, rng.randint(3, 9)).tolist()
            for _ in range(20)]
    lm = NGramLM(order=2, add_k=0.5).fit(seqs)
    for prefix in [(), (1,), (3,), (2, 4)]:
        total = sum(np.exp(lm(prefix, t)) for t in lm.vocab)
        np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_perplexity_prefers_matching_corpus():
    chain = [[1, 2, 3, 4, 1, 2, 3, 4] for _ in range(10)]
    rng = np.random.RandomState(0)
    rand = [rng.randint(1, 5, 8).tolist() for _ in range(10)]
    lm = NGramLM(order=2, add_k=0.1).fit(chain)
    assert lm.perplexity(chain) < lm.perplexity(rand)


def test_fusion_steers_ctc_beam_search():
    """With flat acoustics, a chain LM makes the beam follow the
    chain; without it the decode does not."""
    rng = np.random.RandomState(1)
    logits = rng.randn(1, 8, 5) * 0.05  # nearly uninformative
    lm = NGramLM(order=2, add_k=0.05).fit(
        [[1, 2, 3, 4, 1, 2, 3, 4]] * 20)
    fused = ctc_beam_search_decode(
        logits, beam_width=16, lm_fn=lm, lm_weight=3.0,
        prune_log_threshold=None)[0]
    assert len(fused) >= 2
    for a, b in zip(fused, fused[1:]):
        assert b == a % 4 + 1, fused  # follows 1->2->3->4->1
