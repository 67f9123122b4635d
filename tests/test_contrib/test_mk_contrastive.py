"""CPC1d tests: torch re-executions of the reference contrast math
(``padertorch/contrib/mk/modules/contrastive.py:329-470``) as golden
oracles, plus end-to-end forward/review/grad checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import padertorch_tpu as pt
from padertorch_tpu.contrib.mk.modules.contrastive import (
    CPC1d, CPCFeatureExtractor, cosine_similarity, repeat_interleaved)

B, D, T = 4, 6, 12


def make_zs(seed=0, s=2):
    rng = np.random.RandomState(seed)
    z = rng.randn(B, D, T).astype('float32')
    z_hat = rng.randn(B, s * D, T).astype('float32')
    return z, z_hat


def torch_contrast_batch(z, z_hat, steps, temperature=1.0,
                         batch_labels=None, invert=False):
    """Reference math for negatives_mode='batch' re-executed in torch."""
    torch = pytest.importorskip('torch')
    from einops import rearrange
    z = torch.tensor(z)
    z_hat = torch.tensor(z_hat)
    b, d, t = z.shape
    z = rearrange(z, 'b d t -> t d b')
    z_hat = torch.split(rearrange(z_hat, 'b d t -> t b d'), d, dim=2)
    if batch_labels is not None:
        labels = np.asarray(batch_labels)
        batch_mask = torch.from_numpy(labels[:, None] != labels[None, :])
        if invert:
            batch_mask = ~batch_mask
            log_batch_mask = torch.log(batch_mask.float())[None]
        else:
            eye = torch.eye(b).float()
            log_batch_mask = torch.log(
                batch_mask.float() + eye)[None]
    else:
        log_batch_mask = torch.zeros(1, b, b)
    logits = []
    for step, z_hat_s in zip(steps, z_hat):
        z_s = z
        if step < 0:
            z_hat_s = z_hat_s[abs(step):]
            z_s = z_s[:-abs(step)]
        elif step > 0:
            z_hat_s = z_hat_s[:-step]
            z_s = z_s[step:]
        sims = torch.matmul(z_hat_s, z_s) / temperature + log_batch_mask
        logits.append(rearrange(sims, 't b k -> b k t').numpy())
    return logits


def assert_logits_match(got, want, atol=1e-5):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g = np.asarray(g)
        # repo uses a large finite negative instead of -inf
        finite = w > -np.inf
        np.testing.assert_allclose(g[finite], w[finite], atol=atol)
        assert (g[~finite] < -1e20).all()


def test_contrast_batch_matches_torch_reference():
    z, z_hat = make_zs()
    model = CPC1d(fwd_prediction_steps=[1, 2], temperature=0.7,
                  negatives_mode='batch')
    got, targets = model.contrast(jnp.asarray(z_hat), jnp.asarray(z))
    want = torch_contrast_batch(z, z_hat, [1, 2], temperature=0.7)
    assert_logits_match(got, want)
    np.testing.assert_array_equal(
        np.asarray(targets)[:, 0], np.arange(B))


def test_contrast_batch_bwd_steps_match_torch_reference():
    z, z_hat = make_zs(seed=1, s=3)
    model = CPC1d(fwd_prediction_steps=[0, 2],
                  bwd_prediction_steps=[-1],
                  fwd_projection_head=None, bwd_projection_head=None,
                  negatives_mode='batch')
    # steps order is bwd + fwd = [-1, 0, 2]
    got, _ = model.contrast(jnp.asarray(z_hat), jnp.asarray(z))
    want = torch_contrast_batch(z, z_hat, [-1, 0, 2])
    assert_logits_match(got, want)


def test_contrast_batch_label_masking_matches_torch_reference():
    z, z_hat = make_zs(seed=2)
    labels = [0, 0, 1, 2]
    for invert in (False, True):
        model = CPC1d(fwd_prediction_steps=[1], negatives_mode='batch',
                      batch_mask_key='spk', invert_batch_mask=invert)
        got, _ = model.contrast(
            jnp.asarray(z_hat[:, :D]), jnp.asarray(z),
            batch_labels=labels)
        want = torch_contrast_batch(
            z, z_hat[:, :D], [1], batch_labels=labels, invert=invert)
        assert_logits_match(got, want)


def test_contrast_time_matches_torch_reference():
    torch = pytest.importorskip('torch')
    from einops import rearrange
    z, z_hat = make_zs(seed=3)
    dist = 3
    model = CPC1d(fwd_prediction_steps=[1, 2], negatives_mode='time',
                  negative_to_target_dist=dist)
    got, targets = model.contrast(jnp.asarray(z_hat), jnp.asarray(z))
    # torch re-execution (reference contrastive.py:393-437)
    tz = torch.tensor(z)
    tz_hat = torch.split(
        rearrange(torch.tensor(z_hat), 'b d t -> b t d'), D, dim=2)
    t = T
    ones = torch.ones((t, t))
    mask = (1 - torch.triu(ones, diagonal=-(dist - 1))
            * torch.tril(ones, diagonal=dist - 1) + torch.eye(t))
    logmask = torch.log(mask)
    want = []
    for step, z_hat_s in zip([1, 2], tz_hat):
        z_s = tz
        z_hat_s = z_hat_s[:, :-step]
        z_s = torch.roll(z_s, -step, dims=-1)
        out = rearrange(
            torch.matmul(z_hat_s, z_s), 'b t k -> b k t')
        out = out + logmask[..., :out.shape[-1]]
        want.append(out.numpy())
    assert_logits_match(got, want)
    np.testing.assert_array_equal(np.asarray(targets)[0], np.arange(T))


def test_contrast_all_shapes_and_targets():
    z, z_hat = make_zs(seed=4)
    model = CPC1d(fwd_prediction_steps=[1], negatives_mode='all')
    (logits,), targets = model.contrast(
        jnp.asarray(z_hat[:, :D]), jnp.asarray(z))
    assert logits.shape == (B, B * T, T - 1)
    # target index of example b at time t is b*T + t
    np.testing.assert_array_equal(
        np.asarray(targets),
        np.arange(B)[:, None] * T + np.arange(T))
    # the target entry (flat index b*T + t, after the roll by -step)
    # scores z_hat[b,:,t] . z[b,:,t+1]
    want = (z_hat[2, :D, 3] * z[2, :, 4]).sum()
    got = np.asarray(logits)[2, 2 * T + 3, 3]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_negative_ratio_masks_highest_similarity_candidates():
    z, z_hat = make_zs(seed=5)
    model = CPC1d(fwd_prediction_steps=[1], negatives_mode='batch',
                  negative_ratio=0.5)
    (logits,), _ = model.contrast(
        jnp.asarray(z_hat[:, :D]), jnp.asarray(z))
    full_model = CPC1d(fwd_prediction_steps=[1], negatives_mode='batch')
    (full,), _ = full_model.contrast(
        jnp.asarray(z_hat[:, :D]), jnp.asarray(z))
    logits, full = np.asarray(logits), np.asarray(full)
    k = int(np.ceil(B * 0.5))
    for bi in range(B):
        for ti in range(T - 1):
            row_full = full[bi, :, ti]
            row = logits[bi, :, ti]
            th = np.sort(row_full)[-k]
            keep = (row_full <= th)
            keep[bi] = True  # target always kept
            assert (row[keep] > -1e20).all()
            assert (row[~keep] < -1e20).all()


def test_cosine_similarity_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    a, b = rng.randn(5, 3, 4), rng.randn(5, 4, 6)
    ta, tb = torch.tensor(a), torch.tensor(b)
    want = (torch.matmul(ta, tb) / torch.maximum(
        torch.linalg.norm(ta, dim=-1, keepdim=True)
        * torch.linalg.norm(tb, dim=-2, keepdim=True),
        torch.tensor(1e-12))).numpy()
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_repeat_interleaved():
    x = jnp.arange(6.0).reshape(1, 2, 3)
    out = np.asarray(repeat_interleaved(x, 2))
    np.testing.assert_array_equal(out[0, 0], out[0, 1])
    np.testing.assert_array_equal(out[0, 2], out[0, 3])


def _cnn_encoder():
    from padertorch_tpu.contrib.je.modules.conv import CNN1d
    return CNN1d(in_channels=8, out_channels=[16, 16], kernel_size=3)


def test_cpc_forward_review_and_grads():
    pt.random.seed(0)
    model = CPC1d(
        encoder=_cnn_encoder(),
        fwd_prediction_steps=[1, 2],
        negatives_mode='batch', input_key='x',
        input_seq_len_key='seq_len_x')
    rng = np.random.RandomState(0)
    inputs = {
        'x': jnp.asarray(rng.randn(B, 8, 20).astype('float32')),
        'seq_len_x': [20, 18, 16, 20],
    }
    outputs = model(inputs)
    review = model.review(inputs, outputs)
    assert 'ce' in review['losses']
    assert np.isfinite(float(review['losses']['ce']))
    scal = review['scalars']
    assert {'overall_accuracy', 'step_1_accuracy',
            'step_2_accuracy'} <= set(scal)
    assert float(scal['step_1_negatives']) <= B - 1

    # gradients flow into the encoder
    from padertorch_tpu.module import partition, combine
    params, static = partition(model)

    def loss_fn(p):
        m = combine(p, static)
        out = m(inputs)
        return m.review(inputs, out)['losses']['ce']

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0

    post = model.get_posteriors(outputs)
    assert post.shape == (B,)
    assert np.isfinite(np.asarray(post)).all()


def test_cpc_time_mask_zeroes_inactive_frames():
    pt.random.seed(1)
    model = CPC1d(fwd_prediction_steps=[1], negatives_mode='time',
                  time_mask_key='vad')
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, D, T).astype('float32'))
    inputs = {'x': x, 'seq_len_x': [T, T],
              'vad': np.ones((2, T), dtype=bool)}
    inputs_masked = {**inputs, 'vad': np.zeros((2, T), dtype=bool)}
    out = model(inputs)
    r_full = model.review(inputs, out)
    r_masked = model.review(inputs_masked, out)
    assert float(r_masked['losses']['ce']) == 0.0
    assert float(r_full['losses']['ce']) > 0.0


def test_cpc_modify_summary_grids_images():
    pt.random.seed(2)
    model = CPC1d(fwd_prediction_steps=[1])
    summary = {'images': {
        'input_features': np.random.uniform(size=(3, D, T)),
        'target_features': np.random.uniform(size=(3, D, T)),
    }}
    out = model.modify_summary(summary)
    img = out['images']['input_features']
    assert img.ndim == 3 and img.shape[0] in (1, 3)


def test_multi_view_requires_second_view():
    model = CPC1d(fwd_prediction_steps=[1], multi_view=True)
    with pytest.raises(ValueError, match='multi_view'):
        model({'x': jnp.zeros((2, D, T)), 'seq_len_x': [T, T]})


def test_cpc_feature_extractor_stops_gradients():
    pt.random.seed(3)
    cpc = CPC1d(encoder=_cnn_encoder(), fwd_prediction_steps=[1])
    fe = CPCFeatureExtractor(cpc)
    x = jnp.ones((1, 8, 20))
    z, seq_len = fe(x, seq_len=[20])
    assert z.ndim == 3

    from padertorch_tpu.module import partition, combine
    params, static = partition(fe)

    def loss_fn(p):
        m = combine(p, static)
        return jnp.sum(m(x, seq_len=[20])[0] ** 2)

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm == 0.0  # frozen
