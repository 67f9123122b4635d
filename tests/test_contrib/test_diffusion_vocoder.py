"""Diffusion vocoder recipe tests (fast units + slow subprocess smoke).

The sampler math itself is oracle-verified in
``tests/test_ops/test_diffusion.py``; these tests cover the recipe
model: shapes, the zero-init eps head (initial loss == E[eps^2] ~= 1),
gradient flow, and synthesis bookkeeping.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.examples.audio_synthesis.diffusion_vocoder \
    import data
from padertorch_tpu.contrib.examples.audio_synthesis.diffusion_vocoder \
    .model import DiffusionVocoder

REPO_ROOT = Path(__file__).resolve().parents[2]


def _tiny_model(**updates):
    ptrandom.seed(0)
    return DiffusionVocoder.from_config(DiffusionVocoder.get_config({
        'denoiser': {'channels': 8, 'num_layers': 2, 'cycle': 2},
        'num_steps': 8,
        **updates,
    }))


def _batch(batch_size=2, segment_length=2000):
    ds = data.synthetic_database(num_examples=2 * batch_size)
    return next(iter(data.prepare_dataset(
        ds, batch_size=batch_size, segment_length=segment_length,
        shuffle=False, prefetch=False)))


def test_forward_review_shapes_and_zero_init_loss():
    model = _tiny_model()
    batch = _batch()
    with ptrandom.key_context(jax.random.PRNGKey(0)):
        out = model.eval()(batch)
    assert out['eps_hat'].shape == out['eps'].shape
    assert out['eps_hat'].shape[0] == 2
    review = model.review(batch, out)
    # zero-init output head => eps_hat == 0 => loss == mean(eps^2) ~ 1
    assert abs(float(review['loss']) - 1.0) < 0.15
    np.testing.assert_allclose(np.asarray(out['eps_hat']), 0.0)


def test_gradients_flow_to_denoiser_and_conditioner():
    model = _tiny_model()
    # the zero-init head passes no gradient upstream at step 0 (by
    # design); perturb it so the full chain is exercised
    model.denoiser.output_proj.weight = (
        jnp.ones_like(model.denoiser.output_proj.weight) * 0.1)
    batch = _batch()
    from padertorch_tpu.module import partition, combine
    params, static = partition(model)

    def loss_fn(p):
        m = combine(p, static)
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return m.review(batch, m(batch))['loss']

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the mel upsampler must receive gradient through the gated blocks
    up_grad = jax.tree_util.tree_leaves(grads.denoiser.upsample)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in up_grad)


def test_synthesize_shapes_and_clipping():
    model = _tiny_model().eval()
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 80, 4),
                      dtype='float32')
    hop = model.denoiser.hop_length
    ddpm = np.asarray(model.synthesize(mel, key=jax.random.PRNGKey(0)))
    assert ddpm.shape == (2, 4 * hop)
    assert np.abs(ddpm).max() <= 1.0 + 1e-4  # clip=(-1, 1)
    ddim = np.asarray(model.synthesize(
        mel, key=jax.random.PRNGKey(0), ddim=True, num_steps=4))
    assert ddim.shape == (2, 4 * hop)
    # DDIM with eta=0 is deterministic in x_T: same key -> same sample
    ddim2 = np.asarray(model.synthesize(
        mel, key=jax.random.PRNGKey(0), ddim=True, num_steps=4))
    np.testing.assert_allclose(ddim, ddim2, atol=0)


def test_synthesize_jits_whole_reverse_process():
    model = _tiny_model().eval()
    mel = jnp.zeros((1, 80, 3), dtype='float32')

    @jax.jit
    def run(mel, key):
        return model.synthesize(mel, key=key, ddim=True, num_steps=4)

    out = run(mel, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()


def _run(module, *args, timeout=560):
    env = {
        **os.environ,
        'JAX_PLATFORMS': 'cpu',
        'PYTHONPATH': str(REPO_ROOT),
    }
    proc = subprocess.run(
        [sys.executable, '-m', module, *args],
        env=env, capture_output=True, text=True, timeout=timeout,
        cwd=str(REPO_ROOT),
    )
    assert proc.returncode == 0, (
        f'{module} failed\nstdout: {proc.stdout[-3000:]}\n'
        f'stderr: {proc.stderr[-3000:]}')
    return proc.stdout


@pytest.mark.slow
def test_diffusion_vocoder_train_then_evaluate(tmp_path):
    pkg = ('padertorch_tpu.contrib.examples.audio_synthesis'
           '.diffusion_vocoder')
    _run(f'{pkg}.train',
         '--storage_root', str(tmp_path), '--synthetic', '--small',
         '--epochs', '2', '--batch_size', '2', '--num_examples', '8',
         '--num_steps', '8')
    storage_dir = tmp_path / 'diffusion_vocoder' / '1'
    _run(f'{pkg}.evaluate',
         '--model_path', str(storage_dir), '--synthetic',
         '--num_synthetic_examples', '2', '--synthetic_samples', '2000',
         '--ddim_steps', '4')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert means['num_examples'] == 2
    assert np.isfinite(means['rmse']) and np.isfinite(means['stft_loss'])
    assert means['sampler'] == 'ddim_4'
