"""GAN vocoder model unit tests (fast, default suite)."""
import numpy as np

import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.examples.audio_synthesis.gan_vocoder.model \
    import Generator, MultiScaleDiscriminator, GANVocoder


def _tiny_model():
    ptrandom.seed(0)
    return GANVocoder(
        generator=Generator(n_mels=80, base_channels=8),
        discriminator=MultiScaleDiscriminator(
            base_channels=4, n_layers=2, n_scales=2),
    )


def test_generator_hop_arithmetic():
    ptrandom.seed(0)
    g = Generator(n_mels=80, base_channels=8, upsample_rates=(5, 5, 4, 2))
    assert g.hop_length == 200
    mel = jnp.zeros((2, 80, 7))
    wave = g(mel)
    assert wave.shape == (2, 7 * 200)
    assert bool(jnp.all(jnp.abs(wave) <= 1.0))  # tanh output


def test_discriminator_scales_and_features():
    ptrandom.seed(0)
    d = MultiScaleDiscriminator(base_channels=4, n_layers=2, n_scales=3)
    outs = d(jnp.zeros((2, 1600)))
    assert len(outs) == 3
    for logits, features in outs:
        assert logits.ndim == 2 and logits.shape[0] == 2
        assert len(features) == 2


def test_review_structure():
    model = _tiny_model()
    rng = np.random.RandomState(0)
    inputs = {
        'features': jnp.asarray(rng.randn(2, 80, 5), 'float32'),
        'audio_data': jnp.asarray(rng.randn(2, 1000), 'float32'),
    }
    out = model(inputs)
    assert out['fake'].shape == out['target'].shape
    review = model.review(inputs, out)
    assert set(review['losses']) == {'generator', 'discriminator'}
    for v in review['losses'].values():
        assert jnp.ndim(v) == 0 and bool(jnp.isfinite(v))
    assert 'stft_loss' in review['scalars']


def test_gan_vocoder_burn_test(tmp_path):
    """test_run through the adversarial Trainer: both submodules update,
    losses stay finite."""
    from padertorch_tpu.contrib.examples.audio_synthesis.gan_vocoder \
        import data
    from padertorch_tpu.data import dataset as lazy

    model = _tiny_model()
    trainer = pt.Trainer(
        model=model,
        storage_dir=tmp_path,
        optimizer={
            'generator': pt.Adam(lr=2e-4),
            'discriminator': pt.Adam(lr=2e-4),
        },
        adversarial=True,
        stop_trigger=(1, 'epoch'),
    )
    ds = data.prepare_dataset(
        data.synthetic_database(num_examples=4, num_samples=2000),
        batch_size=2, segment_length=1000, shuffle=False, prefetch=False)
    trainer.test_run(ds, ds)
