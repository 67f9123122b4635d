"""Adversarial (GAN-style) training: per-optimizer-key objectives.

The core contract under test: with ``Trainer(..., adversarial=True)``
and ``optimizer={'generator': ..., 'discriminator': ...}``, each
submodule is updated with the gradient of ITS OWN loss only —
the discriminator never receives the generator's adversarial gradient
and vice versa.  A linear toy GAN makes the correct updates available
in closed form.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.data import dataset as lazy


class _Gen(pt.Module):
    def __init__(self, a=0.5):
        self.a = jnp.asarray(a, 'float32')

    def forward(self, z):
        return self.a * z


class _Disc(pt.Module):
    def __init__(self, w=2.0):
        self.w = jnp.asarray(w, 'float32')

    def forward(self, x):
        return self.w * x


class LinearGAN(pt.Model):
    """fake = a*z, D(x) = w*x, Wasserstein-style linear losses.

    g_loss = -mean(D(fake)) = -w * a * mean(z)
    d_loss =  mean(D(fake)) - mean(D(real)) = w * (a*mean(z) - mean(x))

    Closed-form grads (per-key objectives):
        dg/da = -w * mean(z)          (through D, without updating D)
        dd/dw = a*mean(z) - mean(x)   (no adversarial-G leakage)
    Leakage would add dg/dw = -a*mean(z) to the discriminator update.
    """

    def __init__(self):
        self.generator = _Gen()
        self.discriminator = _Disc()

    def forward(self, inputs):
        return self.generator(inputs['z'])

    def review(self, inputs, outputs):
        fake = outputs
        d_fake = self.discriminator(fake)
        d_real = self.discriminator(inputs['x'])
        g_loss = -jnp.mean(d_fake)
        d_loss = jnp.mean(d_fake) - jnp.mean(d_real)
        return {
            'losses': {'generator': g_loss, 'discriminator': d_loss},
            'scalars': {},
        }


def _dataset(n=4, batch=4):
    rng = np.random.RandomState(0)
    examples = [{
        'z': rng.randn(batch).astype('float32'),
        'x': rng.randn(batch).astype('float32') + 3.0,
    } for _ in range(n)]
    return lazy.from_list(examples)


def test_adversarial_grads_are_isolated(tmp_path):
    """One SGD step must match the closed-form per-key updates."""
    lr = 0.1
    ptrandom.seed(0)
    model = LinearGAN()
    a0 = float(model.generator.a)
    w0 = float(model.discriminator.w)
    trainer = pt.Trainer(
        model=model,
        storage_dir=tmp_path,
        optimizer={
            'generator': pt.SGD(lr=lr),
            'discriminator': pt.SGD(lr=lr),
        },
        adversarial=True,
        stop_trigger=(1, 'iteration'),
    )
    ds = _dataset(n=1)
    trainer.train(ds, resume=False)

    ex = list(ds)[0]
    mz, mx = ex['z'].mean(), ex['x'].mean()
    expected_a = a0 - lr * (-w0 * mz)
    expected_w = w0 - lr * (a0 * mz - mx)
    # leakage of the generator loss into w would shift it by +lr*a0*mz
    leaked_w = expected_w - lr * (-a0 * mz)

    got_a = float(trainer.model.generator.a)
    got_w = float(trainer.model.discriminator.w)
    np.testing.assert_allclose(got_a, expected_a, rtol=1e-5)
    np.testing.assert_allclose(got_w, expected_w, rtol=1e-5)
    assert abs(got_w - leaked_w) > 1e-3, (
        'discriminator received the adversarial generator gradient')


def test_adversarial_loss_weights(tmp_path):
    """loss_weights scale each key's own objective."""
    lr, gw, dw = 0.1, 0.5, 2.0
    ptrandom.seed(0)
    model = LinearGAN()
    a0 = float(model.generator.a)
    w0 = float(model.discriminator.w)
    trainer = pt.Trainer(
        model=model,
        storage_dir=tmp_path,
        optimizer={
            'generator': pt.SGD(lr=lr),
            'discriminator': pt.SGD(lr=lr),
        },
        adversarial=True,
        loss_weights={'generator': gw, 'discriminator': dw},
        stop_trigger=(1, 'iteration'),
    )
    ds = _dataset(n=1)
    trainer.train(ds, resume=False)
    ex = list(ds)[0]
    mz, mx = ex['z'].mean(), ex['x'].mean()
    np.testing.assert_allclose(
        float(trainer.model.generator.a),
        a0 - lr * gw * (-w0 * mz), rtol=1e-5)
    np.testing.assert_allclose(
        float(trainer.model.discriminator.w),
        w0 - lr * dw * (a0 * mz - mx), rtol=1e-5)


def test_adversarial_requires_dict_optimizer(tmp_path):
    with pytest.raises(TypeError, match='adversarial'):
        pt.Trainer(
            model=LinearGAN(),
            storage_dir=tmp_path,
            optimizer=pt.SGD(lr=0.1),
            adversarial=True,
        )


def test_adversarial_requires_matching_loss_keys(tmp_path):
    class BadModel(LinearGAN):
        def review(self, inputs, outputs):
            review = super().review(inputs, outputs)
            review['losses'] = {'g': review['losses']['generator']}
            return review

    ptrandom.seed(0)
    model = BadModel()
    trainer = pt.Trainer(
        model=model,
        storage_dir=tmp_path,
        optimizer={
            'generator': pt.SGD(lr=0.1),
            'discriminator': pt.SGD(lr=0.1),
        },
        adversarial=True,
        stop_trigger=(1, 'iteration'),
    )
    with pytest.raises(Exception, match='keyed exactly'):
        trainer.train(_dataset(n=1), resume=False)


def test_adversarial_validation_and_resume(tmp_path):
    """Validation (joint loss reporting) and checkpoint resume work in
    adversarial mode; both optimizers' states round-trip."""
    ptrandom.seed(0)
    trainer = pt.Trainer(
        model=LinearGAN(),
        storage_dir=tmp_path,
        optimizer={
            'generator': pt.Adam(lr=1e-3),
            'discriminator': pt.Adam(lr=1e-3),
        },
        adversarial=True,
        stop_trigger=(2, 'epoch'),
        checkpoint_trigger=(1, 'epoch'),
        summary_trigger=(1, 'epoch'),
    )
    tr = _dataset(n=4)
    trainer.register_validation_hook(tr)
    trainer.train(tr, resume=False)
    assert (tmp_path / 'checkpoints' / 'ckpt_latest.ptt').exists()

    ptrandom.seed(0)
    trainer2 = pt.Trainer(
        model=LinearGAN(),
        storage_dir=tmp_path,
        optimizer={
            'generator': pt.Adam(lr=1e-3),
            'discriminator': pt.Adam(lr=1e-3),
        },
        adversarial=True,
        stop_trigger=(3, 'epoch'),
        checkpoint_trigger=(1, 'epoch'),
        summary_trigger=(1, 'epoch'),
    )
    trainer2.register_validation_hook(tr)
    trainer2.train(tr, resume=True)
    assert trainer2.iteration > trainer.iteration
