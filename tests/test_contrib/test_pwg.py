"""ParallelWaveGAN generator: weight import + numerics vs a torch
reference implementation that replicates kan-bayashi's
``parallel_wavegan.models.ParallelWaveGANGenerator`` (same state_dict
naming scheme as published checkpoints)."""
import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from padertorch_tpu.contrib.mk.synthesis.vocoder.pwg import (  # noqa: E402
    ParallelWaveGANGenerator, PWGVocoder, load_pwg_generator)


class _TorchPWG(torch.nn.Module):
    """Minimal torch PWG generator with kan-bayashi's module names."""

    def __init__(self, layers=6, stacks=2, residual=8, gate=16, skip=8,
                 aux=10, kernel=3, window=2, scales=(2, 2)):
        super().__init__()
        self.window = window
        self.scales = scales
        self.layers = layers
        per_stack = layers // stacks
        self.first_conv = torch.nn.Conv1d(1, residual, 1)

        class Block(torch.nn.Module):
            def __init__(self, dilation):
                super().__init__()
                self.dilation = dilation
                self.conv = torch.nn.Conv1d(
                    residual, gate, kernel,
                    padding=(kernel - 1) // 2 * dilation,
                    dilation=dilation)
                self.conv1x1_aux = torch.nn.Conv1d(
                    aux, gate, 1, bias=False)
                self.conv1x1_out = torch.nn.Conv1d(
                    gate // 2, residual, 1)
                self.conv1x1_skip = torch.nn.Conv1d(gate // 2, skip, 1)

            def forward(self, x, c):
                y = self.conv(x) + self.conv1x1_aux(c)
                a, b = y.split(y.size(1) // 2, dim=1)
                z = torch.tanh(a) * torch.sigmoid(b)
                return ((x + self.conv1x1_out(z)) * math.sqrt(0.5),
                        self.conv1x1_skip(z))

        self.conv_layers = torch.nn.ModuleList(
            [Block(2 ** (i % per_stack)) for i in range(layers)])
        self.last_conv_layers = torch.nn.Sequential(
            torch.nn.ReLU(),
            torch.nn.Conv1d(skip, skip, 1),
            torch.nn.ReLU(),
            torch.nn.Conv1d(skip, 1, 1),
        )

        class UpNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = torch.nn.Conv1d(
                    aux, aux, 2 * window + 1, bias=False)

                class Up(torch.nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.up_layers = torch.nn.ModuleList()
                        for s in scales:
                            self.up_layers.append(
                                torch.nn.Identity())  # Stretch2d slot
                            self.up_layers.append(torch.nn.Conv2d(
                                1, 1, (1, 2 * s + 1), padding=(0, s),
                                bias=False))

                self.upsample = Up()

            def forward(self, c):
                c = torch.nn.functional.pad(
                    c, (window, window), mode='replicate')
                c = self.conv_in(c).unsqueeze(1)
                i = 0
                for s in scales:
                    c = torch.repeat_interleave(c, s, dim=-1)
                    c = self.upsample.up_layers[2 * i + 1](c)
                    i += 1
                return c.squeeze(1)

        self.upsample_net = UpNet()

    def forward(self, z, c):
        c = self.upsample_net(c)
        x = self.first_conv(z)
        skips = 0
        for block in self.conv_layers:
            x, s = block(x, c)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)
        return self.last_conv_layers(skips)


def test_pwg_import_matches_torch(tmp_path):
    torch.manual_seed(0)
    ref = _TorchPWG()
    ref.eval()
    ckpt = tmp_path / 'checkpoint-100steps.pkl'
    torch.save({'model': {'generator': ref.state_dict()}}, ckpt)

    gen = load_pwg_generator(
        str(ckpt),
        config={'generator_params': {
            'stacks': 2, 'upsample_scales': [2, 2],
            'aux_context_window': 2}})
    assert gen.upsample_factor == 4
    assert len(gen.blocks) == 6

    b, t_mel, aux = 2, 20, 10
    rng = np.random.RandomState(0)
    c = rng.randn(b, aux, t_mel).astype('float32')
    z = rng.randn(b, 1, t_mel * 4).astype('float32')

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(z), torch.from_numpy(c)).numpy()
    y = np.asarray(gen(jnp.asarray(z), jnp.asarray(c)))
    assert y.shape == y_ref.shape == (b, 1, t_mel * 4)
    np.testing.assert_allclose(y, y_ref, atol=2e-5)


def test_pwg_vocoder_api():
    from padertorch_tpu import random as ptrandom
    ptrandom.seed(0)
    gen = ParallelWaveGANGenerator(
        layers=4, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, upsample_scales=(2, 2))
    voc = PWGVocoder(generator=gen, sampling_rate=16000)
    mel = np.random.RandomState(1).randn(7, 10).astype('float32')
    wav = voc(mel)
    assert wav.shape == (7 * 4,)
    wavs = voc(np.stack([mel, mel]), sequence_lengths=[7, 5])
    assert wavs.shape == (2, 28)
    assert np.asarray(wavs)[1, 5 * 4:].sum() == 0  # masked tail
