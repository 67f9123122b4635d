"""BigVGAN generator: structure, checkpoint import and numerics vs a
torch oracle replicating NVIDIA's implementation (state-dict naming of
``bigvgan_generator.pt`` checkpoints; math of
``nvidia_bigvgan/bigvgan.py`` + ``alias_free_activation/torch``)."""
import json
import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from padertorch_tpu import random as ptrandom  # noqa: E402
from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (  # noqa: E402
    AMPBlock1, AMPBlock2, BigVGANGenerator, BigVGANVocoder,
    load_bigvgan_generator,
)
from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan_activation import (  # noqa: E402
    UpSample1d, DownSample1d, Activation1d, Snake, SnakeBeta,
)


# ---- torch oracle -----------------------------------------------------

def _torch_kaiser_sinc(cutoff, half_width, kernel_size):
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    f = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    return (f / f.sum()).view(1, 1, kernel_size).float()


class _TorchUp(torch.nn.Module):
    def __init__(self, ratio=2, kernel_size=12):
        super().__init__()
        self.ratio = ratio
        self.k = kernel_size
        self.pad = kernel_size // ratio - 1
        self.pad_left = self.pad * ratio + (kernel_size - ratio) // 2
        self.pad_right = self.pad * ratio + (kernel_size - ratio + 1) // 2
        self.register_buffer('filter', _torch_kaiser_sinc(
            0.5 / ratio, 0.6 / ratio, kernel_size))

    def forward(self, x):
        c = x.shape[1]
        x = torch.nn.functional.pad(
            x, (self.pad, self.pad), mode='replicate')
        y = self.ratio * torch.nn.functional.conv_transpose1d(
            x, self.filter.expand(c, -1, -1), stride=self.ratio, groups=c)
        return y[..., self.pad_left:-self.pad_right]


class _TorchDown(torch.nn.Module):
    def __init__(self, ratio=2, kernel_size=12):
        super().__init__()
        self.ratio = ratio
        even = kernel_size % 2 == 0
        self.pad_left = kernel_size // 2 - int(even)
        self.pad_right = kernel_size // 2
        self.register_buffer('filter', _torch_kaiser_sinc(
            0.5 / ratio, 0.6 / ratio, kernel_size))

    def forward(self, x):
        c = x.shape[1]
        x = torch.nn.functional.pad(
            x, (self.pad_left, self.pad_right), mode='replicate')
        return torch.nn.functional.conv1d(
            x, self.filter.expand(c, -1, -1), stride=self.ratio, groups=c)


class _TorchSnakeBeta(torch.nn.Module):
    def __init__(self, channels, alpha_logscale=True):
        super().__init__()
        self.logscale = alpha_logscale
        init = torch.zeros(channels) if alpha_logscale \
            else torch.ones(channels)
        self.alpha = torch.nn.Parameter(init.clone())
        self.beta = torch.nn.Parameter(init.clone())

    def forward(self, x):
        a = self.alpha.exp() if self.logscale else self.alpha
        b = self.beta.exp() if self.logscale else self.beta
        a, b = a[None, :, None], b[None, :, None]
        return x + torch.sin(a * x) ** 2 / (b + 1e-9)


class _TorchAct(torch.nn.Module):
    def __init__(self, activation):
        super().__init__()
        self.act = activation
        self.upsample = _TorchUp()
        self.downsample = _TorchDown()

    def forward(self, x):
        return self.downsample(self.act(self.upsample(x)))


class _TorchAMP1(torch.nn.Module):
    def __init__(self, channels, kernel_size=3, dilation=(1, 3)):
        super().__init__()

        def conv(d):
            return torch.nn.Conv1d(
                channels, channels, kernel_size, dilation=d,
                padding=(kernel_size * d - d) // 2)

        self.convs1 = torch.nn.ModuleList([conv(d) for d in dilation])
        self.convs2 = torch.nn.ModuleList([conv(1) for _ in dilation])
        self.activations = torch.nn.ModuleList([
            _TorchAct(_TorchSnakeBeta(channels))
            for _ in range(2 * len(dilation))
        ])

    def forward(self, x):
        a1s, a2s = self.activations[::2], self.activations[1::2]
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, a1s, a2s):
            x = c2(a2(c1(a1(x)))) + x
        return x


class _TorchBigVGAN(torch.nn.Module):
    """Tiny BigVGAN with NVIDIA's state-dict names."""

    def __init__(self, mels=6, up_rates=(4, 2), up_ks=(8, 4), ch0=16,
                 rb_ks=(3, 5), rb_ds=((1, 3), (1, 3))):
        super().__init__()
        self.num_kernels = len(rb_ks)
        self.num_upsamples = len(up_rates)
        self.conv_pre = torch.nn.Conv1d(mels, ch0, 7, padding=3)
        self.ups = torch.nn.ModuleList()
        for i, (u, k) in enumerate(zip(up_rates, up_ks)):
            self.ups.append(torch.nn.ModuleList([
                torch.nn.ConvTranspose1d(
                    ch0 // (2 ** i), ch0 // (2 ** (i + 1)), k, u,
                    padding=(k - u) // 2)
            ]))
        self.resblocks = torch.nn.ModuleList()
        for i in range(self.num_upsamples):
            ch = ch0 // (2 ** (i + 1))
            for k, d in zip(rb_ks, rb_ds):
                self.resblocks.append(_TorchAMP1(ch, k, d))
        self.activation_post = _TorchAct(_TorchSnakeBeta(ch))
        self.conv_post = torch.nn.Conv1d(ch, 1, 7, padding=3)

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(self.num_upsamples):
            for up in self.ups[i]:
                x = up(x)
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = self.conv_post(self.activation_post(x))
        return torch.tanh(x)


_TINY_CONFIG = dict(
    num_mels=6, upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
    upsample_initial_channel=16, resblock='1',
    resblock_kernel_sizes=[3, 5],
    resblock_dilation_sizes=[[1, 3], [1, 3]],
    activation='snakebeta', snake_logscale=True,
    use_bias_at_final=True, use_tanh_at_final=True,
    sampling_rate=16000,
)


# ---- tests ------------------------------------------------------------

def test_upsample_downsample_match_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 40)).astype(np.float32)
    for ratio in (2,):
        up = UpSample1d(ratio)
        tup = _TorchUp(ratio)
        np.testing.assert_allclose(
            np.asarray(up(x)), tup(torch.as_tensor(x)).numpy(),
            atol=1e-5)
        down = DownSample1d(ratio)
        tdown = _TorchDown(ratio)
        np.testing.assert_allclose(
            np.asarray(down(x)), tdown(torch.as_tensor(x)).numpy(),
            atol=1e-5)


def test_activation1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 30)).astype(np.float32)
    ptrandom.seed(0)
    act = Activation1d(SnakeBeta(4))
    tact = _TorchAct(_TorchSnakeBeta(4))
    np.testing.assert_allclose(
        np.asarray(act(x)),
        tact(torch.as_tensor(x)).detach().numpy(), atol=1e-5)


def test_generator_shapes_and_structure():
    ptrandom.seed(0)
    g = BigVGANGenerator(
        num_mels=6, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)))
    assert g.upsample_factor == 8
    assert len(g.resblocks) == 4  # 2 stages x 2 kernels
    y = g(jnp.zeros((2, 6, 12)))
    assert y.shape == (2, 1, 96)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh bounded


def test_generator_ampblock2_and_clamp():
    ptrandom.seed(0)
    g = BigVGANGenerator(
        num_mels=4, upsample_rates=(2,), upsample_kernel_sizes=(4,),
        upsample_initial_channel=8, resblock='2',
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        use_tanh_at_final=False)
    assert isinstance(g.resblocks[0], AMPBlock2)
    y = g(jnp.ones((1, 4, 7)))
    assert y.shape == (1, 1, 14)
    assert float(jnp.abs(y).max()) <= 1.0  # clamp bounded


def test_checkpoint_import_matches_torch(tmp_path):
    torch.manual_seed(0)
    tmodel = _TorchBigVGAN().eval()
    torch.save({'generator': tmodel.state_dict()},
               tmp_path / 'bigvgan_generator.pt')
    (tmp_path / 'config.json').write_text(json.dumps(_TINY_CONFIG))

    gen = load_bigvgan_generator(tmp_path)
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, 6, 20)).astype(np.float32)
    with torch.inference_mode():
        want = tmodel(torch.as_tensor(mel)).numpy()
    got = np.asarray(gen(mel))
    assert got.shape == want.shape == (1, 1, 160)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_checkpoint_import_with_weight_norm(tmp_path):
    torch.manual_seed(1)
    tmodel = _TorchBigVGAN().eval()
    sd = tmodel.state_dict()
    # simulate a training checkpoint: split conv_pre into g/v pairs
    w = sd.pop('conv_pre.weight')
    norm = w.norm(dim=(1, 2), keepdim=True)
    sd['conv_pre.weight_g'] = norm
    sd['conv_pre.weight_v'] = w
    torch.save({'generator': sd}, tmp_path / 'bigvgan_generator.pt')
    (tmp_path / 'config.json').write_text(json.dumps(_TINY_CONFIG))
    gen = load_bigvgan_generator(tmp_path)
    mel = np.zeros((1, 6, 8), np.float32)
    with torch.inference_mode():
        want = tmodel(torch.as_tensor(mel)).numpy()
    np.testing.assert_allclose(np.asarray(gen(mel)), want, atol=1e-4)


def test_vocoder_synthesis_api(tmp_path):
    torch.manual_seed(2)
    tmodel = _TorchBigVGAN().eval()
    torch.save({'generator': tmodel.state_dict()},
               tmp_path / 'bigvgan_generator.pt')
    (tmp_path / 'config.json').write_text(json.dumps(_TINY_CONFIG))

    voc = BigVGANVocoder(checkpoint_dir=tmp_path)
    assert voc.sampling_rate == 16000
    # 2-dim input (T, M) with sequence_axis=0 convention -> (T_wav,)
    voc2 = BigVGANVocoder(generator=voc.generator, sequence_axis=0)
    mel = np.zeros((10, 6), np.float32)
    y = voc2(mel)
    assert y.shape == (80,)
    # batched (B, M, T) + sequence-length masking
    mel_b = np.random.default_rng(3).normal(
        size=(2, 6, 10)).astype(np.float32)
    y = voc(mel_b, sequence_lengths=[10, 5])
    assert y.shape == (2, 80)
    np.testing.assert_array_equal(np.asarray(y)[1, 40:], 0)


def test_vocoder_random_init_smoke():
    ptrandom.seed(0)
    voc = BigVGANVocoder(generator=BigVGANGenerator(
        num_mels=4, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),)))
    y = voc(np.zeros((2, 4, 6), np.float32))
    assert y.shape == (2, 24)


def test_slaney_mel_filterbank_properties():
    from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (
        slaney_mel_filterbank)
    fb = slaney_mel_filterbank(16000, 512, 40)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # triangles overlap: every frequency bin inside the band covered
    coverage = fb.sum(0)
    assert (coverage[5:250] > 0).all()
    # slaney norm: filter areas are ~equal after bandwidth scaling
    areas = fb.sum(1)
    assert areas.std() / areas.mean() < 0.35


def test_mel_spectrogram_matches_torch_pipeline():
    """Re-execute NVIDIA's meldataset math in torch (with the same
    numpy filterbank, librosa being unavailable) and compare."""
    from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (
        slaney_mel_filterbank, mel_spectrogram)
    n_fft, hop, win, sr, mels = 256, 64, 256, 16000, 20
    rng = np.random.default_rng(5)
    y = np.clip(rng.normal(scale=0.2, size=(2, 4000)), -1, 1) \
        .astype(np.float32)

    yt = torch.as_tensor(y)
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(
        yt.unsqueeze(1), (pad, pad), mode='reflect').squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False,
        normalized=False, onesided=True, return_complex=True)
    mag = torch.sqrt(
        torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(slaney_mel_filterbank(sr, n_fft, mels))
    want = torch.log(torch.clamp(fb @ mag, min=1e-5)).numpy()

    got = np.asarray(mel_spectrogram(y, n_fft, mels, sr, hop, win))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mel_spectrogram_feeds_vocoder():
    from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (
        mel_spectrogram, BigVGANGenerator)
    from padertorch_tpu import random as ptrandom
    ptrandom.seed(0)
    g = BigVGANGenerator(
        num_mels=20, upsample_rates=(4, 4, 4), 
        upsample_kernel_sizes=(8, 8, 8), upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),))
    mel = mel_spectrogram(
        np.zeros(4000, np.float32), 256, 20, 16000, 64, 256)
    wav = g(np.asarray(mel)[None])
    assert wav.shape == (1, 1, mel.shape[-1] * 64)



def test_nvidia_hparams_compat_tail(tmp_path):
    """AttrDict / load_hparams_from_json / get_mel_spectrogram /
    dynamic range helpers (ref nvidia_bigvgan/{env.py:8,bigvgan.py:25,
    meldataset.py:24-44,124})."""
    import json
    from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (
        AttrDict, load_hparams_from_json, get_mel_spectrogram,
        mel_spectrogram, dynamic_range_compression,
        dynamic_range_decompression, spectral_normalize,
        spectral_de_normalize, get_padding, MAX_WAV_VALUE)

    h = AttrDict(n_fft=256, num_mels=8, sampling_rate=8000,
                 hop_size=64, win_size=256, fmin=0, fmax=4000)
    assert h.n_fft == h['n_fft'] == 256

    (tmp_path / 'config.json').write_text(json.dumps(dict(h)))
    h2 = load_hparams_from_json(tmp_path / 'config.json')
    assert h2.hop_size == 64

    y = np.random.RandomState(0).randn(1, 2048).astype('float32') * 0.1
    got = np.asarray(get_mel_spectrogram(y, h))
    want = np.asarray(mel_spectrogram(
        y, h.n_fft, h.num_mels, h.sampling_rate, h.hop_size,
        h.win_size, h.fmin, h.fmax))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (1, 8, want.shape[-1])

    x = np.abs(np.random.RandomState(1).randn(32)).astype('float32') + 0.1
    # log <-> exp roundtrip (loose tol: TPU transcendentals)
    np.testing.assert_allclose(
        np.asarray(dynamic_range_decompression(
            dynamic_range_compression(x))), x, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(spectral_de_normalize(spectral_normalize(x))),
        x, rtol=1e-3)
    # clip floor: values below clip_val compress to log(clip_val)
    lo = np.asarray(dynamic_range_compression(np.float32(1e-9)))
    np.testing.assert_allclose(lo, np.log(1e-5), rtol=1e-4)
    assert get_padding(3) == 1 and get_padding(3, 5) == 5
    assert MAX_WAV_VALUE == 32767.0


def test_nvidia_utils_tail(tmp_path):
    """init_weights / scan_checkpoint / save_audio / plot_spectrogram
    (ref nvidia_bigvgan/utils.py:17-100)."""
    from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (
        init_weights, scan_checkpoint, save_audio, plot_spectrogram,
        MAX_WAV_VALUE)
    from padertorch_tpu import nn, random as ptrandom
    import jax

    ptrandom.seed(0)
    conv = nn.Conv1d(4, 4, 3)
    before = np.asarray(conv.weight).copy()
    init_weights(conv, std=0.01, key=jax.random.PRNGKey(1))
    after = np.asarray(conv.weight)
    assert not np.allclose(before, after)
    assert np.std(after) < 0.05  # drew from N(0, 0.01)
    # non-conv modules untouched
    lin = nn.Linear(4, 4)
    w = np.asarray(lin.weight).copy()
    init_weights(lin)
    np.testing.assert_array_equal(np.asarray(lin.weight), w)

    # checkpoint scanning: newest 8-digit suffix wins, renamed fallback
    (tmp_path / 'g_00000001').touch()
    (tmp_path / 'g_00000005').touch()
    assert scan_checkpoint(tmp_path, 'g_').endswith('g_00000005')
    assert scan_checkpoint(tmp_path, 'x_') is None
    (tmp_path / 'renamed.pt').touch()
    got = scan_checkpoint(tmp_path, 'x_', renamed_file='renamed.pt')
    assert got.endswith('renamed.pt')

    # wav roundtrip at int16 scale
    from scipy.io.wavfile import read
    wav = np.sin(np.linspace(0, 20, 400)).astype('float32') * 0.5
    save_audio(wav, tmp_path / 'a.wav', 16000)
    sr, back = read(tmp_path / 'a.wav')
    assert sr == 16000
    np.testing.assert_allclose(
        back / MAX_WAV_VALUE, wav, atol=1.0 / MAX_WAV_VALUE)

    fig = plot_spectrogram(np.random.rand(8, 20))
    assert fig is not None
