"""BigVGAN neural vocoder, TPU-native.

Reference parity:
``padertorch/contrib/mk/synthesis/vocoder/nvidia_bigvgan/bigvgan.py``
(AMPBlock1 :31, AMPBlock2 :150, BigVGAN generator :244) and the
``Synthesis``-API wrapper ``mk/synthesis/vocoder/bigvgan.py:16``
(``Vocoder``).

The reference runs NVIDIA's torch/CUDA implementation and downloads
checkpoints from the HuggingFace hub.  Here the **generator graph is
implemented in JAX**: the whole mel→waveform synthesis is one feed-
forward conv stack (transpose-conv upsampling + anti-aliased-snake
residual blocks) — fully parallel over time, so a single XLA program
with every conv on the MXU; no autoregression, no CUDA kernel.  The
anti-aliased activation reuses :mod:`.bigvgan_activation` (the repo's
jnp composition of the reference's fused CUDA up-snake-down kernel).

Checkpoint import: :func:`load_bigvgan_generator` converts an NVIDIA
``bigvgan_generator.pt`` + ``config.json`` pair (torch used only for
deserialization — no network access; weight-norm pairs are merged).
"""
import json
from pathlib import Path
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu import nn
from padertorch_tpu.base import Module
from padertorch_tpu.contrib.mk.synthesis.base import Synthesis
from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan_activation import (
    Snake, SnakeBeta, Activation1d,
)

__all__ = ['AMPBlock1', 'AMPBlock2', 'BigVGANGenerator',
           'BigVGANVocoder', 'load_bigvgan_generator',
           'slaney_mel_filterbank', 'mel_spectrogram',
           'get_mel_spectrogram', 'dynamic_range_compression',
           'dynamic_range_decompression', 'spectral_normalize',
           'spectral_de_normalize', 'AttrDict',
           'load_hparams_from_json', 'get_padding', 'MAX_WAV_VALUE',
           'init_weights', 'scan_checkpoint', 'save_audio',
           'plot_spectrogram', 'plot_spectrogram_clipped']

# int16 full-scale the NVIDIA pipeline normalizes by
# (ref ``nvidia_bigvgan/meldataset.py:21`` — 32767, not 32768, to
# avoid overflow pops on full-scale samples)
MAX_WAV_VALUE = 32767.0


class AttrDict(dict):
    """Hyperparameter dict with attribute access
    (ref ``nvidia_bigvgan/env.py:8``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def load_hparams_from_json(path) -> 'AttrDict':
    """Read an NVIDIA BigVGAN ``config.json`` into an :class:`AttrDict`
    (ref ``nvidia_bigvgan/bigvgan.py:25``)."""
    return AttrDict(json.loads(Path(path).read_text()))


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    """``log(clip(x) * C)`` (ref ``meldataset.py:24``; the torch and
    numpy variants collapse to one jnp implementation here)."""
    return jnp.log(jnp.clip(jnp.asarray(x), clip_val, None) * C)


def dynamic_range_decompression(x, C=1):
    """Inverse of :func:`dynamic_range_compression`
    (ref ``meldataset.py:28``)."""
    return jnp.exp(jnp.asarray(x)) / C


def spectral_normalize(magnitudes):
    """ref ``meldataset.py:40`` (``spectral_normalize_torch``)."""
    return dynamic_range_compression(magnitudes)


def spectral_de_normalize(magnitudes):
    """ref ``meldataset.py:44`` (``spectral_de_normalize_torch``)."""
    return dynamic_range_decompression(magnitudes)


def slaney_mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """librosa-compatible mel filterbank (htk=False, norm='slaney') —
    the filters NVIDIA's ``meldataset.py`` conditions BigVGAN on.

    Returns (n_mels, n_fft // 2 + 1) float32.
    """
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        # slaney scale: linear below 1 kHz, log above
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        logstep = np.log(6.4) / 27.0
        return np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep,
            mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney norm: each filter integrates to ~ constant energy
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def mel_spectrogram(y, n_fft, num_mels, sampling_rate, hop_size,
                    win_size, fmin=0, fmax=None):
    """NVIDIA-BigVGAN-compatible log-mel conditioning
    (ref ``nvidia_bigvgan/meldataset.py:52``): reflect-pad by
    ``(n_fft - hop) // 2``, Hann STFT without centering,
    ``sqrt(|X|^2 + 1e-9)`` magnitude, slaney mel filterbank,
    ``log(clamp(mel, 1e-5))``.

    y: (B, T) or (T,) waveform in [-1, 1] → (B, M, frames)/(M, frames).
    """
    y = jnp.asarray(y, jnp.float32)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode='reflect')
    t = y.shape[-1]
    frames = 1 + (t - n_fft) // hop_size
    idx = (np.arange(frames) * hop_size)[:, None] + np.arange(n_fft)
    framed = y[:, idx]                               # (B, F, n_fft)
    window = jnp.asarray(np.hanning(win_size + 1)[:-1], jnp.float32)
    if win_size < n_fft:                             # torch pads window
        lpad = (n_fft - win_size) // 2
        window = jnp.pad(window, (lpad, n_fft - win_size - lpad))
    framed = framed * window
    k = np.arange(n_fft // 2 + 1)
    angle = -2j * np.pi * np.outer(np.arange(n_fft), k) / n_fft
    dft = np.exp(angle)
    spec = jnp.einsum(
        'bfn,nk->bfk', framed,
        jnp.asarray(dft.real, jnp.float32)) ** 2 + jnp.einsum(
        'bfn,nk->bfk', framed,
        jnp.asarray(dft.imag, jnp.float32)) ** 2
    mag = jnp.sqrt(spec + 1e-9)                      # (B, F, bins)
    fbank = jnp.asarray(slaney_mel_filterbank(
        sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum('mk,bfk->bmf', fbank, mag)
    out = jnp.log(jnp.clip(mel, 1e-5, None))
    return out[0] if squeeze else out


def get_mel_spectrogram(wav, h):
    """Mel spectrogram from hyperparameter object ``h`` with attributes
    ``n_fft/num_mels/sampling_rate/hop_size/win_size/fmin/fmax``
    (ref ``meldataset.py:124``; pairs with :func:`load_hparams_from_json`).
    """
    return mel_spectrogram(
        wav, h.n_fft, h.num_mels, h.sampling_rate, h.hop_size,
        h.win_size, h.fmin, h.fmax)


def get_padding(kernel_size, dilation=1):
    """Same-padding for odd kernels (ref ``nvidia_bigvgan/utils.py:58``)."""
    return (kernel_size * dilation - dilation) // 2


_get_padding = get_padding


def init_weights(m, mean=0.0, std=0.01, key=None):
    """Re-initialize a conv module's weight from N(mean, std)
    (ref ``nvidia_bigvgan/utils.py:46``; there an in-place torch
    ``.data.normal_`` draws FRESH randomness per call — so without an
    explicit ``key`` each invocation pulls a new subkey from the
    framework's seeded stream (``padertorch_tpu.random``); a constant
    default key would silently assign identical samples to every
    same-shaped conv in an ``apply(init_weights)`` sweep)."""
    if 'Conv' in type(m).__name__ and hasattr(m, 'weight'):
        if key is None:
            from padertorch_tpu import random as ptrandom
            key = ptrandom.init_key()
        m.weight = mean + std * jax.random.normal(
            key, jnp.shape(m.weight), jnp.result_type(m.weight))
    return m


def scan_checkpoint(cp_dir, prefix, renamed_file=None):
    """Newest ``<prefix>????????`` checkpoint in ``cp_dir``, falling
    back to ``renamed_file`` (ref ``nvidia_bigvgan/utils.py:76``)."""
    import glob
    import os
    cp_list = glob.glob(os.path.join(str(cp_dir), prefix + '????????'))
    if cp_list:
        return sorted(cp_list)[-1]
    if renamed_file:
        renamed_path = os.path.join(str(cp_dir), renamed_file)
        if os.path.isfile(renamed_path):
            return renamed_path
    return None


def save_audio(audio, path, sr):
    """Write a [-1, 1] float waveform as 16-bit PCM
    (ref ``nvidia_bigvgan/utils.py:96``)."""
    from scipy.io.wavfile import write
    audio = np.asarray(audio) * MAX_WAV_VALUE
    write(path, sr, audio.astype('int16'))


def plot_spectrogram(spectrogram, clip_max=None):
    """Matplotlib figure of a spectrogram
    (ref ``nvidia_bigvgan/utils.py:17``); returns the figure for the
    summary-hook ``figures`` channel."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 2))
    kwargs = {} if clip_max is None else dict(vmin=1e-6, vmax=clip_max)
    im = ax.imshow(np.asarray(spectrogram), aspect='auto',
                   origin='lower', interpolation='none', **kwargs)
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close(fig)
    return fig


def plot_spectrogram_clipped(spectrogram, clip_max=2.0):
    """ref ``nvidia_bigvgan/utils.py:28``."""
    return plot_spectrogram(spectrogram, clip_max=clip_max)


def _make_activation(activation, channels, snake_logscale):
    if activation == 'snake':
        return Snake(channels, alpha_logscale=snake_logscale)
    if activation == 'snakebeta':
        return SnakeBeta(channels, alpha_logscale=snake_logscale)
    raise ValueError(
        f"activation must be 'snake' or 'snakebeta', got {activation!r}")


class AMPBlock1(Module):
    """Anti-aliased multi-periodicity residual block, variant 1.

    Per dilation: act → dilated conv → act → dilation-1 conv, residual
    add (ref ``nvidia_bigvgan/bigvgan.py:31``).  Activations are the
    alias-free up-snake-down composition.
    """

    def __init__(self, channels, kernel_size=3, dilation=(1, 3, 5),
                 activation='snakebeta', snake_logscale=True):
        self.convs1 = [
            nn.Conv1d(channels, channels, kernel_size, dilation=d,
                      padding=_get_padding(kernel_size, d))
            for d in dilation
        ]
        self.convs2 = [
            nn.Conv1d(channels, channels, kernel_size, dilation=1,
                      padding=_get_padding(kernel_size, 1))
            for _ in dilation
        ]
        self.activations = [
            Activation1d(
                _make_activation(activation, channels, snake_logscale))
            for _ in range(2 * len(dilation))
        ]

    def forward(self, x):
        acts1 = self.activations[::2]
        acts2 = self.activations[1::2]
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, acts1, acts2):
            xt = c2(a2(c1(a1(x))))
            x = xt + x
        return x


class AMPBlock2(Module):
    """AMP residual block, variant 2: one conv per dilation
    (ref ``nvidia_bigvgan/bigvgan.py:150``)."""

    def __init__(self, channels, kernel_size=3, dilation=(1, 3, 5),
                 activation='snakebeta', snake_logscale=True):
        self.convs = [
            nn.Conv1d(channels, channels, kernel_size, dilation=d,
                      padding=_get_padding(kernel_size, d))
            for d in dilation
        ]
        self.activations = [
            Activation1d(
                _make_activation(activation, channels, snake_logscale))
            for _ in dilation
        ]

    def forward(self, x):
        for c, a in zip(self.convs, self.activations):
            x = c(a(x)) + x
        return x


class BigVGANGenerator(Module):
    """BigVGAN generator: log-mel → waveform in one conv stack.

    Reference parity: ``nvidia_bigvgan/bigvgan.py:244`` — pre-conv,
    transpose-conv upsampling stages, per-stage bank of AMP blocks
    (averaged), anti-aliased post activation, post-conv, tanh/clamp.
    Defaults follow NVIDIA's ``bigvgan_v2_24khz_100band_256x`` config.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> g = BigVGANGenerator(
    ...     num_mels=8, upsample_initial_channel=16,
    ...     upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
    ...     resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    >>> import jax.numpy as jnp
    >>> g(jnp.zeros((1, 8, 10))).shape
    (1, 1, 80)
    """

    def __init__(
            self,
            num_mels: int = 100,
            upsample_rates: tp.Sequence[int] = (4, 4, 2, 2, 2, 2),
            upsample_kernel_sizes: tp.Sequence[int] = (8, 8, 4, 4, 4, 4),
            upsample_initial_channel: int = 1536,
            resblock: str = '1',
            resblock_kernel_sizes: tp.Sequence[int] = (3, 7, 11),
            resblock_dilation_sizes: tp.Sequence[tp.Sequence[int]] = (
                (1, 3, 5), (1, 3, 5), (1, 3, 5)),
            activation: str = 'snakebeta',
            snake_logscale: bool = True,
            use_bias_at_final: bool = True,
            use_tanh_at_final: bool = True,
    ):
        assert len(upsample_rates) == len(upsample_kernel_sizes)
        self.num_mels = num_mels
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.upsample_factor = int(np.prod(upsample_rates))
        self.use_tanh_at_final = use_tanh_at_final

        self.conv_pre = nn.Conv1d(
            num_mels, upsample_initial_channel, 7, padding=3)

        resblock_cls = {'1': AMPBlock1, '2': AMPBlock2}[str(resblock)]

        self.ups = []
        for i, (u, k) in enumerate(
                zip(upsample_rates, upsample_kernel_sizes)):
            self.ups.append([nn.ConvTranspose1d(
                upsample_initial_channel // (2 ** i),
                upsample_initial_channel // (2 ** (i + 1)),
                k, stride=u, padding=(k - u) // 2)])

        self.resblocks = []
        for i in range(self.num_upsamples):
            ch = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes,
                            resblock_dilation_sizes):
                self.resblocks.append(resblock_cls(
                    ch, k, tuple(d), activation=activation,
                    snake_logscale=snake_logscale))

        self.activation_post = Activation1d(
            _make_activation(activation, ch, snake_logscale))
        self.conv_post = nn.Conv1d(
            ch, 1, 7, padding=3, bias=use_bias_at_final)

    def forward(self, x):
        """x: (B, num_mels, T') log-mel → (B, 1, T' * upsample_factor)."""
        x = self.conv_pre(x)
        for i in range(self.num_upsamples):
            for up in self.ups[i]:
                x = up(x)
            xs = 0.0
            for j in range(self.num_kernels):
                xs = xs + self.resblocks[i * self.num_kernels + j](x)
            x = xs / self.num_kernels
        x = self.activation_post(x)
        x = self.conv_post(x)
        if self.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)

    def inference(self, c):
        """c: (B, M, T') or (M, T') log-mel → (B, T)/(T,) waveform."""
        squeeze = c.ndim == 2
        if squeeze:
            c = c[None]
        y = self.forward(c)[:, 0]
        return y[0] if squeeze else y


def _merge_weight_norm(sd):
    """Collapse torch ``weight_g``/``weight_v`` pairs into plain
    weights (published inference checkpoints usually store them)."""
    merged = {}
    for k in list(sd):
        if k.endswith('weight_v'):
            base = k[:-len('_v')]
            v = sd[k]
            g = sd[base + '_g']
            norm = np.sqrt((v ** 2).sum(
                axis=tuple(range(1, v.ndim)), keepdims=True))
            merged[base] = g * v / norm
        elif k.endswith('weight_g'):
            continue
        else:
            merged[k] = sd[k]
    return merged


def _set_conv(conv, sd, prefix, transpose=False):
    w = np.asarray(sd[f'{prefix}.weight'])
    if transpose:  # torch ConvTranspose1d stores (in, out, k); ours OIK
        w = np.transpose(w, (1, 0, 2))
    conv.weight = jnp.asarray(w)
    if f'{prefix}.bias' in sd:
        conv.bias = jnp.asarray(np.asarray(sd[f'{prefix}.bias']))


def _set_snake(act_module, sd, prefix):
    act_module.alpha = jnp.asarray(np.asarray(sd[f'{prefix}.alpha']))
    if f'{prefix}.beta' in sd:
        act_module.beta = jnp.asarray(np.asarray(sd[f'{prefix}.beta']))


def load_bigvgan_generator(model_dir, config=None):
    """Build a :class:`BigVGANGenerator` from a local NVIDIA BigVGAN
    checkpoint directory (``config.json`` + ``bigvgan_generator.pt``
    holding ``{'generator': state_dict}`` — the layout
    ``BigVGAN._save_pretrained`` writes, ref
    ``nvidia_bigvgan/bigvgan.py:404``), or from an explicit ``.pt``
    file plus a ``config`` dict.
    """
    import torch
    model_dir = Path(model_dir)
    if model_dir.is_dir():
        ckpt_file = model_dir / 'bigvgan_generator.pt'
        if config is None:
            config = json.loads((model_dir / 'config.json').read_text())
    else:
        ckpt_file = model_dir
        assert config is not None, 'config required with a bare .pt file'
    ckpt = torch.load(ckpt_file, map_location='cpu', weights_only=False)
    sd = ckpt.get('generator', ckpt)
    sd = _merge_weight_norm(
        {k: v.numpy() for k, v in sd.items()})

    gen = BigVGANGenerator(
        num_mels=config['num_mels'],
        upsample_rates=tuple(config['upsample_rates']),
        upsample_kernel_sizes=tuple(config['upsample_kernel_sizes']),
        upsample_initial_channel=config['upsample_initial_channel'],
        resblock=str(config['resblock']),
        resblock_kernel_sizes=tuple(config['resblock_kernel_sizes']),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in config['resblock_dilation_sizes']),
        activation=config['activation'],
        snake_logscale=config['snake_logscale'],
        use_bias_at_final=config.get('use_bias_at_final', True),
        use_tanh_at_final=config.get('use_tanh_at_final', True),
    )

    _set_conv(gen.conv_pre, sd, 'conv_pre')
    for i, stage in enumerate(gen.ups):
        for j, up in enumerate(stage):
            _set_conv(up, sd, f'ups.{i}.{j}', transpose=True)
    for n, block in enumerate(gen.resblocks):
        if isinstance(block, AMPBlock1):
            for j, conv in enumerate(block.convs1):
                _set_conv(conv, sd, f'resblocks.{n}.convs1.{j}')
            for j, conv in enumerate(block.convs2):
                _set_conv(conv, sd, f'resblocks.{n}.convs2.{j}')
        else:
            for j, conv in enumerate(block.convs):
                _set_conv(conv, sd, f'resblocks.{n}.convs.{j}')
        for m, act in enumerate(block.activations):
            _set_snake(act.activation, sd,
                       f'resblocks.{n}.activations.{m}.act')
    _set_snake(gen.activation_post.activation, sd, 'activation_post.act')
    _set_conv(gen.conv_post, sd, 'conv_post')
    return gen


class BigVGANVocoder(Synthesis):
    """Mel → waveform synthesis with a (possibly imported) BigVGAN
    generator.

    Reference parity: ``mk/synthesis/vocoder/bigvgan.py:16``
    (``Vocoder``) — 2-dim or 3-dim mel input with configurable
    batch/sequence axes, per-utterance sequence-length masking — minus
    the HuggingFace *download* (zero-egress environment: pass a local
    checkpoint directory instead) and minus the per-utterance python
    loop: batched utterances synthesize as ONE jitted XLA call; padded
    frames are masked after synthesis.
    """

    def __init__(self, generator=None, checkpoint_dir=None,
                 batch_axis: int = 0, sequence_axis: int = -1,
                 sampling_rate: int = 24000,
                 postprocessing: tp.Optional[tp.Callable] = None):
        if generator is None:
            if checkpoint_dir is None:
                generator = BigVGANGenerator()
            else:
                generator = load_bigvgan_generator(checkpoint_dir)
                cfg_file = Path(checkpoint_dir) / 'config.json'
                if cfg_file.exists():
                    cfg = json.loads(cfg_file.read_text())
                    sampling_rate = cfg.get('sampling_rate',
                                            sampling_rate)
        self.generator = generator
        self.batch_axis = batch_axis
        self.sequence_axis = sequence_axis
        self.sampling_rate = sampling_rate
        self.postprocessing = postprocessing

    def forward(self, mel_spec, sequence_lengths=None):
        """mel_spec: 2-dim (M, T)/(T, M) by ``sequence_axis``, or 3-dim
        with ``batch_axis``/``sequence_axis``; returns (T,) or (B, T)."""
        mel_spec = jnp.asarray(mel_spec, jnp.float32)
        ndim = mel_spec.ndim
        seq_ax = self.sequence_axis % ndim
        if ndim == 2:
            c = jnp.moveaxis(mel_spec, seq_ax, -1)[None]   # (1, M, T)
        elif ndim == 3:
            batch_ax = self.batch_axis % ndim
            assert batch_ax != seq_ax, (batch_ax, seq_ax)
            feat_ax = ({0, 1, 2} - {batch_ax, seq_ax}).pop()
            c = jnp.transpose(mel_spec, (batch_ax, feat_ax, seq_ax))
        else:
            raise TypeError(
                'Expected 2- or 3-dim. spectrogram but got '
                f'{ndim}-dim. input with shape {mel_spec.shape}')
        y = self.generator.inference(c)                    # (B, T)
        if sequence_lengths is not None:
            f = self.generator.upsample_factor
            mask = (jnp.arange(y.shape[-1])[None, :]
                    < f * jnp.asarray(sequence_lengths)[:, None])
            y = y * mask
        if ndim == 2:
            y = y[0]
        if self.postprocessing is not None:
            y = self.postprocessing(y)
        return y
