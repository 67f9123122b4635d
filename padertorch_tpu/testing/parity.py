"""Numerics parity harness vs the installed torch (the reference backend).

BASELINE.json demands "STFT outputs and SI-SDR matching to 1e-4" against
the PyTorch reference.  The reference source cannot be imported here (it
depends on paderbox/pb_bss), so each check re-executes the reference
*math* in torch, independent of this repo's JAX code:

- ``pit_parity``: one recorded batch through the repo PIT BLSTM and
  through a torch re-execution of the reference model semantics
  (``contrib/examples/source_separation/pit/model.py:75-140`` — log1p,
  packed BLSTM, two linear layers, per-example ``pit_loss`` with MSE over
  unpadded frames) with identical weights; returns both losses.
- ``stft_parity``: repo conv-kernel STFT vs a torch unfold+window+rfft
  oracle (the reference mirrors ``paderbox.transform.stft``).
- ``si_sdr_parity``: repo SI-SDR vs the reference formula
  (``ops/losses/regression.py:178``) in torch float64.

Used by ``bench.py`` (emits the parity metric) and by
``tests/test_parity.py``.
"""
import itertools

import numpy as np

__all__ = ['pit_parity', 'stft_parity', 'si_sdr_parity', 'make_pit_batch']


def make_pit_batch(b=4, t=50, f=257, k=2, seed=0, vary_lengths=True):
    rng = np.random.RandomState(seed)
    num_frames = (
        rng.randint(t // 2, t + 1, size=b) if vary_lengths
        else np.full(b, t)
    )
    num_frames[0] = t  # at least one full-length example
    return {
        'Y_abs': np.abs(rng.randn(b, t, f)).astype('float32'),
        'X_abs': np.abs(rng.randn(b, t, k, f)).astype('float32'),
        'cos_phase_difference':
            np.cos(rng.randn(b, t, k, f)).astype('float32'),
        'num_frames': num_frames.astype('int32'),
    }


def _torch_pit_loss_single(estimate, target):
    """Reference ``pit_loss(estimate, target, axis=-2)`` with MSE:
    min over speaker permutations of the mean squared error."""
    import torch
    k = estimate.shape[-2]
    candidates = [
        torch.nn.functional.mse_loss(estimate[:, perm, :], target)
        for perm in itertools.permutations(range(k))
    ]
    return torch.min(torch.stack(candidates))


def torch_pit_losses(model, batch):
    """Reference-semantics losses in torch with the repo model's weights."""
    import torch
    torch_blstm = torch.nn.LSTM(
        model.F, model.blstm.hidden_size, model.blstm.num_layers,
        bidirectional=True, batch_first=True)
    sd = {}
    ours = model.blstm
    for layer in range(ours.num_layers):
        for d in range(2):
            i = layer * 2 + d
            suffix = '_reverse' if d == 1 else ''
            sd[f'weight_ih_l{layer}{suffix}'] = torch.tensor(
                np.asarray(ours.w_ih[i], dtype='float32').T.copy())
            sd[f'weight_hh_l{layer}{suffix}'] = torch.tensor(
                np.asarray(ours.w_hh[i], dtype='float32').T.copy())
            b = np.asarray(ours.b[i], dtype='float32')
            sd[f'bias_ih_l{layer}{suffix}'] = torch.tensor(b.copy())
            sd[f'bias_hh_l{layer}{suffix}'] = torch.tensor(
                np.zeros_like(b))
    torch_blstm.load_state_dict(sd)
    # torch Linear stores (out, in); repo stores weight as (in, out)
    w1 = np.asarray(model.linear1.weight, dtype='float32')
    w2 = np.asarray(model.linear2.weight, dtype='float32')
    linear1 = torch.nn.Linear(w1.shape[0], w1.shape[1])
    linear2 = torch.nn.Linear(w2.shape[0], w2.shape[1])
    with torch.no_grad():
        linear1.weight.copy_(torch.tensor(w1.T.copy()))
        linear1.bias.copy_(torch.tensor(
            np.asarray(model.linear1.bias, dtype='float32').copy()))
        linear2.weight.copy_(torch.tensor(w2.T.copy()))
        linear2.bias.copy_(torch.tensor(
            np.asarray(model.linear2.bias, dtype='float32').copy()))

    torch_blstm.eval()
    k = model.K
    pit_mse, pit_ips = [], []
    with torch.no_grad():
        for i in range(batch['Y_abs'].shape[0]):
            n = int(batch['num_frames'][i])
            y = torch.tensor(batch['Y_abs'][i, :n])        # (n, F)
            x = torch.tensor(batch['X_abs'][i, :n])        # (n, K, F)
            cpd = torch.tensor(
                batch['cos_phase_difference'][i, :n])
            h = torch.log1p(y)[None]
            h, _ = torch_blstm(h)
            h = torch.relu(linear1(h))
            h = torch.relu(linear2(h))
            mask = h[0].reshape(n, k, model.F)
            estimate = mask * y[:, None, :]
            pit_mse.append(_torch_pit_loss_single(estimate, x))
            pit_ips.append(_torch_pit_loss_single(estimate, x * cpd))
    return {
        'pit_mse_loss': float(torch.mean(torch.stack(pit_mse))),
        'pit_ips_loss': float(torch.mean(torch.stack(pit_ips))),
    }


def repo_pit_losses(model, batch):
    import jax
    import jax.numpy as jnp
    from padertorch_tpu.module import partition, combine
    model = model.eval()
    params, static = partition(model)
    jbatch = {key: jnp.asarray(value) for key, value in batch.items()}

    @jax.jit
    def losses(params, jbatch):
        m = combine(params, static)
        review = m.review(jbatch, m(jbatch))
        return review['losses']

    out = losses(params, jbatch)
    return {key: float(value) for key, value in out.items()}


def pit_parity(b=4, t=50, f=257, k=2, units=64, layers=2, seed=0):
    """Same recorded batch + same weights through repo JAX model and a
    torch re-execution of the reference.  Returns loss dicts + max diff."""
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
    ptrandom.seed(seed)
    model = PermutationInvariantTrainingModel(
        F=f, recurrent_layers=layers, units=units, K=k)
    batch = make_pit_batch(b=b, t=t, f=f, k=k, seed=seed)
    repo = repo_pit_losses(model, batch)
    ref = torch_pit_losses(model, batch)
    max_diff = max(abs(repo[key] - ref[key]) for key in ref)
    return {'repo': repo, 'torch': ref, 'max_abs_diff': max_diff}


def stft_parity(size=512, shift=128, window_length=None, batch=3,
                samples=8000, seed=0, window='blackman', fading='full'):
    """Repo conv STFT vs torch unfold+window+rfft; returns max abs diff."""
    import torch
    from padertorch_tpu.ops._stft import STFT, _get_window

    stft = STFT(size, shift, window=window, window_length=window_length,
                fading=fading, complex_representation='complex',
                dtype='float32')
    length = stft.window_length
    rng = np.random.RandomState(seed)
    x = rng.randn(batch, samples)
    repo = np.asarray(stft(x))

    w = _get_window(window, False, length)
    xt = torch.tensor(x, dtype=torch.float64)
    pad = length - shift
    if fading == 'full':
        xt = torch.nn.functional.pad(xt, (pad, pad))
    elif fading == 'half':
        xt = torch.nn.functional.pad(
            xt, (pad // 2, int(np.ceil(pad / 2))))
    # pad to a whole number of frames (STFT pad=True semantics)
    t_total = xt.shape[-1]
    if t_total < length:
        xt = torch.nn.functional.pad(xt, (0, length - t_total))
    elif (t_total + shift - length) % shift:
        xt = torch.nn.functional.pad(
            xt, (0, shift - (t_total + shift - length) % shift))
    frames = xt.unfold(-1, length, shift)  # (B, frames, length)
    frames = frames * torch.tensor(w, dtype=torch.float64)
    spec = torch.fft.rfft(frames, n=size)
    ref = spec.numpy()
    assert repo.shape == ref.shape, (repo.shape, ref.shape)
    return float(np.abs(repo - ref).max())


def si_sdr_parity(batch=8, samples=16000, seed=0):
    """Repo SI-SDR vs the reference formula in torch float64."""
    import torch
    from padertorch_tpu.evaluation.metrics import si_sdr

    rng = np.random.RandomState(seed)
    reference = rng.randn(batch, samples)
    estimate = reference + 0.3 * rng.randn(batch, samples)

    ref_t = torch.tensor(reference, dtype=torch.float64)
    est_t = torch.tensor(estimate, dtype=torch.float64)
    # reference ops/losses/regression.py:178 (si_sdr_loss without
    # thresholds): project estimate onto reference, ratio in dB
    scale = (torch.sum(est_t * ref_t, dim=-1, keepdim=True)
             / torch.sum(ref_t ** 2, dim=-1, keepdim=True))
    target = scale * ref_t
    noise = est_t - target
    torch_vals = 10 * torch.log10(
        torch.sum(target ** 2, dim=-1) / torch.sum(noise ** 2, dim=-1))

    repo_vals = np.asarray([
        si_sdr(estimate[i], reference[i]) for i in range(batch)
    ])
    return float(np.abs(repo_vals - torch_vals.numpy()).max())
