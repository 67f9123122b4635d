"""Reference (torch) checkpoint import tests.

End-to-end: build a torch replica of the reference PIT BLSTM model
(``/root/reference`` ``pit/model.py`` structure: 3-layer BLSTM +
linear1 + linear2), save a reference-trainer-style checkpoint
(``{'model': state_dict, ...}``), import it with ``pt.migrate`` and
require forward equivalence between the torch replica and the native
model.  Plus layout unit tests per layer type.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.migrate import (
    load_torch_checkpoint, import_torch_state_dict, named_modules,
)

torch = pytest.importorskip('torch')


def test_linear_transposed():
    ptrandom.seed(0)
    ours = nn.Linear(4, 3)
    t = torch.nn.Linear(4, 3)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    ours = import_torch_state_dict(ours, sd)
    x = np.random.RandomState(0).randn(2, 4).astype('float32')
    np.testing.assert_allclose(
        np.asarray(ours(jnp.asarray(x))),
        t(torch.tensor(x)).detach().numpy(), atol=1e-6)


def test_conv_and_transpose_layouts():
    ptrandom.seed(0)
    ours = nn.Sequential(
        nn.Conv1d(2, 3, 3, padding=1),
        nn.ConvTranspose1d(3, 2, 4, stride=2, padding=1),
    )
    t = torch.nn.Sequential(
        torch.nn.Conv1d(2, 3, 3, padding=1),
        torch.nn.ConvTranspose1d(3, 2, 4, stride=2, padding=1),
    )
    sd = {f'layers.{k}': v.detach().numpy()
          for k, v in t.state_dict().items()}
    ours = import_torch_state_dict(ours, sd)
    x = np.random.RandomState(1).randn(2, 2, 8).astype('float32')
    np.testing.assert_allclose(
        np.asarray(ours(jnp.asarray(x))),
        t(torch.tensor(x)).detach().numpy(), atol=1e-5)


def test_lstm_bias_sum_exact():
    ptrandom.seed(0)
    from padertorch_tpu.modules.recurrent import LSTM
    ours = LSTM(5, 4, num_layers=2, bidirectional=True)
    t = torch.nn.LSTM(5, 4, num_layers=2, bidirectional=True,
                      batch_first=True)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    ours = import_torch_state_dict(ours, sd)
    x = np.random.RandomState(2).randn(3, 6, 5).astype('float32')
    out, _ = ours.eval()(jnp.asarray(x))
    t_out, _ = t(torch.tensor(x))
    np.testing.assert_allclose(
        np.asarray(out), t_out.detach().numpy(), atol=1e-5)


def test_gru_warns_when_b_hn_nonzero():
    ptrandom.seed(0)
    from padertorch_tpu.modules.recurrent import GRU
    ours = GRU(3, 2)
    t = torch.nn.GRU(3, 2, batch_first=True)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    assert np.abs(sd['bias_hh_l0'][2 * 2:]).max() > 0
    with pytest.warns(UserWarning, match='GRU import is approximate'):
        import_torch_state_dict(ours, sd)
    sd['bias_hh_l0'][2 * 2:] = 0  # b_hn == 0 -> exact, no warning
    with torch.no_grad():
        t.bias_hh_l0[2 * 2:] = 0
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter('error')
        ours = import_torch_state_dict(ours, sd)
    x = np.random.RandomState(3).randn(2, 5, 3).astype('float32')
    out, _ = ours.eval()(jnp.asarray(x))
    t_out, _ = t(torch.tensor(x))
    np.testing.assert_allclose(
        np.asarray(out), t_out.detach().numpy(), atol=1e-5)


def test_strict_raises_on_unconsumed_keys():
    ptrandom.seed(0)
    ours = nn.Linear(4, 3)
    sd = {'weight': np.zeros((3, 4), 'float32'),
          'typo.weight': np.zeros((3, 4), 'float32')}
    with pytest.raises(KeyError, match='typo.weight'):
        import_torch_state_dict(ours, sd)
    imported = import_torch_state_dict(ours, sd, strict=False)
    assert float(np.abs(np.asarray(imported.weight)).max()) == 0.0


class _TorchPIT(torch.nn.Module):
    """Replica of the reference PIT model structure
    (``pit/model.py:27-73``): BLSTM + linear1 + linear2, relu output."""

    def __init__(self, F=33, units=16, layers=3, K=2):
        super().__init__()
        self.K, self.F = K, F
        self.blstm = torch.nn.LSTM(
            F, units, layers, bidirectional=True, batch_first=True)
        self.linear1 = torch.nn.Linear(2 * units, 2 * units)
        self.linear2 = torch.nn.Linear(2 * units, F * K)

    def forward(self, y):
        h = torch.log1p(y)
        h, _ = self.blstm(h)
        h = torch.relu(self.linear1(h))
        h = torch.relu(self.linear2(h))
        b, t, _ = y.shape
        return h.reshape(b, t, self.K, self.F)


def test_reference_pit_checkpoint_roundtrip(tmp_path):
    """Trainer-style torch checkpoint -> native flagship model."""
    torch.manual_seed(0)
    t_model = _TorchPIT()
    ckpt = {
        'model': t_model.state_dict(),
        'iteration': 1234,
        'epoch': 5,
        'optimizer': {'param_groups': []},
        'hooks': {},
    }
    path = tmp_path / 'ckpt_best_loss.pth'
    torch.save(ckpt, path)

    ptrandom.seed(0)
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
    model = PermutationInvariantTrainingModel(
        F=33, units=16, recurrent_layers=3, K=2)
    sd = load_torch_checkpoint(path)
    model = import_torch_state_dict(model, sd).eval()

    y = np.random.RandomState(0).rand(2, 11, 33).astype('float32')
    ours = np.asarray(model({'Y_abs': jnp.asarray(y)}))
    theirs = t_model(torch.tensor(y)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_prefix_map():
    ptrandom.seed(0)
    ours = nn.Linear(4, 3)
    t = torch.nn.Linear(4, 3)
    sd = {f'net.head.{k}': v.detach().numpy()
          for k, v in t.state_dict().items()}
    imported = import_torch_state_dict(
        ours, sd, prefix_map={'': 'net.head'})
    x = np.random.RandomState(4).randn(2, 4).astype('float32')
    np.testing.assert_allclose(
        np.asarray(imported(jnp.asarray(x))),
        t(torch.tensor(x)).detach().numpy(), atol=1e-6)


def test_named_modules_names_match_state_dict():
    ptrandom.seed(0)
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
    model = PermutationInvariantTrainingModel(
        F=9, units=4, recurrent_layers=1, K=2)
    module_names = {n for n, _ in named_modules(model)}
    assert {'', 'blstm', 'linear1', 'linear2'} <= module_names
    sd_names = set(model.state_dict())
    assert 'linear1.weight' in sd_names
    assert 'blstm.w_ih.0' in sd_names
