"""Tests for the cb parity-tail symbols (round-3 symbol sweep):
kaldi_stft/kaldi_istft, Makefile/makefile/write_makefile_and_config,
tracker_list/get_ParameterTracker, KamoExampleToDevice,
CPUTimeLimitExceededHookTrigger, is_torch.

Reference: padertorch/contrib/cb/{feature_extractor,io,track,data,
hooks,complex}.py.
"""
import os
import signal

import numpy as np
import pytest


class TestKaldiSTFT:
    def test_matches_class_and_reconstructs(self):
        from padertorch_tpu.contrib.cb.feature_extractor import (
            kaldi_stft, kaldi_istft, KaldiSTFT)
        x = np.random.RandomState(0).randn(2, 16000).astype('float32')
        S = kaldi_stft(x)
        assert S.shape == (2, 98, 257) and S.dtype == np.complex64
        S2 = np.asarray(KaldiSTFT()(x))
        np.testing.assert_allclose(S, S2, atol=1e-4)
        y = kaldi_istft(S)
        n = min(y.shape[-1], x.shape[-1])
        np.testing.assert_allclose(
            y[..., 400:n - 400], x[..., 400:n - 400], atol=1e-4)

    def test_axis_argument(self):
        from padertorch_tpu.contrib.cb.feature_extractor import kaldi_stft
        x = np.random.RandomState(1).randn(3, 8000).astype('float32')
        S = kaldi_stft(x)
        Sm = kaldi_stft(np.moveaxis(x, -1, 0), axis=0)
        np.testing.assert_allclose(np.moveaxis(Sm, 0, -2), S, atol=1e-5)

    def test_abstract_feature_extractor_alias(self):
        from padertorch_tpu.contrib.cb.feature_extractor import (
            AbstractFeatureExtractor, FeatureExtractor)
        assert AbstractFeatureExtractor is FeatureExtractor


class TestMakefile:
    def test_text_rendering_order(self):
        from padertorch_tpu.contrib.cb.io import Makefile
        m = Makefile()
        m['run'] = 'python -m x'
        m['two'] = ['a', 'b']
        m.add_raw('v := 1')
        text = m.text
        assert text.index('run:') < text.index('two:') < text.index('v :=')
        assert '\ta\n\tb' in text

    def test_makefile_contextmanager_when_exist(self, tmp_path):
        from padertorch_tpu.contrib.cb.io import makefile
        with makefile(tmp_path) as m:
            m['run'] = 'echo hi'
        assert 'echo hi' in (tmp_path / 'Makefile').read_text()
        with pytest.raises(FileExistsError):
            with makefile(tmp_path) as m:
                pass
        with makefile(tmp_path, when_exist='append') as m:
            m['more'] = 'echo more'
        text = (tmp_path / 'Makefile').read_text()
        assert 'echo hi' in text and 'echo more' in text
        with makefile(tmp_path, when_exist='backup') as m:
            m['fresh'] = 'echo fresh'
        text = (tmp_path / 'Makefile').read_text()
        assert 'echo fresh' in text and 'echo hi' not in text
        backups = list(tmp_path.glob('Makefile_*'))
        assert len(backups) == 1 and 'echo hi' in backups[0].read_text()

    def test_write_makefile_and_config(self, tmp_path):
        from padertorch_tpu.contrib.cb.io import write_makefile_and_config
        write_makefile_and_config(
            tmp_path, {'lr': 0.1}, main_python_path='myexp.train')
        mk = (tmp_path / 'Makefile').read_text()
        assert 'python -m myexp.train --config config.yaml' in mk
        assert '--resume' in mk
        from padertorch_tpu.io import load_config
        assert load_config(tmp_path / 'config.yaml') == {'lr': 0.1}


class TestTrackTail:
    def test_tracker_list_and_custom_parameter_tracker(self):
        import jax.numpy as jnp
        from padertorch_tpu import nn
        from padertorch_tpu.contrib.cb.track import (
            track, tracker_list, get_ParameterTracker, ShapeTracker)
        net = nn.Sequential(nn.Linear(4, 8), nn.ReLU(), nn.Linear(8, 2))
        PT = get_ParameterTracker(
            name='#P', include_not_require_grad=False)
        with track(net, tracker_list(ShapeTracker, PT)) as rep:
            _ = net(jnp.ones((3, 4)))
        text = str(rep)
        # Linear(4->8): 4*8+8 = 40 params; Linear(8->2): 18; total 58
        assert '40' in text and '18' in text and '58' in text
        assert '#P' in text

    def test_parameter_tracker_bytes(self):
        import jax.numpy as jnp
        from padertorch_tpu import nn
        from padertorch_tpu.contrib.cb.track import (
            track, tracker_list, get_ParameterTracker)
        net = nn.Linear(4, 8)
        PT = get_ParameterTracker(
            num_or_bytes='bytes', include_not_require_grad=False)
        with track(net, tracker_list(PT)) as rep:
            _ = net(jnp.ones((1, 4)))
        assert '160' in str(rep)  # 40 f32 params * 4 B

    def test_gpu_aliases(self):
        from padertorch_tpu.contrib.cb import track as T
        assert T.GPUMemTracker is T.DeviceMemTracker
        assert issubclass(T.GPUTotPreMemTracker, T.Tracker)
        assert issubclass(T.GPUTotPostMemTracker, T.Tracker)


class TestSignalsAndMisc:
    def test_cpu_time_limit_trigger(self):
        from padertorch_tpu.contrib.cb.hooks import (
            CPUTimeLimitExceededHookTrigger)
        old_xcpu = signal.getsignal(signal.SIGXCPU)
        old_usr1 = signal.getsignal(signal.SIGUSR1)
        try:
            t = CPUTimeLimitExceededHookTrigger()
            assert t(0, 0) is False
            os.kill(os.getpid(), signal.SIGUSR1)
            assert t(1, 0) is False      # same epoch: keep going
            assert t(2, 1) is True       # epoch boundary: stop
            t2 = CPUTimeLimitExceededHookTrigger()
            os.kill(os.getpid(), signal.SIGXCPU)
            assert t2(5, 2) is True      # immediate
        finally:
            signal.signal(signal.SIGXCPU, old_xcpu)
            signal.signal(signal.SIGUSR1, old_usr1)

    def test_is_torch(self):
        import torch
        from padertorch_tpu.contrib.cb.complex import is_torch
        assert is_torch(torch.ones(2))
        assert not is_torch(np.ones(2))

    def test_kamo_example_to_device(self):
        from padertorch_tpu.contrib.cb.data import (
            KamoExampleToDevice, ExampleToDeviceNativeComplex)
        assert KamoExampleToDevice is ExampleToDeviceNativeComplex
        out = KamoExampleToDevice()({'x': np.ones(3, np.complex64)})
        assert out['x'].dtype == np.complex64
