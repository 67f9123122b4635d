"""Tests for the jensheit/tcl/ldrude symbol-parity tail (round-3
symbol sweep): jensheit.beamforming / MaskLossKeys /
maybe_remove_channel, tcl get_eer/get_dcf (golden vs a literal
re-execution of the reference VoxSRC math), the ldrude lazy-basedir
observer decorator.
"""
import numpy as np
import pytest


def _mc_scene(seed=0, c=4, t=60, f=33):
    """A multi-channel scene with a phase-coherent target and diffuse
    noise, so MVDR actually improves SNR."""
    rng = np.random.RandomState(seed)
    steer = np.exp(1j * rng.uniform(0, 2 * np.pi, (c, 1, f)))
    speech_src = (rng.randn(1, t, f) + 1j * rng.randn(1, t, f))
    speech = steer * speech_src
    noise = 0.5 * (rng.randn(c, t, f) + 1j * rng.randn(c, t, f))
    obs = speech + noise
    speech_mask = (np.abs(speech) ** 2
                   / (np.abs(speech) ** 2 + np.abs(noise) ** 2))
    return obs.astype(np.complex64), speech.astype(np.complex64), \
        noise.astype(np.complex64), speech_mask.astype(np.float32)


class TestJensheitBeamforming:
    def test_shapes_and_contract(self):
        from padertorch_tpu.contrib.jensheit.evaluation import beamforming
        obs, speech, noise, sm = _mc_scene()
        pred, img, nimg = beamforming(
            obs, sm, 1 - sm, speech_image=speech, noise_image=noise)
        assert pred.shape == obs.shape[1:]
        assert img.shape == pred.shape and nimg.shape == pred.shape
        # linearity: beamformer output = image + noise contributions
        np.testing.assert_allclose(pred, img + nimg, rtol=1e-3,
                                   atol=1e-4)

    def test_improves_snr(self):
        from padertorch_tpu.contrib.jensheit.evaluation import beamforming
        obs, speech, noise, sm = _mc_scene(seed=3)
        _, img, nimg = beamforming(
            obs, sm, 1 - sm, speech_image=speech, noise_image=noise)
        snr_in = (np.abs(speech[0]) ** 2).sum() \
            / (np.abs(noise[0]) ** 2).sum()
        snr_out = (np.abs(img) ** 2).sum() / (np.abs(nimg) ** 2).sum()
        assert snr_out > 2 * snr_in, (snr_in, snr_out)

    def test_none_images(self):
        from padertorch_tpu.contrib.jensheit.evaluation import beamforming
        obs, _, _, sm = _mc_scene(seed=1)
        pred, img, nimg = beamforming(obs, sm, 1 - sm)
        assert img is None and nimg is None and pred.shape == obs.shape[1:]


class TestMaskEstimatorTail:
    def test_mask_loss_keys(self):
        from padertorch_tpu.contrib.jensheit.mask_estimator import (
            MaskLossKeys)
        assert MaskLossKeys.SPEECH_MASK == 'speech_mask_loss'
        assert MaskLossKeys.TOTAL_MASK == 'total_mask_loss'
        assert MaskLossKeys.REC == 'reconstruction_loss'

    def test_maybe_remove_channel(self):
        from padertorch_tpu.contrib.jensheit.mask_estimator import (
            maybe_remove_channel)
        x = np.ones((6, 100))
        np.testing.assert_array_equal(
            maybe_remove_channel(x, exp_dim=1), x[0])
        y = np.ones(100)
        assert maybe_remove_channel(y, exp_dim=1) is y
        with pytest.raises(ValueError):
            maybe_remove_channel(np.ones((2, 3, 4)), exp_dim=1)
        with pytest.raises(AssertionError):
            # 50 "channels" -> refuses (first dim is not a channel dim)
            maybe_remove_channel(np.ones((50, 100)), exp_dim=1)


def _reference_get_dcf(scores, labels, p_target=0.05, c_miss=1, c_fa=1):
    """Literal re-execution of the reference VoxSRC loop
    (tcl/speaker_embeddings/eer_metrics.py:16-53)."""
    indices = np.argsort(scores)
    labels = np.array(labels).astype(np.int32)[indices]
    fnrs, fprs = [], []
    for i in range(0, len(labels)):
        if i == 0:
            fnrs.append(labels[i])
            fprs.append(1 - labels[i])
        else:
            fnrs.append(fnrs[i - 1] + labels[i])
            fprs.append(fprs[i - 1] + 1 - labels[i])
    fnrs_norm = sum(labels)
    fprs_norm = len(labels) - fnrs_norm
    fnrs = [x / float(fnrs_norm) for x in fnrs]
    fprs = [1 - x / float(fprs_norm) for x in fprs]
    min_c_det = float('inf')
    for i in range(0, len(fnrs)):
        c_det = c_miss * fnrs[i] * p_target \
            + c_fa * fprs[i] * (1 - p_target)
        min_c_det = min(min_c_det, c_det)
    c_def = min(c_miss * p_target, c_fa * (1 - p_target))
    return min_c_det / c_def


class TestVoxSRCMetrics:
    def test_get_dcf_matches_reference_loop(self):
        from padertorch_tpu.contrib.tcl.eer_metrics import get_dcf
        rng = np.random.RandomState(0)
        for seed in range(5):
            rng = np.random.RandomState(seed)
            labels = rng.randint(0, 2, 200)
            labels[:2] = [0, 1]  # both classes present
            scores = rng.randn(200) + 0.8 * labels
            ref = _reference_get_dcf(scores, labels)
            got = get_dcf(scores, labels)
            assert abs(ref - got) < 1e-12, (seed, ref, got)

    def test_get_eer_against_sklearn_brentq_convention(self):
        from padertorch_tpu.contrib.tcl.eer_metrics import get_eer
        from sklearn.metrics import roc_curve
        rng = np.random.RandomState(1)
        labels = rng.randint(0, 2, 500)
        labels[:2] = [0, 1]
        scores = rng.randn(500) + 1.2 * labels
        e = get_eer(scores, labels)
        # the root satisfies 1 - x == tpr(x) on the interpolated ROC
        fpr, tpr, _ = roc_curve(labels, scores, pos_label=1)
        resid = 1. - e - np.interp(e, fpr, tpr)
        assert abs(resid) < 1e-6, (e, resid)
        assert 0.0 <= e <= 0.5

    def test_separable_scores_give_zero(self):
        from padertorch_tpu.contrib.tcl.eer_metrics import get_eer, get_dcf
        scores = [0.9, 0.8, 0.2, 0.1]
        labels = [1, 1, 0, 0]
        assert get_eer(scores, labels) < 1e-9
        assert get_dcf(scores, labels) == 0.0


class TestLdrudeLazyObserver:
    def test_lazy_basedir_resolution(self, tmp_path):
        from padertorch_tpu.contrib.ldrude.utils import (
            decorator_append_file_storage_observer_with_lazy_basedir)

        class FakeExperiment:
            def __init__(self):
                self.observers = []

            def capture(self, func):
                return func

        class DummyObserver:
            def __init__(self, basedir=None):
                pass

        ex = FakeExperiment()
        target = tmp_path / 'runs'
        calls = []

        @decorator_append_file_storage_observer_with_lazy_basedir(
            ex, observer_cls=DummyObserver)
        def basedir():
            calls.append(1)
            return str(target)

        assert len(ex.observers) == 1
        assert not calls  # lazy: nothing resolved yet
        obs = ex.observers[0]
        assert obs.basedir == target.resolve()
        assert target.is_dir()  # created on first access
        assert obs.basedir == target.resolve()
        assert len(calls) == 1  # cached after first resolution

    def test_none_basedir_raises(self):
        from padertorch_tpu.contrib.ldrude.utils import (
            decorator_append_file_storage_observer_with_lazy_basedir)

        class FakeExperiment:
            observers = []

            def capture(self, func):
                return func

        class DummyObserver:
            def __init__(self, basedir=None):
                pass

        @decorator_append_file_storage_observer_with_lazy_basedir(
            FakeExperiment(), observer_cls=DummyObserver)
        def basedir():
            return None

        # find the observer appended to the class-level list
        obs = FakeExperiment.observers[-1]
        with pytest.raises(ValueError):
            obs.basedir


class TestWsj0MixCreationHelpers:
    def test_normalize_transcription_kaldi_rules(self):
        from padertorch_tpu.contrib.data.wsj0_mix import (
            normalize_transcription)
        raw = {
            'u1': 'the [loud_breath] cat',
            'u2': '[<door_slam] word [door_slam>] ~ .',
            'u3': '<and> %percent .point --DASH',
            'u4': 'back\\slash [phone_ring/] [/phone_ring]',
        }
        out = normalize_transcription(raw)
        assert out['u1'] == 'THE <NOISE> CAT'
        assert out['u2'] == 'WORD'
        assert out['u3'] == 'AND PERCENT POINT -DASH'
        assert out['u4'] == 'BACKSLASH'

    def test_get_transcriptions_dot_over_ptx(self, tmp_path):
        from padertorch_tpu.contrib.data.wsj0_mix import get_transcriptions
        d = tmp_path / 'wsj0' / 'si_tr_s' / '011'
        d.mkdir(parents=True)
        (d / 'a.dot').write_text(
            'the quick fox (utt1)\nhello [loud_breath] world (utt2)\n')
        # sibling ptx is ignored; standalone ptx is used
        (d / 'a.ptx').write_text('SHOULD BE IGNORED (utt1)\n')
        (d / 'b.ptx').write_text('only in ptx (utt3)\n')
        out = get_transcriptions(tmp_path / 'wsj0')
        assert out == {
            'utt1': 'THE QUICK FOX',
            'utt2': 'HELLO <NOISE> WORLD',
            'utt3': 'ONLY IN PTX',
        }

    def test_load_spk2gender(self, tmp_path):
        from padertorch_tpu.contrib.data.wsj0_mix import load_spk2gender
        f = tmp_path / 'spk2gender'
        f.write_text('011 m\n012 F\n\n013 f\n')
        assert load_spk2gender(f) == {
            '011': 'male', '012': 'female', '013': 'female'}
