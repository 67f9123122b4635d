"""tcl speaker-embedding depth: angular losses (golden vs a torch
re-execution of the reference math), StudentdVectors/FrameResNet34
shapes, TeacherStudentEmbeddings losses + EER summary, and the
AugmentationHelper."""
import numpy as np
import pytest

import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.tcl.speaker_embeddings.loss import (
    AngularPenaltySMLoss,
)


def _torch_angular_loss(loss_type, s, m, weight, embeddings, labels):
    """Re-execution of the reference AngularPenaltySMLoss math
    (ref tcl/speaker_embeddings/loss.py:64) with torch ops."""
    torch = pytest.importorskip('torch')
    w = torch.nn.functional.normalize(
        torch.as_tensor(weight), p=2, dim=1)         # (C, E)
    e = torch.nn.functional.normalize(
        torch.as_tensor(embeddings), p=2, dim=1)     # (B, E)
    logits = e @ w.T                                 # (B, C)
    labels = torch.as_tensor(labels)
    target = torch.diagonal(logits.transpose(1, 0)[labels])
    eps = 1e-7
    if loss_type == 'aam':
        numerator = s * (target - m)
    elif loss_type == 'arcface':
        numerator = s * torch.cos(torch.acos(
            torch.clamp(target, -1 + eps, 1 - eps)) + m)
    else:
        numerator = s * torch.cos(m * torch.acos(
            torch.clamp(target, -1 + eps, 1 - eps)))
    excl = torch.cat([
        torch.cat((logits[i, :y], logits[i, y + 1:])).unsqueeze(0)
        for i, y in enumerate(labels)], dim=0)
    denominator = torch.exp(numerator) + torch.sum(
        torch.exp(s * excl), dim=1)
    return float(-torch.mean(numerator - torch.log(denominator)))


@pytest.mark.parametrize('loss_type', ['aam', 'arcface', 'sphereface'])
def test_angular_loss_matches_torch_reference_math(loss_type):
    ptrandom.seed(0)
    loss = AngularPenaltySMLoss(6, 4, loss_type=loss_type)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(5, 6)).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 1])
    got = float(loss(jnp.asarray(emb), labels))
    # torch weight layout is (C, E); ours is (E, C)
    want = _torch_angular_loss(
        loss_type, loss.s, loss.m, np.asarray(loss.fc.weight).T,
        emb, labels)
    assert got == pytest.approx(want, rel=1e-5)


def test_angular_loss_defaults_and_reduce():
    ptrandom.seed(0)
    assert AngularPenaltySMLoss(4, 3, loss_type='arcface').s == 64.0
    assert AngularPenaltySMLoss(4, 3, loss_type='arcface').m == 0.5
    assert AngularPenaltySMLoss(4, 3, loss_type='sphereface').m == 1.35
    assert AngularPenaltySMLoss(4, 3, loss_type='aam').s == 30.0
    # cosface alias maps onto aam
    assert AngularPenaltySMLoss(4, 3, loss_type='cosface') \
        .loss_type == 'aam'
    loss = AngularPenaltySMLoss(4, 3, reduce=None)
    out = loss(jnp.ones((2, 4)), np.array([0, 1]))
    assert out.shape == (2,)


def test_student_dvectors_shapes():
    from padertorch_tpu.contrib.tcl.speaker_embeddings \
        .student_embeddings import StudentdVectors
    ptrandom.seed(0)
    m = StudentdVectors(channels=(4, 8, 8, 8), dvec_dim=8, num_spk=2,
                        num_classes=10).eval()
    x, seq_len = m(jnp.zeros((2, 40, 64)), [64, 48])
    assert x.shape == (2, 2, 8, 6)
    assert m.reduction == 4
    assert m.aam.out_features == 10


def test_frame_resnet34_teacher():
    from padertorch_tpu.contrib.tcl.speaker_embeddings.dvectors \
        import FrameResNet34
    ptrandom.seed(0)
    m = FrameResNet34(channels=(4, 8, 8, 8), dvec_dim=8).eval()
    d, emb = m(jnp.ones((2, 64, 40)), [64, 40])
    assert d.shape == (2, 8)
    assert emb.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(d)).all()


def _toy_model(**kw):
    from padertorch_tpu.contrib.tcl.teacher_student import (
        TeacherStudentEmbeddings)
    from padertorch_tpu.contrib.tcl.speaker_embeddings \
        .student_embeddings import StudentdVectors
    from padertorch_tpu.contrib.tcl.speaker_embeddings.dvectors \
        import FrameResNet34
    ptrandom.seed(0)
    num_spk = kw.pop('num_spk', 2)
    student_spk = kw.pop('student_spk', num_spk)
    student = StudentdVectors(
        channels=(4, 8, 8, 8), dvec_dim=8, num_spk=student_spk,
        num_classes=10, pool_size=1)
    teacher = FrameResNet34(channels=(4, 8, 8, 8), dvec_dim=8)
    return TeacherStudentEmbeddings(
        teacher=teacher, student=student, num_spk=num_spk, **kw)


def _toy_example(b=2, k=2, t=64, f=40):
    rng = np.random.default_rng(0)
    return {
        'features_student': rng.normal(size=(b, f, t)).astype('float32'),
        'num_frames_student': np.array([t] * b),
        'features_teacher': rng.normal(
            size=(b, k, t, f)).astype('float32'),
        'num_frames_teacher': np.array([t] * b),
        'overlap_boundaries': np.array([[16, 48]] * b),
        'speaker_id': np.arange(b * k).reshape(b, k) % 3,
    }


@pytest.mark.parametrize('pit_order', ['utterance', 'frame', None])
def test_teacher_student_embeddings_pit_modes(pit_order):
    model = _toy_model(pit_order=pit_order,
                       framewise_loss_fn='cosine').train()
    example = _toy_example()
    out = model(example)
    review = model.review(example, out)
    fw = float(review['losses']['frame_level_loss'])
    assert np.isfinite(fw)
    assert 'd_vector_loss' in review['scalars']
    assert 'same_speaker_score' in review['scalars']


def test_teacher_student_embeddings_geodesic():
    model = _toy_model(
        num_spk=2, student_spk=1, use_geodesic_loss=True,
        framewise_loss_fn='mse').train()
    example = _toy_example()
    out = model(example)
    assert out[0].shape[1] == 1  # single student stream
    review = model.review(example, out)
    assert np.isfinite(float(review['losses']['frame_level_loss']))
    assert 'geodesic_weight_1' in review['histograms']


def test_teacher_student_embeddings_eval_eer():
    model = _toy_model(pit_order='utterance').eval()
    example = _toy_example(b=4)
    out = model(example)
    review = model.review(example, out)
    assert 'embeddings' in review['buffers']
    # aggregate like SummaryHook does, then let the model fold buffers
    summary = {
        'losses': {}, 'scalars': {}, 'histograms': {}, 'snapshots': {},
        'buffers': {
            'embeddings': [np.asarray(review['buffers']['embeddings'])],
            'speaker_ids': [np.asarray(review['buffers']['speaker_ids'])],
        },
    }
    summary = model.modify_summary(summary)
    assert 'EER' in summary['scalars']
    assert 0 <= summary['scalars']['EER'] <= 1
    assert 'minDCF' in summary['scalars']
    assert 'embeddings' not in summary['buffers']


def test_framewise_loss_fns():
    model = _toy_model(framewise_loss_fn='log_cosine')
    x = jnp.ones((3, 4))
    y = jnp.ones((3, 4))
    assert float(model.loss_fn(x, y).max()) <= -11  # log10(eps)
    model.framewise_loss_fn = 'log_mse'
    assert np.isfinite(float(model.loss_fn(x, 2 * y).mean()))


def test_augmentation_helper():
    from padertorch_tpu.contrib.tcl.utils.augmentation import (
        AugmentationHelper)
    from padertorch_tpu.data import dataset as lazy
    rng = np.random.default_rng(0)
    noise_ds = lazy.from_list([
        {'example_id': f'n{i}',
         'audio_data': {'observation': rng.normal(size=500)}}
        for i in range(8)
    ])
    rir_ds = lazy.from_list([
        {'example_id': 'r0',
         'audio_data': {'rir': np.r_[1.0, np.zeros(15)]}},
    ])
    helper = AugmentationHelper(
        augmentation_datasets={'noise': noise_ds, 'reverb': rir_ds},
        p_augment=1.0, augmentation_type=('noise', 'reverb'),
        deterministic=True)
    obs = np.sin(np.linspace(0, 20, 400))
    example = {'example_id': 'x1', 'audio_data': {'observation': obs.copy()}}
    out = helper(example)
    # clean signal preserved under target_key, observation augmented
    np.testing.assert_array_equal(
        out['audio_data']['speech_image'][0, :400], obs)
    assert not np.allclose(
        out['audio_data']['observation'][:400], obs)
    # deterministic: same example_id -> identical augmentation
    out2 = helper({'example_id': 'x1',
                   'audio_data': {'observation': obs.copy()}})
    np.testing.assert_array_equal(out['audio_data']['observation'],
                                  out2['audio_data']['observation'])


def test_augmentation_snr_scaling():
    from padertorch_tpu.contrib.tcl.utils.augmentation import (
        AugmentationHelper)
    obs = np.ones(100)
    aug = np.ones(100) * 2
    factor = AugmentationHelper.get_scaling_factor(obs, aug, snr=10.0)
    scaled = aug * factor
    snr = 10 * np.log10(np.mean(obs ** 2) / np.mean(scaled ** 2))
    assert snr == pytest.approx(10.0, abs=1e-6)


def test_multispeaker_verification():
    from padertorch_tpu.contrib.tcl.teacher_student import (
        multispeaker_verification)
    e = np.eye(2)
    labels, scores = multispeaker_verification(
        (e, np.array([0, 1])), (e, np.array([0, 2])))
    assert labels == [True, False, False, False]
    assert scores[0] == pytest.approx(1.0)
    assert scores[1] == pytest.approx(0.0)
