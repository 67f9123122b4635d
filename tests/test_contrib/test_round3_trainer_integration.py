"""Trainer integration of the round-3 components: the tcl
embedding-distillation model and the native wav2vec2 frontend run
through the real Trainer burn test (jitted fused step, review
contract, buffers/modify_summary)."""
import numpy as np
import pytest

import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.base import Model
from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_teacher_student_embeddings_trainer_burn_test(tmp_path):
    from padertorch_tpu.contrib.tcl.teacher_student import (
        TeacherStudentEmbeddings)
    from padertorch_tpu.contrib.tcl.speaker_embeddings \
        .student_embeddings import StudentdVectors
    from padertorch_tpu.contrib.tcl.speaker_embeddings.dvectors \
        import FrameResNet34

    ptrandom.seed(0)
    model = TeacherStudentEmbeddings(
        teacher=FrameResNet34(channels=(4, 8, 8, 8), dvec_dim=8),
        student=StudentdVectors(
            channels=(4, 8, 8, 8), dvec_dim=8, num_spk=2,
            num_classes=10, pool_size=1),
        num_spk=2, pit_order='utterance', framewise_loss_fn='cosine')

    rng = np.random.default_rng(0)

    def make_example(i):
        return {
            'features_student': rng.normal(
                size=(40, 64)).astype('float32'),
            'num_frames_student': 64,
            'features_teacher': rng.normal(
                size=(2, 64, 40)).astype('float32'),
            'num_frames_teacher': 64,
            'speaker_id': np.asarray([i % 3, (i + 1) % 3]),
        }

    def collate(batch):
        from padertorch_tpu.data.utils import collate_fn
        b = collate_fn(batch)
        return {
            'features_student': np.stack(b['features_student']),
            'num_frames_student': np.asarray(b['num_frames_student']),
            'features_teacher': np.stack(b['features_teacher']),
            'num_frames_teacher': np.asarray(b['num_frames_teacher']),
            'speaker_id': np.stack(b['speaker_id']),
        }

    ds = lazy.from_list([make_example(i) for i in range(8)]) \
        .batch(2).map(collate)
    trainer = Trainer(
        model=model, storage_dir=tmp_path,
        optimizer=pt.Adam(gradient_clipping=10.0, lr=1e-3),
        stop_trigger=(1, 'epoch'),
    )
    trainer.test_run(ds, ds)


@pytest.mark.slow
def test_wav2vec2_frontend_classifier_burn_test(tmp_path):
    from padertorch_tpu.contrib.mk.modules.features.ssl import Wav2Vec2

    class W2VClassifier(Model):
        def __init__(self):
            # frozen native wav2vec2 frontend (buffers, not params)
            self.frontend = Wav2Vec2(pretrained=False, tiny=True)
            self.head = nn.Linear(self.frontend.hidden_size, 4)

        def forward(self, example):
            feats, seq_len = self.frontend(
                example['audio'],
                sequence_lengths=example['num_samples'])
            pooled = jnp.mean(feats, axis=1)
            return self.head(pooled)

        def review(self, example, outputs):
            from padertorch_tpu.ops.losses.classification import (
                softmax_cross_entropy)
            labels = example['label']
            ce = softmax_cross_entropy(outputs, labels)
            acc = jnp.mean(
                (jnp.argmax(outputs, -1) == labels).astype('float32'))
            return {'loss': ce, 'scalars': {'accuracy': acc}}

    ptrandom.seed(0)
    model = W2VClassifier()
    rng = np.random.default_rng(1)
    examples = [
        {'audio': rng.normal(size=(400,)).astype('float32'),
         'num_samples': 400, 'label': i % 4}
        for i in range(8)
    ]

    def collate(batch):
        return {
            'audio': np.stack([b['audio'] for b in batch]),
            'num_samples': np.asarray(
                [b['num_samples'] for b in batch]),
            'label': np.asarray([b['label'] for b in batch]),
        }

    ds = lazy.from_list(examples).batch(2).map(collate)
    trainer = Trainer(
        model=model, storage_dir=tmp_path,
        optimizer=pt.Adam(gradient_clipping=5.0, lr=1e-3),
        stop_trigger=(1, 'epoch'),
    )
    trainer.test_run(ds, ds)
