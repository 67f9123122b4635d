"""Teacher-student distillation models.

Reference parity: ``padertorch/contrib/tcl/teacher_student.py`` (a
student model trained against a frozen teacher's logits; response-based
KD with optional hard-label loss) and
``padertorch/contrib/tcl/speaker_embeddings/teacher_student.py:19``
(``TeacherStudentEmbeddings`` — frame-wise/overlap-robust speaker
embedding distillation, Cord-Landwehr et al., ICASSP 2023 +
arXiv:2306.00634: frame-level student vs d-vector teacher with
frame/utterance PIT, cosine/log-cosine/mse/log-mse losses, geodesic
interpolation targets in overlap regions, EER/minDCF validation).

TPU notes: the reference loops over the batch and the permutation set
in python; here both are vectorized — per-frame PIT evaluates all K!
permutations as one stacked tensor and reorders via ``take_along_
axis``, the geodesic interpolation solves its constrained (K x K)
least squares with masks instead of boundary slicing, so the whole
review jits with static shapes.
"""
from itertools import permutations

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu.ops.losses.classification import softmax_cross_entropy

__all__ = ['TeacherStudentModel', 'TeacherStudentEmbeddings',
           'kl_distillation_loss', 'multispeaker_verification']


def kl_distillation_loss(student_logits, teacher_logits, temperature=1.0):
    """KL(teacher_T || student_T) * T^2 (Hinton 2015).

    >>> import jax.numpy as jnp
    >>> l = kl_distillation_loss(jnp.ones((2, 4)), jnp.ones((2, 4)))
    >>> float(l) < 1e-6
    True
    """
    t = temperature
    teacher_logp = jax.nn.log_softmax(teacher_logits / t, axis=-1)
    student_logp = jax.nn.log_softmax(student_logits / t, axis=-1)
    kl = jnp.sum(
        jnp.exp(teacher_logp) * (teacher_logp - student_logp), axis=-1)
    return jnp.mean(kl) * t ** 2


class TeacherStudentModel(Model):
    """Distill a frozen teacher into a student.

    Both teacher and student map the input dict to logits; the teacher's
    parameters are frozen (buffers) so only the student trains.
    """

    def __init__(self, student, teacher, temperature=2.0,
                 hard_label_weight=0.5, label_key='label'):
        self.student = student
        self.register_buffer('teacher', teacher.eval())
        self.temperature = temperature
        self.hard_label_weight = hard_label_weight
        self.label_key = label_key

    def train(self, mode=True):
        # keep the frozen teacher in eval mode (Module.train recurses
        # into buffer-registered submodules)
        super().train(mode)
        self.teacher.eval()
        return self

    def forward(self, inputs):
        student_logits = self.student(inputs)
        teacher_logits = jax.lax.stop_gradient(self.teacher(inputs))
        return {'student': student_logits, 'teacher': teacher_logits}

    def review(self, inputs, outputs):
        kd = kl_distillation_loss(
            outputs['student'], outputs['teacher'], self.temperature)
        losses = {'kd_loss': kd}
        scalars = {}
        if self.label_key in inputs and self.hard_label_weight > 0:
            labels = inputs[self.label_key]
            ce = softmax_cross_entropy(outputs['student'], labels)
            losses['ce_loss'] = ce
            scalars['accuracy'] = jnp.mean(
                (jnp.argmax(outputs['student'], -1) == labels)
                .astype('float32'))
            scalars['teacher_accuracy'] = jnp.mean(
                (jnp.argmax(outputs['teacher'], -1) == labels)
                .astype('float32'))
        return {'losses': losses, 'scalars': scalars}


def _cosine_sim(x, y, axis=-1, eps=1e-8):
    num = jnp.sum(x * y, axis=axis)
    den = (jnp.linalg.norm(x, axis=axis)
           * jnp.linalg.norm(y, axis=axis))
    return num / jnp.maximum(den, eps)


def multispeaker_verification(example1, example2):
    """All K x K cross-speaker trial scores between two multi-speaker
    embedding sets (ref ``speaker_embeddings/teacher_student.py:375``).

    example: ``(embeddings (K, E), speaker_ids (K,))`` (numpy).
    Returns (labels, scores) lists.
    """
    e1, s1 = example1
    e2, s2 = example2
    labels, scores = [], []
    for i in range(len(s1)):
        for j in range(len(s2)):
            labels.append(s1[i] == s2[j])
            num = float(np.dot(e1[i], e2[j]))
            den = float(np.linalg.norm(e1[i]) * np.linalg.norm(e2[j]))
            scores.append(num / max(den, 1e-12))
    return labels, scores


class TeacherStudentEmbeddings(Model):
    """Frame-wise speaker-embedding distillation (teacher: utterance
    d-vectors on clean sources; student: frame-level embeddings on the
    mixture).

    Reference parity:
    ``tcl/speaker_embeddings/teacher_student.py:19`` — same losses and
    modes: ``framewise_loss_fn`` in {mse, log_mse, cosine, log_cosine},
    ``pit_order`` in {frame, utterance, None}, optional geodesic
    interpolation targets in overlap regions
    (``use_geodesic_loss`` + ``example['overlap_boundaries']``),
    utterance-level d-vector loss, cross-speaker similarity tracking,
    and EER/minDCF validation via buffered embeddings in
    ``modify_summary``.

    Expected example keys (collated, padded numpy/jnp arrays):
      - ``features_student``: (B, F, T) log-fbank of the mixture
      - ``num_frames_student``: (B,)
      - ``features_teacher``: (B, K, T_t, F) per-source features
      - ``num_frames_teacher``: (B,) or (B, K)
      - optional ``overlap_boundaries``: (B, 2) frame indices (student
        feature resolution) of the overlap region
      - eval: ``example_id``, ``speaker_id``
    """

    def __init__(self, teacher=None, student=None,
                 silence_masking=False, loss_masking=False,
                 sample_rate=16000, num_spk=2,
                 pit_order='utterance',  # ['frame', 'utterance', None]
                 framewise_loss_fn='mse', use_framewise_loss=True,
                 use_embedding_loss=False, use_geodesic_loss=False,
                 aggregate='mean', normalize=True,
                 teacher_embedding_key='dvector'):
        from padertorch_tpu.contrib.tcl.speaker_embeddings \
            .student_embeddings import StudentdVectors
        from padertorch_tpu.contrib.tcl.speaker_embeddings.dvectors \
            import FrameResNet34
        if student is None:
            student = StudentdVectors(num_spk=num_spk)
        if teacher is None:
            teacher = FrameResNet34()
        self.student = student
        self.register_buffer('teacher', teacher.eval())
        self._keep_teacher_frozen = True
        self.loss_masking = loss_masking
        self.silence_masking = silence_masking
        self.sampling_rate = sample_rate
        self.num_spk = num_spk
        self.pit_order = pit_order
        self.aggregate = aggregate
        self.normalize = normalize
        self.use_framewise_loss = use_framewise_loss
        self.use_embedding_loss = use_embedding_loss
        self.geodesic_loss = use_geodesic_loss
        self.framewise_loss_fn = framewise_loss_fn
        self.reduction = getattr(student, 'reduction', 4)
        self.target = teacher_embedding_key

    def train(self, mode=True):
        """The teacher stays in eval mode: ``Module.train`` recurses
        into buffer-registered submodules too, which would flip the
        frozen teacher to per-batch BN statistics (and mutate its
        running stats) during distillation."""
        super().train(mode)
        if getattr(self, '_keep_teacher_frozen', False):
            self.teacher.eval()
        return self

    # -- losses (per-frame, operating on (..., E) vectors) -------------
    def loss_fn(self, x, y):
        if self.framewise_loss_fn == 'mse':
            return jnp.mean((x - y) ** 2, axis=-1)
        if self.framewise_loss_fn == 'log_mse':
            return jnp.log10(
                jnp.maximum(jnp.mean((x - y) ** 2, axis=-1), 1e-12))
        if self.framewise_loss_fn == 'cosine':
            return 1 - _cosine_sim(x, y)
        if self.framewise_loss_fn == 'log_cosine':
            return jnp.log10(
                jnp.maximum(1 - _cosine_sim(x, y), 1e-12))
        raise ValueError(self.framewise_loss_fn)

    def d_vector_loss_fn(self, x, y):
        return 1 - _cosine_sim(x, y)

    def get_teacher_embeddings(self, example):
        """(B, K, T, F) per-source features → time-averaged d-vectors
        (B, K, E) + frame-level teacher embeddings (B, K, E, T')."""
        feats = jnp.asarray(example['features_teacher'])
        b, k, t, f = feats.shape
        lens = jnp.asarray(example['num_frames_teacher'])
        if lens.ndim < 2:
            lens = jnp.repeat(lens[:, None], k, axis=1)
        dvec, emb = self.teacher(
            feats.reshape(b * k, t, f), lens.reshape(-1))
        dvec = jax.lax.stop_gradient(dvec).reshape(b, k, -1)
        emb = jax.lax.stop_gradient(emb)
        emb = emb.reshape(b, k, emb.shape[-2], emb.shape[-1])
        return dvec, emb

    def compute_geodesic_loss(self, embeddings, targets, ov, dvecs):
        """Masked version of the reference's constrained least squares
        (ref ``:127``): before the overlap, match speaker 0; after it,
        speaker 1; inside, match the optimal convex interpolation of
        the two teacher d-vectors (closed form with sum(alpha)=1).

        embeddings: (E, T) single student stream; targets: (K, E, T);
        ov: (2,) frame boundaries (student resolution, pre-reduction);
        dvecs: (K, E) single-speaker teacher d-vectors.
        Returns (per-frame loss (T,), alpha (K, T)).
        """
        e, t = embeddings.shape
        ov = jnp.asarray(ov) // self.reduction
        idx = jnp.arange(t)
        pre = idx < ov[0]
        post = idx >= ov[1]
        mid = ~(pre | post)

        loss_pre = self.loss_fn(embeddings.T, targets[0].T)
        loss_post = self.loss_fn(embeddings.T, targets[1].T)

        # alpha: least squares of emb on span{dvecs} with sum == 1
        gram = dvecs @ dvecs.T                         # (K, K)
        proj = dvecs @ embeddings                      # (K, T)
        det_ok = jnp.abs(jnp.linalg.det(gram)) > 1e-8
        w = jnp.where(det_ok, 1.0, 0.0) * jnp.linalg.inv(
            jnp.where(det_ok, gram, jnp.eye(gram.shape[0])))
        alpha = w @ proj
        alpha = alpha - (w.sum(-1, keepdims=True)
                         / jnp.maximum(w.sum(), 1e-12)
                         ) * (alpha.sum(0, keepdims=True) - 1)
        alpha = jnp.where(det_ok, alpha, 0.5)
        ov_target = jnp.einsum('ke,kt->et', dvecs, alpha)
        ov_target = ov_target / jnp.maximum(jax.lax.stop_gradient(
            jnp.std(ov_target, axis=0, keepdims=True)), 1e-8)
        ov_target = ov_target * jnp.std(dvecs[0])
        loss_mid = self.loss_fn(embeddings.T, ov_target.T)

        loss = (jnp.where(pre, loss_pre, 0.0)
                + jnp.where(post, loss_post, 0.0)
                + jnp.where(mid, loss_mid, 0.0))
        return loss, alpha

    def utterance_reconstruction_loss(self, estimates, targets,
                                      frame_mask):
        """PIT over time-averaged losses; estimates/targets (K, E, T),
        frame_mask (T,). Returns (loss, best perm indices (K,))."""
        k = estimates.shape[0]
        perms = np.array(list(permutations(range(k))))
        denom = jnp.maximum(frame_mask.sum(), 1.0)

        def per_perm(p):
            l = self.loss_fn(  # (K, T)
                jnp.swapaxes(estimates[p], -1, -2),
                jnp.swapaxes(targets, -1, -2))
            return (l * frame_mask).sum(-1).mean() / denom

        losses = jnp.stack([per_perm(p) for p in perms])
        best = jnp.argmin(losses)
        return losses[best], jnp.asarray(perms)[best]

    def framewise_reconstruction_loss(self, estimates, targets,
                                      frame_mask):
        """Per-frame PIT (ref ``:299``); returns (per-frame loss (T,),
        reordered embeddings (K, E, T))."""
        k, e, t = estimates.shape
        perms = np.array(list(permutations(range(k))))   # (P, K)
        # loss_matrix[p, t] = sum_k loss(est[perm[k]], tgt[k]) at t
        est_p = estimates[jnp.asarray(perms)]            # (P, K, E, T)
        l = self.loss_fn(
            jnp.moveaxis(est_p, -1, 1),                  # (P, T, K, E)
            jnp.moveaxis(targets, -1, 0)[None])          # (1, T, K, E)
        loss_matrix = l.sum(-1)                          # (P, T)
        best = jnp.argmin(loss_matrix, axis=0)           # (T,)
        frame_loss = jnp.min(loss_matrix, axis=0) * frame_mask
        perm_t = jnp.asarray(perms)[best]                # (T, K)
        reordered = jnp.take_along_axis(
            jnp.moveaxis(estimates, -1, 0),              # (T, K, E)
            perm_t[..., None], axis=1)
        return frame_loss, jnp.moveaxis(reordered, 0, -1)

    def forward(self, example):
        feats = jnp.asarray(example['features_student'])  # (B, F, T)
        seq_len = example['num_frames_student']
        return self.student(feats, seq_len)

    def review(self, example, outputs):
        embeddings, seq_lens = outputs                   # (B, K, E, T')
        b, k, e, t = embeddings.shape
        teacher_dvecs, teacher_emb = self.get_teacher_embeddings(
            example)

        lens = jnp.minimum(jnp.asarray(seq_lens), t)
        frame_mask = (jnp.arange(t)[None, :]
                      < lens[:, None]).astype(embeddings.dtype)

        if self.target == 'dvector':
            target_emb = jnp.repeat(
                teacher_dvecs[..., None], t, axis=-1)    # (B, K, E, T')
        elif self.target == 'embedding':
            target_emb = teacher_emb[..., :t]
            pad = t - target_emb.shape[-1]
            if pad > 0:
                target_emb = jnp.pad(
                    target_emb, ((0, 0),) * 3 + ((0, pad),))
        else:
            raise NotImplementedError(self.target)

        losses, scalars, histograms = {}, {}, {}
        reordered = embeddings
        if self.use_framewise_loss:
            if self.geodesic_loss and k == 1 and self.num_spk > 1:
                ov = jnp.asarray(example['overlap_boundaries'])
                frame_loss, alpha = jax.vmap(
                    self.compute_geodesic_loss)(
                        embeddings[:, 0], target_emb, ov, teacher_dvecs)
                fw = ((frame_loss * frame_mask).sum()
                      / jnp.maximum(frame_mask.sum(), 1.0))
                sorted_alpha = jnp.sort(alpha, axis=1)
                histograms['geodesic_weight_1'] = sorted_alpha[:, 0]
                histograms['geodesic_weight_2'] = sorted_alpha[:, -1]
            elif self.pit_order == 'frame':
                frame_loss, reordered = jax.vmap(
                    self.framewise_reconstruction_loss)(
                        embeddings, target_emb, frame_mask)
                fw = (frame_loss.sum()
                      / jnp.maximum(frame_mask.sum(), 1.0))
            else:
                utt_losses, perm = jax.vmap(
                    lambda est, tgt, m:
                    self.utterance_reconstruction_loss(est, tgt, m))(
                        embeddings, target_emb, frame_mask)
                fw = jnp.mean(utt_losses)
                if self.pit_order == 'utterance':
                    reordered = jnp.take_along_axis(
                        embeddings, perm[:, :, None, None], axis=1)
            losses['frame_level_loss'] = fw
            scalars['frame_level_loss'] = fw

        # utterance-level d-vectors from (reordered) frame embeddings
        if self.aggregate == 'mean':
            d_vectors = ((reordered * frame_mask[:, None, None]).sum(-1)
                         / jnp.maximum(lens[:, None, None], 1))
        else:
            d_vectors = jnp.mean(reordered, axis=-1)
        if self.normalize:
            d_vectors = d_vectors / jnp.maximum(
                jnp.linalg.norm(d_vectors, axis=-1, keepdims=True),
                1e-8)
        utt_loss = jnp.mean(
            self.d_vector_loss_fn(d_vectors[:, :k],
                                  teacher_dvecs[:, :k]))
        if self.use_embedding_loss:
            losses['d_vector_loss'] = utt_loss
        scalars['d_vector_loss'] = utt_loss
        scalars['_embedding_norm'] = jnp.mean(
            jnp.linalg.norm(reordered, axis=-2))

        if k > 1:
            same = _cosine_sim(d_vectors, teacher_dvecs)       # (B, K)
            diff = _cosine_sim(
                d_vectors, jnp.roll(teacher_dvecs, 1, axis=1))
            scalars['same_speaker_score'] = jnp.mean(same)
            scalars['different_speaker_score'] = jnp.mean(diff)
            histograms['same_speaker_similarities'] = same.reshape(-1)
            histograms['different_speaker_similarities'] = \
                diff.reshape(-1)

        review = {'losses': losses, 'scalars': scalars,
                  'histograms': histograms}
        if not self.training:
            buffers = {'embeddings': d_vectors}
            # integer speaker labels ride the summary buffers (jit-safe
            # arrays; the reference buffers string ids host-side)
            if 'speaker_id' in example:
                buffers['speaker_ids'] = jnp.asarray(
                    example['speaker_id'])
            review['buffers'] = buffers
        return review

    def update_activity(self, activity):
        return activity[:, ::self.reduction]

    def modify_summary(self, summary):
        """Pseudo speaker-verification metrics over the validation set
        (ref ``:328``): pair every utterance with a shuffled partner,
        score cosine similarity, compute EER/minDCF."""
        if 'embeddings' in summary.get('buffers', {}):
            from padertorch_tpu.contrib.tcl.eer_metrics import (
                eer, min_dcf)
            emb = np.concatenate(
                [np.asarray(v) for v in summary['buffers']['embeddings']],
                axis=0)                                    # (N, K, E)
            spk = None
            if summary['buffers'].get('speaker_ids'):
                spk = np.concatenate([
                    np.asarray(v)
                    for v in summary['buffers'].pop('speaker_ids')
                ], axis=0)
            if spk is not None and len(spk) == len(emb):
                indexer = list(range(len(emb)))
                np.random.default_rng(42).shuffle(indexer)
                scores, labels = [], []
                for idx1, idx2 in enumerate(indexer):
                    if self.num_spk == 1 or emb.ndim == 2:
                        e1 = emb[idx1].reshape(-1)[:emb.shape[-1]]
                        e2 = emb[idx2].reshape(-1)[:emb.shape[-1]]
                        s1 = np.asarray(spk[idx1]).reshape(-1)[0]
                        s2 = np.asarray(spk[idx2]).reshape(-1)[0]
                        labels.append(s1 == s2)
                        scores.append(float(
                            np.dot(e1, e2) / max(
                                np.linalg.norm(e1)
                                * np.linalg.norm(e2), 1e-12)))
                    else:
                        ls, ss = multispeaker_verification(
                            (emb[idx1], np.atleast_1d(spk[idx1])),
                            (emb[idx2], np.atleast_1d(spk[idx2])))
                        labels.extend(ls)
                        scores.extend(ss)
                scores = np.asarray(scores, float)
                labels = np.asarray(labels, bool)
                if 0 < labels.sum() < len(labels):
                    summary['scalars']['EER'] = eer(scores, labels)
                    summary['scalars']['minDCF'] = min_dcf(
                        scores, labels)
                    summary['histograms']['scores'] = scores
            summary['buffers'].pop('embeddings')
        return super().modify_summary(summary)
