"""Teacher-student distillation model.

Reference parity: ``padertorch/contrib/tcl/teacher_student.py`` — a
student model trained against a frozen teacher's outputs (response-based
KD with optional hard-label loss).
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu.ops.losses.classification import softmax_cross_entropy

__all__ = ['TeacherStudentModel', 'kl_distillation_loss']


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
        self.register_buffer('teacher', teacher)
        self.temperature = temperature
        self.hard_label_weight = hard_label_weight
        self.label_key = label_key

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
