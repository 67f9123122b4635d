"""Generic sequence classifier. Reference parity: ``contrib/je/models/clf.py:11``."""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu import nn
from padertorch_tpu.ops.losses.classification import softmax_cross_entropy
from padertorch_tpu.contrib.je.modules.reduce import Mean

__all__ = ['Classifier']


class Classifier(Model):
    """feature_extractor -> cnn/encoder -> pooling -> linear head.

    forward input: dict with ``stft`` (B, C, T, F, 2) or ``features``,
    ``seq_len`` and the label under ``label_key``.
    """

    def __init__(self, net, feature_extractor=None, predictor=None,
                 label_key='label', num_classes=None, pool=None):
        self.feature_extractor = feature_extractor
        self.net = net
        self.pool = pool if pool is not None else Mean(axis=-1)
        self.predictor = predictor
        self.label_key = label_key
        self.num_classes = num_classes

    def forward(self, inputs):
        seq_len = inputs.get('seq_len')
        if self.feature_extractor is not None:
            x, seq_len = self.feature_extractor(
                inputs['stft'], seq_len=seq_len)
        else:
            x = inputs['features']
        y = self.net(x) if not _wants_seq_len(self.net) \
            else self.net(x, seq_len)
        y = self.pool(y, seq_len)
        if self.predictor is not None:
            y = self.predictor(y)
        return y

    def review(self, inputs, outputs):
        labels = inputs[self.label_key]
        ce = softmax_cross_entropy(outputs, labels)
        predictions = jnp.argmax(outputs, axis=-1)
        accuracy = jnp.mean((predictions == labels).astype('float32'))
        return {
            'loss': ce,
            'scalars': {'accuracy': accuracy},
            'buffers': {
                'predictions': predictions,
                'labels': labels,
            },
        }

    def modify_summary(self, summary):
        import numpy as np
        buffers = summary['buffers']
        if 'predictions' in buffers:
            predictions = np.concatenate(
                [np.atleast_1d(np.asarray(p))
                 for p in buffers.pop('predictions')])
            labels = np.concatenate(
                [np.atleast_1d(np.asarray(t))
                 for t in buffers.pop('labels')])
            summary['scalars']['overall_accuracy'] = float(
                (predictions == labels).mean())
        return super().modify_summary(summary)


def _wants_seq_len(net):
    import inspect
    try:
        sig = inspect.signature(net.forward)
    except (TypeError, ValueError):
        return False
    return 'seq_len' in sig.parameters or 'sequence_lengths' in \
        sig.parameters
