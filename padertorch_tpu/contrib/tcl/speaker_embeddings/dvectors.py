"""d-vector speaker embedding models (ResNet-style).

Reference parity: ``padertorch/contrib/tcl/speaker_embeddings/dvectors.py``
— ResNet18/34 trunks over log-mel features, statistics pooling, and a
``DVectorModel`` trained with speaker cross entropy whose penultimate
activations are the d-vectors.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model, Module
from padertorch_tpu import nn
from padertorch_tpu.ops.losses.classification import softmax_cross_entropy

__all__ = ['BasicBlock', 'ResNet18', 'ResNet34', 'DVectorModel']


class _BatchNorm2d(Module):
    """Simple batch norm over (B, C, H, W) with running stats."""

    def __init__(self, num_features, eps=1e-5, momentum=0.9):
        self.eps = eps
        self.momentum = momentum
        self.weight = jnp.ones((num_features,))
        self.bias = jnp.zeros((num_features,))
        self.register_buffer('running_mean', jnp.zeros((num_features,)))
        self.register_buffer('running_var', jnp.ones((num_features,)))

    def forward(self, x):
        if self.training:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
            self.running_mean = (
                self.momentum * self.running_mean
                + (1 - self.momentum) * jax.lax.stop_gradient(mean))
            self.running_var = (
                self.momentum * self.running_var
                + (1 - self.momentum) * jax.lax.stop_gradient(var))
        else:
            mean = self.running_mean
            var = self.running_var
        shape = (1, -1, 1, 1)
        y = (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.eps)
        return y * self.weight.reshape(shape) + self.bias.reshape(shape)


class BasicBlock(Module):
    def __init__(self, in_planes, planes, stride=1):
        self.conv1 = nn.Conv2d(
            in_planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = _BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = _BatchNorm2d(planes)
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False),
                _BatchNorm2d(planes),
            )
        else:
            self.shortcut = None

    def forward(self, x):
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = x if self.shortcut is None else self.shortcut(x)
        return jax.nn.relu(out + sc)


class _ResNet(Module):
    layers_spec = (2, 2, 2, 2)  # ResNet18

    def __init__(self, in_channels=1, base_planes=16, embedding_size=256):
        self.conv1 = nn.Conv2d(
            in_channels, base_planes, 3, padding=1, bias=False)
        self.bn1 = _BatchNorm2d(base_planes)
        blocks = []
        planes = base_planes
        in_planes = base_planes
        for i, n in enumerate(self.layers_spec):
            stride = 1 if i == 0 else 2
            for j in range(n):
                blocks.append(BasicBlock(
                    in_planes, planes, stride=stride if j == 0 else 1))
                in_planes = planes
            planes *= 2
        self.blocks = blocks
        self.out_planes = in_planes
        self.fc = nn.Linear(2 * in_planes, embedding_size)
        self.embedding_size = embedding_size

    def forward(self, x):
        """x: (B, C, M, T) log-mel -> (B, embedding_size)."""
        h = jax.nn.relu(self.bn1(self.conv1(x)))
        for block in self.blocks:
            h = block(h)
        # statistics pooling over (freq, time)
        mean = jnp.mean(h, axis=(2, 3))
        std = jnp.sqrt(jnp.maximum(jnp.var(h, axis=(2, 3)), 1e-8))
        return self.fc(jnp.concatenate([mean, std], axis=-1))


class ResNet18(_ResNet):
    layers_spec = (2, 2, 2, 2)


class ResNet34(_ResNet):
    layers_spec = (3, 4, 6, 3)


class DVectorModel(Model):
    """Speaker classifier whose embedding layer yields d-vectors.

    Reference parity: ``dvectors.py:176``.
    """

    def __init__(self, trunk=None, num_speakers=100, embedding_size=256):
        if trunk is None:
            trunk = ResNet34(embedding_size=embedding_size)
        self.trunk = trunk
        self.head = nn.Linear(trunk.embedding_size, num_speakers)

    def forward(self, inputs):
        features = inputs['features']  # (B, C, M, T)
        embedding = self.trunk(features)
        logits = self.head(embedding)
        return {'embedding': embedding, 'logits': logits}

    def embed(self, inputs):
        out = self(inputs)
        e = out['embedding']
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    def review(self, inputs, outputs):
        labels = inputs['speaker_id']
        ce = softmax_cross_entropy(outputs['logits'], labels)
        accuracy = jnp.mean(
            (jnp.argmax(outputs['logits'], -1) == labels).astype('float32'))
        return {'loss': ce, 'scalars': {'accuracy': accuracy}}
