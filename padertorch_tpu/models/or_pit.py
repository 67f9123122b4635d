"""One-and-Rest PIT recursive source separation.

Reference parity: ``contrib/examples/source_separation/or_pit/model.py``
(Takahashi 2019: separate one speaker + the sum of the rest, recurse).

TPU design: training is one separator step with the OR-PIT loss (all K
candidate assignments evaluated inside the graph); recursive inference
unrolls ``max_iterations`` separator applications statically.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu.models.tasnet import TasNet
from padertorch_tpu.ops.losses.regression import si_sdr_loss

__all__ = ['one_and_rest_permutation_invariant_loss', 'OneAndRestPIT']


def one_and_rest_permutation_invariant_loss(inputs, targets, loss_fn):
    """OR-PIT loss for one example (no batch axis).

    Args:
        inputs: (2, T) — the single-speaker estimate and the rest estimate.
        targets: (K, T) with K >= 1.
        loss_fn: callable(estimate (T,), target (T,)) -> scalar.

    Returns:
        (min_loss, argmin_index) — index of the target matched as 'one'.

    >>> import jax.numpy as jnp
    >>> t = jnp.stack([jnp.ones(8), 2 * jnp.ones(8)])
    >>> est = jnp.stack([2 * jnp.ones(8), jnp.ones(8)])
    >>> loss, idx = one_and_rest_permutation_invariant_loss(
    ...     est, t, lambda e, tg: jnp.mean((e - tg) ** 2))
    >>> float(loss), int(idx)
    (0.0, 1)
    """
    k = targets.shape[0]
    total = jnp.sum(targets, axis=0)
    candidates = jnp.stack([
        loss_fn(inputs[0], targets[i])
        + loss_fn(inputs[1], total - targets[i])
        for i in range(k)
    ])
    idx = jnp.argmin(candidates)
    return candidates[idx], idx


class OneAndRestPIT(Model):
    """Recursive separator built on a 2-output TasNet.

    forward input: ``y`` (B, T), ``num_samples``; review uses ``s``
    (B, K, T).
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['separator'] = {
            'factory': TasNet,
            'num_speakers': 2,
        }

    def __init__(self, separator: TasNet, max_iterations=2,
                 loss='si-sdr'):
        assert separator.num_speakers == 2, separator.num_speakers
        self.separator = separator
        self.max_iterations = max_iterations
        self.loss_name = loss

    def _forward_step(self, batch):
        out = self.separator(batch)
        estimates = out['out']  # (B, 2, T)
        return estimates[:, 0], estimates[:, 1]

    def forward(self, batch):
        one, rest = self._forward_step(batch)
        return {'one': one, 'rest': rest}

    def separate(self, batch, num_speakers=None):
        """Recursive inference: returns (B, K, T) estimates.

        Unrolls up to ``max_iterations`` (static); with
        ``num_speakers=k`` the recursion stops after k-1 splits.
        """
        iterations = (num_speakers - 1) if num_speakers \
            else self.max_iterations
        outputs = []
        current = batch
        rest = None
        for _ in range(iterations):
            one, rest = self._forward_step(current)
            outputs.append(one)
            current = dict(current)
            current['y'] = rest
        outputs.append(rest)
        return jnp.stack(outputs, axis=1)

    def review(self, batch, outputs):
        s = batch['s']  # (B, K, T)
        one = outputs['one']
        rest = outputs['rest']
        t = one.shape[-1]
        num_samples = jnp.asarray(batch.get(
            'num_samples', jnp.full((s.shape[0],), t)))

        def per_example(one_i, rest_i, targets, n):
            mask = (jnp.arange(t) < n).astype(one_i.dtype)

            def loss_fn(e, tg):
                e = e * mask
                tg = tg * mask
                alpha = jnp.sum(e * tg) / jnp.maximum(
                    jnp.sum(tg * tg), 1e-10)
                s_t = alpha * tg
                num = jnp.sum(s_t * s_t)
                den = jnp.sum((e - s_t) ** 2)
                return -10 * jnp.log10(
                    num / jnp.maximum(den, 1e-10))

            loss, _ = one_and_rest_permutation_invariant_loss(
                jnp.stack([one_i, rest_i]), targets[..., :t], loss_fn)
            return loss

        loss = jnp.mean(jax.vmap(per_example)(
            one, rest, s, num_samples))
        return {'loss': loss}
