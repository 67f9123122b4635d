"""Optimizer wrappers over optax. Reference parity: ``padertorch/train/optimizer.py``.

TPU-native design decisions:

- The update is a pure function ``(grads, opt_state, params) -> (params,
  opt_state, grad_norm)`` compiled into the trainer's jitted step, so the
  optimizer math fuses with the backward pass in one XLA program.
- Hyperparameters (learning rate, ...) live *inside* the optimizer state via
  ``optax.inject_hyperparams``.  Annealing hooks and learning-rate backoff
  mutate a device scalar instead of re-tracing the step.
- ``gradient_clipping`` (mandatory, like the reference) is a global-norm
  clip whose pre-clip norm is returned for reporting.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from padertorch_tpu.configurable import Configurable
from padertorch_tpu import module as ptmodule

__all__ = ['Optimizer', 'Adam', 'AdamW', 'SGD', 'Adadelta',
           'Adafactor', 'Lion', 'Muon']


def _scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8):
    """AMSGrad with torch.optim.Adam(amsgrad=True) semantics.

    torch maxes the *raw* second moment and divides by its bias
    correction afterwards (``max_exp_avg_sq``), while optax's
    ``scale_by_amsgrad`` maxes the bias-corrected moment — the two
    diverge over the first ~1/(1-b2) steps.  This transform mirrors
    torch exactly (verified in
    ``tests/test_train/test_optimizer_torch_parity.py``).
    """

    def init(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        return {
            'count': jnp.zeros((), jnp.int32),
            'mu': zeros,
            'nu': zeros,
            'nu_max': jax.tree_util.tree_map(jnp.copy, zeros),
        }

    def update(updates, state, params=None):
        del params
        count = state['count'] + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state['mu'], updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g),
            state['nu'], updates)
        nu_max = jax.tree_util.tree_map(
            jnp.maximum, state['nu_max'], nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm / bc2) + eps),
            mu, nu_max)
        return out, {'count': count, 'mu': mu, 'nu': nu,
                     'nu_max': nu_max}

    return optax.GradientTransformation(init, update)


def _global_norm(grads):
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


class Optimizer(Configurable):
    """Base wrapper: optax transformation + mandatory gradient clipping."""

    def __init__(self, gradient_clipping, **kwargs):
        self.gradient_clipping = gradient_clipping
        self.optimizer_kwargs = kwargs
        self.opt_state = None
        self._tx = None

    def _make_tx(self) -> optax.GradientTransformation:
        raise NotImplementedError

    @property
    def tx(self):
        if self._tx is None:
            def make(learning_rate):
                return self._make_optax(learning_rate=learning_rate)
            self._tx = optax.inject_hyperparams(make)(
                **self.optimizer_kwargs)
        return self._tx

    def _make_optax(self, **kwargs):
        raise NotImplementedError

    def set_parameters(self, params):
        """Initialize optimizer state for a (pytree of) parameters.

        Unlike the torch reference (which stores param references), this
        only initializes state — parameters flow through ``step``.  The
        state is keyed on the *flat leaf list*, so it stays valid when
        static module metadata (train/eval flags, snapshot flags) changes.
        """
        self.opt_state = self.tx.init(jax.tree_util.tree_leaves(params))
        return self

    def check_if_set(self):
        assert self.opt_state is not None, (
            'The optimizer is not initialized; call set_parameters before '
            'using any of the optimizer functions.'
        )

    # -- pure functional core (used inside the jitted train step) -----------
    def clip_by_global_norm(self, grads):
        """Return (clipped_grads, pre_clip_grad_norm)."""
        norm = _global_norm(grads)
        clip = self.gradient_clipping
        scale = jnp.minimum(1.0, clip / (norm + 1e-6))
        clipped = jax.tree_util.tree_map(lambda g: g * scale, grads)
        return clipped, norm

    def step(self, params, grads, opt_state):
        """Pure update: returns (new_params, new_opt_state, grad_norm)."""
        p_leaves, p_def = jax.tree_util.tree_flatten(params)
        g_leaves = jax.tree_util.tree_leaves(grads)
        assert len(p_leaves) == len(g_leaves), (
            len(p_leaves), len(g_leaves))
        g_leaves, grad_norm = self.clip_by_global_norm(g_leaves)
        updates, new_state = self.tx.update(g_leaves, opt_state, p_leaves)
        new_leaves = optax.apply_updates(p_leaves, updates)
        new_params = jax.tree_util.tree_unflatten(p_def, new_leaves)
        return new_params, new_state, grad_norm

    # -- stateful conveniences (host side) -----------------------------------
    def apply(self, params, grads):
        self.check_if_set()
        new_params, self.opt_state, grad_norm = self.step(
            params, grads, self.opt_state)
        return new_params, grad_norm

    def zero_grad(self):
        """No-op for API parity: grads are functional values here."""

    @property
    def lr(self):
        self.check_if_set()
        hp = self.opt_state.hyperparams
        if 'learning_rate' not in hp:
            # Adafactor(lr=None): internal relative step size, no
            # injected hyperparam to read
            return None
        return float(np.asarray(hp['learning_rate']))

    @lr.setter
    def lr(self, value):
        self.check_if_set()
        hp = self.opt_state.hyperparams
        hp['learning_rate'] = jnp.asarray(
            value, dtype=jnp.asarray(hp['learning_rate']).dtype)

    def state_dict(self):
        self.check_if_set()
        return ptmodule.state_dict(self.opt_state)

    def load_state_dict(self, sd):
        self.check_if_set()
        import jax
        old_state = self.opt_state
        self.opt_state = ptmodule.load_state_dict(
            self.opt_state, sd, strict=False)

        # keep DP/TP shardings across resume (restore yields host arrays)
        def place(old, new):
            import numpy as _np
            if isinstance(old, jax.Array) and isinstance(
                    new, (jax.Array, _np.ndarray)):
                return jax.device_put(new, old.sharding)
            return new

        self.opt_state = jax.tree_util.tree_map(
            place, old_state, self.opt_state)

    def to(self, device):
        """API parity; jax arrays live on the default device already."""
        return self

    def cpu(self):
        return self

    def cuda(self, device=None):
        return self


class Adam(Optimizer):
    def __init__(
            self,
            gradient_clipping=1e10,
            lr=1e-3,
            betas=(0.9, 0.999),
            eps=1e-8,
            weight_decay=0,
            amsgrad=False,
    ):
        super().__init__(
            gradient_clipping,
            learning_rate=lr,
        )
        self.betas = tuple(betas)
        self.eps = eps
        self.weight_decay = weight_decay
        self.amsgrad = amsgrad

    def _make_optax(self, learning_rate):
        # torch.optim.Adam semantics: weight_decay is *coupled* L2
        # regularization, added to the gradient before the moment
        # updates (unlike AdamW's decoupled decay) — so it chains
        # add_decayed_weights in front of adam/amsgrad and composes
        # with amsgrad.
        b1, b2 = self.betas
        if self.amsgrad:
            inner = optax.chain(
                _scale_by_amsgrad_torch(b1=b1, b2=b2, eps=self.eps),
                optax.scale_by_learning_rate(learning_rate),
            )
        else:
            inner = optax.adam(learning_rate, b1=b1, b2=b2, eps=self.eps)
        if self.weight_decay:
            return optax.chain(
                optax.add_decayed_weights(self.weight_decay), inner)
        return inner


class AdamW(Adam):
    def __init__(
            self,
            gradient_clipping=1e10,
            lr=1e-3,
            betas=(0.9, 0.999),
            eps=1e-8,
            weight_decay=1e-2,
            amsgrad=False,
    ):
        super().__init__(
            gradient_clipping, lr=lr, betas=betas, eps=eps,
            weight_decay=weight_decay, amsgrad=amsgrad)

    def _make_optax(self, learning_rate):
        # torch.optim.AdamW semantics: *decoupled* weight decay.
        b1, b2 = self.betas
        if self.amsgrad:
            return optax.chain(
                _scale_by_amsgrad_torch(b1=b1, b2=b2, eps=self.eps),
                optax.add_decayed_weights(self.weight_decay),
                optax.scale_by_learning_rate(learning_rate),
            )
        return optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=self.eps,
            weight_decay=self.weight_decay)


class SGD(Optimizer):
    def __init__(
            self,
            gradient_clipping=1e10,
            lr=1e-3,
            momentum=0,
            dampening=0,
            weight_decay=0,
            nesterov=False,
    ):
        super().__init__(gradient_clipping, learning_rate=lr)
        assert dampening == 0, 'dampening is not supported'
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.nesterov = nesterov

    def _make_optax(self, learning_rate):
        parts = []
        if self.weight_decay:
            parts.append(optax.add_decayed_weights(self.weight_decay))
        parts.append(optax.sgd(
            learning_rate,
            momentum=self.momentum or None,
            nesterov=self.nesterov,
        ))
        return optax.chain(*parts) if len(parts) > 1 else parts[0]


class Adadelta(Optimizer):
    def __init__(
            self,
            gradient_clipping=1e10,
            lr=1.0,
            rho=0.9,
            eps=1e-6,
            weight_decay=0,
    ):
        super().__init__(gradient_clipping, learning_rate=lr)
        self.rho = rho
        self.eps = eps
        self.weight_decay = weight_decay

    def _make_optax(self, learning_rate):
        return optax.adadelta(
            learning_rate, rho=self.rho, eps=self.eps,
            weight_decay=self.weight_decay)


class Adafactor(Optimizer):
    """Memory-efficient optimizer for large TPU models (Shazeer & Stern
    2018).  The second moment of a (d1, d2) weight is stored as two
    factored vectors (d1,) + (d2,) instead of the full matrix — for a
    transformer this shrinks optimizer state from 2x to ~epsilon of the
    parameter bytes (vs Adam), which matters when parameters are
    replicated or when FSDP shards are HBM-bound.

    Beyond the reference's optimizer set (``padertorch/train/
    optimizer.py`` stops at Adam/SGD/Adadelta); exposed through the
    same clipping/state_dict/hyperparam-injection wrapper, so lr
    scheduling and checkpoint resume work unchanged.

    With ``lr=None`` Adafactor's original relative step size schedule
    is used (``min(1/sqrt(step), 1e-2)``, scaled by parameter norm when
    ``multiply_by_parameter_scale`` is on).
    """

    def __init__(
            self,
            gradient_clipping=1e10,
            lr=1e-3,
            min_dim_size_to_factor=128,
            decay_rate=0.8,
            decay_offset=0,
            multiply_by_parameter_scale=True,
            clipping_threshold=1.0,
            momentum=None,
            weight_decay=0,
            eps=1e-30,
            factored=True,
    ):
        super().__init__(gradient_clipping, learning_rate=lr)
        self.min_dim_size_to_factor = min_dim_size_to_factor
        self.decay_rate = decay_rate
        self.decay_offset = decay_offset
        self.multiply_by_parameter_scale = multiply_by_parameter_scale
        self.clipping_threshold = clipping_threshold
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.eps = eps
        self.factored = factored

    def _make_optax(self, learning_rate):
        return optax.adafactor(
            learning_rate,
            min_dim_size_to_factor=self.min_dim_size_to_factor,
            decay_rate=self.decay_rate,
            decay_offset=self.decay_offset,
            multiply_by_parameter_scale=self.multiply_by_parameter_scale,
            clipping_threshold=self.clipping_threshold,
            momentum=self.momentum,
            weight_decay_rate=self.weight_decay or None,
            eps=self.eps,
            factored=self.factored,
        )


class Muon(Optimizer):
    """Momentum orthogonalized by Newton-Schulz (Jordan 2024).

    A TPU-natural optimizer: the whole update is five quintic
    Newton-Schulz iterations — pure (m, n) x (n, m) matmuls that run on
    the MXU — applied to the momentum of every 2-D weight, yielding an
    approximately orthogonal update direction (steepest descent under
    the spectral norm).  Non-2-D parameters (biases, norm scales,
    embeddings) fall back to AdamW inside the same transformation.

    Beyond the reference's optimizer set (``padertorch/train/
    optimizer.py`` stops at Adam/SGD/Adadelta); exposed through the
    same clipping/state_dict/hyperparam-injection wrapper, so lr
    scheduling, annealing hooks, and checkpoint resume work unchanged.
    Verified against an independent numpy re-execution of the update
    math in ``tests/test_train/test_muon.py``.

    Note on learning rates: Muon updates have roughly unit RMS per
    element (orthogonal matrices scaled by sqrt(max(1, n_out/n_in))),
    so good lrs are much smaller than Adam's for the same model; the
    0.02 default follows the modded-nanogpt recipe.
    """

    def __init__(
            self,
            gradient_clipping=1e10,
            lr=2e-2,
            beta=0.95,
            ns_steps=5,
            nesterov=True,
            weight_decay=0,
            eps=1e-8,
            adam_betas=(0.9, 0.999),
            adam_weight_decay=0,
    ):
        super().__init__(gradient_clipping, learning_rate=lr)
        self.beta = beta
        self.ns_steps = ns_steps
        self.nesterov = nesterov
        self.weight_decay = weight_decay
        self.eps = eps
        self.adam_betas = tuple(adam_betas)
        self.adam_weight_decay = adam_weight_decay

    def _make_optax(self, learning_rate):
        import optax.contrib
        b1, b2 = self.adam_betas
        return optax.contrib.muon(
            learning_rate,
            ns_steps=self.ns_steps,
            beta=self.beta,
            eps=self.eps,
            weight_decay=self.weight_decay,
            nesterov=self.nesterov,
            adam_b1=b1,
            adam_b2=b2,
            adam_weight_decay=self.adam_weight_decay,
        )


class Lion(Optimizer):
    """Sign-momentum optimizer (Chen et al. 2023): one momentum buffer,
    sign updates — half of Adam's optimizer memory and strong results
    on vision/language at 3-10x smaller lr with 3-10x larger decoupled
    weight decay.  Beyond-reference addition."""

    def __init__(
            self,
            gradient_clipping=1e10,
            lr=1e-4,
            betas=(0.9, 0.99),
            weight_decay=0,
    ):
        super().__init__(gradient_clipping, learning_rate=lr)
        self.betas = tuple(betas)
        self.weight_decay = weight_decay

    def _make_optax(self, learning_rate):
        b1, b2 = self.betas
        return optax.lion(
            learning_rate, b1=b1, b2=b2,
            weight_decay=self.weight_decay)
