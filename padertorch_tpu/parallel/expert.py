"""Expert parallelism: Switch-style mixture-of-experts over an
``expert`` mesh axis.

No reference counterpart (the reference has no MoE); this is the
TPU-native extension for scaling parameter count past one chip: the
expert FFN weights live sharded over the ``expert`` axis, tokens are
routed top-1 (Switch) with a capacity limit, and the dispatch/combine
einsums carry sharding constraints so GSPMD lowers them to
``all_to_all`` over ICI — the canonical MoE recipe (pick a mesh,
annotate shardings, let XLA insert the collectives).

Numerics: with sufficient capacity the output equals the dense
per-token expert computation exactly (tested); over-capacity tokens
are dropped (output zero for the FFN branch), matching Switch
semantics.
"""
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['switch_router', 'expert_parallel_ffn', 'init_moe_params']


def switch_router(x, router_w, num_experts, capacity):
    """Top-1 routing with capacity (Switch Transformer).

    Args:
        x: (N, D) tokens (flattened batch*time).
        router_w: (D, E).
        capacity: max tokens per expert.

    Returns:
        dispatch: (N, E, C) 0/1 dispatch tensor,
        combine: (N, E, C) dispatch scaled by the router probability,
        probs: (N, E) router probabilities (f32) — the load-balancing
            aux loss consumes these; returning them keeps the loss on
            the SAME routing decision instead of recomputing it.
    """
    # routing math in f32 regardless of the activation dtype: under
    # the bf16 policy a bf16 queue-position cumsum is unrepresentable
    # past 256 tokens per expert (8 mantissa bits) and tokens would
    # silently collide in capacity slots
    logits = jnp.dot(x.astype(jnp.float32),
                     router_w.astype(jnp.float32))       # (N, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)              # (N,)
    expert_prob = jnp.max(probs, axis=-1).astype(x.dtype)
    onehot_i = jax.nn.one_hot(expert_idx, num_experts,
                              dtype=jnp.int32)           # (N, E)
    # position of each token within its expert's queue (exact int32)
    position = jnp.cumsum(onehot_i, axis=0) * onehot_i - 1  # (N, E)
    keep = (position >= 0) & (position < capacity)
    pos_onehot = jax.nn.one_hot(
        jnp.clip(position, 0, capacity - 1),
        capacity, dtype=x.dtype)                         # (N, E, C)
    dispatch = pos_onehot * keep.astype(x.dtype)[..., None]
    combine = dispatch * expert_prob[:, None, None]
    return dispatch, combine, probs


def expert_parallel_ffn(params, x, *, mesh: Mesh = None,
                        axis: str = 'expert',
                        capacity_factor: float = 2.0):
    """Switch MoE FFN: route, dispatch, per-expert GELU MLP, combine.

    Args:
        params: dict with ``router_w`` (D, E), ``w1`` (E, D, F),
            ``b1`` (E, F), ``w2`` (E, F, D), ``b2`` (E, D).
        x: (B, T, D) activations.
        mesh: if given, the expert-stacked tensors get sharding
            constraints over ``axis`` so GSPMD shards the expert
            compute and inserts the dispatch/combine ``all_to_all``.

    Returns:
        (B, T, D) output (over-capacity tokens contribute zero) and
        the load-balancing auxiliary loss (Switch eq. 4).
    """
    b, t, d = x.shape
    e = params['router_w'].shape[-1]
    n = b * t
    capacity = max(1, int(capacity_factor * n / e))

    tokens = x.reshape(n, d)
    dispatch, combine, probs = switch_router(
        tokens, params['router_w'], e, capacity)

    def constrain(arr, spec):
        if mesh is None:
            return arr
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(mesh, spec))

    # (N, E, C) x (N, D) -> (E, C, D): GSPMD turns the E-sharded
    # output constraint into the dispatch all_to_all
    expert_in = jnp.einsum('nec,nd->ecd', dispatch, tokens)
    expert_in = constrain(expert_in, P(axis))
    w1 = constrain(params['w1'], P(axis))
    w2 = constrain(params['w2'], P(axis))
    h = jax.nn.gelu(
        jnp.einsum('ecd,edf->ecf', expert_in, w1)
        + params['b1'][:, None, :])
    h = constrain(h, P(axis))
    expert_out = jnp.einsum('ecf,efd->ecd', h, w2) \
        + params['b2'][:, None, :]
    expert_out = constrain(expert_out, P(axis))
    y = jnp.einsum('nec,ecd->nd', combine, expert_out)

    # Switch load-balancing loss: E * sum_e f_e * p_e — on the SAME
    # router probs the dispatch used (switch_router returns them)
    frac_tokens = jnp.mean(
        jax.nn.one_hot(jnp.argmax(probs, -1), e), axis=0)
    frac_probs = jnp.mean(probs, axis=0)
    aux_loss = e * jnp.sum(frac_tokens * frac_probs)
    return y.reshape(b, t, d), aux_loss


def init_moe_params(key, d_model, d_ff, num_experts, dtype='float32'):
    """Standard init for :func:`expert_parallel_ffn` params."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale1 = 1.0 / jnp.sqrt(d_model)
    scale2 = 1.0 / jnp.sqrt(d_ff)
    return {
        'router_w': jax.random.normal(
            k1, (d_model, num_experts), dtype) * scale1,
        'w1': jax.random.normal(
            k2, (num_experts, d_model, d_ff), dtype) * scale1,
        'b1': jnp.zeros((num_experts, d_ff), dtype),
        'w2': jax.random.normal(
            k3, (num_experts, d_ff, d_model), dtype) * scale2,
        'b2': jnp.zeros((num_experts, d_model), dtype),
    }
