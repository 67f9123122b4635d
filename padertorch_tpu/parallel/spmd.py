"""Explicit-collective SPMD training utilities (``shard_map`` + ``psum``).

The default data-parallel path (``parallel/mesh.py``) is GSPMD: the jit
step carries sharding annotations and XLA inserts the gradient
all-reduce.  This module provides the *explicit* formulation — the step
body is written per shard and the collectives are spelled out — which is
useful when the compiler's choices must be pinned down (e.g. forcing the
grad reduction onto ICI as one fused ``psum``, or mixing in
``ppermute``-based overlaps later).

Both formulations compute identical results (tested against each other
in ``tests/test_parallel.py``); the scaling recipe is the standard one:
pick a mesh, shard the batch over ``data``, replicate the params, psum
the grads.
"""
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ['shard_map_value_and_grad', 'pmean_trees']


def pmean_trees(tree, axis_name):
    """psum/size over a mesh axis for every leaf of a pytree."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.pmean(leaf, axis_name), tree)


def shard_map_value_and_grad(loss_fn, mesh: Mesh, axis: str = 'data',
                             donate_params: bool = False):
    """Explicit data-parallel ``value_and_grad``.

    Args:
        loss_fn: ``loss_fn(params, batch) -> scalar loss`` — written for
            ONE shard of the batch (the usual single-device code).
        mesh: the device mesh; ``axis`` names the batch dimension axis.

    Returns:
        A jitted ``fn(params, batch) -> (loss, grads)`` where ``batch``
        leaves are sharded on their leading axis over ``axis``, params
        are replicated, and loss/grads are ``pmean``-ed over the mesh —
        exactly what GSPMD derives implicitly, but with the collective
        explicit in the program.
    """
    grad_fn = jax.value_and_grad(loss_fn)

    def per_shard(params, batch):
        loss, grads = grad_fn(params, batch)
        # ONE fused all-reduce over ICI for the whole gradient pytree
        loss = jax.lax.pmean(loss, axis)
        grads = pmean_trees(grads, axis)
        return loss, grads

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    donate = (0,) if donate_params else ()
    return jax.jit(sharded, donate_argnums=donate)
