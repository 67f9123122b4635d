"""Tensor (model) parallelism as parameter shardings over a 2D mesh.

Beyond the reference (which only supports single-node data parallelism,
``trainer.py:396``): on TPU pods the natural scaling axes are a 2D
``(data, model)`` mesh — batch split over 'data', weight matrices split
over 'model'.  Everything stays declarative: parameters are placed with
``NamedSharding``s and GSPMD propagates the shardings through the jitted
train step, inserting all-gathers / reduce-scatters over ICI where the
math requires them.  The step code is unchanged.

Sharding rule (``shard_module``): 2D+ weight matrices whose last axis is
divisible by the 'model' axis size are column-sharded ``P(..., 'model')``
(for RNN gate matrices ``(D, 4H)`` this splits the gates — each shard
computes its gate slice and carries an ``H/m``-slice of (h, c); GSPMD
all-gathers the small ``(B, H)`` hidden state for the next step's
recurrent matmul).  Biases and vectors replicate.

Use the ``'scan'`` RNN backend under model parallelism — a Pallas custom
call is opaque to GSPMD and would force replication of its operands.

Usage::

    mp = ModelParallel(data=4, model=2)
    trainer = Trainer(..., sharding=mp)
    trainer.model = mp.shard_module(trainer.model)
    trainer.train(...)
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from padertorch_tpu.parallel.mesh import (
    replicate, shard_batch, shard_host_local_batch,
)

__all__ = ['make_mesh_2d', 'shard_module', 'ModelParallel']


def make_mesh_2d(data=None, model=2, devices=None) -> Mesh:
    """(data, model) mesh; ``data`` defaults to n_devices / model."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    device_array = np.asarray(devices).reshape(data, model)
    return Mesh(device_array, ('data', 'model'))


def _param_spec(x, model_size, min_size=2 ** 16):
    """Default tensor-parallel PartitionSpec for one parameter."""
    if x.ndim >= 2 and x.shape[-1] % model_size == 0 \
            and x.size >= min_size:
        return P(*([None] * (x.ndim - 1) + ['model']))
    return P()


def shard_module(module, mesh: Mesh, spec_fn=None,
                 min_size=2 ** 16):
    """Place a module's arrays on the mesh per ``spec_fn``.

    ``spec_fn(path, array) -> PartitionSpec`` overrides the default
    column-sharding rule; return ``None`` to fall back to it.
    """
    model_size = mesh.shape['model']

    def place(path, x):
        if not isinstance(x, (jax.Array, np.ndarray)):
            return x
        spec = spec_fn(path, x) if spec_fn is not None else None
        if spec is None:
            spec = _param_spec(x, model_size, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, module)


class ModelParallel:
    """2D (data, model) parallelism for the Trainer's sharding slot.

    ``shard(example)`` splits the batch over 'data' (replicated over
    'model'); ``shard_module(model)`` column-shards the big weight
    matrices over 'model'.
    """

    def __init__(self, mesh: Mesh = None, data=None, model=2,
                 spec_fn=None, min_size=2 ** 16):
        self.mesh = mesh if mesh is not None else make_mesh_2d(
            data=data, model=model)
        self.axis = 'data'
        self.spec_fn = spec_fn
        self.min_size = min_size

    def shard(self, example):
        if jax.process_count() > 1:
            # multi-controller: each process's pipeline holds only the
            # LOCAL slice of the global batch — same contract as
            # DataParallel.shard (treating the local batch as global
            # would both shrink the batch dim and feed divergent
            # values into one SPMD program)
            return shard_host_local_batch(example, self.mesh, self.axis)
        return shard_batch(example, self.mesh, self.axis)

    def shard_module(self, module):
        return shard_module(module, self.mesh, self.spec_fn,
                            self.min_size)

    def replicate(self, tree):
        return replicate(tree, self.mesh)
