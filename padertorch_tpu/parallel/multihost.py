"""Multi-host (multi-process) training support.

The reference ships MPI-aware IO: rank 0 reads checkpoint/config bytes and
broadcasts them (``padertorch/base.py:152-165``,
``padertorch/configurable.py:510-517``), rank 0 creates storage dirs
(``padertorch/io.py:60-66``), and evaluation fans out over MPI ranks.

Under JAX's multi-controller model (``jax.distributed.initialize``), every
process runs the *same* SPMD program, so the device-side code needs no
changes — but host-side effects must be coordinated:

- **Exactly one writer**: checkpoint files, tfevents, storage dirs and
  Makefiles are written by process 0 only, with a cross-process barrier so
  no process proceeds before the write committed.
- **Broadcast instead of shared-FS reads**: configs and checkpoints are
  read by process 0 and broadcast as bytes, so resume/backoff works even
  when workers have no (or slow) access to the storage filesystem.
- **Host-local input sharding**: each process's data pipeline produces its
  slice of the global batch and
  :func:`padertorch_tpu.parallel.mesh.shard_host_local_batch` assembles the
  globally-sharded array without funnelling data through one host.

All collectives here are cheap control-plane operations (they ride the
coordination service / one tiny device program), not part of the train
step.
"""
import io as _io

import numpy as np

__all__ = [
    'process_index',
    'process_count',
    'is_primary',
    'barrier',
    'broadcast_bytes',
    'broadcast_obj',
    'fetch_global',
    'read_and_broadcast',
    'load_state_broadcast',
]


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_primary() -> bool:
    """True on the (single) process that owns host-side writes."""
    return process_index() == 0


def barrier(name: str = 'barrier') -> None:
    """Block until every process reached this point.

    No-op in a single-process run, so gated code paths need no special
    casing.  ``name`` disambiguates concurrent barriers (all processes
    must pass the same name at the same point).
    """
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_bytes(data=None) -> bytes:
    """Broadcast a ``bytes`` payload from process 0 to all processes.

    Process 0 passes the payload; other processes pass ``None`` and
    receive process 0's bytes.  Reference parity: ``dlp_mpi.bcast`` as
    used by ``padertorch/configurable.py:510-517``.
    """
    import jax
    if jax.process_count() == 1:
        assert data is not None, 'single process must supply data'
        return bytes(data)
    from jax.experimental import multihost_utils
    if jax.process_index() == 0:
        assert data is not None, 'process 0 must supply the payload'
        payload = np.frombuffer(bytes(data), dtype=np.uint8)
        length = np.int64(payload.size)
    else:
        payload = None
        length = np.int64(0)
    length = int(multihost_utils.broadcast_one_to_all(length))
    if payload is None:
        payload = np.zeros((length,), dtype=np.uint8)
    assert payload.shape == (length,), (payload.shape, length)
    payload = multihost_utils.broadcast_one_to_all(payload)
    return np.asarray(payload).tobytes()


def broadcast_obj(obj=None):
    """Pickle-broadcast a host object from process 0 to all processes.

    Only used for *trusted, self-produced* control data (paths, configs
    already loaded from JSON) — checkpoints go through the pickle-free
    ``serialize`` module.
    """
    if process_count() == 1:
        return obj
    import pickle
    data = pickle.dumps(obj) if is_primary() else None
    return pickle.loads(broadcast_bytes(data))


def fetch_global(tree):
    """Device pytree -> host numpy pytree, valid on every process.

    Fully-addressable / fully-replicated arrays are fetched locally;
    arrays sharded across processes (ZeRO/FSDP state on a multi-host
    mesh) are all-gathered.  This is a COLLECTIVE: every process must
    call it with the same tree structure (e.g. before process 0 writes a
    checkpoint).
    """
    import jax

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable or x.sharding.is_fully_replicated:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree_util.tree_map(fetch, tree)


def read_and_broadcast(path) -> bytes:
    """Read a file on process 0 and broadcast its bytes to all processes.

    The multi-controller analog of the reference's
    ``consider_mpi=True`` file loads (rank 0 reads, ``dlp_mpi.bcast`` —
    ``padertorch/base.py:152-165``): workers never touch the storage
    filesystem, which both cuts FS load and works when only the primary
    host mounts the experiment directory.
    """
    from pathlib import Path
    data = Path(path).read_bytes() if is_primary() else None
    return broadcast_bytes(data)


def load_state_broadcast(path):
    """Load a ``.ptt`` checkpoint on process 0 and broadcast the state."""
    from padertorch_tpu.serialize import load_state
    return load_state(_io.BytesIO(read_and_broadcast(path)))
