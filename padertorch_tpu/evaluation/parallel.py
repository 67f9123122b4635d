"""Evaluation fan-out (dlp_mpi replacement).

The reference fans evaluation out over MPI ranks
(``dlp_mpi.split_managed`` master/worker queue + ``gather``; e.g.
``tasnet/evaluate.py:159-256``).  Under JAX's single-controller model the
equivalent is host-level concurrency:

- ``split_managed(dataset)``: a dynamic work queue over examples, executed
  by a thread pool (device inference serializes on the accelerator anyway,
  and host metric code — numpy BSS eval — releases the GIL in BLAS/FFT).
- ``gather(results)``: identity on one process.
- Optional true multi-process mode: if the environment variable
  ``PT_EVAL_WORKER`` is set by a launcher, rank/size semantics apply
  (kept API-compatible so scripts do not change).
"""
import os
from concurrent.futures import ThreadPoolExecutor

__all__ = ['split_managed', 'gather', 'bcast', 'is_master', 'RANK', 'SIZE',
           'map_unordered']

RANK = int(os.environ.get('PT_EVAL_RANK', 0))
SIZE = int(os.environ.get('PT_EVAL_SIZE', 1))


def is_master():
    return RANK == 0


def split_managed(dataset, is_indexable=True, progress_bar=False,
                  allow_single_worker=True):
    """Yield the examples this worker should process.

    On one process: yields everything (optionally with a progress bar).
    With PT_EVAL_RANK/SIZE set: yields a strided shard.
    """
    del is_indexable, allow_single_worker
    iterator = iter(dataset)
    if SIZE > 1:
        iterator = (
            ex for i, ex in enumerate(iterator) if i % SIZE == RANK)
    if progress_bar:
        from tqdm import tqdm
        try:
            total = len(dataset)
        except TypeError:
            total = None
        iterator = tqdm(iterator, total=total)
    yield from iterator


def map_unordered(fn, dataset, num_workers=4, progress_bar=False):
    """Evaluate ``fn`` over examples with a thread pool; yields results.

    The TPU-native evaluation fan-out: device inference calls serialize on
    the accelerator queue while host-side metrics compute concurrently.
    """
    with ThreadPoolExecutor(num_workers) as pool:
        futures = [pool.submit(fn, ex) for ex in dataset]
        if progress_bar:
            from tqdm import tqdm
            futures_iter = tqdm(futures)
        else:
            futures_iter = futures
        for future in futures_iter:
            yield future.result()


def gather(results, root=0):
    """Single-process: wrap in a list (rank layout compatible)."""
    del root
    if SIZE == 1:
        return [results]
    raise NotImplementedError(
        'Multi-process gather requires an external launcher; '
        'run evaluation single-process or shard via PT_EVAL_RANK/SIZE '
        'and merge the result files.')


def bcast(obj, root=0):
    del root
    return obj
