"""ctypes bindings for the native host-side data-prep kernels.

Compiles ``_dataprep.cpp`` on first use (cached next to the source) and
exposes numpy-facing wrappers.  Every function has a numpy fallback, so
the package works even without a compiler; ``NATIVE_AVAILABLE`` tells
which path is active.  ctypes calls release the GIL, so the prefetch
thread pool converts audio in parallel with Python-level work.
"""
import ctypes
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

__all__ = [
    'NATIVE_AVAILABLE',
    'pcm16_to_float32',
    'mu_law_encode',
    'mu_law_decode',
    'frame_signal',
]

_HERE = Path(__file__).parent
_SO = _HERE / '_dataprep.so'
_SRC = _HERE / '_dataprep.cpp'

_lib = None


def _build():
    for cc in ('c++', 'g++', 'cc'):
        try:
            subprocess.run(
                [cc, '-O3', '-shared', '-fPIC',
                 str(_SRC), '-o', str(_SO)],
                check=True, capture_output=True)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p = ctypes.c_void_p
    lib.pcm16_to_float32.argtypes = [p, p, i64]
    lib.mu_law_encode_f32.argtypes = [p, p, i64, i32]
    lib.mu_law_decode_u8.argtypes = [p, p, i64, i32]
    lib.frame_signal_f32.argtypes = [p, p, i64, i64, i64]
    _lib = lib
    return lib


NATIVE_AVAILABLE = _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def pcm16_to_float32(pcm):
    """int16 PCM -> float32 in [-1, 1].

    >>> out = pcm16_to_float32(np.array([0, 16384, -32768], np.int16))
    >>> out.round(2).tolist()
    [0.0, 0.5, -1.0]
    """
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    out = np.empty(pcm.shape, np.float32)
    lib = _load()
    if lib is None:
        return (pcm / 32768.0).astype(np.float32)
    lib.pcm16_to_float32(_ptr(pcm), _ptr(out), pcm.size)
    return out


def mu_law_encode(x, mu_quantization=256):
    """float32 [-1, 1] -> uint8 mu-law indices (native hot path).

    >>> mu_law_encode(np.array([-1.0, 0.0, 1.0], np.float32)).tolist()
    [0, 128, 255]
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _load()
    if lib is None:
        from padertorch_tpu.ops.mu_law import mu_law_encode as jref
        import jax.numpy as jnp
        return np.asarray(jref(jnp.asarray(x))).astype(np.uint8)
    out = np.empty(x.shape, np.uint8)
    lib.mu_law_encode_f32(_ptr(x), _ptr(out), x.size, mu_quantization)
    return out


def mu_law_decode(idx, mu_quantization=256):
    """uint8 mu-law indices -> float32 [-1, 1].

    >>> x = np.linspace(-1, 1, 11).astype(np.float32)
    >>> rt = mu_law_decode(mu_law_encode(x))
    >>> bool(np.abs(rt - x).max() < 0.02)
    True
    """
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    lib = _load()
    if lib is None:
        from padertorch_tpu.ops.mu_law import mu_law_decode as jref
        import jax.numpy as jnp
        return np.asarray(jref(jnp.asarray(idx.astype(np.int32)),
                               mu_quantization))
    out = np.empty(idx.shape, np.float32)
    lib.mu_law_decode_u8(_ptr(idx), _ptr(out), idx.size, mu_quantization)
    return out


def frame_signal(signal, length, shift):
    """1-D float32 signal -> (n_frames, length) overlapping frames.

    >>> frame_signal(np.arange(10, dtype=np.float32), 4, 2).shape
    (4, 4)
    """
    signal = np.ascontiguousarray(signal, dtype=np.float32)
    n = signal.shape[-1]
    n_frames = max(0, (n - length) // shift + 1)
    out = np.empty((n_frames, length), np.float32)
    lib = _load()
    if lib is None:
        for f in range(n_frames):
            out[f] = signal[f * shift:f * shift + length]
        return out
    lib.frame_signal_f32(_ptr(signal), _ptr(out), n_frames, length, shift)
    return out
