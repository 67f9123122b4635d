"""Test configuration: run JAX on a local virtual 8-device CPU mesh.

The session environment may install a remote-TPU PJRT plugin via a
sitecustomize hook (PYTHONPATH + PALLAS_AXON_POOL_IPS) that routes *all*
XLA compiles through a slow remote relay — even for the CPU backend
(~10-60s per jit compile).  Tests must be fast and local, so if that hook
is active we re-exec pytest once with a cleaned environment (restoring
pytest's captured fds first so output still reaches the terminal).
Set PT_TEST_ON_TPU=1 to skip this and run tests against the real chip.
"""
import os
import sys


def _strip_axon(env):
    env = dict(env)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
    pythonpath = [
        p for p in env.get('PYTHONPATH', '').split(os.pathsep)
        if p and '.axon_site' not in p
    ]
    env['PYTHONPATH'] = os.pathsep.join(pythonpath)
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def _needs_reexec():
    return (
        os.environ.get('PALLAS_AXON_POOL_IPS')
        and not os.environ.get('PT_TEST_ON_TPU')
    )


def pytest_configure(config):
    if _needs_reexec():
        capman = config.pluginmanager.getplugin('capturemanager')
        if capman is not None:
            capman.stop_global_capturing()
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(
            sys.executable,
            [sys.executable, '-m', 'pytest'] + sys.argv[1:],
            _strip_axon(os.environ),
        )


if not _needs_reexec():
    if not os.environ.get('PT_TEST_ON_TPU'):
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8'
        ).strip()
    os.environ.setdefault('JAX_ENABLE_X64', 'false')
    # Persistent compilation cache: the suite compiles hundreds of small
    # programs; cache hits across runs (and across the recipe-smoke
    # subprocesses) cut wall-clock by minutes.  Env vars, not
    # jax.config, so child processes inherit it.
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '.jax_cache')
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _cache_dir)
    os.environ.setdefault(
        'JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')
    os.environ.setdefault(
        'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0')
