"""Extra hooks. Reference parity: ``padertorch/contrib/cb/hooks.py``."""
import resource
import signal

from padertorch_tpu.train.hooks import Hook
from padertorch_tpu.train.hooks import StopTraining

__all__ = ['CPUTimeLimitExceededHook', 'CPUTimeLimitExceededHookTrigger',
           'WallClockLimitHook', 'SignalStopHook', 'InspectorHook',
           'PyroHook']


class CPUTimeLimitExceededHookTrigger:
    """Trigger firing once the scheduler signals the CPU-time limit
    (reference cb/hooks.py:6).  SIGXCPU fires at the next iteration;
    SIGUSR1 fires at the next *epoch* boundary (clean iterator state).

    Implements the framework ``Trigger`` protocol
    (``__call__(iteration, epoch)`` / ``set_last``) so it composes with
    ``StopTrainingHook`` and the other trigger combinators.
    """

    def __init__(self):
        self._sigxcpu_received = False
        self._sigusr1_received = False
        self._last_epoch = None
        signal.signal(signal.SIGXCPU, self._handler_sigxcpu)
        signal.signal(signal.SIGUSR1, self._handler_sigusr1)

    def _handler_sigxcpu(self, signum, frame):
        print('Received SIGXCPU: CPU time limit exceeded.'
              ' Graceful shutdown after this iteration.')
        self._sigxcpu_received = True

    def _handler_sigusr1(self, signum, frame):
        print('Received SIGUSR1.'
              ' Graceful shutdown after this epoch.')
        self._sigusr1_received = True

    def __call__(self, iteration, epoch):
        if self._sigxcpu_received:
            return True
        if self._sigusr1_received:
            # fire at the first step of a new epoch
            if self._last_epoch is not None and epoch != self._last_epoch:
                return True
        self._last_epoch = epoch
        return False

    def set_last(self, iteration, epoch):
        self._last_epoch = epoch


class CPUTimeLimitExceededHook(Hook):
    """Stop training gracefully when the process CPU time exceeds a limit
    (reference cb/hooks.py:50: SIGXCPU-style self-termination so a cluster
    scheduler never hard-kills mid-checkpoint)."""

    def __init__(self, cpu_time_limit_seconds):
        self.limit = cpu_time_limit_seconds

    def pre_step(self, trainer):
        usage = resource.getrusage(resource.RUSAGE_SELF)
        if usage.ru_utime + usage.ru_stime > self.limit:
            print(f'CPU time limit of {self.limit}s exceeded -> stopping.')
            raise StopTraining


class WallClockLimitHook(Hook):
    """Stop training before a wall-clock deadline."""

    def __init__(self, wall_clock_limit_seconds):
        import time
        self.deadline = time.monotonic() + wall_clock_limit_seconds

    def pre_step(self, trainer):
        import time
        if time.monotonic() > self.deadline:
            print('Wall clock limit exceeded -> stopping.')
            raise StopTraining


class SignalStopHook(Hook):
    """Stop training gracefully on a signal (reference cb/hooks.py:6,50:
    a SIGXCPU/SIGUSR1 from the cluster scheduler sets a flag, the next
    ``pre_step`` raises ``StopTraining`` so the final checkpoint still
    gets written).

    >>> import os, signal as sig
    >>> h = SignalStopHook(signals=(sig.SIGUSR1,))
    >>> h._install()
    >>> os.kill(os.getpid(), sig.SIGUSR1)  # delivered synchronously
    Received signal 10 -> stop after this step.
    >>> try:
    ...     h.pre_step(None)
    ... except StopTraining:
    ...     print('stopped')
    stopped
    """

    def __init__(self, signals=(signal.SIGXCPU, signal.SIGUSR1)):
        self.signals = tuple(signals)
        self._triggered = False
        self._installed = False

    def _install(self):
        if not self._installed:
            for s in self.signals:
                signal.signal(s, self._handler)
            self._installed = True

    def _handler(self, signum, frame):
        print(f'Received signal {signum} -> stop after this step.')
        self._triggered = True

    def pre_step(self, trainer):
        self._install()
        if self._triggered:
            raise StopTraining


class InspectorHook(Hook):
    """Attach-to-running-training inspection (reference cb/hooks.py:56
    ``PyroHook``, which exposes the live trainer through a Pyro remote
    object).  TPU-native replacement without the Pyro dependency:

    - ``SIGUSR2`` dumps all Python thread stacks to stderr
      (``faulthandler``), answering "where is my training stuck?".
    - a Unix-domain socket (``<storage_dir>/inspect.sock`` once the
      trainer is known) accepts one expression per line and replies with
      ``repr(eval(expr, {'trainer': trainer}))`` — e.g.
      ``echo 'trainer.iteration' | socat - UNIX:.../inspect.sock``.

    Read-only by convention; the eval runs in the training process, so
    only use it on machines you own (same trust model as Pyro).
    """

    def __init__(self, enable_socket=True):
        self.enable_socket = enable_socket
        self._server = None
        self._thread = None
        self._trainer = None

    def pre_step(self, trainer):
        if self._trainer is None:
            self._trainer = trainer
            import faulthandler
            faulthandler.register(signal.SIGUSR2, all_threads=True)
            if self.enable_socket:
                self._start_socket(trainer)

    def _start_socket(self, trainer):
        import socket
        import threading
        import os
        path = str(getattr(trainer, 'storage_dir', '.')) + '/inspect.sock'
        try:
            os.unlink(path)
        except OSError:
            pass
        try:
            server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            server.bind(path)
            server.listen(1)
        except OSError:
            return  # no socket support (sandbox) -> stacks-only mode
        self._server = server
        self.socket_path = path

        def serve():
            while True:
                try:
                    conn, _ = server.accept()
                except OSError:
                    return  # closed
                with conn:
                    data = conn.makefile().readline().strip()
                    try:
                        result = repr(eval(  # noqa: S307 - explicit opt-in
                            data, {'trainer': self._trainer}))
                    except Exception as e:
                        result = f'{type(e).__name__}: {e}'
                    try:
                        conn.sendall((result + '\n').encode())
                    except OSError:
                        pass

        self._thread = threading.Thread(target=serve, daemon=True)
        self._thread.start()

    def close(self, trainer):
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass
            self._server = None


#: reference-compatible alias
PyroHook = InspectorHook
