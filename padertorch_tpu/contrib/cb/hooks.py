"""Extra hooks. Reference parity: ``padertorch/contrib/cb/hooks.py``."""
import resource
import signal

from padertorch_tpu.train.hooks import Hook
from padertorch_tpu.train.hooks import StopTraining

__all__ = ['CPUTimeLimitExceededHook', 'WallClockLimitHook']


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
