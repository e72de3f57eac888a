"""Compile watchdog — failure detection for stalled device backends.

SURVEY.md §5.3 lists failure detection as a gap in the reference (long
trainings babysat manually).  On network-attached TPU runtimes a
process's first compilation can stall indefinitely in the transport
(observed repeatedly in this environment); empirically, any activity
from a *second* client flushes the stuck request within seconds.

:class:`CompileWatchdog` runs a daemon timer: while armed, if no
progress is reported within ``interval`` seconds it launches a tiny
detached jax subprocess as a "poke".  Wrap the first device work of a
long job::

    with compile_watchdog(interval=120):
        variables = jax.jit(model.init)(...)   # the wedge-prone call

Progress marks (``wd.alive()``) or leaving the context disarm it.
"""

import contextlib
import subprocess
import sys
import threading
import time
from typing import List, Optional

_POKE_SRC = ("import jax, jax.numpy as jnp; "
             "jax.jit(lambda a: a + 1)(jnp.ones((8, 8)))"
             ".block_until_ready()")


class CompileWatchdog:
    def __init__(self, interval: float = 120.0, max_pokes: int = 5,
                 poke_argv: Optional[List[str]] = None):
        self.interval = interval
        self.max_pokes = max_pokes
        self.poke_argv = poke_argv or [sys.executable, "-c", _POKE_SRC]
        self.pokes = 0
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def alive(self) -> None:
        """Report progress; resets the stall timer."""
        self._last = time.monotonic()

    def _run(self) -> None:
        while not self._stop.wait(min(self.interval / 4, 10.0)):
            if self.pokes >= self.max_pokes:
                return
            if time.monotonic() - self._last >= self.interval:
                try:
                    subprocess.Popen(self.poke_argv,
                                     stdout=subprocess.DEVNULL,
                                     stderr=subprocess.DEVNULL)
                except OSError:
                    return
                self.pokes += 1
                self._last = time.monotonic()

    def start(self) -> "CompileWatchdog":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)


@contextlib.contextmanager
def compile_watchdog(interval: float = 120.0, max_pokes: int = 5,
                     poke_argv: Optional[List[str]] = None):
    wd = CompileWatchdog(interval, max_pokes, poke_argv).start()
    try:
        yield wd
    finally:
        wd.stop()
