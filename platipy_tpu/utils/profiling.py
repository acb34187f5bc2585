"""Tracing / profiling utilities.

The reference exposes only opt-in per-iteration metric printing through ITK
observer callbacks (reference registration/utils.py:22-41, linear.py:232-236,
deformable.py:260-264) and Celery task timing (tasks.py:252-254).  Here the
equivalents are:

* :func:`trace` — a context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XLA trace of everything dispatched inside it;
* :class:`StageTimer` — wall-clock stage timing with explicit device
  synchronisation (on remote backends ``block_until_ready`` may not actually
  block, so a scalar reduction is fetched instead);
* :func:`log_iteration` — the ``registration_command_iteration`` analogue for
  verbose registration runs.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)

__all__ = ["trace", "StageTimer", "log_iteration"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    View with TensorBoard (``tensorboard --logdir <log_dir>``) or Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(value) -> None:
    """Force execution of pending device work feeding ``value``.

    Fetches a scalar reduction rather than relying on ``block_until_ready``
    (a no-op on some tunnelled backends) or ``np.asarray`` (pulls whole
    volumes through the device link).
    """
    import jax.numpy as jnp

    if hasattr(value, "array"):
        value = value.array
    if hasattr(value, "dtype"):
        float(jnp.sum(value.astype(jnp.float32)))


class StageTimer:
    """Accumulate wall-clock per pipeline stage.

    >>> timer = StageTimer()
    >>> with timer.stage("demons", sync=dvf_stack):
    ...     ...
    >>> timer.report()
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self._created = time.time()
        self._last_lap: Optional[float] = None

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        holder = {}
        try:
            yield holder
        finally:
            target = holder.get("sync", sync)
            if target is not None:
                _sync(target)
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def lap(self, name: str, sync=None):
        """Record the time since the previous lap (or construction) as
        ``name``, synchronising on ``sync`` first.  Lets a pipeline insert
        one-line stage marks without re-indenting blocks."""
        if sync is not None:
            _sync(sync)
        now = time.time()
        last = getattr(self, "_last_lap", None)
        if last is None:
            last = getattr(self, "_created", now)
        self.times[name] = self.times.get(name, 0.0) + now - last
        self._last_lap = now

    def report(self, log=True) -> Dict[str, float]:
        for name, secs in sorted(self.times.items(), key=lambda kv: -kv[1]):
            if log:
                logger.info("stage %-24s %8.2f s", name, secs)
        return dict(self.times)


def log_iteration(iteration: int, metric_value: float,
                  params: Optional[list] = None) -> None:
    """Verbose per-iteration line, mirroring the reference's
    ``registration_command_iteration`` / ``deformable_registration_command_iteration``
    (reference registration/utils.py:22-41)."""
    if params is not None:
        logger.info("%3d = %10.5f : %s", iteration, metric_value,
                    [round(float(p), 4) for p in params])
    else:
        logger.info("%3d = %10.5f", iteration, metric_value)
