"""Profiling & timing utilities.

The reference litters dead ``time.time()`` calls with no readout
(``Multi-style Interpolation/style_network.py:433-457``); this module gives
the framework a real story: ``jax.profiler`` trace capture plus a
chained-dependency timer that works on async dispatch platforms (on the
tunneled TPU used here, ``block_until_ready`` does NOT block — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def enable_compile_cache() -> None:
    """Point JAX at the persistent compilation cache.

    Every CLI entry point calls this first: on remote-compile platforms
    (the tunneled TPU) each process otherwise re-pays minutes of
    compilation for the same graphs on every invocation.  Honors
    ``JAX_COMPILATION_CACHE_DIR``; defaults to ``~/.cache/jax``.
    """
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _force(x):
    """Force execution on platforms where block_until_ready is a no-op:
    reduce to a scalar and pull it to the host."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def time_fn(fn: Callable, *args, iters: int = 10, feedback: bool = True
            ) -> Dict[str, float]:
    """Marginal per-call wall time of a jitted `fn`.

    With `feedback`, the first output is fed back as the first argument to
    chain iterations (defeats device-side overlap); otherwise calls are
    independent and the scalar fetch closes the batch.
    Returns {'per_call_s', 'calls_per_s'} using the 1-vs-N marginal method.
    """
    out = fn(*args)
    _force(out)

    def chain(n):
        t0 = time.perf_counter()
        x = args[0]
        out = None
        for _ in range(n):
            out = fn(x, *args[1:])
            if feedback:
                first = out[0] if isinstance(out, tuple) else out
                if first.shape == x.shape and first.dtype == x.dtype:
                    x = first
        _force(out)
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(3))
    tn = min(chain(iters) for _ in range(3))
    per = max(tn - t1, 1e-9) / max(iters - 1, 1)
    return {"per_call_s": per, "calls_per_s": 1.0 / per}


class PhaseTimer:
    """Named wall-clock phases for pipeline drivers (host-side)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (self.totals.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def report(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))
