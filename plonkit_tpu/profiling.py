"""Lightweight tracing/profiling (SURVEY §5.1: the reference has only a
setup-time extrapolator, src/plonk.rs:36-45; the TPU build gets real
per-stage timing from day one).

- `stage(name)`: context manager logging wall time per prover stage at
  INFO, accumulated in the module-level `last_timings` dict.
- PLONKIT_TPU_TRACE=<dir>: wraps the stage in a jax.profiler trace so the
  XLA op-level timeline can be inspected with tensorboard/xprof.
"""

import logging
import os
import time
from contextlib import contextmanager

log = logging.getLogger("plonkit_tpu")

last_timings = {}


@contextmanager
def stage(name: str):
    trace_dir = os.environ.get("PLONKIT_TPU_TRACE")
    tracer = None
    if trace_dir:
        import jax
        tracer = jax.profiler.trace(os.path.join(trace_dir, name.replace(" ", "_")))
        tracer.__enter__()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        last_timings[name] = dt
        log.info("[stage] %-28s %8.2fs", name, dt)
        if tracer is not None:
            tracer.__exit__(None, None, None)


def reset():
    last_timings.clear()
