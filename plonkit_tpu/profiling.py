"""Lightweight tracing/profiling (SURVEY §5.1: the reference has only a
setup-time extrapolator, src/plonk.rs:36-45; the TPU build gets real
per-stage timing from day one).

- `stage(name)`: context manager logging wall time per prover stage at
  INFO, accumulated in the module-level `last_timings` dict.  Stage exit
  DRAINS the device queue (a tiny jitted op + block_until_ready) so the
  table attributes JAX's async dispatch truthfully — without the sync, a
  stage that merely enqueues work reports ~0 s and the cost surfaces at
  whatever stage synchronizes next.  Set PLONKIT_TPU_SYNC_STAGES=0 to
  skip the sync (max-overlap production mode; timings become dispatch
  times only).
- PLONKIT_TPU_TRACE=<dir>: wraps the stage in a jax.profiler trace so the
  XLA op-level timeline can be inspected with tensorboard/xprof.
"""

import logging
import os
import time
from contextlib import contextmanager
from functools import lru_cache

log = logging.getLogger("plonkit_tpu")

last_timings = {}

_SYNC = os.environ.get("PLONKIT_TPU_SYNC_STAGES", "1") != "0"


_sync_state = {"fn": None, "dead": False}


def sync_device():
    """Drain the device execution queue (in-order execution: blocking on a
    freshly enqueued trivial program waits for everything queued before).
    No-op when jax was never imported (pure host backend) or when no device
    backend can initialize (host-only subprocesses)."""
    import sys
    if _sync_state["dead"] or "jax" not in sys.modules:
        return
    try:
        if _sync_state["fn"] is None:
            import jax
            _sync_state["fn"] = jax.jit(lambda x: x + 1)
        import jax
        jax.block_until_ready(_sync_state["fn"](0))
    except Exception:  # profiling support must never break proving
        _sync_state["dead"] = True


@contextmanager
def stage(name: str, sync: bool = None):
    trace_dir = os.environ.get("PLONKIT_TPU_TRACE")
    tracer = None
    if trace_dir:
        import jax
        tracer = jax.profiler.trace(os.path.join(trace_dir, name.replace(" ", "_")))
        tracer.__enter__()
    do_sync = _SYNC if sync is None else sync
    if do_sync:
        sync_device()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if do_sync:
            sync_device()
        dt = time.perf_counter() - t0
        last_timings[name] = last_timings.get(name, 0.0) + dt
        log.info("[stage] %-28s %8.2fs", name, dt)
        if tracer is not None:
            tracer.__exit__(None, None, None)


def reset():
    last_timings.clear()
