"""Tracing / profiling helpers.

The reference's observability is wall-clock timers printed at stage ends
(Timer/TimerArray/TIMING, src/utility/timer.h:12-70).  utils/timer.py
covers that; this module adds the TPU-native layer promised in
SURVEY.md §5.1: JAX profiler traces (viewable in TensorBoard /
Perfetto) and synchronized device-time measurement.

Notes for this environment: ``jax.block_until_ready`` does not block on
the axon platform, so ``device_time`` synchronizes with a scalar host
fetch of a reduced value instead.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def maybe_trace(trace_dir):
    """Wrap a block in ``jax.profiler.trace(trace_dir)`` when a
    directory is given, else no-op.  Usage:

        with maybe_trace("/tmp/trace"):
            pipeline()
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield
    print(f"[profile] trace written to {trace_dir}", flush=True)


def _sync(x):
    """Block until ``x`` is computed (axon-safe: scalar host fetch)."""
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    for l in leaves[-1:]:
        np.asarray(jax.numpy.ravel(l)[:1])


def device_time(fn, *args, warmup: int = 1, iters: int = 10, **kw):
    """Median wall time of ``fn(*args, **kw)`` with a device sync per
    call.  Returns (median_seconds, last_result)."""
    out = None
    for _ in range(max(warmup, 0)):
        out = fn(*args, **kw)
        _sync(out)
    times = []
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


@contextlib.contextmanager
def annotate(name: str):
    """Named profiler span (shows up in the JAX trace viewer)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def install_dispatch_counter():
    """Count device dispatches (jit-function invocations) and host
    fetches (jax.device_get) — the tunnel environment bills ~13 ms per
    round-trip, so the e2e wall at small scenes is ~13 ms x this count
    (docs/benchmark.md "image-pipeline e2e").

    MUST be called before importing any xrsfm_tpu compute module: the
    package jits at import time via the module-level ``jax.jit``
    attribute, which this function replaces with a counting wrapper.
    Eager jnp ops are not counted (package convention keeps host math in
    numpy, CLAUDE.md).  Returns the live counter dict
    {"jit_calls": int, "fetches": int, "by_name": {fn: count}}.
    """
    import functools

    import jax

    state = {"jit_calls": 0, "fetches": 0, "by_name": {}}
    orig_jit = jax.jit

    def counting_jit(fun=None, **kw):
        if fun is None:
            return functools.partial(counting_jit, **kw)
        g = orig_jit(fun, **kw)
        name = getattr(fun, "__name__", str(fun))

        @functools.wraps(fun)
        def wrapper(*a, **k):
            state["jit_calls"] += 1
            state["by_name"][name] = state["by_name"].get(name, 0) + 1
            return g(*a, **k)

        for attr in ("lower", "trace", "eval_shape", "clear_cache"):
            if hasattr(g, attr):
                setattr(wrapper, attr, getattr(g, attr))
        return wrapper

    jax.jit = counting_jit
    orig_get = jax.device_get

    def counting_get(x):
        state["fetches"] += 1
        return orig_get(x)

    jax.device_get = counting_get
    return state
