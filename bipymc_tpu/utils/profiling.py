"""Tracing / profiling harness (SURVEY.md §7.1).

The reference has no profiling support; the rebuild provides:

- :func:`time_fn` — honest steady-state timing of jitted callables
  (compile excluded, ``block_until_ready`` enforced, best-of-k);
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
- :func:`named` — decorator adding a ``jax.named_scope`` so sampler
  phases (proposal / likelihood / diagnostics) are labelled in traces.

Used by benchmarks/run_all.py and available to users profiling their own
likelihoods.
"""

import contextlib
import functools
import time

import jax


def time_fn(fn, *args, repeats: int = 3, warmup: int = 1):
    """Steady-state wall-clock of ``fn(*args)``.

    Runs ``warmup`` untimed calls (pays compile + cache), then ``repeats``
    timed calls; returns (best_seconds, last_output). Blocks on the output
    pytree so asynchronous dispatch can't fake speed.
    """
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"): run()`` → TensorBoard trace directory."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named(scope: str):
    """Decorator: wrap a function in ``jax.named_scope(scope)`` so it is
    identifiable in profiler traces and HLO dumps."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kw):
            with jax.named_scope(scope):
                return fn(*args, **kw)
        return wrapped
    return deco
