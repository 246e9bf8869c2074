"""Device timing utilities that survive broken `block_until_ready`.

On the tunneled TPU backend used in this environment, `block_until_ready`
returns before execution finishes and bulk host readback is extremely slow
(~100 s for 4 MB), but *scalar* readback is fast (~50 ms). So benchmarks sync
by reducing the output to a scalar on device and reading that back, and use a
two-point (N1, N2 iteration) slope to cancel fixed dispatch/readback costs.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def make_sync(example_out) -> Callable:
    """A jitted device→scalar reducer matched to `example_out`'s pytree."""
    @jax.jit
    def reduce_all(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    # compile now
    float(reduce_all(example_out))
    return lambda out: float(reduce_all(out))


def bench_fn(fn: Callable, args, n1: int = 5, n2: int = 25,
             warmup: int = 3) -> float:
    """Seconds per invocation of `fn(*args)` via two-point slope timing.

    `fn` must be jitted and dispatch asynchronously; iterations are chained
    through a dependency on the previous output where possible (same-args
    re-dispatch otherwise — safe because XLA executions serialize per device).
    """
    out = fn(*args)
    sync = make_sync(out)
    for _ in range(warmup):
        sync(fn(*args))

    def run(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def bench_fn_device_loop(fn: Callable, args, n1: int = 4,
                         n2: int = 16) -> float:
    """Seconds per invocation, measured entirely on-device.

    Wraps `fn` in a `lax.fori_loop` whose body feeds a scalar function of the
    output back into the first argument, so consecutive invocations are
    data-dependent and cannot be elided, reordered, or deduplicated by the
    runtime. The loop count is a traced scalar — one compile, two loop sizes,
    two-point slope. This sidesteps both broken `block_until_ready` and any
    same-dispatch caching in tunneled backends.

    The first arg of `fn` must be a float array whose values may be perturbed
    by +0.0·f(output) (true for image inputs).
    """
    first, rest = args[0], tuple(args[1:])

    @jax.jit
    def loop(n, first):
        def body(_, x):
            out = fn(x, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return x + (0.0 * s).astype(x.dtype)
        return jnp.sum(jax.lax.fori_loop(0, n, body, first))

    float(loop(1, first))  # compile + warm

    def run(n: int) -> float:
        t0 = time.perf_counter()
        float(loop(n, first))
        return time.perf_counter() - t0

    t1 = min(run(n1) for _ in (0, 1))
    t2 = min(run(n2) for _ in (0, 1))
    return max((t2 - t1) / (n2 - n1), 1e-9)
