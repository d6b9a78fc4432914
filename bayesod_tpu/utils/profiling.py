"""Profiling + timing harness (SURVEY.md §5.1 rebuild).

The reference's only observability is TensorBoard scalars; the rebuild adds:

  * `trace(...)`: context manager wrapping `jax.profiler` — produces a
    TensorBoard-profile-compatible trace directory for MXU/HBM analysis.
  * `Timer`: robust step timer for this environment. NOTE on the TPU tunnel
    used here: `block_until_ready` on large device-resident outputs can
    return before execution completes (remote PJRT), so trustworthy numbers
    come from functions whose outputs are small (scalars) or from fetching a
    scalar reduction of the output — `timed_steady_state` does the latter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_steady_state(
    fn: Callable,
    make_args: Callable[[int], tuple],
    iters: int = 10,
    warmup: int = 2,
) -> Dict[str, float]:
    """Median steady-state latency of `fn(*make_args(i))`.

    Appends a scalar-sum fetch per iteration so remote-PJRT backends cannot
    overlap or elide timed executions.
    """

    def fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        if not leaves:
            return
        np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))

    for i in range(warmup):
        fetch(fn(*make_args(i)))
    ts = []
    for i in range(iters):
        t0 = time.time()
        fetch(fn(*make_args(warmup + i)))
        ts.append(time.time() - t0)
    return {
        "p50_s": float(np.percentile(ts, 50)),
        "p90_s": float(np.percentile(ts, 90)),
        "mean_s": float(np.mean(ts)),
    }
