"""Debug utilities: NaN/Inf guards for the covariance-heavy inference path.

SURVEY.md §5.2: the reference has nothing to sanitize (single-threaded TF);
the rebuild's risk surface is numerical — covariance inverses, log-variance
exps, precision sums. `checked_detect` wraps a detect fn with
jax.experimental.checkify so a NaN/Inf anywhere in the graph surfaces as a
structured error with a location, instead of silently propagating into
detection outputs. Debug tool — the checks cost throughput; don't wrap the
serving path.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked_detect(detect_fn: Callable) -> Callable:
    """Wrap a detect fn; the wrapper raises on any NaN/Inf/OOB in the graph.

    Usage:
        detect = build_detect_fn(cfg, model)
        safe = checked_detect(detect)
        out = safe(variables, images, rng)   # throws on numerical errors
    """
    checked = checkify.checkify(
        detect_fn, errors=checkify.float_checks | checkify.index_checks
    )
    jitted = jax.jit(checked)

    def wrapper(*args, **kwargs):
        err, out = jitted(*args, **kwargs)
        err.throw()
        return out

    return wrapper
