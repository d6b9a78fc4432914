"""Probe: does this Mosaic build lower an int8 x int8 -> int32 jnp.dot
inside a Pallas TPU kernel (the int8-table gather prerequisite)?

Prints one line: PALLAS_INT8 ok/FAIL <detail>.
"""
import sys

import jax

if "--cpu" in sys.argv:  # script-logic sanity only; proves nothing re Mosaic
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def main() -> None:
    a = jnp.asarray(
        np.random.default_rng(0).integers(-4, 5, (256, 512)), jnp.int8
    )
    b = jnp.asarray(
        np.random.default_rng(1).integers(-4, 5, (512, 256)), jnp.int8
    )
    try:
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
            interpret=jax.default_backend() != "tpu",
        )(a, b)
        ref = jnp.dot(
            a.astype(jnp.int32), b.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        ok = bool(jnp.array_equal(out, ref))
        print(f"PALLAS_INT8 {'ok' if ok else 'FAIL mismatch'}")
    except Exception as e:  # noqa: BLE001 — probe reports, never raises
        print(f"PALLAS_INT8 FAIL {type(e).__name__}: {str(e)[:300]}")
        sys.exit(0)


if __name__ == "__main__":
    main()
