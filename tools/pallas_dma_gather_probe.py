"""Probe: can this Mosaic build do a DYNAMIC-OFFSET row gather — per-row
DMA from an HBM-resident table into VMEM at runtime-computed indices?

Context (VERDICT r4 item 3): the candidate kernels' one-hot-matmul gather
costs K9 x R x C MACs (~24 GFLOP/img/kernel) because it streams the WHOLE
row table past the MXU. A working dynamic-offset DMA gather would cost
K9 x C BYTES instead (~3 orders less traffic) and erase most of the
finals segment's 22%-of-floor gap. Round-1 notes say `dynamic_slice` has
no Mosaic lowering in this build — this probes the DMA path
(`make_async_copy` with a scalar-prefetch index), which lowers through
DMA descriptors, not vector dynamic_slice.

Variants probed independently (each reports ok/FAIL):
  dsload  — pl.ds dynamic row load from a VMEM ref (the known-suspect path)
  dma     — per-row make_async_copy HBM->VMEM at idx_ref[i] offsets
  dma2    — same with 2-deep double buffering (the production shape)

Run on TPU for the real verdict; --cpu exercises interpret mode only
(script sanity, proves nothing about Mosaic).
"""

from __future__ import annotations

import functools
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, K = 8192, 256, 512
INTERP = None  # set in main


def _ref_gather(table, idx):
    return table[idx]


# --------------------------------------------------------------- dsload ----
def _dsload_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        r = idx_ref[i]
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def probe_dsload(table, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    # VMEM-resident table variant: table block fully in VMEM (8192x256 bf16
    # = 4 MB — fits), dynamic row load + store.
    grid_spec_vmem = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _dsload_kernel,
        out_shape=jax.ShapeDtypeStruct((K, C), table.dtype),
        grid_spec=grid_spec_vmem,
        interpret=INTERP,
    )(idx, table)


# ------------------------------------------------------------------ dma ----
def _dma_kernel(idx_ref, table_ref, out_ref, sem):
    def body(i, _):
        r = idx_ref[i]
        dma = pltpu.make_async_copy(
            table_ref.at[pl.ds(r, 1), :], out_ref.at[pl.ds(i, 1), :], sem
        )
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def probe_dma(table, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _dma_kernel,
        out_shape=jax.ShapeDtypeStruct((K, C), table.dtype),
        grid_spec=grid_spec,
        interpret=INTERP,
    )(idx, table)


# ----------------------------------------------------------------- dma2 ----
def _dma2_kernel(idx_ref, table_ref, out_ref, scratch, sems):
    """2-deep pipelined row DMA: start row i+1's copy before waiting on i."""

    def start(slot, i):
        r = idx_ref[i]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(r, 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).start()

    def wait_and_emit(slot, i):
        r = idx_ref[i]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(r, 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).wait()
        out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

    start(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < K)
        def _():
            start(nxt, i + 1)

        wait_and_emit(slot, i)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def probe_dma2(table, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _dma2_kernel,
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=INTERP,
    )(idx, table)


def main() -> None:
    global INTERP
    INTERP = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, R, (K,)), jnp.int32)
    want = np.asarray(_ref_gather(table, idx))

    # CAUTION (measured 2026-08-21): running all three variants in one
    # process WEDGED the axon tunnel claim for >20 min (kill -> stale
    # claim; suspect = dsload's dynamic VMEM indexing hanging the core).
    # Select ONE variant per process: --variant dma|dma2|dsload.
    wanted = None
    for a in sys.argv[1:]:
        if a.startswith("--variant="):
            wanted = a.split("=", 1)[1]
    variants = (
        ("dsload", probe_dsload),
        ("dma", probe_dma),
        ("dma2", probe_dma2),
    )
    if wanted:
        variants = tuple(v for v in variants if v[0] == wanted)
    for name, fn in variants:
        try:
            t0 = time.time()
            got = np.asarray(fn(table, idx))
            dt = time.time() - t0
            ok = np.array_equal(got, want)
            print(f"DMA_GATHER {name} {'ok' if ok else 'FAIL mismatch'} "
                  f"first_call {dt*1e3:.1f}ms")
            if ok and not INTERP:
                # Rough steady-state timing: 20 chained calls.
                f = jax.jit(lambda t, ix: fn(t, ix))
                np.asarray(f(table, idx))
                t0 = time.time()
                for _ in range(20):
                    out = f(table, idx)
                np.asarray(out)
                print(f"DMA_GATHER {name} ~{(time.time()-t0)/20*1e3:.2f} "
                      f"ms/call (K={K}, C={C}, incl ~RTT)")
        except Exception as e:  # noqa: BLE001 — probe reports, never raises
            print(f"DMA_GATHER {name} FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
