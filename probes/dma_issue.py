"""Measure the per-DMA issue cost of Mosaic async copies on the chip.

Hypothesis (round-4): the pair kernel's ~18-25 us per-stage-tile fixed
cost is scalar-core DMA issue/wait overhead (~40 make_async_copy
start/wait pairs per visit).  This probe copies the SAME total bytes per
loop iteration split over K separate async copies, K in {1,2,4,8,16,32}:
the slope of time vs K is the per-copy issue cost.

Run from the repo root, ONE TPU job at a time:
    python -c "exec(open('probes/dma_issue.py').read())"
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512            # rows per loop iteration (total bytes constant)
W = 1024              # lanes
SUB = 8               # sublanes per row
ITERS = 200           # kernel loop iterations
BYTES_IT = ROWS * SUB * W * 4


def build(K: int, rows_per_copy: int):
    def kernel(x_h, o_h, buf, sem):
        def body(i, _):
            cps = [pltpu.make_async_copy(
                x_h.at[pl.ds(k * rows_per_copy, rows_per_copy)],
                buf.at[pl.ds(k * rows_per_copy, rows_per_copy)],
                sem.at[k]) for k in range(K)]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
            return _

        jax.lax.fori_loop(0, ITERS, body, None, unroll=False)
        cp = pltpu.make_async_copy(buf.at[pl.ds(0, 1)], o_h.at[pl.ds(0, 1)],
                                   sem.at[0])
        cp.start()
        cp.wait()

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, SUB, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((ROWS, SUB, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((max(K, 1),))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(f)


x = jnp.asarray(np.random.rand(ROWS, SUB, W).astype(np.float32))
print(f"bytes/iter {BYTES_IT/1e6:.1f} MB, iters {ITERS}", flush=True)
for K in (1, 2, 4, 8, 16, 32):
    rpc = ROWS // K
    f = build(K, rpc)
    o = f(x)
    float(jnp.sum(o))          # real sync over the tunnel
    t0 = time.perf_counter()
    o = f(x)
    float(jnp.sum(o))
    dt = time.perf_counter() - t0
    per_it = dt / ITERS * 1e6
    bw = BYTES_IT * ITERS / dt / 1e9
    print(f"K={K:3d} copies/iter ({rpc} rows each): {per_it:8.2f} us/iter, "
          f"{bw:7.1f} GB/s", flush=True)
print("DONE", flush=True)
