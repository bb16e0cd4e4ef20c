"""Part 3: separate loop overhead / DMA wait latency / pipelined DMA.

Variants, all ITERS=500 fori_loop iterations:
  empty    - loop body is a single VMEM scalar store (no DMA)
  sync     - one tiny copy, start+wait in the same iteration
  sync8    - 8 tiny copies, start all then wait all, same iteration
  pipe     - one tiny copy started per iteration, waited NEXT iteration
  vmemcopy - VMEM->VMEM one-row copy via store (no DMA at all)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 1024
SUB = 8
ITERS = 500
ROWS = 64


def build(mode: str):
    def kernel(x_h, o_h, buf, sem):
        if mode == "empty":
            def body(i, _):
                buf[0, 0, :] = jnp.full((W,), i, jnp.float32)
                return _
        elif mode == "vmemcopy":
            def body(i, _):
                buf[1] = buf[0]
                return _
        elif mode == "sync":
            def body(i, _):
                cp = pltpu.make_async_copy(x_h.at[pl.ds(0, 1)],
                                           buf.at[pl.ds(0, 1)], sem.at[0])
                cp.start()
                cp.wait()
                return _
        elif mode == "sync8":
            def body(i, _):
                cps = [pltpu.make_async_copy(
                    x_h.at[pl.ds(k, 1)], buf.at[pl.ds(k, 1)], sem.at[k])
                    for k in range(8)]
                for c in cps:
                    c.start()
                for c in cps:
                    c.wait()
                return _
        elif mode == "pipe":
            def body(i, _):
                sl = i % 2
                cp_prev = pltpu.make_async_copy(
                    x_h.at[pl.ds(0, 1)], buf.at[pl.ds(1 - sl, 1)],
                    sem.at[1 - sl])

                @pl.when(i > 0)
                def _w():
                    cp_prev.wait()
                cp = pltpu.make_async_copy(
                    x_h.at[pl.ds(0, 1)], buf.at[pl.ds(sl, 1)], sem.at[sl])
                cp.start()
                return _

        jax.lax.fori_loop(0, ITERS, body, None, unroll=False)
        if mode == "pipe":
            cp = pltpu.make_async_copy(
                x_h.at[pl.ds(0, 1)], buf.at[pl.ds((ITERS - 1) % 2, 1)],
                sem.at[(ITERS - 1) % 2])
            cp.wait()
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
                        pltpu.SemaphoreType.DMA((8,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(f)


x = jnp.asarray(np.random.rand(ROWS, SUB, W).astype(np.float32))
for mode in ("empty", "vmemcopy", "sync", "sync8", "pipe"):
    f = build(mode)
    o = f(x)
    float(jnp.sum(o))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(x)
        float(jnp.sum(o))
        best = min(best, time.perf_counter() - t0)
    print(f"{mode:9s}: {best/ITERS*1e6:8.3f} us/iter  "
          f"(total {best*1e3:.1f} ms)", flush=True)
print("DONE", flush=True)
