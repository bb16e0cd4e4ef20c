"""Part 4: ITERS sweep - slope = true per-iteration cost, intercept =
per-dispatch overhead (tunnel + launch + readback).  Modes as part 3.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 1024
SUB = 8
ROWS = 64


def build(mode: str, iters: int):
    def kernel(x_h, o_h, buf, sem):
        if mode == "empty":
            def body(i, _):
                buf[0, 0, :] = jnp.full((W,), i, jnp.float32)
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
        elif mode == "fat8":     # one 8-row copy (same bytes as sync8)
            def body(i, _):
                cp = pltpu.make_async_copy(x_h.at[pl.ds(0, 8)],
                                           buf.at[pl.ds(0, 8)], sem.at[0])
                cp.start()
                cp.wait()
                return _

        jax.lax.fori_loop(0, iters, body, None, unroll=False)
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
I0, I1 = 1000, 9000
for mode in ("empty", "sync", "sync8", "fat8"):
    ts = {}
    for iters in (I0, I1):
        f = build(mode, iters)
        o = f(x)
        float(jnp.sum(o))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(x)
            float(jnp.sum(o))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    slope = (ts[I1] - ts[I0]) / (I1 - I0) * 1e6
    icept = ts[I0] - slope * 1e-6 * I0
    print(f"{mode:6s}: {slope:8.3f} us/iter true, dispatch {icept*1e3:6.1f}"
          f" ms  (t{I0}={ts[I0]*1e3:.1f}ms t{I1}={ts[I1]*1e3:.1f}ms)",
          flush=True)
print("DONE", flush=True)
