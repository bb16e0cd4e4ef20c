"""Part 2: isolate per-copy DMA issue cost with TINY copies.

K copies of one (8, 1024) f32 row (32 KB) per loop iteration: bytes are
negligible (32 KB ~ 40 ns at HBM rate), so time/iter vs K slope = the
scalar-core issue+wait cost per async copy.  Also: the same total bytes
via one fat copy, as the zero-issue baseline.
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


def build(K: int, fat: bool):
    def kernel(x_h, o_h, buf, sem):
        def body(i, _):
            if fat:
                cps = [pltpu.make_async_copy(
                    x_h.at[pl.ds(0, K)], buf.at[pl.ds(0, K)], sem.at[0])]
            else:
                cps = [pltpu.make_async_copy(
                    x_h.at[pl.ds(k, 1)], buf.at[pl.ds(k, 1)],
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
res = {}
for fat in (False, True):
    for K in (1, 2, 4, 8, 16, 32):
        f = build(K, fat)
        o = f(x)
        float(jnp.sum(o))
        t0 = time.perf_counter()
        o = f(x)
        float(jnp.sum(o))
        dt = time.perf_counter() - t0
        per_it = dt / ITERS * 1e6
        res[(fat, K)] = per_it
        print(f"fat={int(fat)} K={K:3d}: {per_it:8.3f} us/iter", flush=True)
slope = (res[(False, 32)] - res[(False, 1)]) / 31
print(f"per-copy issue cost ~ {slope*1000:.0f} ns", flush=True)
print("DONE", flush=True)
