"""DMA plateau probe v2 (VERDICT r4 item 3) — amortized version.

v1 (dma_plateau.py) was dispatch-bound: every config measured ~8-12 ms
regardless of bytes moved (64 iterations x ~125 us fixed floor per call
over the axon tunnel).  v2 moves ~1-2 GB per pallas_call so execution
dominates, and adds the XLA streaming baseline (y = x*c) on the same
buffer sizes for a same-day apples-to-apples number.

Key hypothesis: XLA streaming measures ~676 GB/s AGGREGATE while the
pallas rings plateau at ~335 = 676/2, i.e. pallas read and write DMA
streams never overlap (each direction runs at the full single-direction
rate, serially).  mode=r vs mode=w vs mode=rw separates that.

Run from the repo root, ONE TPU job at a time:
    python -c "exec(open('probes/dma_plateau2.py').read())"
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 1024              # lanes
SUB = 8               # sublanes
CALLS = 6


def build(rows: int, iters: int, nslots: int, mode: str):
    """One kernel call streams `iters` blocks of (rows, SUB, W) f32."""
    def kernel(x_h, o_h, buf, rsem, wsem):
        def start_read(i):
            s = i % nslots
            pltpu.make_async_copy(
                x_h.at[pl.ds(i * rows, rows)], buf.at[s], rsem.at[s]).start()

        def start_write(i):
            s = i % nslots
            pltpu.make_async_copy(
                buf.at[s], o_h.at[pl.ds(i * rows, rows)], wsem.at[s]).start()

        if mode in ("r", "rw"):
            for i in range(min(nslots, iters)):
                start_read(i)

        def body(i, _):
            s = i % nslots
            if mode in ("r", "rw"):
                pltpu.make_async_copy(
                    x_h.at[pl.ds(i * rows, rows)], buf.at[s],
                    rsem.at[s]).wait()
            if mode in ("rw", "w"):
                @pl.when(i >= nslots)
                def _():
                    pltpu.make_async_copy(
                        buf.at[s], o_h.at[pl.ds(i * rows, rows)],
                        wsem.at[s]).wait()
                start_write(i)
            if mode in ("r", "rw"):
                nxt = i + nslots

                @pl.when(nxt < iters)
                def _():
                    start_read(nxt)
            return _

        jax.lax.fori_loop(0, iters, body, None, unroll=False)
        if mode in ("w", "rw"):
            for i in range(max(iters - nslots, 0), iters):
                s = i % nslots
                pltpu.make_async_copy(
                    buf.at[s], o_h.at[pl.ds(i * rows, rows)],
                    wsem.at[s]).wait()
        # tiny dependent output so timing forces real completion
        pltpu.make_async_copy(buf.at[0, pl.ds(0, 1)],
                              o_h.at[pl.ds(iters * rows, 1)],
                              rsem.at[0]).start()
        pltpu.make_async_copy(buf.at[0, pl.ds(0, 1)],
                              o_h.at[pl.ds(iters * rows, 1)],
                              rsem.at[0]).wait()

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((iters * rows + 1, SUB, W),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((nslots, rows, SUB, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((nslots,)),
                        pltpu.SemaphoreType.DMA((nslots,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(f)


def timed(f, x, dirs, nbytes):
    o = f(x)
    float(jnp.sum(o[-1, 0, :8]))        # warm + sync
    t0 = time.perf_counter()
    for _ in range(CALLS):
        o = f(x)
    float(jnp.sum(o[-1, 0, :8]))
    dt = (time.perf_counter() - t0) / CALLS
    return dirs * nbytes / dt / 1e9, dt


print("aggregate GB/s counts each direction; ~1-2 GB moved per call",
      flush=True)

# --- XLA streaming baseline on the same shape -------------------------
ROWS_TOT = 32768
x = jnp.asarray(np.random.rand(ROWS_TOT + 1, SUB, W).astype(np.float32))
nbytes = ROWS_TOT * SUB * W * 4


@jax.jit
def xla_stream(x):
    return x * jnp.float32(1.0000001)


o = xla_stream(x)
float(jnp.sum(o[-1, 0, :8]))
t0 = time.perf_counter()
for _ in range(CALLS):
    o = xla_stream(x)
float(jnp.sum(o[-1, 0, :8]))
dt = (time.perf_counter() - t0) / CALLS
print(f"XLA x*c stream: {2 * (nbytes + SUB * W * 4) / dt / 1e9:7.1f} GB/s "
      f"agg ({dt*1e3:6.2f} ms)", flush=True)

# --- pallas rings ------------------------------------------------------
for mode in ("r", "w", "rw"):
    for rows, iters in ((64, 512), (256, 128), (512, 64)):
        mb = rows * SUB * W * 4 / 1e6
        for nslots in (2, 4):
            if rows * nslots * SUB * W * 4 > 17e6:   # scoped-vmem cap
                continue
            try:
                f = build(rows, iters, nslots, mode)
                dirs = 2 if mode == "rw" else 1
                bw, dt = timed(f, x[: iters * rows + 1], dirs,
                               rows * SUB * W * 4 * iters)
                print(f"mode={mode:2s} {mb:5.1f} MB/copy slots={nslots}: "
                      f"{bw:7.1f} GB/s agg ({dt*1e3:6.2f} ms)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"mode={mode} rows={rows} slots={nslots}: FAILED "
                      f"{type(e).__name__} {str(e)[:160]}", flush=True)
print("DONE", flush=True)
