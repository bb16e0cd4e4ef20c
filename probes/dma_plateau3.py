"""DMA plateau probe v3 — amortized INSIDE one dispatch (VERDICT r4 #3).

v2 lesson: the axon tunnel costs ~6-8 ms of dead time per jit dispatch
(even plain XLA x*c measured 218 GB/s per-call vs 676 GB/s in a scan).
Everything here therefore loops inside ONE compiled program:
  - XLA baseline: lax.scan of x * c, 32 steps.
  - pallas rings: one pallas_call whose fori_loop wraps its DMA offsets
    modulo the buffer size, so a 0.27 GB buffer carries ~17 GB of traffic.

Questions this answers:
  1. does read-only alone reach XLA's ~676 GB/s? (if yes, the 335
     plateau = no read/write overlap)
  2. do separate-direction streams overlap when both are in flight?
  3. does copy size / slot count move the plateau?

Run from the repo root, ONE TPU job at a time:
    python -c "exec(open('probes/dma_plateau3.py').read())"
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 1024              # lanes
SUB = 8               # sublanes
NROWS = 8192          # buffer rows: 0.27 GB per array
CALLS = 3


def build(rows: int, iters: int, nslots: int, mode: str):
    """One kernel call streams `iters` blocks of (rows, SUB, W) f32,
    wrapping offsets over the NROWS-row HBM arrays."""
    NB = NROWS // rows   # distinct block positions

    def kernel(x_h, o_h, buf, rsem, wsem):
        def start_read(i):
            s = i % nslots
            pltpu.make_async_copy(
                x_h.at[pl.ds((i % NB) * rows, rows)], buf.at[s],
                rsem.at[s]).start()

        def start_write(i):
            s = i % nslots
            pltpu.make_async_copy(
                buf.at[s], o_h.at[pl.ds((i % NB) * rows, rows)],
                wsem.at[s]).start()

        if mode in ("r", "rw"):
            for i in range(min(nslots, iters)):
                start_read(i)

        def body(i, _):
            s = i % nslots
            if mode in ("r", "rw"):
                pltpu.make_async_copy(
                    x_h.at[pl.ds((i % NB) * rows, rows)], buf.at[s],
                    rsem.at[s]).wait()
            if mode in ("rw", "w"):
                @pl.when(i >= nslots)
                def _():
                    pltpu.make_async_copy(
                        buf.at[s], o_h.at[pl.ds((i % NB) * rows, rows)],
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
                    buf.at[s], o_h.at[pl.ds((i % NB) * rows, rows)],
                    wsem.at[s]).wait()
        pltpu.make_async_copy(buf.at[0, pl.ds(0, 1)],
                              o_h.at[pl.ds(NROWS, 1)], rsem.at[0]).start()
        pltpu.make_async_copy(buf.at[0, pl.ds(0, 1)],
                              o_h.at[pl.ds(NROWS, 1)], rsem.at[0]).wait()

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NROWS + 1, SUB, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((nslots, rows, SUB, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((nslots,)),
                        pltpu.SemaphoreType.DMA((nslots,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(f)


x = jnp.asarray(np.random.rand(NROWS + 1, SUB, W).astype(np.float32))

# --- XLA baseline: 32-step scan of x*c, ONE dispatch -------------------
SC_STEPS = 32


@jax.jit
def xla_scan(x0):
    def step(c, _):
        return c * jnp.float32(1.0000001), ()
    y, _ = jax.lax.scan(step, x0, None, length=SC_STEPS)
    return y


o = xla_scan(x)
float(jnp.sum(o[-1, 0, :8]))
t0 = time.perf_counter()
for _ in range(CALLS):
    o = xla_scan(x)
float(jnp.sum(o[-1, 0, :8]))
dt = (time.perf_counter() - t0) / CALLS
nbytes = (NROWS + 1) * SUB * W * 4
print(f"XLA x*c scan({SC_STEPS}): "
      f"{2 * nbytes * SC_STEPS / dt / 1e9:7.1f} GB/s agg ({dt*1e3:6.2f} ms)",
      flush=True)

# --- pallas rings, ~17 GB of traffic per call ---------------------------
TARGET_GB = 17.0
for mode in ("r", "w", "rw"):
    for rows in (16, 64, 256, 1024):
        mb = rows * SUB * W * 4 / 1e6
        iters = max(int(TARGET_GB * 1e9 / (rows * SUB * W * 4)), 8)
        for nslots in (2, 4, 8):
            if rows * nslots * SUB * W * 4 > 17e6:
                continue
            try:
                f = build(rows, iters, nslots, mode)
                o = f(x)
                float(jnp.sum(o[-1, 0, :8]))
                t0 = time.perf_counter()
                for _ in range(CALLS):
                    o = f(x)
                float(jnp.sum(o[-1, 0, :8]))
                dt = (time.perf_counter() - t0) / CALLS
                dirs = 2 if mode == "rw" else 1
                bw = dirs * rows * SUB * W * 4 * iters / dt / 1e9
                print(f"mode={mode:2s} {mb:5.1f} MB/copy slots={nslots} "
                      f"iters={iters}: {bw:7.1f} GB/s agg "
                      f"({dt*1e3:7.2f} ms)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"mode={mode} rows={rows} slots={nslots}: FAILED "
                      f"{type(e).__name__} {str(e)[:160]}", flush=True)
print("DONE", flush=True)
