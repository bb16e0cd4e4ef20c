"""Explain the ~335 GB/s aggregate Pallas DMA plateau (VERDICT r4 item 3).

Round-2 probes found manual Mosaic DMA rings cap at ~335 GB/s AGGREGATE
(read+write) regardless of slot count, while a plain XLA streaming scan
(y = x*c) measures ~676 GB/s aggregate on the same chip (v5e peak 819).
This probe separates the axes the earlier sweeps never isolated:

  1. direction      — read-only (HBM->VMEM), write-only (VMEM->HBM), both
  2. copy size      — 0.5/2/8/32 MB per DMA
  3. outstanding    — 1/2/4 copies in flight (ring of VMEM slots)
  4. concurrent VPU — does arithmetic on resident data change DMA rate?

If read-only alone reaches ~670 GB/s, the plateau is the lack of
read/write STREAM overlap (each direction serial at full rate halves the
aggregate) and the pair kernel's fix is overlapping input DMAs of tile
t+1 with output DMAs of tile t-1.  If read-only itself caps at ~335, the
plateau is a per-engine limit and the fix is multiple parallel DMA
queues (or accepting it as a Mosaic invariant, documented).

Run from the repo root, ONE TPU job at a time:
    python -c "exec(open('probes/dma_plateau.py').read())"
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 1024              # lanes
SUB = 8               # sublanes
ITERS = 64            # ring iterations per kernel call


def build(rows: int, nslots: int, mode: str, compute: bool):
    """One kernel call streams ITERS blocks of (rows, SUB, W) f32.

    mode: 'r' HBM->VMEM only; 'w' VMEM->HBM only; 'rw' both per iter.
    A ring of nslots VMEM buffers keeps up to nslots copies in flight.
    """
    def kernel(x_h, o_h, buf, rsem, wsem, acc):
        def start_read(i):
            s = i % nslots
            pltpu.make_async_copy(
                x_h.at[pl.ds(i * rows, rows)], buf.at[s], rsem.at[s]).start()

        def start_write(i):
            s = i % nslots
            pltpu.make_async_copy(
                buf.at[s], o_h.at[pl.ds(i * rows, rows)], wsem.at[s]).start()

        if mode in ("r", "rw"):
            for i in range(min(nslots, ITERS)):
                start_read(i)

        def body(i, _):
            s = i % nslots
            if mode in ("r", "rw"):
                pltpu.make_async_copy(
                    x_h.at[pl.ds(i * rows, rows)], buf.at[s],
                    rsem.at[s]).wait()
                if compute:
                    acc[...] = acc[...] + buf[s, 0]
            if mode == "rw":
                # write what we just read (wait for the previous write of
                # this slot to retire first, i >= nslots)
                @pl.when(i >= nslots)
                def _():
                    pltpu.make_async_copy(
                        buf.at[s], o_h.at[pl.ds(i * rows, rows)],
                        wsem.at[s]).wait()
                start_write(i)
            elif mode == "w":
                @pl.when(i >= nslots)
                def _():
                    pltpu.make_async_copy(
                        buf.at[s], o_h.at[pl.ds(i * rows, rows)],
                        wsem.at[s]).wait()
                start_write(i)
            if mode in ("r", "rw"):
                nxt = i + nslots

                @pl.when(nxt < ITERS)
                def _():
                    start_read(nxt)
            return _

        jax.lax.fori_loop(0, ITERS, body, None, unroll=False)
        # drain writes
        if mode in ("w", "rw"):
            for i in range(max(ITERS - nslots, 0), ITERS):
                s = i % nslots
                pltpu.make_async_copy(
                    buf.at[s], o_h.at[pl.ds(i * rows, rows)],
                    wsem.at[s]).wait()
        # tiny dependent output so timing forces real completion
        pltpu.make_async_copy(buf.at[0, pl.ds(0, 1)],
                              o_h.at[pl.ds(ITERS * rows, 1)],
                              rsem.at[0]).start()
        pltpu.make_async_copy(buf.at[0, pl.ds(0, 1)],
                              o_h.at[pl.ds(ITERS * rows, 1)],
                              rsem.at[0]).wait()

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ITERS * rows + 1, SUB, W),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((nslots, rows, SUB, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((nslots,)),
                        pltpu.SemaphoreType.DMA((nslots,)),
                        pltpu.VMEM((SUB, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(f)


x = jnp.asarray(np.random.rand(ITERS * 256 + 1, SUB, W).astype(np.float32))
print("rows_mb = MB per single DMA; aggregate GB/s counts each direction",
      flush=True)
for mode in ("r", "w", "rw"):
    for rows in (16, 64, 256):
        mb = rows * SUB * W * 4 / 1e6
        for nslots in (1, 2, 4):
            if rows * nslots > 1024:   # VMEM cap ~128 MB
                continue
            for compute in ((False, True) if (mode == "r" and rows == 64
                                              and nslots == 2) else (False,)):
                try:
                    f = build(rows, nslots, mode, compute)
                    o = f(x[: ITERS * rows + 1])
                    float(jnp.sum(o[-1, 0, :8]))
                    t0 = time.perf_counter()
                    for _ in range(4):
                        o = f(x[: ITERS * rows + 1])
                    float(jnp.sum(o[-1, 0, :8]))
                    dt = (time.perf_counter() - t0) / 4
                    dirs = 2 if mode == "rw" else 1
                    bw = dirs * rows * SUB * W * 4 * ITERS / dt / 1e9
                    print(f"mode={mode:2s} {mb:5.1f} MB/copy slots={nslots} "
                          f"compute={int(compute)}: {bw:7.1f} GB/s agg "
                          f"({dt*1e3:6.2f} ms)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"mode={mode} rows={rows} slots={nslots}: "
                          f"FAILED {type(e).__name__} {e}", flush=True)
print("DONE", flush=True)
