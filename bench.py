"""Benchmark: fp32 voxel-update throughput (MVPS) on the attached TPU chip.

Mirrors the reference's benchmark methodology (benchmarks/README.md): a large
hall, impulse + diff source, single precision, MVPS = Npts * Nsamples /
runtime / 1e6.  The baseline to beat is the best published per-GPU rate,
52512.6 MVPS on A100-40GB (pffdtd_benchmarks.csv:44).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MVPS = 52512.6  # 2x A100-40GB per-GPU rate, FCC fmax=6.5kHz


def main():
    # size via env overrides (defaults target ~3.3 GB of fp32 state)
    Lx = float(os.environ.get("BENCH_LX", "36"))
    Ly = float(os.environ.get("BENCH_LY", "28"))
    Lz = float(os.environ.get("BENCH_LZ", "23"))
    h = float(os.environ.get("BENCH_H", "0.046"))
    nt = int(os.environ.get("BENCH_NT", "128"))
    fcc = os.environ.get("BENCH_FCC", "0") == "1"
    # lossy impedance boundaries everywhere (the reference benchmark config);
    # off by default until the windowed boundary kernel lands
    lossy = os.environ.get("BENCH_LOSSY", "0") == "1"

    from pffdtd_tpu.demo import synthetic_box_sim
    from pffdtd_tpu.engine.jax_engine import JaxEngine

    t0 = time.perf_counter()
    sim = synthetic_box_sim(Lx, Ly, Lz, h=h, Nt=nt, fcc=fcc, lossy=lossy,
                            insig_type="impulse")
    t1 = time.perf_counter()
    g = sim.vox
    print(f"setup: {t1 - t0:.1f}s  grid {g.Nx}x{g.Ny}x{g.Nz} = "
          f"{g.Nx * g.Ny * g.Nz / 1e6:.1f} Mvox, Nb={g.Nb}",
          file=sys.stderr)

    eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                    mats=sim.mats, dtype=np.float32)
    # warmup at the SAME trip count (scan length is baked into the compile)
    eng.run(nt=nt, verbose=False)
    print(f"compile+first run: {eng.elapsed:.1f}s", file=sys.stderr)
    # timed run
    eng.run(nt=nt, verbose=False)
    assert np.isfinite(eng.u_out).all()

    value = eng.mvps
    print(json.dumps({
        "metric": "voxel_update_rate_fp32" + ("_fcc" if fcc else "_cart"),
        "value": round(value, 1),
        "unit": "Mvox/s",
        "vs_baseline": round(value / BASELINE_MVPS, 4),
    }))


if __name__ == "__main__":
    main()
