"""Localise the pair kernel's per-stage-tile fixed cost.

One config per process (PFFDTD_ABLATE is read at import/build time):
    TX=8 ABL="" python -c "exec(open('probes/fixed_cost.py').read())"

Sweeping ABL over feature subsets at TX in {4, 8} on a mid-size fcc
lossy box decomposes the measured ~29 us/visit fixed cost (TX=4 vs TX=8
bench gap, round 3) into flips / ABC / ODE / rolls / unpack shares:
a feature's per-visit (vs per-voxel) cost is its contribution to the
t(TX=4) - t(TX=8) gap.  ONE TPU job at a time.
"""
import os
import time

import numpy as np

TX = int(os.environ.get("TX", "8"))
NT = int(os.environ.get("NT", "64"))

from pffdtd_tpu.demo import synthetic_box_sim  # noqa: E402
from pffdtd_tpu.engine.jax_engine import JaxEngine  # noqa: E402
from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim  # noqa: E402

DEF11 = np.array([[d, e, f] for d, e, f in zip(
    np.geomspace(0.4, 40.0, 11),
    np.geomspace(2.0, 80.0, 11),
    np.geomspace(20.0, 2.0e5, 11))])

lossy = os.environ.get("LOSSY", "1") == "1"
sim = synthetic_box_sim(22.0, 14.0, 11.0, h=0.046, Nt=NT, fcc=True,
                        lossy=lossy, insig_type="impulse",
                        DEF=DEF11 if lossy else None)
sim = sort_sim(fold_fcc_sim(rotate_sim(sim)))
g = sim.vox
eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                mats=sim.mats, dtype=np.float32, backend="pallas_pair",
                tile_x=TX)
t0 = time.time()
eng.run(nt=NT, verbose=False)
tc = time.time() - t0
eng.run(nt=NT, verbose=False)
npts = g.Nx * g.Ny * g.Nz
nxt = -(-(eng.data.grid.Nx - 2) // TX)
ms_step = npts / eng.mvps / 1e3
print(f"RESULT ablate='{os.environ.get('PFFDTD_ABLATE', '')}' TX={TX} "
      f"lossy={int(lossy)} grid {g.Nx}x{g.Ny}x{g.Nz}={npts/1e6:.1f}Mvox "
      f"NXT={nxt} {eng.mvps:.0f} MVPS  {ms_step:.3f} ms/step  "
      f"{ms_step*2e3/(nxt+1):.1f} us/visit  (compile {tc:.0f}s)",
      flush=True)
