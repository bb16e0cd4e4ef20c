"""Feature ablation of the SHIPPING headline config (auto backend at the
bench fcc_lossy dims, 125 Mvox, TB3/TX8 as of round 4).

One config per process (PFFDTD_ABLATE is read at kernel-build time):
    PFFDTD_ABLATE=ode python -c "exec(open('probes/abl_bench.py').read())"

Sweep '' / ode / abc / rolls / flips to decompose the ~5.9 ms/step into
plane-ODE / ABC / lane-roll / halo-flip shares AT BENCH SCALE (the
round-4 19-Mvox shares don't transfer: small rows are compute-bound,
bench rows add the DMA floor).  ONE TPU job at a time.
"""
import os
import time

import numpy as np

NT = int(os.environ.get("NT", "64"))

from pffdtd_tpu.demo import synthetic_box_sim  # noqa: E402
from pffdtd_tpu.engine.jax_engine import JaxEngine  # noqa: E402
from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim  # noqa: E402

DEF11 = np.array([[d, e, f] for d, e, f in zip(
    np.geomspace(0.4, 40.0, 11),
    np.geomspace(2.0, 80.0, 11),
    np.geomspace(20.0, 2.0e5, 11))])

lossy = os.environ.get("LOSSY", "1") == "1"
sim = synthetic_box_sim(36.0, 28.0, 23.0, h=0.046, Nt=NT, fcc=True,
                        lossy=lossy, insig_type="impulse",
                        DEF=DEF11 if lossy else None)
sim = sort_sim(fold_fcc_sim(rotate_sim(sim)))
g = sim.vox
kw = {}
if os.environ.get("BACKEND"):
    kw["backend"] = os.environ["BACKEND"]
if os.environ.get("TX"):
    kw["tile_x"] = int(os.environ["TX"])
# PFFDTD_U2B_CARRY=0 measures the carry delta (VERDICT r3 item 3);
# PFFDTD_XPLANE_CY sweeps the x-pass chunk rows
eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                mats=sim.mats, dtype=np.float32, **kw)
t0 = time.time()
eng.run(nt=NT, verbose=False)
tc = time.time() - t0
eng.run(nt=NT, verbose=False)
npts = g.Nx * g.Ny * g.Nz
ms_step = npts / eng.mvps / 1e3
print(f"RESULT ablate='{os.environ.get('PFFDTD_ABLATE', '')}' "
      f"backend={eng.backend} TX={eng.data.tile_x} "
      f"TB={getattr(eng.data, 'tb', 2)} "
      f"carry={getattr(eng.data, 'u2b_carry', None)} "
      f"grid {g.Nx}x{g.Ny}x{g.Nz}={npts / 1e6:.1f}Mvox "
      f"{eng.mvps:.0f} MVPS  {ms_step:.3f} ms/step  (compile {tc:.0f}s)",
      flush=True)
