"""Isolate the x-plane pass cost (the MV round-4 dominator: 26 of 59
ms/step at PX=8) on a mid-size lossy box with a BIG (y, z) cross-section.

One process, several engine builds (PFFDTD_ABLATE / PFFDTD_XPLANE_CY are
read at kernel-build / partition time): full vs ABLATE=odex isolates the
2 x-wall passes; the CY sweep probes chunk-granularity sensitivity.
Run from the repo root; ONE TPU job at a time.
"""
import os
import time

import numpy as np

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import JaxEngine

NT = int(os.environ.get("NT", "64"))

# ~31 Mvox, (y, z) cross-section comparable to MV orientation B (256x768)
sim = synthetic_box_sim(6.2, 10.0, 30.0, h=0.04, Nt=NT, lossy=True,
                        insig_type="impulse")
g = sim.vox
print(f"grid {g.Nx}x{g.Ny}x{g.Nz} = {g.Nx*g.Ny*g.Nz/1e6:.1f} Mvox "
      f"Nb={g.Nb}", flush=True)

CONFIGS = [
    {},                                            # control (CY=64)
    {"PFFDTD_ABLATE": "odex"},                     # x passes OFF
    {"PFFDTD_XPLANE_CY": "128"},
    {"PFFDTD_XPLANE_CY": "256"},
    {"PFFDTD_XPLANE_CY": "32"},
]
if os.environ.get("XP_CONFIGS"):   # TX matrix (batched z/y planes)
    CONFIGS = [{}, {"PFFDTD_ABLATE": "odex"},
               {"TX": "4"}, {"TX": "4", "PFFDTD_ABLATE": "odex"}]
KEYS = ("PFFDTD_ABLATE", "PFFDTD_XPLANE_CY", "TX")
ref = None
for cfg in CONFIGS:
    for k in KEYS:
        os.environ.pop(k, None)
    os.environ.update(cfg)
    t0 = time.time()
    try:
        eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                        mats=sim.mats, dtype=np.float32,
                        backend="pallas_pair",
                        tile_x=int(cfg.get("TX", "8")))
        pl_ = eng.data.planes
        eng.run(nt=NT, verbose=False)
        eng.run(nt=NT, verbose=False)
        ms = g.Nx * g.Ny * g.Nz / eng.mvps / 1e3
        tag = (f"PZ={0 if pl_.z is None else pl_.z.P} "
               f"PY={0 if pl_.y is None else pl_.y.P} "
               f"PX={0 if pl_.x is None else pl_.x.P} "
               f"CY={pl_.x.CY if pl_.x is not None else '-'} "
               f"stray={pl_.n_stray} carry={eng.data.u2b_carry}")
        if "PFFDTD_ABLATE" in cfg:
            err = float("nan")  # physics intentionally wrong
        elif ref is None:
            ref = eng.u_out.copy()
            err = 0.0
        else:
            err = float(np.abs(eng.u_out - ref).max()
                        / max(np.abs(ref).max(), 1e-30))
        print(f"{cfg or 'control'}: {eng.mvps:.0f} MVPS  {ms:.2f} ms/step"
              f"  [{tag}] err={err:.1e} ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001 - keep sweeping
        print(f"{cfg or 'control'}: FAILED {type(e).__name__} {e} "
              f"({time.time()-t0:.0f}s)", flush=True)
print("DONE", flush=True)
