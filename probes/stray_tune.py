"""Sweep stray-pass chunking knobs on the real chip and report rates.

A mid-size all-stray lossy box stands in for stray-heavy geometry; each
config recompiles (~1-3 min at this scale).  Use the winner to calibrate
_stray_chunk_cost's fixed/mac constants (pallas_boundary.py).
Run from the repo root; ONE TPU job at a time.
"""
import os, time
import numpy as np

CONFIGS = [
    {},                                           # cost-model choice
    {"PFFDTD_STRAY_TS": "512", "PFFDTD_STRAY_ZW": "256"},
    {"PFFDTD_STRAY_TS": "1024", "PFFDTD_STRAY_ZW": "256"},
    {"PFFDTD_STRAY_TS": "512", "PFFDTD_STRAY_ZW": "512"},
    {"PFFDTD_STRAY_TS": "1024", "PFFDTD_STRAY_YW": "32"},
    {"PFFDTD_STRAY_TS": "256", "PFFDTD_STRAY_ZW": "256"},
]
KEYS = ("PFFDTD_STRAY_TS", "PFFDTD_STRAY_YW", "PFFDTD_STRAY_RW",
        "PFFDTD_STRAY_ZW")

os.environ["PFFDTD_ZPLANE_MIN_COUNT"] = "1000000000"   # all-stray
from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import JaxEngine

nt = 64
sim = synthetic_box_sim(6.0, 4.8, 12.0, h=0.04, Nt=nt, lossy=True,
                        insig_type="impulse")
g = sim.vox
print(f"grid {g.Nx}x{g.Ny}x{g.Nz} = {g.Nx*g.Ny*g.Nz/1e6:.1f} Mvox "
      f"Nb={g.Nb}", flush=True)
ref = None
for cfg in CONFIGS:
    for k in KEYS:
        os.environ.pop(k, None)
    os.environ.update(cfg)
    t0 = time.time()
    try:
        eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                        mats=sim.mats, dtype=np.float32,
                        backend="pallas_pair", tile_x=8)
        st = eng.data.strays
        eng.run(nt=nt, verbose=False)
        eng.run(nt=nt, verbose=False)
        tag = (f"TS={st.TS} RW={st.RW} YW={st.YW} ZW={st.ZW} "
               f"chunks={int(st.soff[-1])} maxc={st.maxc}")
        if ref is None:
            ref = eng.u_out.copy()
            err = 0.0
        else:
            err = float(np.abs(eng.u_out - ref).max()
                        / max(np.abs(ref).max(), 1e-30))
        print(f"{cfg or 'auto'}: {eng.mvps:.0f} MVPS  [{tag}] "
              f"err={err:.1e} ({time.time()-t0:.0f}s)", flush=True)
        assert err < 1e-5
    except Exception as e:  # noqa: BLE001 - keep sweeping
        print(f"{cfg or 'auto'}: FAILED {e} ({time.time()-t0:.0f}s)",
              flush=True)
print("DONE", flush=True)
