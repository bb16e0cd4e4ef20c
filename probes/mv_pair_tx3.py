"""MV through the pair+strays path on the real chip: partition stats,
compile, and a timed run vs the old fallback number (6.1 GVPS)."""
import os, sys, time
import numpy as np
from pffdtd_tpu.engine.jax_engine import JaxEngine
from pffdtd_tpu.geometry.room import RoomGeo
from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim
from pffdtd_tpu.scene_setup import pack_mats, sim_setup_from_room

REF = "/root/reference/data"
MV_MATS = {"Floor": "mv_floor.h5", "Chairs": "mv_chairs.h5",
           "Plasterboard": "mv_plasterboard.h5", "Window": "mv_window.h5",
           "Wood": "mv_wood.h5"}
t0 = time.perf_counter()
rg = RoomGeo(f"{REF}/models/Musikverein_ConcertHall/model_export.json")
keep = [r for r in rg.Rxyz
        if np.linalg.norm(rg.tris_pre.cent - r, axis=-1).min() > 0.6]
rg.Rxyz = np.asarray(keep if keep else rg.Sxyz[:1] + 2.0)
mats = pack_mats(rg.mat_str, MV_MATS, f"{REF}/materials")
nt = int(os.environ.get("NT", "128"))
sim = sim_setup_from_room(rg, mats, duration=nt * 1e-4,
                          insig_type="impulse", diff_source=True,
                          fmax=2000.0, PPW=5.6, fcc_flag=True,
                          check_adj=False)
sim = sort_sim(fold_fcc_sim(rotate_sim(sim)))
g = sim.vox
print(f"setup {time.perf_counter()-t0:.0f}s grid {g.Nx}x{g.Ny}x{g.Nz} = "
      f"{g.Nx*g.Ny*g.Nz/1e6:.1f} Mvox Nb={g.Nb}", flush=True)

t0 = time.perf_counter()
eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                mats=sim.mats, dtype=np.float32, tile_x=3)
print(f"backend {eng.backend} TX={eng.data.tile_x}", flush=True)
st = getattr(eng.data, "strays", None)
if st is not None:
    n = int(st.soff[-1])
    print(f"strays: nodes={st.node_slot.size} chunks={n} TS={st.TS} "
          f"RW={st.RW} YW={st.YW} maxc={st.maxc} "
          f"smem_bytes={(st.sr0.nbytes + st.sy0.nbytes + st.soff.nbytes)}",
          flush=True)
    from pffdtd_tpu.engine.pallas_boundary import _stray_chunk_cost
nt = min(nt, eng.Nt)
eng.run(nt=nt, verbose=False)
print(f"compile+first run: {time.perf_counter()-t0:.0f}s", flush=True)
for _ in range(2):
    eng.run(nt=nt, verbose=False)
    print(f"mv pair+strays: {eng.mvps:.0f} MVPS", flush=True)
assert np.isfinite(eng.u_out).all()
print("MV OK", flush=True)
