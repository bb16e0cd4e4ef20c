"""MV orientation experiment: put the 1664-long axis on x (tiles) instead
of z (lanes).

Round-3 routing left MV at grid (646, 250, 1664): the 1664 axis is exact
on lanes (13*128, zero pad) but the (Nyp, Nzp) plane row is 1.7 MB, which
forces TX=2 — and at TX=2 every (TX, hy, Nzp) vector op runs at <= 25%
sublane utilisation and the per-visit fixed costs double.  Re-rotating the
CACHED folded sim with tr=(2, 1, 0) (x <-> z; the folded y axis stays put)
gives (1664, 250, 646): rows are 786 KB (646 -> 768 lanes, 19% pad), TX
jumps to 6-8.

Run: TR=210 python -c "exec(open('probes/mv_orient.py').read())"
     (TR=012 re-measures the cached orientation A as control)
"""
import os
import time

import numpy as np

from pffdtd_tpu.engine.jax_engine import JaxEngine
from pffdtd_tpu.io.h5 import SimFolder
from pffdtd_tpu.prep import rotate_sim, sort_sim
from pffdtd_tpu.scene_setup import SimData

CACHE = os.environ.get("BENCH_MV_CACHE", "/tmp/bench_mv_sim")
TR = tuple(int(c) for c in os.environ.get("TR", "210"))
NT = int(os.environ.get("NT", "128"))

t0 = time.perf_counter()
sf = SimFolder(CACHE)
sim = SimData(consts=sf.consts, vox=sf.vox, comms=sf.comms, mats=sf.mats)
if TR != (0, 1, 2):
    assert TR[1] == 1, "the folded y axis must stay on y"
    sim = sort_sim(rotate_sim(sim, tr=TR))
g = sim.vox
print(f"load+rotate {time.perf_counter()-t0:.0f}s grid "
      f"{g.Nx}x{g.Ny}x{g.Nz} = {g.Nx*g.Ny*g.Nz/1e6:.1f} Mvox Nb={g.Nb}",
      flush=True)

t0 = time.perf_counter()
TILE_X = int(os.environ.get("TILE_X", "0")) or None
eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                mats=sim.mats, dtype=np.float32, tile_x=TILE_X)
print(f"backend {eng.backend} TX={eng.data.tile_x}", flush=True)
st = getattr(eng.data, "strays", None)
if st is not None:
    n = int(st.soff[-1])
    print(f"strays: nodes={st.node_slot.size} chunks={n} TS={st.TS} "
          f"RW={st.RW} YW={st.YW} ZW={st.ZW} maxc={st.maxc}", flush=True)
pl = eng.data.planes
if pl is not None:
    print(f"planes: PZ={0 if pl.z is None else pl.z.P} "
          f"PY={0 if pl.y is None else pl.y.P} "
          f"PX={0 if pl.x is None else pl.x.P} "
          f"carry={getattr(eng.data, 'u2b_carry', None)}", flush=True)
nt = min(NT, eng.Nt)
eng.run(nt=nt, verbose=False)
print(f"compile+first run: {time.perf_counter()-t0:.0f}s", flush=True)
for _ in range(2):
    eng.run(nt=nt, verbose=False)
    print(f"RESULT mv tr={TR}: {eng.mvps:.0f} MVPS "
          f"({g.Nx*g.Ny*g.Nz/eng.mvps/1e3:.1f} ms/step)", flush=True)
assert np.isfinite(eng.u_out).all()
print("MV OK", flush=True)
