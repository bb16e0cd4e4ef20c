"""Isolate the ShardedPairEngine D=1 overhead vs the single-chip pair path.

bench.py's sharded_pair_tpu measured frac=0.76 (VERDICT r3 #4: target
>= 0.9).  Same scene, both engines, REAL readback timing; prints TX and
ms/step for each so the wrapper overhead is visible.
Run: ONE TPU job at a time.
"""
import os
import time

import numpy as np

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import JaxEngine
from pffdtd_tpu.parallel.sharded_pallas import ShardedPairEngine

NT = int(os.environ.get("NT", "64"))

sim = synthetic_box_sim(21.0, 16.0, 12.6, h=0.03, Nt=NT, lossy=False,
                        insig_type="impulse")
g = sim.vox
npts = g.Nx * g.Ny * g.Nz
print(f"grid {g.Nx}x{g.Ny}x{g.Nz} = {npts/1e6:.1f} Mvox", flush=True)

jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
               mats=sim.mats, dtype=np.float32, backend="pallas_pair")
t0 = time.time()
jx.run(nt=NT, verbose=False)
print(f"jx TX={jx.data.tile_x} compile {time.time()-t0:.0f}s", flush=True)
for _ in range(2):
    jx.run(nt=NT, verbose=False)
    print(f"  jx {jx.mvps:.0f} MVPS ({npts/jx.mvps/1e3:.2f} ms/step)",
          flush=True)

sp = ShardedPairEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                       mats=sim.mats, dtype=np.float32)
t0 = time.time()
sp.run(nt=NT, verbose=False)
print(f"sp TX={sp.data.tile_x} S={sp.S} compile {time.time()-t0:.0f}s",
      flush=True)
for _ in range(2):
    sp.run(nt=NT, verbose=False)
    print(f"  sp {sp.mvps:.0f} MVPS ({npts/sp.mvps/1e3:.2f} ms/step)  "
          f"frac={sp.mvps/jx.mvps:.3f}", flush=True)
