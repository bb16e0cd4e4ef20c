"""Real-TPU smoke of the y-plane z-window (Mosaic layout check).

The interpret-mode tests can't catch vector-layout offset issues (the
round-4 'offset mismatch on non-concat dimension' class), so compile and
run the windowed pair kernel on the chip against the XLA reference.
Scene: the test's _extend_z embedding (z0=128, W=128 of Nzp=256).
"""
import os
import time

import numpy as np

os.environ.setdefault("PFFDTD_ZPLANE_MIN_COUNT", "200")
os.environ.setdefault("PFFDTD_ZPLANE_MIN_DENSITY", "0.0")

from pffdtd_tpu.demo import synthetic_box_sim  # noqa: E402
from pffdtd_tpu.engine.jax_engine import EngineData, JaxEngine  # noqa: E402
from tests.test_pallas_pair import _extend_z  # noqa: E402

sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                        insig_type="hann10", diff_source=False)
sim = _extend_z(sim, below=128, above=256 - 128 - sim.vox.Nz)
data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                  dtype=np.float32, pad_z=128, tile_x=4)
ns = data.attach_planes()
y = data.planes.y
assert y is not None and y.z0 == 128 and y.ssaf.shape[2] == 128, \
    (ns, y.z0 if y else None)
print(f"window OK in partition: z0={y.z0} W={y.ssaf.shape[2]} strays={ns}",
      flush=True)

xla = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                mats=sim.mats, dtype=np.float32, backend="xla")
xla.run(verbose=False)
for backend, tb in (("pallas_pair", None), ("pallas_tb", 3)):
    if backend == "pallas_tb" and ns:
        print("tb skipped (strays)", flush=True)
        continue
    t0 = time.time()
    if tb:
        os.environ["PFFDTD_TB"] = str(tb)
    eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                    mats=sim.mats, dtype=np.float32, backend=backend,
                    tile_x=4)
    eng.run(verbose=False)
    err = float(np.abs(eng.u_out - xla.u_out).max()
                / max(np.abs(xla.u_out).max(), 1e-30))
    print(f"{backend}: err={err:.2e} compile+run {time.time()-t0:.0f}s",
          flush=True)
    assert err < 1e-5, err
print("YWINDOW SMOKE OK", flush=True)
