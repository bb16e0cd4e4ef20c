"""Pallas fused-stencil kernel vs the XLA composition (interpret mode on CPU).

The kernel is validated in interpret mode here; on real TPU hardware the same
comparison runs in the bench harness.  fp32 cross-compilation reassociation
puts the two paths within ~1e-5 relative after tens of steps.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import EngineData, JaxEngine, build_step
from pffdtd_tpu.io.h5 import MMb


def _run_pallas_interpret(sim, nt, tile_x=8):
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=tile_x,
                      boundary_kernel=True)  # exercise the windowed kernel
    step, C = build_step(data, backend="pallas", interpret=True)
    g = data.grid
    if data.bhyb is not None:
        vhs, u2s = data.bhyb.state_shapes()
        vh = {k: jnp.zeros(s, np.float32) for k, s in vhs.items()}
        gh = {k: jnp.zeros(s, np.float32) for k, s in vhs.items()}
        z = lambda: {k: jnp.zeros(s, np.float32) for k, s in u2s.items()}
        u2 = (z(), z())
    else:
        vh = jnp.zeros((data.Nbl_state, MMb), np.float32)
        gh = jnp.zeros((data.Nbl_state, MMb), np.float32)
        u2 = (jnp.zeros((1,), np.float32), jnp.zeros((1,), np.float32))
    carry = (jnp.zeros(g.shape, np.float32), jnp.zeros(g.shape, np.float32),
             vh, gh, u2)
    sigs = (data.in_sigs[:, :nt] / data.infac).T.astype(np.float32)
    carry, ys = jax.lax.scan(lambda c, x: step(c, x, C), carry,
                             jnp.asarray(sigs))
    return np.float64(np.asarray(ys).T) * data.infac


def test_pallas_matches_xla_cart():
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=40, lossy=True,
                            insig_type="hann10", diff_source=False)
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    u_out_p = _run_pallas_interpret(sim, jx.Nt)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_out_p - jx.u_out).max() / scale
    assert err < 1e-5, err


def test_pallas_matches_xla_fcc():
    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=30, lossy=True,
                            fcc=True, insig_type="hann10", diff_source=False)
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    u_out_p = _run_pallas_interpret(sim, jx.Nt)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_out_p - jx.u_out).max() / scale
    assert err < 1e-5, err


def _zplane_case(monkeypatch, fcc):
    """Force the z-plane partition to absorb as much as possible (every
    (z, mat) group qualifies) and compare the fused in-kernel impedance ODE
    against the XLA composition."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0")
    dims = (2.2, 1.8, 1.5, 0.12) if fcc else (2.5, 2.0, 1.6, 0.1)
    sim = synthetic_box_sim(*dims[:3], h=dims[3], Nt=30, lossy=True,
                            fcc=fcc, insig_type="hann10", diff_source=False)
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)

    from pffdtd_tpu.engine.jax_engine import EngineData

    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=8,
                      boundary_kernel=True)
    assert data.bhyb.zplanes is not None and data.bhyb.zplanes.P >= 2
    u_out_p = _run_pallas_interpret(sim, jx.Nt)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_out_p - jx.u_out).max() / scale
    assert err < 1e-5, err


def test_pallas_zplanes_cart(monkeypatch):
    _zplane_case(monkeypatch, fcc=False)


def test_pallas_zplanes_fcc(monkeypatch):
    _zplane_case(monkeypatch, fcc=True)
