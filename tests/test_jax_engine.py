"""JAX engine vs the NumPy oracle: outputs to machine accuracy, on-device
energy balance, fp32 path sanity (the reference's own cross-engine criterion,
README.md:60)."""

import numpy as np
import pytest

from pffdtd_tpu.engine.jax_engine import JaxEngine
from pffdtd_tpu.engine.numpy_ref import NumpyEngine
from pffdtd_tpu.scene_setup import mats_from_DEF_list, sim_setup_from_room

from conftest import make_shoebox

DEF3 = np.array([[2.0, 5.0, 30.0],
                 [1.0, 10.0, 300.0],
                 [0.5, 8.0, 3000.0]])


def _setup(fcc=False, mats=None, DEF_list=(), sig="hann10", duration=0.02,
           h=0.25, diff=False):
    rg = make_shoebox(mats=mats)
    md = mats_from_DEF_list(list(DEF_list))
    return sim_setup_from_room(
        rg, md, duration=duration, insig_type=sig, h=h, fcc_flag=fcc,
        diff_source=diff, vox_backend="numpy", block_size=16)


def _both(sim, **kw):
    o = NumpyEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                    mats=sim.mats)
    o.run_all()
    j = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                  mats=sim.mats, dtype=np.float64, **kw)
    j.run(verbose=False)
    return o, j


def _assert_close(o, j, tol=1e-12):
    scale = np.abs(o.u_out).max()
    assert scale > 0
    err = np.abs(j.u_out - o.u_out).max() / scale
    assert err < tol, f"max rel err {err:.3e}"


def test_matches_oracle_rigid_cart():
    sim = _setup()
    o, j = _both(sim)
    _assert_close(o, j)


def test_matches_oracle_lossy_cart():
    sim = _setup(mats=["w"] * 6, DEF_list=[DEF3])
    o, j = _both(sim)
    _assert_close(o, j)


def test_matches_oracle_fcc():
    sim = _setup(fcc=True, mats=["w"] * 6, DEF_list=[DEF3], h=0.2)
    o, j = _both(sim)
    _assert_close(o, j)


def test_padding_invariance():
    """z-padding for TPU lane alignment must not change results at all."""
    sim = _setup(mats=["w"] * 6, DEF_list=[DEF3])
    j1 = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float64, pad_z=None)
    j2 = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float64, pad_z=128)
    j1.run(verbose=False)
    j2.run(verbose=False)
    assert np.array_equal(j1.u_out, j2.u_out)


def test_on_device_energy_balance():
    sim = _setup(mats=["w"] * 6, DEF_list=[DEF3])
    j = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                  mats=sim.mats, dtype=np.float64, energy_on=True)
    j.run(verbose=False)
    bal = j.energy_balance()
    assert np.max(np.abs(bal)) < 1e-10
    assert j.E_lost[-1] > 0


def test_fp32_runs_and_tracks_fp64():
    sim = _setup(mats=["w"] * 6, DEF_list=[DEF3], sig="hann20", duration=0.03)
    o = NumpyEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                    mats=sim.mats)
    o.run_all()
    j = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                  mats=sim.mats, dtype=np.float32)
    j.run(verbose=False)
    scale = np.abs(o.u_out).max()
    err = np.abs(j.u_out - o.u_out).max() / scale
    assert err < 1e-3, f"fp32 deviated: {err:.3e}"  # fp32 rounding accumulation
    assert np.isfinite(j.u_out).all()
