"""Sharded temporally-blocked pair engine (interpret mode, CPU mesh).

The multi-chip fast path for plane-coverable scenes: per-shard pair
kernels (TWO leapfrog steps per sweep) with a 2-deep ghost exchange and
overlap-computed edge u2 — halo traffic per two steps equals the
single-step engine's per one step.  Requirement: shard-count invariance
and agreement with the single-device XLA engine.
"""

from dataclasses import replace

import numpy as np
import pytest

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import JaxEngine
from pffdtd_tpu.parallel.sharded_engine import make_mesh
from pffdtd_tpu.parallel.sharded_pallas import ShardedPairEngine
from pffdtd_tpu.prep import pad_x_interior


def _pad_divisible(sim, D=4):
    return pad_x_interior(sim, D)


def _rigidify_x_walls(sim):
    """Clear materials on x-extreme wall nodes: x-normal impedance planes
    are single-device-only (static tile ownership breaks SPMD)."""
    vox = sim.vox
    row = vox.Ny * vox.Nz
    gx = np.asarray(vox.bn_ixyz) // row
    xs = np.unique(gx)
    lo, hi = xs[:2], xs[-2:]
    mat = np.asarray(vox.mat_bn).copy()
    mat[np.isin(gx, np.r_[lo, hi])] = -1
    return replace(sim, vox=replace(vox, mat_bn=mat))


def _compare(sim, tol=2e-5, Ds=(1, 4)):
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    outs = {}
    for D in Ds:
        sp = ShardedPairEngine(consts=sim.consts, vox=sim.vox,
                               comms=sim.comms, mats=sim.mats,
                               mesh=make_mesh(D), dtype=np.float32,
                               interpret=True)
        sp.run(verbose=False)
        outs[D] = sp.u_out
    nt = outs[Ds[0]].shape[1]
    assert np.array_equal(outs[Ds[0]], outs[Ds[-1]])
    scale = np.abs(jx.u_out).max()
    assert np.abs(outs[Ds[-1]] - jx.u_out[:, :nt]).max() / scale < tol


def test_sharded_pair_rigid_cart():
    sim = synthetic_box_sim(3.1, 2.0, 1.7, h=0.12, Nt=40, lossy=False,
                            insig_type="hann10", diff_source=False)
    _compare(_pad_divisible(sim))


def test_sharded_pair_rigid_fcc():
    sim = synthetic_box_sim(2.6, 2.0, 1.6, h=0.14, Nt=30, lossy=False,
                            fcc=True, insig_type="hann10", diff_source=False)
    _compare(_pad_divisible(sim))


def test_sharded_pair_lossy_zy(monkeypatch):
    # z/y walls keep their impedance; x walls are rigidified (x-plane
    # fusion is single-device-only) so the plane cover has no x family
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    _compare(_rigidify_x_walls(_pad_divisible(sim)), tol=1e-4)


def test_sharded_pair_lossy_fcc_folded(monkeypatch):
    # folded-FCC grid (fold ghost row at high y) + z/y impedance planes
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.12")
    from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim

    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=30, lossy=True,
                            fcc=True, insig_type="hann10",
                            diff_source=False)
    sim = sort_sim(fold_fcc_sim(rotate_sim(sim)))
    _compare(_rigidify_x_walls(_pad_divisible(sim)), tol=1e-4)


def test_sharded_pair_lossy_x_planes(monkeypatch):
    """Lossy x-walls stay on the multi-chip fast path: runtime x-plane
    rows keep the SPMD program shard-uniform (round-3 VERDICT item 4)."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    _compare(_pad_divisible(sim), tol=1e-4)


def test_sharded_pair_lossy_x_planes_fcc(monkeypatch):
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.12")
    from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim

    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=30, lossy=True,
                            fcc=True, insig_type="hann10",
                            diff_source=False)
    sim = sort_sim(fold_fcc_sim(rotate_sim(sim)))
    # D=2 exercises mid-shard runtime rows; at D=4 this scene's x-walls
    # land on shard-OVERLAP rows: both owners run the duplicated plane
    # and the per-pair state graft keeps the copies coherent
    sim = _pad_divisible(sim, D=4)
    _compare(sim, tol=1e-4, Ds=(1, 2))
    _compare(sim, tol=1e-4, Ds=(1, 4))


def _sloped():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py")
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    return ge._sloped_sim(Nt=30)


def test_sharded_pair_strays():
    """Arbitrary geometry on the multi-chip fast path (round-4 VERDICT
    item 5): the raked ceiling staircases into off-plane stray nodes;
    per-shard packed chunks + the overlap-row duplicate state graft must
    agree bitwise across shard counts and match the XLA oracle."""
    sim = _pad_divisible(_sloped())
    from pffdtd_tpu.parallel.sharded_pallas import ShardedPairEngine

    eng = ShardedPairEngine(consts=sim.consts, vox=sim.vox,
                            comms=sim.comms, mats=sim.mats,
                            mesh=make_mesh(4), dtype=np.float32,
                            interpret=True)
    assert eng._strays_build is not None, "scene lost its stray nodes"
    _compare(sim, tol=1e-4)


def test_sharded_pair_strays_overlap_rows(monkeypatch):
    """Force stray nodes ONTO the duplicated shard-overlap rows: a lossy
    x-wall demoted to strays lands whole rows of nodes on global m*S and
    m*S+1 for some shard split, exercising the send/recv slot graft."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    sim = _pad_divisible(_sloped(), D=4)
    from pffdtd_tpu.parallel.sharded_pallas import ShardedPairEngine

    eng = ShardedPairEngine(consts=sim.consts, vox=sim.vox,
                            comms=sim.comms, mats=sim.mats,
                            mesh=make_mesh(4), dtype=np.float32,
                            interpret=True)
    # the graft machinery must actually be engaged for this scene at D=4
    assert eng._strays_build is not None
    _compare(sim, tol=1e-4, Ds=(1, 2))
    _compare(sim, tol=1e-4, Ds=(1, 4))
