"""Prep transforms: rotation, FCC folding and sorting must preserve physics.

Rotation/folding relabel indices (and permute adjacency columns), so outputs
agree with the untransformed run to machine accuracy (leg summation order
changes, hence not bitwise).
"""

import numpy as np

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.numpy_ref import NumpyEngine
from pffdtd_tpu.engine.jax_engine import JaxEngine
from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim


def _run(sim, engine="numpy"):
    if engine == "numpy":
        eng = NumpyEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                          mats=sim.mats)
        u = eng.run_all()
        return u[sim.comms.out_reorder]
    eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                    mats=sim.mats, dtype=np.float64)
    eng.run(verbose=False)
    return eng.u_out[sim.comms.out_reorder]


def test_rotate_preserves_outputs():
    sim = synthetic_box_sim(2.6, 2.0, 1.5, h=0.14, Nt=50, lossy=True,
                            insig_type="hann10", diff_source=False)
    base = _run(sim)
    rot = rotate_sim(sim, tr=(2, 0, 1))
    assert (rot.vox.Nx, rot.vox.Ny, rot.vox.Nz) != \
        (sim.vox.Nx, sim.vox.Ny, sim.vox.Nz)
    out = _run(rot)
    assert np.allclose(out, base, rtol=0, atol=1e-12 * np.abs(base).max())


def test_rotate_descending():
    sim = synthetic_box_sim(1.5, 2.6, 2.0, h=0.14, Nt=10, lossy=False)
    rot = rotate_sim(sim, orient="descending")
    assert rot.vox.Nx >= rot.vox.Ny >= rot.vox.Nz


def test_rotate_auto_puts_fewest_faces_on_z():
    # a box: faces normal to axis k have area = product of the other two
    # extents, so the LONGEST axis has the fewest boundary faces -> z
    sim = synthetic_box_sim(1.5, 2.6, 2.0, h=0.14, Nt=10, lossy=False)
    rot = rotate_sim(sim)
    from pffdtd_tpu.prep import boundary_face_counts

    counts = boundary_face_counts(rot.vox)
    assert counts[2] == counts.min()
    assert rot.vox.Nz >= max(rot.vox.Nx, rot.vox.Ny)  # box: longest -> z
    assert rot.vox.Nx >= rot.vox.Ny


def test_sort_preserves_outputs():
    sim = synthetic_box_sim(2.6, 2.0, 1.5, h=0.14, Nt=50, lossy=True,
                            insig_type="hann10", diff_source=False)
    base = _run(sim)
    # scramble then sort back
    rng = np.random.default_rng(0)
    from dataclasses import replace

    p = rng.permutation(sim.vox.Nb)
    q = rng.permutation(sim.comms.out_ixyz.size)
    scr = replace(sim,
                  vox=replace(sim.vox, bn_ixyz=sim.vox.bn_ixyz[p],
                              adj_bn=sim.vox.adj_bn[p],
                              mat_bn=sim.vox.mat_bn[p],
                              saf_bn=sim.vox.saf_bn[p]),
                  comms=replace(sim.comms, out_ixyz=sim.comms.out_ixyz[q],
                                out_reorder=np.argsort(q)))
    srt = sort_sim(scr)
    assert np.all(np.diff(srt.vox.bn_ixyz) > 0)
    out = _run(srt)
    assert np.allclose(out, base, rtol=0, atol=1e-12 * np.abs(base).max())


def test_fcc_fold_preserves_outputs():
    sim = synthetic_box_sim(2.6, 2.0, 1.5, h=0.12, Nt=60, fcc=True,
                            lossy=True, insig_type="hann10",
                            diff_source=False)
    base = _run(sim)
    folded = fold_fcc_sim(sim)
    assert folded.consts.fcc_flag == 2
    assert folded.vox.Ny == sim.vox.Ny // 2 + 1
    out = _run(folded)
    assert np.allclose(out, base, rtol=0, atol=1e-10 * np.abs(base).max())
    # and through the JAX engine
    out_j = _run(folded, engine="jax")
    assert np.allclose(out_j, base, rtol=0, atol=1e-10 * np.abs(base).max())


def test_rotate_after_fold_preserves_outputs():
    # the MV routing fix re-rotates the FOLDED grid (x <-> z, the folded y
    # axis stays put) to move the long axis off the lane dimension: the
    # adjacency column permutation must compose correctly with the fold's
    # y-leg swaps
    sim = synthetic_box_sim(3.1, 2.3, 1.7, h=0.09, Nt=40, fcc=True,
                            lossy=True, insig_type="impulse")
    folded = sort_sim(fold_fcc_sim(rotate_sim(sim)))
    base = _run(folded)
    rot = sort_sim(rotate_sim(folded, tr=(2, 1, 0)))
    assert rot.consts.fcc_flag == 2
    assert (rot.vox.Nx, rot.vox.Ny, rot.vox.Nz) == \
        (folded.vox.Nz, folded.vox.Ny, folded.vox.Nx)
    out = _run(rot)
    assert np.allclose(out, base, rtol=0, atol=1e-12 * np.abs(base).max())


def test_orientation_score_bulk_beats_face_tiebreak():
    # round-4 regression: the z-normal-face tiebreak at 0.5 ns/leg
    # overrode a real TX=8-vs-TX=6 bulk-rate gap on the 125-Mvox
    # synthetic hall and cost 23% of the headline (21.5 -> 16.5 GVPS).
    # Lock both decisions: the hall keeps its short axis on z (TX=8
    # plane rows), the folded MV keeps the 1664 axis on x (tiles).
    from pffdtd_tpu.prep import orientation_scores

    # synthetic bench hall, pre-fold interleaved dims; faces ~ 4x the
    # normal wall areas in voxels (two walls, ~2 cut legs per node)
    N = (792, 618, 510)
    faces = 4 * np.array([N[1] * N[2], N[0] * N[2], N[0] * N[1]])
    s = orientation_scores(N, faces, fcc=1)
    assert int(np.argmin(s)) == 2, s
    # Musikverein, folded orientation A (646, 250, 1664): axis 0 on z
    # (tr = (2, 1, 0)) affords TX=8 rows; y (folded) must score inf
    N = (646, 250, 1664)
    faces = 4 * np.array([N[1] * N[2], N[0] * N[2], N[0] * N[1]])
    s = orientation_scores(N, faces, fcc=2)
    assert s[1] == np.inf
    assert int(np.argmin(s)) == 0, s
