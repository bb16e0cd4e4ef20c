"""Temporally-blocked pair kernel vs the XLA composition (interpret mode).

The pair kernel advances TWO leapfrog steps per call with in-kernel source
injection, ABC, and fused impedance-plane ODEs; every path here must match
the XLA engine bit-for-bit at fp32 (same operation order by construction).
On real TPU hardware the same comparison runs in the bench harness.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import EngineData, JaxEngine, build_step


def _run_pair_interpret(sim, nt_run, tile_x=8, adj_planes=False,
                        lookahead=1):
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=tile_x)
    data.lookahead = lookahead
    if data.attach_planes():
        data.attach_strays()   # off-plane nodes: in-kernel stray pass
    if adj_planes:
        from pffdtd_tpu.engine.pallas_pair import partition_adj_planes

        data.adj_planes = partition_adj_planes(data.adj_grid, data.grid,
                                               data.NN)
        assert data.adj_planes is not None, "no axis-plane adjacency cover"
        assert data.adj_planes.n_planes <= 16
    step, C = build_step(data, backend="pallas_pair", interpret=True)
    g = data.grid
    vh, gh = {}, {}
    planes = getattr(data, "planes", None)
    if planes is not None:
        for fam, pp in (("z", planes.z), ("y", planes.y), ("x", planes.x)):
            if pp is not None:
                s = pp.state_shape(g.Nxp)
                vh[fam] = jnp.zeros(s, np.float32)
                gh[fam] = jnp.zeros(s, np.float32)
    if planes is not None and getattr(data, "u2b_carry", False):
        from pffdtd_tpu.engine.pallas_pair import carry_pad

        for fam, pp in (("z", planes.z), ("y", planes.y)):
            if pp is not None:
                vh[fam + "c"] = jnp.zeros(
                    (g.Nxp, carry_pad(pp.P), pp.ssaf.shape[2]), np.float32)
    strays = getattr(data, "strays", None)
    if strays is not None and int(strays.soff[-1]) > 0:
        s = strays.state_shape()
        vh["s"] = jnp.zeros(s, np.float32)
        gh["s"] = jnp.zeros(s, np.float32)
    carry = (jnp.zeros(g.shape, np.float32), jnp.zeros(g.shape, np.float32),
             vh, gh, jnp.zeros(len(data.out_ixyz), np.float32))
    nt = nt_run + (nt_run % 2)
    sigs = (data.in_sigs[:, :nt] / data.infac).T.astype(np.float32)
    if sigs.shape[0] < nt:
        sigs = np.pad(sigs, ((0, nt - sigs.shape[0]), (0, 0)))
    C = jax.tree.map(jnp.asarray, C)
    pairs = jnp.asarray(sigs).reshape(nt // 2, 2, -1)
    carry, ys = jax.lax.scan(lambda c, x: step(c, x, C), carry, pairs)
    u = np.asarray(ys).reshape(nt, -1).T[:, :nt_run]
    return np.float64(u) * data.infac


def _compare(sim, tile_x=8, adj_planes=False):
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    u_p = _run_pair_interpret(sim, jx.Nt, tile_x=tile_x,
                              adj_planes=adj_planes)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_p - jx.u_out).max() / scale
    # the kernel sums stencil legs grouped by dz (one roll per group);
    # the XLA reference sums in plain leg order -> fp32 association drift
    assert err < 1e-5, err


def test_pair_rigid_cart():
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=40, lossy=False,
                            insig_type="hann10", diff_source=False)
    _compare(sim)


def test_pair_rigid_fcc():
    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=30, lossy=False,
                            fcc=True, insig_type="hann10", diff_source=False)
    _compare(sim, tile_x=4)


def test_pair_rigid_odd_tiles():
    # Nx - 2 not a multiple of TX: exercises the x padding tail fills
    sim = synthetic_box_sim(2.3, 1.9, 1.5, h=0.09, Nt=20, lossy=False,
                            insig_type="impulse", diff_source=False)
    _compare(sim, tile_x=8)


def _lossy_case(monkeypatch, fcc, density):
    """Thresholds tuned so floors go to z-planes, y-walls to y-planes and
    x-walls to x-planes (the perimeter 'rings' fail the density test in the
    earlier families), covering ALL lossy nodes: n_stray must be 0."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", str(density))
    dims = (2.2, 1.8, 1.5, 0.12) if fcc else (2.5, 2.0, 1.6, 0.1)
    sim = synthetic_box_sim(*dims[:3], h=dims[3], Nt=30, lossy=True,
                            fcc=fcc, insig_type="hann10", diff_source=False)
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=4)
    assert data.attach_planes() == 0
    pl = data.planes
    assert pl.z is not None and pl.y is not None and pl.x is not None
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    u_p = _run_pair_interpret(sim, jx.Nt, tile_x=4)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_p - jx.u_out).max() / scale
    assert err < 1e-5, err


def test_pair_lossy_planes_cart(monkeypatch):
    _lossy_case(monkeypatch, fcc=False, density=0.3)


def test_pair_lossy_planes_fcc(monkeypatch):
    # FCC parity halves every plane fill relative to the Cartesian case
    _lossy_case(monkeypatch, fcc=True, density=0.12)


# ------------------------- adjacency-plane (unmasked bulk) stencil mode
def test_pair_adj_planes_rigid_cart():
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=40, lossy=False,
                            insig_type="hann10", diff_source=False)
    _compare(sim, adj_planes=True)


def test_pair_adj_planes_rigid_fcc():
    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=30, lossy=False,
                            fcc=True, insig_type="hann10", diff_source=False)
    _compare(sim, tile_x=4, adj_planes=True)


def test_pair_adj_planes_odd_tiles():
    sim = synthetic_box_sim(2.3, 1.9, 1.5, h=0.09, Nt=20, lossy=False,
                            insig_type="impulse", diff_source=False)
    _compare(sim, tile_x=8, adj_planes=True)


def _lossy_adj_case(monkeypatch, fcc, density):
    """Lossy ODE planes + adjacency cover planes active together."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", str(density))
    dims = (2.2, 1.8, 1.5, 0.12) if fcc else (2.5, 2.0, 1.6, 0.1)
    sim = synthetic_box_sim(*dims[:3], h=dims[3], Nt=30, lossy=True,
                            fcc=fcc, insig_type="hann10", diff_source=False)
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    u_p = _run_pair_interpret(sim, jx.Nt, tile_x=4, adj_planes=True)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_p - jx.u_out).max() / scale
    assert err < 1e-5, err


def test_pair_adj_planes_lossy_cart(monkeypatch):
    _lossy_adj_case(monkeypatch, fcc=False, density=0.3)


def test_pair_adj_planes_lossy_fcc(monkeypatch):
    _lossy_adj_case(monkeypatch, fcc=True, density=0.12)


def test_adj_planes_cover_matches_masked_bits():
    """The cover must contain every non-full node; plane-adjacency arrays
    must reproduce the grid bits at their planes."""
    from pffdtd_tpu.engine.pallas_pair import partition_adj_planes

    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=4, lossy=True)
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=4)
    ap = partition_adj_planes(data.adj_grid, data.grid, data.NN)
    assert ap is not None
    full = (1 << data.NN) - 1
    covered = np.zeros(data.grid.shape, bool)
    for zl in ap.z_lanes:
        covered[:, :, zl] = True
    for yl in ap.y_subl:
        covered[:, yl, :] = True
    for xr in ap.x_rows:
        covered[xr] = True
    assert (data.adj_grid[~covered] == full).all()
    Nyp = data.grid.Nyp
    for p, zl in enumerate(ap.z_lanes):
        np.testing.assert_array_equal(ap.zadj[:, p, :Nyp],
                                      data.adj_grid[:, :, zl])
    for p, yl in enumerate(ap.y_subl):
        np.testing.assert_array_equal(ap.yadj[:, p, :],
                                      data.adj_grid[:, yl, :])
    for p, xr in enumerate(ap.x_rows):
        np.testing.assert_array_equal(ap.xadj[p], data.adj_grid[xr])


# ------------------------------------ in-kernel stray-node boundary pass
def _stray_data(sim, tile_x):
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=tile_x)
    ns = data.attach_planes()
    data.attach_strays()
    return data, ns


def test_pair_strays_all_cart(monkeypatch):
    """Plane thresholds reject EVERYTHING: all lossy nodes go through the
    packed stray pass (gpu_engine.h:964-1056 boundary stream analogue)."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1000000000")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    data, ns = _stray_data(sim, 4)
    assert ns > 0 and data.planes.z is None and data.planes.x is None
    assert data.strays is not None and int(data.strays.soff[-1]) > 0
    _compare(sim, tile_x=4)


def test_pair_strays_all_fcc_rw1(monkeypatch):
    """FCC all-stray with the RW=1 (single-row window) kernel variant."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1000000000")
    monkeypatch.setenv("PFFDTD_STRAY_RW", "1")
    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=30, lossy=True,
                            fcc=True, insig_type="hann10", diff_source=False)
    data, ns = _stray_data(sim, 4)
    assert ns > 0 and data.strays.RW == 1
    _compare(sim, tile_x=4)


def _sloped_room(Lx=2.0, Ly=3.0, Lz1=1.6, Lz2=2.5):
    """Shoebox with a ceiling RAKED along y (Lz1 at y=0, Lz2 at y=Ly):
    voxelization staircases the sloped face into off-plane lossy nodes -
    the real-hall geometry class (raked floors/balconies) that rejects
    the axis-plane partition."""
    from pffdtd_tpu.geometry.room import RoomGeo

    v = np.array([[0, 0, 0], [Lx, 0, 0], [0, Ly, 0], [Lx, Ly, 0],
                  [0, 0, Lz1], [Lx, 0, Lz1], [0, Ly, Lz2], [Lx, Ly, Lz2]],
                 np.float64)
    tris = np.array([(0, 4, 6), (0, 6, 2), (1, 3, 7), (1, 7, 5),
                     (0, 1, 5), (0, 5, 4), (2, 6, 7), (2, 7, 3),
                     (0, 2, 3), (0, 3, 1), (4, 5, 7), (4, 7, 6)], np.int64)
    mat_ind = np.zeros(12, np.int8)
    mat_side = np.ones(12, np.int8)
    Sxyz = np.array([[0.55 * Lx, 0.6 * Ly, 0.5 * Lz1]])
    Rxyz = np.array([[0.3 * Lx, 0.3 * Ly, 0.4 * Lz1]])
    return RoomGeo.from_arrays(v, tris, mat_ind, mat_side, ["walls"],
                               Sxyz, Rxyz)


def test_pair_strays_sloped_room():
    """End-to-end sloped-geometry scene: planes cover the straight walls,
    the raked ceiling's staircase nodes run through the stray pass."""
    from pffdtd_tpu.scene_setup import mats_from_DEF_list, \
        sim_setup_from_room

    rg = _sloped_room()
    md = mats_from_DEF_list([np.array([[2.0, 5.0, 30.0],
                                       [1.0, 10.0, 300.0]])])
    sim = sim_setup_from_room(rg, md, duration=0.018, insig_type="hann10",
                              h=0.2, vox_backend="numpy", block_size=16)
    data, ns = _stray_data(sim, 4)
    assert ns > 0, "raked ceiling must leave off-plane lossy nodes"
    _compare(sim, tile_x=4)


def test_pair_planes_padded_p8(monkeypatch):
    """More than 8 planes in one family: the 3-D ssaf arrays pad their
    plane dim to a multiple of 8 (Mosaic DMA sublane tiling) with exact
    identity planes."""
    from pffdtd_tpu.scene_setup import mats_from_DEF_list, \
        sim_setup_from_room

    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.0")
    rg = _sloped_room()
    md = mats_from_DEF_list([np.array([[2.0, 5.0, 30.0],
                                       [1.0, 10.0, 300.0]])])
    sim = sim_setup_from_room(rg, md, duration=0.018, insig_type="hann10",
                              h=0.2, vox_backend="numpy", block_size=16)
    data, _ = _stray_data(sim, 4)
    zp = data.planes.z
    assert zp is not None and zp.P > 8 and zp.ssaf.shape[1] % 8 == 0
    _compare(sim, tile_x=4)


def test_pair_strays_zwindow(monkeypatch):
    """Sub-Nzp z-windowed stray chunks (the long-hall configuration:
    gather/scatter matmuls restricted to a 128-lane window)."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1000000000")
    monkeypatch.setenv("PFFDTD_STRAY_ZW", "128")
    sim = synthetic_box_sim(1.6, 1.2, 26.0, h=0.1, Nt=24, lossy=True,
                            insig_type="hann10", diff_source=False)
    data, ns = _stray_data(sim, 4)
    st = data.strays
    assert ns > 0 and st.ZW == 128 and int(st.sz0.max()) >= 128
    _compare(sim, tile_x=4)


def test_pair_strays_many_segments(monkeypatch):
    """maxc >> SEG: the segmented state-DMA pipeline runs multiple
    double-buffered rounds per tile (incl. tail over-fetch)."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1000000000")
    monkeypatch.setenv("PFFDTD_STRAY_TS", "128")
    monkeypatch.setenv("PFFDTD_STRAY_YW", "128")
    sim = synthetic_box_sim(0.9, 3.4, 3.0, h=0.07, Nt=24, lossy=True,
                            insig_type="hann10", diff_source=False)
    data, ns = _stray_data(sim, 4)
    st = data.strays
    assert ns > 0 and st.maxc > 4 * st.SEG, (st.maxc, st.SEG)
    _compare(sim, tile_x=4)


def test_pair_u2b_carry_bit_exact(monkeypatch):
    """The u2b-carry path (plane-ODE u^{step-1} sheets carried in plane
    layout instead of re-extracted from the prev field) is bit-exact
    against the extraction path, with both z- and y-plane families
    engaged."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=8)
    data.attach_planes()
    from pffdtd_tpu.engine.pallas_pair import carry_ok
    ii = np.asarray(data.in_ixyz)
    g = data.grid
    pts = np.stack([ii // (g.Nyp * g.Nzp), (ii // g.Nzp) % g.Nyp,
                    ii % g.Nzp], 1)
    assert carry_ok(data.planes, pts)
    assert data.planes.z is not None and data.planes.y is not None
    u_carry = _run_pair_interpret(sim, 30)
    monkeypatch.setenv("PFFDTD_U2B_CARRY", "0")
    u_plain = _run_pair_interpret(sim, 30)
    assert np.abs(u_carry - u_plain).max() == 0.0


def test_pair_u2b_carry_source_on_plane_guard():
    """A source sitting on an owned plane coordinate disables the carry
    (injection lands after the plane stages and would be missed)."""
    from pffdtd_tpu.engine.pallas_pair import carry_ok

    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=16, lossy=True,
                            insig_type="hann10", diff_source=False)
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=8)
    data.attach_planes()
    if data.planes.z is None:
        return
    g = data.grid
    zs = {int(v) for v in data.planes.z.zp}
    ypl = data.planes.y
    ys = {int(v) for v in ypl.yp} if ypl is not None else set()
    zl = int(data.planes.z.zp[0])
    pts = np.array([[5, 5, zl]])
    assert not carry_ok(data.planes, pts)
    # off-plane source: search the complements so the positive case is
    # never vacuous (ADVICE r3: hardcoded 5/zl+-1 could collide)
    z_off = next(z for z in range(1, g.Nz - 1) if z not in zs)
    y_off = next(y for y in range(1, g.Ny - 1) if y not in ys)
    assert carry_ok(data.planes, np.array([[5, y_off, z_off]]))
    if ys:
        assert not carry_ok(data.planes,
                            np.array([[5, next(iter(ys)), z_off]]))


def _extend_z(sim, below, above):
    """Embed the scene in a taller z grid (plain decoupled air lanes
    below/above): the interior physics is unchanged, but the y-plane
    node lanes now occupy a 128-aligned SUB-window of Nzp — exercising
    the y-family z-window (BoundaryYPlanes.z0 > 0, W < Nzp)."""
    from dataclasses import replace

    from pffdtd_tpu.utils import ind2sub3d

    vox, comms = sim.vox, sim.comms
    Nx, Ny, Nz = vox.Nx, vox.Ny, vox.Nz
    Nz2 = Nz + below + above

    def remap(ixyz):
        ix, iy, iz = ind2sub3d(np.asarray(ixyz), Nx, Ny, Nz)
        return (ix * Ny + iy) * Nz2 + iz + below

    from dataclasses import replace as _r
    h = vox.h
    zv2 = np.r_[vox.zv[0] - h * np.arange(below, 0, -1), vox.zv,
                vox.zv[-1] + h * np.arange(1, above + 1)]
    vox2 = _r(vox, Nz=Nz2, zv=zv2, bn_ixyz=remap(vox.bn_ixyz))
    comms2 = _r(comms, in_ixyz=remap(comms.in_ixyz),
                out_ixyz=remap(comms.out_ixyz))
    return replace(sim, vox=vox2, comms=comms2)


def test_pair_yplane_z_window(monkeypatch):
    """y-plane states/ssaf/ODE confined to the 128-aligned union z-span:
    with the scene embedded at lane offset 128 in a 256-lane grid the
    partition must window (z0=128, W=128) and the kernel must still
    match the XLA reference exactly."""
    # count threshold: per-z rings (~114 nodes) stay out of the z family,
    # floors (~600), y-walls (~480) and x-walls (~432) qualify — density
    # can't split them here because extending Nzt dilutes the y-walls
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "300")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.0")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    sim = _extend_z(sim, below=128, above=256 - 128 - sim.vox.Nz)
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=4)
    data.attach_planes()   # edge/corner leftovers ride the stray pass
    y = data.planes.y
    assert y is not None and y.z0 == 128 and y.ssaf.shape[2] == 128, \
        (y.z0, y.ssaf.shape)
    assert data.grid.Nzp == 256
    _compare(sim, tile_x=4)


def test_pair_lookahead2_bit_exact(monkeypatch):
    """Input-DMA lookahead LA=2 only deepens the u0b/state input rings;
    the math must be BIT-identical to the historical LA=1 schedule
    (lossy z/y planes + a stray ceiling exercise every input ring)."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=24, lossy=True,
                            insig_type="hann10", diff_source=False)
    u1 = _run_pair_interpret(sim, 24, tile_x=4)
    u2 = _run_pair_interpret(sim, 24, tile_x=4, lookahead=2)
    assert np.array_equal(u1, u2)
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(nt=24, verbose=False)
    scale = np.abs(jx.u_out).max()
    assert np.abs(u2[:, :24] - jx.u_out[:, :24]).max() / scale < 1e-5
