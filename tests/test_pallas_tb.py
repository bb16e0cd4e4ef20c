"""Deep temporally-blocked kernel (TB steps per sweep) vs the XLA engine.

Interpret-mode equivalence for TB in {3, 4}: per-call the kernel advances
TB leapfrog steps with in-kernel sources, ABC, fused impedance-plane ODEs
AND in-kernel receiver taps for the intermediate steps that never reach
HBM.  Must match the XLA composition to fp32 association tolerance (the
same bound the pair kernel meets).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pffdtd_tpu.demo import synthetic_box_sim
from pffdtd_tpu.engine.jax_engine import EngineData, JaxEngine, build_step


def _run_tb_interpret(sim, nt_run, TB, tile_x=4, adj_planes=False):
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=tile_x)
    data.attach_planes()
    data.tb = TB
    if adj_planes:
        from pffdtd_tpu.engine.pallas_pair import partition_adj_planes

        data.adj_planes = partition_adj_planes(data.adj_grid, data.grid,
                                               data.NN)
        assert data.adj_planes is not None, "no axis-plane adjacency cover"
    step, C = build_step(data, backend="pallas_tb", interpret=True)
    g = data.grid
    vh, gh = {}, {}
    planes = getattr(data, "planes", None)
    if planes is not None:
        for fam, pp in (("z", planes.z), ("y", planes.y), ("x", planes.x)):
            if pp is not None:
                s = pp.state_shape(g.Nxp)
                vh[fam] = jnp.zeros(s, np.float32)
                gh[fam] = jnp.zeros(s, np.float32)
        if getattr(data, "u2b_carry", False):
            from pffdtd_tpu.engine.pallas_pair import carry_pad

            for fam, pp in (("z", planes.z), ("y", planes.y)):
                if pp is not None:
                    vh[fam + "c"] = jnp.zeros(
                        (g.Nxp, carry_pad(pp.P), pp.ssaf.shape[2]),
                        np.float32)
    carry = (jnp.zeros(g.shape, np.float32), jnp.zeros(g.shape, np.float32),
             vh, gh, jnp.zeros(len(data.out_ixyz), np.float32))
    nt = -(-nt_run // TB) * TB
    sigs = (data.in_sigs[:, :nt] / data.infac).T.astype(np.float32)
    if sigs.shape[0] < nt:
        sigs = np.pad(sigs, ((0, nt - sigs.shape[0]), (0, 0)))
    C = jax.tree.map(jnp.asarray, C)
    groups = jnp.asarray(sigs).reshape(nt // TB, TB, -1)
    carry, ys = jax.lax.scan(lambda c, x: step(c, x, C), carry, groups)
    u = np.asarray(ys).reshape(nt, -1).T[:, :nt_run]
    return np.float64(u) * data.infac


def _compare(sim, TB, tile_x=4, adj_planes=False, tol=1e-5):
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)
    u_p = _run_tb_interpret(sim, jx.Nt, TB, tile_x=tile_x,
                            adj_planes=adj_planes)
    scale = np.abs(jx.u_out).max()
    err = np.abs(u_p - jx.u_out).max() / scale
    assert err < tol, err


def test_tb3_rigid_cart():
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=False,
                            insig_type="hann10", diff_source=False)
    _compare(sim, TB=3)


def test_tb4_rigid_cart():
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=40, lossy=False,
                            insig_type="hann10", diff_source=False)
    _compare(sim, TB=4)


def test_tb4_rigid_fcc():
    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=24, lossy=False,
                            fcc=True, insig_type="hann10", diff_source=False)
    _compare(sim, TB=4)


def test_tb4_rigid_odd_tiles_and_nt():
    # Nx-2 not a multiple of TX AND nt not a multiple of TB: exercises the
    # x padding tail fills and the group padding/trim
    sim = synthetic_box_sim(2.3, 1.9, 1.5, h=0.09, Nt=22, lossy=False,
                            insig_type="impulse", diff_source=False)
    _compare(sim, TB=4, tile_x=8)


def test_tb4_rigid_folded_fcc():
    from pffdtd_tpu.prep import fold_fcc_sim, rotate_sim, sort_sim

    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=24, lossy=False,
                            fcc=True, insig_type="hann10",
                            diff_source=False)
    sim = sort_sim(fold_fcc_sim(rotate_sim(sim)))
    _compare(sim, TB=4)


def _lossy_case(monkeypatch, TB, fcc, density, adj_planes=False):
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
    _compare(sim, TB=TB, adj_planes=adj_planes)


def test_tb3_lossy_planes_cart(monkeypatch):
    _lossy_case(monkeypatch, 3, fcc=False, density=0.3)


def test_tb4_lossy_planes_cart(monkeypatch):
    _lossy_case(monkeypatch, 4, fcc=False, density=0.3)


def test_tb4_lossy_planes_fcc(monkeypatch):
    _lossy_case(monkeypatch, 4, fcc=True, density=0.12)


def test_tb4_adj_planes_lossy_cart(monkeypatch):
    _lossy_case(monkeypatch, 4, fcc=False, density=0.3, adj_planes=True)


def test_tb4_adj_planes_rigid_fcc():
    sim = synthetic_box_sim(2.2, 1.8, 1.5, h=0.12, Nt=24, lossy=False,
                            fcc=True, insig_type="hann10", diff_source=False)
    _compare(sim, TB=4, adj_planes=True)


def test_tb_engine_run_roundtrip(monkeypatch):
    """JaxEngine with backend='pallas_tb' end-to-end (run/chunk/pad)."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    monkeypatch.setenv("PFFDTD_TB", "3")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=25, lossy=True,
                            insig_type="hann10", diff_source=False)
    jx = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                   mats=sim.mats, dtype=np.float32, backend="xla")
    jx.run(verbose=False)

    import pffdtd_tpu.engine.jax_engine as je

    orig = je.build_step

    def patched(data, **kw):
        if kw.get("backend") == "pallas_tb":
            kw["interpret"] = True
        return orig(data, **kw)

    monkeypatch.setattr(je, "build_step", patched)
    eng = JaxEngine(consts=sim.consts, vox=sim.vox, comms=sim.comms,
                    mats=sim.mats, dtype=np.float32, backend="pallas_tb",
                    tile_x=4)
    assert eng.backend == "pallas_tb" and eng.data.tb == 3
    eng.run(nt=25, verbose=False, chunk=10)   # uneven chunks + odd tail
    scale = np.abs(jx.u_out).max()
    err = np.abs(eng.u_out[:, :25] - jx.u_out[:, :25]).max() / scale
    assert err < 1e-5, err


def test_tb_u2b_carry_bit_exact(monkeypatch):
    """TB=3 u2b-carry (HBM 2-block ring for the cross-sweep stages plus
    the within-sweep VMEM ring for stage 3) is bit-exact against the
    extraction path with z- and y-plane families engaged."""
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "1")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.3")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    u3 = _run_tb_interpret(sim, 30, TB=3)
    u4 = _run_tb_interpret(sim, 30, TB=4)
    monkeypatch.setenv("PFFDTD_U2B_CARRY", "0")
    u3p = _run_tb_interpret(sim, 30, TB=3)
    u4p = _run_tb_interpret(sim, 30, TB=4)
    assert np.abs(u3 - u3p).max() == 0.0
    assert np.abs(u4 - u4p).max() == 0.0


def test_tb3_yplane_z_window(monkeypatch):
    """y-family z-window on the deeper TB kernel: scene embedded at lane
    offset 128 of a 256-lane grid, full plane coverage (no strays), must
    match the XLA reference."""
    from tests.test_pallas_pair import _extend_z

    # rings (~86/z) stay out, x-walls (252), y-walls (480), floors (600)
    # qualify: full axis-plane coverage with a windowed y family
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_COUNT", "200")
    monkeypatch.setenv("PFFDTD_ZPLANE_MIN_DENSITY", "0.0")
    sim = synthetic_box_sim(2.5, 2.0, 1.6, h=0.1, Nt=30, lossy=True,
                            insig_type="hann10", diff_source=False)
    sim = _extend_z(sim, below=128, above=256 - 128 - sim.vox.Nz)
    data = EngineData(sim.consts, sim.vox, sim.comms, sim.mats,
                      dtype=np.float32, pad_z=128, tile_x=4)
    assert data.attach_planes() == 0
    y = data.planes.y
    assert y is not None and y.z0 == 128 and y.ssaf.shape[2] == 128, \
        (y.z0, y.ssaf.shape)
    _compare(sim, TB=3)
