"""Deep-DMA-ring tiled boundary kernel vs the auto-pipelined original.

The ring rewrite changes ONLY the window streaming (manual K-deep DMA ring
instead of Mosaic's depth-2 auto pipeline); processing order and math are
unchanged, so outputs must be bit-identical in interpret mode.
"""

import numpy as np
import jax.numpy as jnp

from pffdtd_tpu.engine.coeffs import MatCoeffs, SchemeCoeffs
from pffdtd_tpu.engine.pallas_boundary import (build_boundary_ring,
                                               build_boundary_update,
                                               partition_boundary)
from pffdtd_tpu.io.h5 import MMb


def _mats(nmat=2, Mb=3):
    from pffdtd_tpu.scene_setup import mats_from_DEF_list

    rng = np.random.default_rng(7)
    mats = [rng.uniform(0.5, 5.0, (Mb, 3)) for _ in range(nmat)]
    return MatCoeffs.from_mats(mats_from_DEF_list(mats), Ts=1e-4)


def _case(n_elements, nodes, T, wr, seed=0):
    rng = np.random.default_rng(seed)
    bnl = np.sort(rng.choice(n_elements, size=nodes, replace=False))
    ssaf = rng.uniform(0.5, 2.0, nodes)
    mat = rng.integers(0, 2, nodes).astype(np.int32)
    mc = _mats()
    sc = SchemeCoeffs.make(1.0 / np.sqrt(3.0), 1.0 / 3.0, False, eps=0.0)
    bt = partition_boundary(bnl, ssaf.astype(np.float32), mat, mc,
                            n_elements, T=T, wr=wr)

    upd_a, nd_a = build_boundary_update(bt, sc, n_elements, interpret=True)
    upd_r, nd_r = build_boundary_ring(bt, sc, n_elements, interpret=True)

    N = bt.n_tiles * bt.T
    unew = jnp.asarray(rng.standard_normal(n_elements).astype(np.float32))
    u2b = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    vh = jnp.asarray(rng.standard_normal((bt.n_tiles, MMb, bt.T)).astype(np.float32))
    gh = jnp.asarray(rng.standard_normal((bt.n_tiles, MMb, bt.T)).astype(np.float32))

    o_a = upd_a(unew, u2b, vh, gh,
                {k: jnp.asarray(v) for k, v in nd_a.items()})
    o_r = upd_r(unew, u2b, vh, gh,
                {k: jnp.asarray(v) for k, v in nd_r.items()})
    for a, r, name in zip(o_a, o_r, ("unew", "ub", "vh0", "gh")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r),
                                      err_msg=name)


def test_ring_matches_auto_sparse():
    # strays spread thinly over many windows (the Musikverein regime)
    _case(n_elements=128 * 128 * 8, nodes=700, T=128, wr=128)


def test_ring_matches_auto_dense_runs():
    # clustered nodes: several tiles per window, exercises first=0 chains
    rng = np.random.default_rng(3)
    base = np.arange(0, 5000, 2)
    extra = np.sort(rng.choice(np.arange(60000, 70000), 800, replace=False))
    bnl = np.unique(np.r_[base, extra])
    n_elements = 128 * 128 * 8
    mc = _mats()
    sc = SchemeCoeffs.make(1.0, 1.0, True, eps=0.0)
    ssaf = rng.uniform(0.5, 2.0, bnl.size).astype(np.float32)
    mat = rng.integers(0, 2, bnl.size).astype(np.int32)
    bt = partition_boundary(bnl, ssaf, mat, mc, n_elements, T=256, wr=256)
    upd_a, nd_a = build_boundary_update(bt, sc, n_elements, interpret=True)
    upd_r, nd_r = build_boundary_ring(bt, sc, n_elements, interpret=True)
    N = bt.n_tiles * bt.T
    unew = jnp.asarray(rng.standard_normal(n_elements).astype(np.float32))
    u2b = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    vh = jnp.asarray(rng.standard_normal((bt.n_tiles, MMb, bt.T)).astype(np.float32))
    gh = jnp.asarray(rng.standard_normal((bt.n_tiles, MMb, bt.T)).astype(np.float32))
    o_a = upd_a(unew, u2b, vh, gh,
                {k: jnp.asarray(v) for k, v in nd_a.items()})
    o_r = upd_r(unew, u2b, vh, gh,
                {k: jnp.asarray(v) for k, v in nd_r.items()})
    for a, r, name in zip(o_a, o_r, ("unew", "ub", "vh0", "gh")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r),
                                      err_msg=name)


def test_ring_single_window():
    # everything in one window: warm-up + drain paths with n_seq = 1
    _case(n_elements=128 * 128 * 2, nodes=300, T=128, wr=256, seed=11)


def test_stray_partition_invariants():
    """partition_boundary_strays: every node lands in a chunk owned by
    its x-tile, inside the chunk's window, with exact f32 node data."""
    import numpy as np
    from pffdtd_tpu.engine.coeffs import MatCoeffs
    from pffdtd_tpu.engine.pallas_boundary import (MMb,
                                                   partition_boundary_strays)

    rng = np.random.default_rng(7)
    Nxp, Nyp, Nzp = 34, 48, 384
    TX = 4
    NXT = -(-(Nxp - 2) // TX)
    N = 3000
    flat = rng.choice(Nxp * Nyp * Nzp, N, replace=False)
    # keep interior x rows only (1..Nx-2)
    ix = flat // (Nyp * Nzp)
    flat = flat[(ix >= 1) & (ix <= Nxp - 2)]
    N = flat.size
    ssaf = rng.uniform(0.5, 2.0, N).astype(np.float32)
    mats = rng.integers(0, 3, N).astype(np.int32)
    mc = MatCoeffs.from_mats(None, 1e-5) if False else None
    # minimal MatCoeffs stand-in
    class MC:
        b = np.ones((4, MMb))
        bd = np.ones((4, MMb)) * 2
        bDh = np.ones((4, MMb)) * 3
        bFh = np.ones((4, MMb)) * 4
        beta = np.arange(4, dtype=float)
    st = partition_boundary_strays(flat, ssaf, mats, MC, (Nxp, Nyp, Nzp),
                                   TX, NXT)
    assert st.soff.shape == (NXT + 1,) and st.soff[-1] == st.n_chunks
    assert st.nd.shape[0] == st.n_chunks + st.SEG
    iz = flat % Nzp
    iy = (flat // Nzp) % Nyp
    ixn = flat // (Nyp * Nzp)
    for i in range(N):
        slot = st.node_slot[i]
        c, j = divmod(int(slot), st.TS)
        t = int(np.searchsorted(st.soff, c, side="right")) - 1
        assert (ixn[i] - 1) // TX == t          # chunk owned by the tile
        w = int(st.nd[c, 0, j])
        r = w // st.YW + (int(st.sr0[c]) if st.RW == 1 else 0)
        y = w % st.YW + int(st.sy0[c])
        z = int(st.nd[c, 1, j]) + int(st.sz0[c])
        assert r == (ixn[i] - 1) % TX or st.RW == 1
        assert y == iy[i] and z == iz[i]
        assert st.nd[c, 2, j] == mats[i]
        assert st.nd[c, 3, j] == ssaf[i]
        assert st.nd[c, 4, j] == 1.0
    # padding lanes are invalid
    for c in range(st.n_chunks):
        n = int((st.nd[c, 4] > 0).sum())
        assert np.all(st.nd[c, 4, :n] == 1.0)
        assert np.all(st.nd[c, 4, n:] == 0.0)
