"""Temporally-blocked Pallas TPU kernel: TWO leapfrog steps per slab visit.

The single-step fused kernel (pallas_stencil.py) is DMA-bound at the measured
~335 GB/s Pallas aggregate: per step it streams u1 slab + u0 + adj in and
unew out (~3.5*TX + 2 row-planes per tile).  Temporal blocking halves the
per-step traffic: one sweep over x-row tiles advances u^{n-1},u^n ->
u^{n+1},u^{n+2}, reading u1/u0/adj ONCE and writing the two new fields ONCE
(~4.5*TX + 2 row-planes per tile per TWO steps).

Pipeline (visit t; one extra drain visit at the end):

    stage 1 (step n):   u2 rows of tile t   = f(u1 slab,   u0 block)
    stage 2 (step n+1): u3 rows of tile t-1 = f(u2 slab,   u1 rows)

Stage 2 trails stage 1 by one tile: its u2 stencil slab needs the first row
of tile t (computed this visit) and the last row of tile t-2 (still in the
3-deep u2 VMEM ring).  Everything the intermediate step needs is applied
IN-KERNEL while the rows are resident: halo mirror flips, the
adjacency-masked stencil + leapfrog, the Engquist-Majda ABC, the
frequency-dependent impedance ODE on boundary planes (z- and y-normal
planes), and source injection for both steps (the reference injects after
the boundary updates of each step, cpu_engine.h:309-313), so u2 is complete
before stage 2 consumes it.

DANGER - aliasing: u2 overwrites u0's HBM buffer and u3 overwrites u1's
(input_output_aliases).  The schedule keeps every read ahead of the aliased
writes: u2(t) writes rows <= t*TX+TX while visit t+1's u0 prefetch reads
rows >= (t+1)*TX+1, and u3(t-1) writes rows <= t*TX while visit t+1's u1
slab prefetch reads rows >= (t+1)*TX.  Receiver readout of u^n happens
outside the kernel BEFORE the call (XLA orders the gather ahead of the
aliased kernel); u^{n+1} is read back from the u2 output.

Impedance-plane states (vh/gh) alias in/out too: a visit reads rows
[t*TX+1, t*TX+TX+1) of state^n (prefetched one visit ahead) and writes the
same rows back as state^{n+2} only after stage 2 - the row ranges a write
touches are never re-read later in the sweep.

Reference anchors: leapfrog + rigid update gpu_engine.h:220-348; ABC
cpu_engine.h:144-172,224-229; boundary ODE cpu_engine.h:362-405; the
two-stream air/boundary overlap this kernel replaces: gpu_engine.h:964-1056.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pffdtd_tpu.voxelizer.vox import CART_VECTORS, FCC_VECTORS


@dataclass
class AdjPlanes:
    """Axis-plane cover of every node whose adjacency mask is not full.

    When such a cover exists (box-like scenes: walls voxelize to a handful
    of axis-normal layers) the pair kernel runs the UNMASKED neighbour sum
    on the bulk — no per-leg bit unpack, no adjacency-grid streaming at all
    — and recomputes the masked stencil only on these static planes from
    the small per-plane adjacency arrays below (packed bits as int32)."""

    z_lanes: list[int]           # static z lanes
    zadj: np.ndarray | None      # (Nxp, PZA, Wy) int32, Wy 128-aligned
    y_subl: list[int]            # static y sublanes
    yadj: np.ndarray | None      # (Nxp, PYA, Nzp) int32
    x_rows: list[int]            # full x rows (true coords, 1..Nx-2)
    xadj: np.ndarray | None      # (PXA, Nyp, Nzp) int32

    @property
    def n_planes(self):
        return len(self.z_lanes) + len(self.y_subl) + len(self.x_rows)


def partition_adj_planes(adj_grid, grid, NN: int, max_per_axis: int = 16,
                         max_total: int | None = None) -> AdjPlanes | None:
    """Greedy axis-plane set cover of the non-full-adjacency nodes.

    Returns None when no cover within the limits exists (sloped/curved
    geometry: the masked-stencil path stays in charge).  The greedy pick
    (largest remaining plane first) is exact for disjoint wall layers and
    a fine approximation otherwise — the limit only bounds kernel cost."""
    if max_total is None:
        max_total = int(os.environ.get("PFFDTD_ADJ_MAX", 2 * max_per_axis))
    fullv = adj_grid.dtype.type((1 << NN) - 1)
    nf = np.argwhere(adj_grid != fullv)
    planes: list[tuple[int, int]] = []   # (axis, coord)
    per_axis = [0, 0, 0]
    while len(nf):
        if len(planes) >= max_total:
            return None
        best = None
        for ax in range(3):
            if per_axis[ax] >= max_per_axis:
                continue
            cnt = np.bincount(nf[:, ax])
            i = int(np.argmax(cnt))
            if best is None or cnt[i] > best[2]:
                best = (ax, i, int(cnt[i]))
        if best is None or best[2] == 0:
            return None
        ax, v, _ = best
        planes.append((ax, v))
        per_axis[ax] += 1
        nf = nf[nf[:, ax] != v]

    Nxp, Nyp, Nzp = grid.shape
    x_rows = sorted(v for ax, v in planes if ax == 0)
    y_subl = sorted(v for ax, v in planes if ax == 1)
    z_lanes = sorted(v for ax, v in planes if ax == 2)
    # planes landing on halo/pad coordinates have no kernel support: fall
    # back to the masked path instead of tripping build_fused_pair asserts
    if any(not 1 <= x <= grid.Nx - 2 for x in x_rows):
        return None
    if any(not 1 <= z <= grid.Nz - 2 for z in z_lanes):
        return None
    if any(not 1 <= y <= grid.Ny - 2 for y in y_subl):
        return None
    a32 = np.asarray(adj_grid, np.int32)
    zadj = yadj = xadj = None
    if z_lanes:
        # lane dim 128-aligned, plane (sublane) dim 8-aligned: both are
        # Mosaic DMA tiling requirements for the sliced ring copies
        Wy = -(-Nyp // 128) * 128
        zadj = np.zeros((Nxp, -(-len(z_lanes) // 8) * 8, Wy), np.int32)
        for p, zl in enumerate(z_lanes):
            zadj[:, p, :Nyp] = a32[:, :, zl]         # (Nxp, PZA8, Wy)
    if y_subl:
        yadj = np.zeros((Nxp, -(-len(y_subl) // 8) * 8, Nzp), np.int32)
        for p, yl in enumerate(y_subl):
            yadj[:, p, :] = a32[:, yl, :]            # (Nxp, PYA8, Nzp)
    if x_rows:
        xadj = np.ascontiguousarray(a32[x_rows])     # (PXA, Nyp, Nzp)
    return AdjPlanes(z_lanes=z_lanes, zadj=zadj, y_subl=y_subl, yadj=yadj,
                     x_rows=x_rows, xadj=xadj)


_NO_ROLLS = bool(os.environ.get("PFFDTD_ABLATE", "").count("rolls"))


def _roll(x, shift, axis):
    if _NO_ROLLS:   # perf ablation only - numerically wrong
        return x
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _roll2(x, dy, dz):
    """result[y,z] = x[y+dy, z+dz] (wrap; wrapped lanes only ever feed halo
    or padding positions, which the mirror flips rebuild)."""
    if dy:
        x = _roll(x, -dy, 1)
    if dz:
        x = _roll(x, -dz, 2)
    return x


def carry_pad(P: int) -> int:
    """Sublane extent of the u2b-carry arrays for a P-plane family: the
    two per-stage blocks [0:P] and [P:2P] stage-major, 8-padded so DMA
    row slices satisfy the Mosaic sublane-tiling rule."""
    return max(8, -(-2 * P // 8) * 8)


def carry_bytes_per_row(planes, itemsize: int = 4, tb: int = 2) -> int:
    """Extra VMEM scratch bytes per TX row for the u2b-carry rings
    (3 input slots + 2 output slots per z/y family, plus tb > 2's
    3-slot within-sweep intermediate ring)."""
    b = 0
    for pp in (planes.z, planes.y):
        if pp is not None:
            W = pp.ssaf.shape[2]
            b += 5 * carry_pad(pp.P) * W * itemsize
            if tb > 2:
                niz = pp.P * (tb - 2)
                b += 3 * (-(-niz // 8) * 8) * W * itemsize
    return b


def carry_ok(planes, in_pts) -> bool:
    """True when the pair kernel may carry the plane-ODE u^{step-1}
    values instead of re-extracting them from the previous field.

    The carried value is the post-ODE plane sheet — identical to the
    field at every node the family owns (ssaf > 0) because later
    in-sweep writes (the other families' ODE sheets) are exact
    identities there.  The one exception is source injection, which
    lands AFTER the plane stages: a source sitting on a plane
    coordinate would be missed, so such scenes fall back to the
    extraction path.

    NOTE: build_step caches the decision on data.u2b_carry, so the
    PFFDTD_U2B_CARRY env override is LATCHED per EngineData - toggling
    it between build_step calls on the same EngineData has no effect
    (rebuild the EngineData, or set data.u2b_carry explicitly)."""
    if planes is None or (planes.z is None and planes.y is None):
        return False
    if os.environ.get("PFFDTD_U2B_CARRY", "1") == "0":
        return False
    zs = ({int(v) for v in planes.z.zp} if planes.z is not None else set())
    ys = ({int(v) for v in planes.y.yp} if planes.y is not None else set())
    for _, gy, gz in np.asarray(in_pts, np.int64).reshape(-1, 3):
        if int(gz) in zs or int(gy) in ys:
            return False
    return True


def build_fused_pair(grid, sc, fcc: bool, dtype=jnp.float32, TX: int = 8,
                     interpret: bool = False, in_pts=None, planes=None,
                     lookahead: int = 1,
                     adj_planes: AdjPlanes | None = None,
                     shard: tuple[int, int] | None = None,
                     strays=None, u2b_carry: bool = False):
    """Returns fn(u1, u0, adj, sig2, states) -> (u3, u2, new_states).

    grid: GridSpec; sc: SchemeCoeffs.  in_pts: (Nin, 3) STATIC source-node
    (row, y, z) coordinates in the padded layout; both steps' samples are
    injected in-kernel from the sig2 (2, Nin) SMEM input.  planes: optional
    BoundaryPlanes with z/y-normal impedance plane partitions; states is a
    {"z": (vh, gh), "y": (vh, gh)} pytree matching it ({} when planes is
    None).  Requires Nxp >= NXT*TX + 2, NXT = ceil((Nx-2)/TX).

    strays: optional BoundaryStrays (pallas_boundary) fusing OFF-PLANE
    lossy nodes (sloped/curved geometry) in-kernel: per x-tile window
    chunks of <= TS packed nodes are gathered from the resident output
    ring by exact one-hot MXU matmuls, advanced through the impedance ODE
    as dense vectors, and the deltas scattered back before the HBM flush;
    per-chunk states round-trip HBM between the two stages like x-planes.
    With strays attached the pair kernel runs ARBITRARY geometry (the
    reference's air/boundary stream split, gpu_engine.h:964-1056).
    states/pconsts then carry an extra "s" family: states["s"] = (svh,
    sgh) of shape strays.state_shape(); pconsts["s"] = (nd, tableT, soff,
    sr0, sy0).

    adj_planes: optional AdjPlanes cover of all non-full-adjacency nodes.
    When given, `adj` in the returned fn is a {"z"/"y"/"x": int32 array}
    dict of the per-plane adjacency (NOT the grid — the full adjacency
    grid is neither read nor streamed): the bulk runs the unmasked
    neighbour sum and the masked stencil is recomputed on the cover planes
    only.  Numerically equivalent to the masked path but NOT bitwise: the
    fix-up sums legs in plain k order while the masked bulk groups legs by
    dz (a different fp association; tests assert 1e-5 agreement).

    shard: optional (S, Nx_global) enables the x-slab SPMD variant: grid
    holds the LOCAL extents with TWO ghost rows per side (local interior
    rows 1..S+2 overlap-compute the neighbour-edge u2 so stage 2 needs no
    mid-pair exchange; the engine ppermutes two u1 planes per side per
    call).  The returned fn then takes scal (3,) i32 SMEM =
    [x0, is_first, is_last] (global row of local row i is i + x0) and
    in_pts is read at runtime from an SMEM (3, Nin) per-shard LOCAL
    coordinate array (out-of-range rows simply never match a tile).
    x-normal lossy planes run from RUNTIME rows (the xpr SMEM array);
    planes on duplicated shard-overlap rows are given to BOTH owners and
    the engine grafts the owner's post-pair state over the duplicate's.
    """
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    Nxp, Nyp, Nzp = grid.shape
    folded = grid.folded
    SHARDED = shard is not None
    S_sh, NXG = shard if SHARDED else (Nx - 2, Nx)
    if SHARDED:
        assert Nx == S_sh + 4, (Nx, S_sh)
    VV = (FCC_VECTORS if fcc else CART_VECTORS).astype(np.int64)
    NN = VV.shape[0]

    NXT = -(-(Nx - 2) // TX)
    assert Nxp >= NXT * TX + 2, (Nxp, NXT, TX)

    npdt = np.float32 if dtype == jnp.float32 else np.float64
    a2 = npdt(sc.a2)
    sl2 = npdt(sc.sl2)
    two = npdt(2.0)
    l_ = sc.l
    lo2 = npdt(sc.lo2)
    lv = npdt(sc.l)
    half = npdt(0.5)
    abc_w = [npdt(1.0 / (1.0 + l_ * q)) for q in range(4)]

    in_pts = np.zeros((0, 3), np.int64) if in_pts is None else \
        np.asarray(in_pts, np.int64)
    Nin = int(in_pts.shape[0])

    zpl = planes.z if planes is not None else None
    ypl = planes.y if planes is not None else None
    xpl = planes.x if planes is not None else None
    PZ = zpl.P if zpl is not None else 0
    PY = ypl.P if ypl is not None else 0
    PX = xpl.P if xpl is not None else 0
    zp_lanes = [int(z) for z in zpl.zp] if PZ else []
    yp_subl = [int(y) for y in ypl.yp] if PY else []
    xp_rows = [int(x) for x in xpl.xp] if PX else []
    MZ = zpl.MZ if PZ else (ypl.MZ if PY else (xpl.MZ if PX else 8))
    Nyw = zpl.ssaf.shape[2] if PZ else 128
    # y-family z-window: the partition confines states/ssaf/ODE work to
    # the 128-aligned union lane span [YZ0, YZ0 + WY) (exact: the ODE is
    # an identity on the nodeless lanes outside it)
    WY = ypl.ssaf.shape[2] if PY else 128
    YZ0 = int(getattr(ypl, "z0", 0)) if PY else 0
    # ssaf plane dims may be 8-padded (identity planes) for DMA tiling
    PZ8 = zpl.ssaf.shape[1] if PZ else 0
    PY8 = ypl.ssaf.shape[1] if PY else 0
    CY = min(xpl.CY, Nyp) if PX else 8
    if PX and not SHARDED:
        assert all(1 <= x <= Nx - 2 for x in xp_rows), xp_rows
    # sharded x-planes: the SPMD program is shard-uniform, so plane rows
    # are RUNTIME values from an SMEM array (one fleet-max-padded set per
    # shard; inactive planes carry ssaf = 0 = exact identity)
    XDYN = SHARDED and PX > 0
    if SHARDED:
        assert adj_planes is None, "adj-planes mode is single-device only"
    # u2b carry (designed round 3): each plane stage's u^{step-1} sheet is
    # the SAME stage's post-ODE output one sweep earlier, so it round-trips
    # HBM in plane layout ((S2P, W): stage-major blocks [0:P] / [P:2P])
    # instead of being re-extracted from the prev-field block — cutting the
    # transposing lane/sublane pulls from 6 to 4 per plane per sweep.
    # Bit-exact for u wherever the family's ssaf > 0 (see carry_ok).
    CARRY = bool(u2b_carry) and not SHARDED and (PZ > 0 or PY > 0)
    S2PZ = carry_pad(PZ) if (PZ and CARRY) else 0
    S2PY = carry_pad(PY) if (PY and CARRY) else 0

    ap = adj_planes
    NOFULL = ap is not None
    za_lanes = [int(z) for z in ap.z_lanes] if NOFULL else []
    ya_subl = [int(y) for y in ap.y_subl] if NOFULL else []
    xa_rows = [int(x) for x in ap.x_rows] if NOFULL else []
    AZ, AY, AX = len(za_lanes), len(ya_subl), len(xa_rows)
    if NOFULL:
        assert all(1 <= z <= Nz - 2 for z in za_lanes), za_lanes
        assert all(1 <= y <= Ny - 2 for y in ya_subl), ya_subl
        assert all(1 <= x <= Nx - 2 for x in xa_rows), xa_rows
    st = strays
    NST = st is not None and int(st.soff[-1]) > 0
    if NST:
        # SHARDED + strays: the engine partitions chunks per shard with
        # fleet-uniform static shapes; nodes on duplicated overlap rows
        # go to BOTH owners and the owner's post-pair state is grafted
        # over the duplicate's (see ShardedPairEngine)
        assert not NOFULL, \
            "stray fusion needs the masked bulk (off-plane masked values)"
        from pffdtd_tpu.io.h5 import MMb as S_MMB
        S_TS, S_RW, S_YW = st.TS, st.RW, st.YW
        S_ZW = st.ZW
        S_MZS, S_MAXC = st.MZS, st.maxc
        S_CR8, S_NmP = st.tableT.shape
        S_NM = st.n_mats
        S_WW = S_RW * S_YW
        S_SEG = st.SEG
        S_ZFULL = S_ZW == Nzp
        assert S_RW in (1, TX) and S_YW % 8 == 0 and S_TS % 128 == 0
        assert S_ZFULL or S_ZW % 128 == 0

    # input-DMA lookahead: tiles of input in flight beyond the one being
    # computed.  LA=1 is the historical single-tile lookahead; LA=2 keeps
    # a second tile's inputs in flight (the round-5 DMA probes measured
    # reads at 438 GB/s with 2 outstanding copies vs 540 with 4 — the
    # wait_in(t) stall right after start_in(t+1) is the bulk's gap to the
    # ~555 GB/s chip ceiling).  Costs one more u0b/zvi/zgi/yvi/ygi slot;
    # the engine enables it only when VMEM affords it without shrinking
    # TX.  Output rings and the stage-2 pipeline are untouched: the
    # aliased u2/u0 (u3/u1) HBM rows stay disjoint because reads lead
    # writes by >= 2 tiles.
    LA = max(1, min(int(lookahead), 2))
    U0D = 1 + LA              # u0b / plane-state input ring depth
    # slab/adj/ssaf/carry input rings are read by stage 2 of tile t-1
    # while tile t+LA's DMA lands: live range [t-1, t+LA] = LA+2 slots
    SLD = 2 + LA

    cfull = npdt(two - sl2 * npdt(NN))
    # PFFDTD_ABLATE: comma list of kernel pieces to SKIP (perf debugging
    # only - results are numerically wrong): abc, ode, flips, rolls, fixup
    ABLATE = set(filter(None,
                        os.environ.get("PFFDTD_ABLATE", "").split(",")))
    # y-chunk size for the x-row fix-up sheets ((Nyp, Nzp) temporaries
    # would stress the Mosaic VMEM stack at grid scale)
    CYA = min(64, Nyp)

    adt = jnp.uint16 if NN == 12 else jnp.uint8

    def kernel(*refs):
        it = iter(refs)
        sig = next(it)                     # SMEM (2, max(Nin, 1))
        scal = next(it) if SHARDED else None   # SMEM (3,) i32
        iptr = next(it) if SHARDED else None   # SMEM (3, max(Nin, 1)) i32
        xpr = next(it) if XDYN else None       # SMEM (PX,) i32 local rows
        u1_h = next(it)
        u0_h = next(it)
        adj_h = None if NOFULL else next(it)
        zadj_h = next(it) if AZ else None  # (Nxp, PZA, Wy) i32
        yadj_h = next(it) if AY else None  # (Nxp, PYA, Nzp) i32
        xadj_h = next(it) if AX else None  # (PXA, Nyp, Nzp) i32
        zvh_h = next(it) if PZ else None   # (Nxp, PZ, MZ, Nyw)
        zgh_h = next(it) if PZ else None
        zsf_h = next(it) if PZ else None   # (Nxp, PZ, Nyw)
        zco = next(it) if PZ else None     # VMEM (PZ, 5*MZ, Nyw)
        zbet = next(it) if PZ else None    # SMEM (PZ,) per-plane beta
        zub_h = next(it) if (PZ and CARRY) else None  # (Nxp, S2PZ, Nyw)
        yvh_h = next(it) if PY else None   # (Nxp, PY, MZ, Nzp)
        ygh_h = next(it) if PY else None
        ysf_h = next(it) if PY else None   # (Nxp, PY, Nzp)
        yco = next(it) if PY else None     # VMEM (PY, 5*MZ, Nzp)
        ybet = next(it) if PY else None    # SMEM (PY,)
        yub_h = next(it) if (PY and CARRY) else None  # (Nxp, S2PY, Nzp)
        xvh_h = next(it) if PX else None   # (PX, Nyp, MZ, Nzp)
        xgh_h = next(it) if PX else None
        xsf_h = next(it) if PX else None   # (PX, Nyp, Nzp)
        xco = next(it) if PX else None     # VMEM (PX, 5*MZ, Nzp)
        xbet = next(it) if PX else None    # SMEM (PX,)
        svh_h = next(it) if NST else None  # (NCH, MZS, TS) stray states
        sgh_h = next(it) if NST else None
        snd_h = next(it) if NST else None  # (NCH, 8, TS) f32 node data
        stab = next(it) if NST else None   # VMEM (CR8, NmP) coef columns
        ssoff = next(it) if NST else None  # SMEM (NXT+1,) i32
        ssr0 = next(it) if NST else None   # SMEM (NCH,) i32
        ssy0 = next(it) if NST else None   # SMEM (NCH,) i32
        ssz0 = next(it) if NST else None   # SMEM (NCH,) i32
        u3_h = next(it)
        u2_h = next(it)
        zvo_h = next(it) if PZ else None
        zgo_h = next(it) if PZ else None
        zuo_h = next(it) if (PZ and CARRY) else None
        yvo_h = next(it) if PY else None
        ygo_h = next(it) if PY else None
        yuo_h = next(it) if (PY and CARRY) else None
        xvo_h = next(it) if PX else None
        xgo_h = next(it) if PX else None
        svo_h = next(it) if NST else None  # aliased stray vh states
        sgo_h = next(it) if NST else None

        def body(slab, u0b, adjb, u2r, slab2, u3b,
                 zvi, zgi, zsf, zvo, zgo, zui, zuo, zst,
                 yvi, ygi, ysf, yvo, ygo, yui, yuo, yst,
                 xv, xg, xsb, sndb, ssvb, ssgb,
                 zadr, yadr, xadb,
                 sem_in, sem_o2, sem_o3, sem_pre, sem_zin, sem_zout,
                 sem_yin, sem_yout, sem_xi, sem_xo, sem_az, sem_ay,
                 sem_ax, sem_si, sem_so):

            def z_in(t):
                rs = t * TX + 1
                cps = [
                    pltpu.make_async_copy(zvh_h.at[pl.ds(rs, TX)],
                                          zvi.at[t % U0D],
                                          sem_zin.at[t % U0D, 0]),
                    pltpu.make_async_copy(zgh_h.at[pl.ds(rs, TX)],
                                          zgi.at[t % U0D],
                                          sem_zin.at[t % U0D, 1]),
                    pltpu.make_async_copy(zsf_h.at[pl.ds(rs, TX)],
                                          zsf.at[t % SLD],
                                          sem_zin.at[t % U0D, 2]),
                ]
                if CARRY:
                    cps.append(pltpu.make_async_copy(
                        zub_h.at[pl.ds(rs, TX)], zui.at[t % SLD],
                        sem_zin.at[t % U0D, 3]))
                return cps

            def z_out(tt):
                rs = tt * TX + 1
                cps = [
                    pltpu.make_async_copy(zvo.at[tt % 2],
                                          zvo_h.at[pl.ds(rs, TX)],
                                          sem_zout.at[tt % 2, 0]),
                    pltpu.make_async_copy(zgo.at[tt % 2],
                                          zgo_h.at[pl.ds(rs, TX)],
                                          sem_zout.at[tt % 2, 1]),
                ]
                if CARRY:
                    cps.append(pltpu.make_async_copy(
                        zuo.at[tt % 2], zuo_h.at[pl.ds(rs, TX)],
                        sem_zout.at[tt % 2, 2]))
                return cps

            def y_in(t):
                rs = t * TX + 1
                cps = [
                    pltpu.make_async_copy(yvh_h.at[pl.ds(rs, TX)],
                                          yvi.at[t % U0D],
                                          sem_yin.at[t % U0D, 0]),
                    pltpu.make_async_copy(ygh_h.at[pl.ds(rs, TX)],
                                          ygi.at[t % U0D],
                                          sem_yin.at[t % U0D, 1]),
                    pltpu.make_async_copy(ysf_h.at[pl.ds(rs, TX)],
                                          ysf.at[t % SLD],
                                          sem_yin.at[t % U0D, 2]),
                ]
                if CARRY:
                    cps.append(pltpu.make_async_copy(
                        yub_h.at[pl.ds(rs, TX)], yui.at[t % SLD],
                        sem_yin.at[t % U0D, 3]))
                return cps

            def y_out(tt):
                rs = tt * TX + 1
                cps = [
                    pltpu.make_async_copy(yvo.at[tt % 2],
                                          yvo_h.at[pl.ds(rs, TX)],
                                          sem_yout.at[tt % 2, 0]),
                    pltpu.make_async_copy(ygo.at[tt % 2],
                                          ygo_h.at[pl.ds(rs, TX)],
                                          sem_yout.at[tt % 2, 1]),
                ]
                if CARRY:
                    cps.append(pltpu.make_async_copy(
                        yuo.at[tt % 2], yuo_h.at[pl.ds(rs, TX)],
                        sem_yout.at[tt % 2, 2]))
                return cps

            def grid_in(t):
                rs = t * TX
                cps = [
                    pltpu.make_async_copy(u1_h.at[pl.ds(rs, TX + 2)],
                                          slab.at[t % SLD],
                                          sem_in.at[t % 3, 0]),
                    pltpu.make_async_copy(u0_h.at[pl.ds(rs + 1, TX)],
                                          u0b.at[t % U0D],
                                          sem_in.at[t % 3, 1]),
                ]
                if not NOFULL:
                    cps.append(
                        pltpu.make_async_copy(adj_h.at[pl.ds(rs + 1, TX)],
                                              adjb.at[t % SLD],
                                              sem_in.at[t % 3, 2]))
                if AZ:
                    cps.append(
                        pltpu.make_async_copy(zadj_h.at[pl.ds(rs + 1, TX)],
                                              zadr.at[t % SLD],
                                              sem_az.at[t % 3]))
                if AY:
                    cps.append(
                        pltpu.make_async_copy(yadj_h.at[pl.ds(rs + 1, TX)],
                                              yadr.at[t % SLD],
                                              sem_ay.at[t % 3]))
                return cps

            def start_in(t):
                cps = grid_in(t)
                if PZ:
                    cps += z_in(t)
                if PY:
                    cps += y_in(t)
                for c in cps:
                    c.start()

            def wait_in(t):
                cps = grid_in(t)
                if PZ:
                    cps += z_in(t)
                if PY:
                    cps += y_in(t)
                for c in cps:
                    c.wait()

            def out2_copy(t):
                return pltpu.make_async_copy(
                    u2r.at[t % 3], u2_h.at[pl.ds(t * TX + 1, TX)],
                    sem_o2.at[t % 3])

            def out3_copy(tt):
                return pltpu.make_async_copy(
                    u3b.at[tt % 2], u3_h.at[pl.ds(tt * TX + 1, TX)],
                    sem_o3.at[tt % 2])

            # output rows the tile loop never writes (global halo row 0 and
            # the x padding tail) are filled from the pre-update fields so
            # both output buffers are fully defined without reading them
            tail0 = NXT * TX + 1
            pre = [
                pltpu.make_async_copy(u0_h.at[pl.ds(0, 1)],
                                      u2_h.at[pl.ds(0, 1)], sem_pre.at[0]),
                pltpu.make_async_copy(u0_h.at[pl.ds(tail0, Nxp - tail0)],
                                      u2_h.at[pl.ds(tail0, Nxp - tail0)],
                                      sem_pre.at[1]),
                pltpu.make_async_copy(u1_h.at[pl.ds(0, 1)],
                                      u3_h.at[pl.ds(0, 1)], sem_pre.at[2]),
                pltpu.make_async_copy(u1_h.at[pl.ds(tail0, Nxp - tail0)],
                                      u3_h.at[pl.ds(tail0, Nxp - tail0)],
                                      sem_pre.at[3]),
            ]
            for c in pre:
                c.start()

            start_in(0)
            if LA == 2 and NXT > 1:
                start_in(1)

            def apply_flips(ref, base_t):
                """Mirror halo flips on a (TX+2, Nyp, Nzp) slab ref whose
                local row 0 is global row base_t*TX."""
                if "flips" in ABLATE:
                    return
                ref[:, :, 0] = ref[:, :, 2]
                ref[:, :, Nz - 1] = ref[:, :, Nz - 3]
                ref[:, 0, :] = ref[:, 2, :]
                if folded:
                    ref[:, Ny - 1, :] = ref[:, Ny - 2, :]
                else:
                    ref[:, Ny - 1, :] = ref[:, Ny - 3, :]

                if SHARDED:
                    # the global halo rows sit ONE row in (2-ghost layout):
                    # low mirror at local row 1 on the first shard, high at
                    # local row S+2 on the last; interior shard edges are
                    # real ppermuted ghost data and must NOT be mirrored
                    isf = scal[1] == 1
                    isl = scal[2] == 1

                    @pl.when(isf & (base_t == 0))
                    def _():
                        ref[1] = ref[3]

                    jh = (S_sh + 2) - base_t * TX

                    @pl.when(isl & (jh >= 2) & (jh <= TX + 1))
                    def _():
                        ref[pl.ds(jh, 1)] = ref[pl.ds(jh - 2, 1)]
                else:
                    @pl.when(base_t == 0)
                    def _():
                        ref[0] = ref[2]

                    j = Nx - 1 - base_t * TX

                    @pl.when((j >= 2) & (j <= TX + 1))
                    def _():
                        ref[pl.ds(j, 1)] = ref[pl.ds(j - 2, 1)]

            # stencil temporaries are (TX, HY, Nzp) y-chunks, NOT full
            # blocks: Mosaic keeps several expression temporaries live, and
            # full-block temps blow the VMEM stack (measured ~54 MB at TX=4
            # on the 250 Mvox grid)
            HY = -(-Nyp // 8)
            HY = -(-HY // 8) * 8

            def stencil_into(write, read_src, read_adj, read_prev):
                """Masked stencil + leapfrog, y-chunked.

                read_src(xoff, ylo, hy): slab rows [xoff, xoff+TX) x
                [ylo, ylo+hy) values; read_adj/read_prev(yc, hy); write(yc,
                hy, vals).  Interior chunks take y shifts as plain slices;
                when the shifted window leaves [0, Nyp) the chunk is read
                straight and rolled locally - the wrapped row lands only on
                the global y halo/pad rows (garbage by convention, rebuilt
                by the mirror flips before any real use)."""
                # legs grouped by dz, the group SUM lane-rolled once -
                # but ONLY when the group has >= 3 legs (FCC: two 4-leg
                # groups, 8 rolls -> 2; a lane roll costs ~2-3x an add,
                # measured ~+37% whole-kernel when ablated).  The masked
                # path then pre-rolls the packed adjacency word per group
                # so bits mask in neighbour-aligned position; the group's
                # node-aligned K share is the SUM of those same
                # neighbour-aligned bits rolled back once (bit sums are
                # exact integer f32, and the wrapped lane lands on the
                # z halo like every other rolled term) - one roll instead
                # of a second 4-bit node-aligned unpack.  Small groups
                # (all of Cartesian) keep the per-leg roll with the
                # node-aligned bit shared between mask and K - exactly
                # the pre-grouping trace (group-rolling Cartesian
                # measured -17% rigid).
                groups: dict[int, list[int]] = {}
                for k in range(NN):
                    groups.setdefault(int(VV[k][2]), []).append(k)
                for yc in range(0, Nyp, HY):
                    hy = min(HY, Nyp - yc)
                    a32 = None if NOFULL else \
                        read_adj(yc, hy).astype(jnp.int32)
                    u1c = read_src(1, yc, hy)
                    acc = None
                    K = None
                    for dz in sorted(groups):
                        ks = groups[dz]
                        gro = bool(dz) and len(ks) >= 3
                        a32g = None if NOFULL else \
                            (_roll(a32, dz, 2) if gro else a32)
                        gacc = None
                        gK = None
                        for k in ks:
                            dx, dy, _ = VV[k]
                            if dy == 0 or (yc + dy >= 0
                                           and yc + hy + dy <= Nyp):
                                nb = read_src(1 + dx, yc + dy, hy)
                            else:
                                nb = _roll(read_src(1 + dx, yc, hy),
                                           -dy, 1)
                            if dz and not gro:
                                nb = _roll(nb, -dz, 2)
                            if NOFULL:
                                # off-plane nodes are all full: pure sum,
                                # cover planes get the masked value from
                                # adj_fixup below
                                t_k = nb
                            else:
                                bit = ((a32g >> k) & 1).astype(dtype)
                                t_k = bit * nb
                                if gro:
                                    gK = bit if gK is None else gK + bit
                                else:
                                    K = bit if K is None else K + bit
                            gacc = t_k if gacc is None else gacc + t_k
                        if gro:
                            gacc = _roll(gacc, -dz, 2)
                            if gK is not None:
                                gK = _roll(gK, -dz, 2)
                                K = gK if K is None else K + gK
                        acc = gacc if acc is None else acc + gacc
                    diag = cfull if NOFULL else (two - sl2 * K)
                    write(yc, hy,
                          diag * u1c - read_prev(yc, hy) + a2 * acc)

            def _masked_val(a32, rd_nb, u1c, prev):
                """Full masked stencil on one plane sheet.

                rd_nb(k, dx, dy, dz) returns the leg-k neighbour sheet with
                the off-sheet axes resolved statically; in-sheet shifts are
                applied here via roll (wrapped entries land on halo/pad
                positions only, garbage by convention).  Same
                accumulation order as the masked bulk => identical fp."""
                acc = None
                K = None
                for k in range(NN):
                    dx, dy, dz = VV[k]
                    nb = rd_nb(k, dx, dy, dz)
                    bit = ((a32 >> k) & 1).astype(dtype)
                    t_k = bit * nb
                    acc = t_k if acc is None else acc + t_k
                    K = bit if K is None else K + bit
                return (two - sl2 * K) * u1c - prev + a2 * acc

            def adj_fixup(outr, oslot, rdfull, rd, rdprev, aslot3):
                """Masked-stencil rewrite of the z/y cover planes.

                rdfull(z): full (TX+2, Nyp) stencil-source sheet at lane z;
                rd(dx, y, z): source rows [1+dx, 1+dx+TX) at static y/z;
                rdprev(y, z): matching u^{step-1} rows.  aslot3: the 3-deep
                adjacency ring slot.

                A lane extraction transposes (y moves from sublanes into
                lanes) — measured ~2x whole-kernel cost when done per LEG.
                Each z plane therefore extracts its three neighbour sheets
                ONCE (cached across planes: wall layers come in adjacent
                pairs sharing two sheets); per-leg reads are then cheap row
                slices + lane rolls of the resident sheets."""
                sheets = {}

                def sheet(z):
                    if z not in sheets:
                        sheets[z] = rdfull(z)
                    return sheets[z]

                for p in range(AZ):
                    zl = za_lanes[p]
                    a32 = zadr[aslot3, :, p, :][:, :Nyp]     # (TX, Nyp)

                    def rdz(k, dx, dy, dz, zl=zl):
                        nb = sheet(zl + dz)[1 + dx:1 + dx + TX, :]
                        return _roll(nb, -dy, 1) if dy else nb

                    outr[oslot, :, :, zl] = _masked_val(
                        a32, rdz, sheet(zl)[1:1 + TX, :],
                        rdprev(slice(None), zl))
                for p in range(AY):
                    yl = ya_subl[p]
                    a32 = yadr[aslot3, :, p, :]              # (TX, Nzp)

                    def rdy(k, dx, dy, dz, yl=yl):
                        nb = rd(dx, yl + dy, slice(None))
                        return _roll(nb, -dz, 1) if dz else nb

                    outr[oslot, :, yl, :] = _masked_val(
                        a32, rdy, rd(0, yl, slice(None)),
                        rdprev(yl, slice(None)))

            def adj_fixup_xrow(outr, oslot, r, p, rdrow, rdprevrow):
                """Masked-stencil rewrite of one x cover row (y-chunked:
                (Nyp, Nzp) sheet temporaries would stress the VMEM stack).

                rdrow(dx, ysl): the (cy, Nzp) y-slice of stencil-source row
                1+r+dx, sliced at the ref read (materialising the full row
                per leg would blow the VMEM stack); rdprevrow(ysl):
                matching u^{step-1} row slice."""
                cp = pltpu.make_async_copy(xadj_h.at[p], xadb, sem_ax.at[0])
                cp.start()
                cp.wait()
                for yc in range(0, Nyp, CYA):
                    cy = min(CYA, Nyp - yc)
                    a32 = xadb[yc:yc + cy, :]                # (cy, Nzp)

                    def rdx(k, dx, dy, dz, yc=yc, cy=cy):
                        if dy == 0 or (yc + dy >= 0
                                       and yc + cy + dy <= Nyp):
                            nb = rdrow(dx, slice(yc + dy, yc + cy + dy))
                        else:
                            nb = _roll(rdrow(dx, slice(yc, yc + cy)),
                                       -dy, 0)
                        return _roll(nb, -dz, 1) if dz else nb

                    outr[oslot, r, yc:yc + cy, :] = _masked_val(
                        a32, rdx, rdrow(0, slice(yc, yc + cy)),
                        rdprevrow(slice(yc, yc + cy)))

            def apply_abc(outr, slot, t, prev_ref, pslot, pbase):
                if "abc" in ABLATE:
                    return
                """Engquist-Majda ABC slices on an output block ref.

                prev_ref[pslot, pbase:pbase+TX] rows hold the pre-update
                (u^{step-1}) field; only thin slices of it are read."""
                w1, w2, w3 = abc_w[1], abc_w[2], abc_w[3]
                x0v = scal[0] if SHARDED else 0   # global = local + x0
                gz1 = jax.lax.broadcasted_iota(jnp.int32, (TX, Nzp), 1)
                zext = ((gz1 == 1) | (gz1 == Nz - 2)).astype(jnp.int32)
                gx1 = (jax.lax.broadcasted_iota(jnp.int32, (TX, Nzp), 0)
                       + t * TX + 1 + x0v)
                xext = ((gx1 == 1) | (gx1 == NXG - 2)).astype(jnp.int32)
                ylo = 2
                yhi = Ny - 1 if folded else Ny - 2
                y_faces = (1,) if folded else (1, Ny - 2)
                for yf in y_faces:
                    q = zext + xext + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, jnp.where(q == 2, w2, w3))
                    vals = outr[slot, :, yf, :]
                    pv = prev_ref[pslot, pbase:pbase + TX, yf, :]
                    outr[slot, :, yf, :] = (vals + lv * qf * pv) * w
                gx2 = (jax.lax.broadcasted_iota(
                    jnp.int32, (TX, yhi - ylo), 0) + t * TX + 1 + x0v)
                xext2 = ((gx2 == 1) | (gx2 == NXG - 2)).astype(jnp.int32)
                for zf in (1, Nz - 2):
                    q = xext2 + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, w2)
                    vals = outr[slot, :, ylo:yhi, zf]
                    pv = prev_ref[pslot, pbase:pbase + TX, ylo:yhi, zf]
                    outr[slot, :, ylo:yhi, zf] = (vals + lv * qf * pv) * w
                for r in range(TX):
                    gx_r = t * TX + 1 + r + x0v

                    @pl.when((gx_r == 1) | (gx_r == NXG - 2))
                    def _(r=r):
                        vals = outr[slot, r, ylo:yhi, 2:Nz - 2]
                        pv = prev_ref[pslot, pbase + r, ylo:yhi, 2:Nz - 2]
                        outr[slot, r, ylo:yhi, 2:Nz - 2] = (
                            vals + lv * pv) * w1

            def inject(outr, slot, t, stage):
                """Add the step's source samples into rows owned by tile t
                (sources sit in the interior, never on halo rows).  Sharded,
                the LOCAL coordinates come from SMEM at runtime — a source
                in a ghost-overlap row is injected by BOTH neighbouring
                shards (each into its own copy), keeping the duplicated row
                consistent; non-owners never match the tile range."""
                for i in range(Nin):
                    if SHARDED:
                        gx, gy, gz = iptr[0, i], iptr[1, i], iptr[2, i]
                    else:
                        gx, gy, gz = (int(v) for v in in_pts[i])

                    @pl.when((gx >= t * TX + 1) & (gx < t * TX + TX + 1))
                    def _(gx=gx, gy=gy, gz=gz, i=i):
                        my = jax.lax.broadcasted_iota(
                            jnp.int32, (1, Nyp, Nzp), 1) == gy
                        mz = jax.lax.broadcasted_iota(
                            jnp.int32, (1, Nyp, Nzp), 2) == gz
                        m = (my & mz).astype(dtype)
                        r = gx - t * TX - 1
                        outr[slot, pl.ds(r, 1)] = (
                            outr[slot, pl.ds(r, 1)] + sig[stage, i] * m)

            def ode(ub, u2b, vh, gh, sa, co, bs):
                """One impedance-ODE step on dense plane values.

                ub/u2b: (TX, W) node values (post-air) and u^{n-1}; vh/gh:
                (TX, MZ, W); sa: (TX, W) ssaf (0 = exact identity); co:
                (5*MZ, 128) rows b|bd|bDh|bFh|beta, lane-broadcast from
                lane 0 (cpu_engine.h:362-405); bs: the plane's beta as an
                SMEM SCALAR — under the carry path's layouts, pulling beta
                from the VMEM tile makes Mosaic emit a (1,1) -> (TX, W)
                vector.broadcast in both sublanes and lanes (unsupported);
                a scalar multiply needs no broadcast at all."""
                co = co[:, 0:1]
                b = co[0 * MZ:1 * MZ]
                bd = co[1 * MZ:2 * MZ]
                bDh = co[2 * MZ:3 * MZ]
                bFh = co[3 * MZ:4 * MZ]
                lo2Kbg = lo2 * sa * bs
                ub_new = ub - lv * sa * jnp.sum(
                    2.0 * bDh * vh - bFh * gh, axis=-2)
                ub_new = (ub_new + lo2Kbg * u2b) / (1.0 + lo2Kbg)
                vh0 = (b * (ub_new - u2b)[..., None, :] + bd * vh
                       - 2.0 * bFh * gh)
                gh_new = gh + half * (vh0 + vh)
                return ub_new, vh0, gh_new

            def ode_p(ub, u2b, vh, gh, sa, co):
                """Batched impedance ODE over a PC-plane chunk (the MV
                round-4 ablation: per-plane per-tile ODE calls on small
                sheets cost ~16 ms/step at 18 z/y planes - batching the
                plane dim into the vregs divides the instruction count
                by PC at identical element math).

                ub/u2b/sa: (TX, PC, W); vh/gh: (TX, PC, MZ, W); co:
                (PC, 5*MZ, 1) with beta in row 4*MZ (a (PC, 1) slice
                lane-broadcasts; no sublane broadcast, so the SMEM-scalar
                workaround in ode() is not needed here)."""
                b = co[:, 0 * MZ:1 * MZ]
                bd = co[:, 1 * MZ:2 * MZ]
                bDh = co[:, 2 * MZ:3 * MZ]
                bFh = co[:, 3 * MZ:4 * MZ]
                beta = co[:, 4 * MZ, :]                    # (PC, 1)
                lo2Kbg = lo2 * sa * beta
                ub_new = ub - lv * sa * jnp.sum(
                    2.0 * bDh * vh - bFh * gh, axis=-2)
                ub_new = (ub_new + lo2Kbg * u2b) / (1.0 + lo2Kbg)
                vh0 = (b * (ub_new - u2b)[..., None, :] + bd * vh
                       - 2.0 * bFh * gh)
                gh_new = gh + half * (vh0 + vh)
                return ub_new, vh0, gh_new

            # planes sharing one lane/sublane (same coordinate, different
            # material): the sequential write-back order matters only
            # there; the batched stages reproduce it with ssaf>0 selects
            # (exact: the ODE is a bit-exact identity at ssaf = 0)
            PC = 8  # planes per ODE call (bounds the Mosaic stack temps)

            def _batched_plane_stage(P, coords, extract, extract_prev,
                                     insert, sa_all, co_all,
                                     vin, gin, vout, gout,
                                     uin, uout, soff, stg):
                """Shared z/y batched plane stage.

                coords: the P plane lane/sublane indices (duplicates =
                same coordinate, different material); extract(p) /
                extract_prev(p) -> (TX, W) sheets; insert(p, val) writes
                one back; sa_all (TX, P8, W) value; co_all (P, 5MZ, 1)
                value; vin/gin/vout/gout (TX, P, MZ, W) refs; uin/uout
                carry refs (TX, S2P, W) or None; soff = sidx * P; stg:
                (2, TX, P8, W) staging scratch - lane/sublane-extracted
                sheets carry their source offset in the Mosaic layout and
                tpu.concatenate refuses mixed offsets, so the sheets
                round-trip a VMEM ref to canonicalize before batching."""
                for p in range(P):
                    stg[0, :, p, :] = extract(p)
                if uin is None:
                    for p in range(P):
                        stg[1, :, p, :] = extract_prev(p)
                news = []
                for p0 in range(0, P, PC):
                    pc = min(PC, P - p0)
                    ub = stg[0, :, p0:p0 + pc, :]
                    if uin is not None:
                        u2b = uin[:, soff + p0:soff + p0 + pc, :]
                    else:
                        u2b = stg[1, :, p0:p0 + pc, :]
                    ub_new, vh0, gh_new = ode_p(
                        ub, u2b, vin[:, p0:p0 + pc], gin[:, p0:p0 + pc],
                        sa_all[:, p0:p0 + pc], co_all[p0:p0 + pc])
                    vout[:, p0:p0 + pc] = vh0
                    gout[:, p0:p0 + pc] = gh_new
                    if uout is not None:
                        uout[:, soff + p0:soff + p0 + pc, :] = ub_new
                    news.append(ub_new)

                def up_new(p):
                    return news[p // PC][:, p % PC]

                # write-back per unique coordinate, select-chained in
                # plane order (bit-identical to the sequential stages:
                # the ODE is an exact identity at ssaf = 0, and distinct
                # materials on one coordinate own disjoint ssaf supports)
                for p in range(P):
                    if coords.index(coords[p]) != p:
                        continue   # handled by its group head
                    val = up_new(p)
                    for q in range(p + 1, P):
                        if coords[q] == coords[p]:
                            val = jnp.where(sa_all[:, q] > 0,
                                            up_new(q), val)
                    insert(p, val)

            def _dot3(x2d, g):
                """Exact one-hot matmul: f32 values split into 3 bf16
                planes (8+8+8 mantissa bits), g one-hot {0,1} (exact in
                bf16) - each output reconstructs one value, no rounding."""
                if dtype != jnp.float32:
                    return jax.lax.dot_general(
                        x2d, g.astype(dtype), (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=dtype)
                hi = x2d.astype(jnp.bfloat16)
                r1 = x2d - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = jnp.dot(hi, g, preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(mid, g,
                                    preferred_element_type=jnp.float32)
                return acc + jnp.dot(lo, g,
                                     preferred_element_type=jnp.float32)

            def _split3(x2d):
                hi = x2d.astype(jnp.bfloat16)
                r1 = x2d - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                return hi, mid, lo

            def _sdot(lhs, rhs, dn, split):
                """Exact one-hot matmul with transposed contraction dims:
                the VALUES operand (split = 0 for lhs, 1 for rhs) is split
                into 3 bf16 planes, the other operand is a {0,1} one-hot
                (exact in bf16) - measured bit-exact on the v5e for both
                ((0,),(0,)) and ((1,),(1,)) forms."""
                if dtype != jnp.float32:
                    return jax.lax.dot_general(
                        lhs, rhs, (dn, ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=dtype)
                acc = None
                for p_ in _split3(lhs if split == 0 else rhs):
                    a, b_ = (p_, rhs) if split == 0 else (lhs, p_)
                    d = jax.lax.dot_general(a, b_, (dn, ((), ())),
                                            preferred_element_type=dtype)
                    acc = d if acc is None else acc + d
                return acc

            def _schunk(c, bj, outr, oslot, prev_ref, pslot, pbase):
                """Impedance-ODE step on one packed stray chunk.

                Gathers ub (post-air value) from the resident output block
                and u2b (u^{step-1}) from the prev block via exact one-hot
                MXU matmuls over the chunk's (RW, YW) window, advances the
                ODE on (TS,)-packed vectors, scatters the delta back into
                the output ring (cpu_engine.h:362-405 per node).  Padding
                lanes (valid=0) force delta/states to exactly 0."""
                y0 = pl.multiple_of(ssy0[c], 8)
                zsl = slice(None) if S_ZFULL else \
                    pl.ds(pl.multiple_of(ssz0[c], 128), S_ZW)
                if S_RW == TX:
                    win = outr[oslot, :, pl.ds(y0, S_YW), zsl]
                    pwin = prev_ref[pslot, pbase:pbase + TX,
                                    pl.ds(y0, S_YW), zsl]
                else:
                    r0 = ssr0[c]
                    win = outr[oslot, pl.ds(r0, 1), pl.ds(y0, S_YW), zsl]
                    pwin = prev_ref[pslot, pl.ds(pbase + r0, 1),
                                    pl.ds(y0, S_YW), zsl]
                w2 = win.reshape(S_WW, S_ZW)
                p2 = pwin.reshape(S_WW, S_ZW)
                ndw = sndb[bj, 0:1, :].astype(jnp.int32)     # (1, TS)
                ndz = sndb[bj, 1:2, :].astype(jnp.int32)
                ndm = sndb[bj, 2:3, :]
                sa = sndb[bj, 3:4, :]
                ok_ = sndb[bj, 4:5, :] > 0
                iz_ = jax.lax.broadcasted_iota(jnp.int32, (S_ZW, S_TS), 0)
                zm = (iz_ == ndz).astype(dtype)
                # both gathers in ONE matmul (the per-chunk cost is
                # small-matmul-issue-bound, ~0.35us each): the current and
                # previous windows concatenate along z, and the 3 bf16
                # mantissa planes of the exact one-hot split stack on the
                # CONTRACTION axis (K = 3*WW) so the whole gather is a
                # SINGLE MXU issue (same flops, 1/3 the issues; exact: each
                # output sums the 3 disjoint mantissa segments of one value
                # plus zeros, f32-accumulated)
                wcat = jnp.concatenate([w2, p2], axis=1)     # (WW, 2*ZW)
                if dtype == jnp.float32:
                    hi = wcat.astype(jnp.bfloat16)
                    r1_ = wcat - hi.astype(jnp.float32)
                    mid = r1_.astype(jnp.bfloat16)
                    lo = (r1_ - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                    lhs3 = jnp.concatenate([hi, mid, lo], 0)  # (3WW, 2ZW)
                    iw3 = jax.lax.broadcasted_iota(
                        jnp.int32, (3 * S_WW, S_TS), 0)
                    g3 = (iw3 % S_WW == ndw).astype(jnp.bfloat16)
                    pb = jax.lax.dot_general(
                        lhs3, g3, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (2*ZW, TS)
                else:
                    iw = jax.lax.broadcasted_iota(
                        jnp.int32, (S_WW, S_TS), 0)
                    g1_ = (iw == ndw).astype(dtype)
                    pb = _sdot(wcat, g1_, ((0,), (0,)), 0)   # (2*ZW, TS)
                ub = jnp.sum(pb[:S_ZW] * zm, axis=0, keepdims=True)
                u2b = jnp.sum(pb[S_ZW:] * zm, axis=0, keepdims=True)
                # per-node coefficients: masked sum over material columns
                # (exact - plain f32 adds of disjoint one-hot terms)
                co = None
                for m in range(S_NM):
                    term = stab[:, m:m + 1] * (ndm == m).astype(dtype)
                    co = term if co is None else co + term
                MB = S_MMB
                b = co[0 * MB:1 * MB]
                bd = co[1 * MB:2 * MB]
                bDh = co[2 * MB:3 * MB]
                bFh = co[3 * MB:4 * MB]
                beta = co[4 * MB:4 * MB + 1]
                vh = ssvb[bj, 0:MB, :]
                gh = ssgb[bj, 0:MB, :]
                lo2Kbg = lo2 * sa * beta
                ub_new = ub - lv * sa * jnp.sum(
                    two * bDh * vh - bFh * gh, axis=0, keepdims=True)
                ub_new = (ub_new + lo2Kbg * u2b) / (1.0 + lo2Kbg)
                vh0 = b * (ub_new - u2b) + bd * vh - two * bFh * gh
                gh_new = gh + half * (vh0 + vh)
                zero = jnp.zeros((), dtype)
                delta = jnp.where(ok_, ub_new - ub, zero)
                ssvb[bj, 0:MB, :] = jnp.where(ok_, vh0, zero)
                ssgb[bj, 0:MB, :] = jnp.where(ok_, gh_new, zero)
                dmat = zm * delta                            # (ZW, TS)
                if dtype == jnp.float32:
                    # scatter as ONE MXU issue: dmat's 3 bf16 planes stack
                    # on the contraction axis (K = 3*TS), the one-hot
                    # replicates by iota (exact as the gather above)
                    dh = dmat.astype(jnp.bfloat16)
                    dr = dmat - dh.astype(jnp.float32)
                    dm_ = dr.astype(jnp.bfloat16)
                    dl = (dr - dm_.astype(jnp.float32)).astype(jnp.bfloat16)
                    dcat = jnp.concatenate([dh, dm_, dl], 1)  # (ZW, 3TS)
                    ndw3 = jnp.concatenate([ndw, ndw, ndw], 1)
                    iwc = jax.lax.broadcasted_iota(
                        jnp.int32, (S_WW, 3 * S_TS), 0)
                    g1c = (iwc == ndw3).astype(jnp.bfloat16)
                    dw = jax.lax.dot_general(
                        g1c, dcat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (WW, ZW)
                else:
                    iw = jax.lax.broadcasted_iota(
                        jnp.int32, (S_WW, S_TS), 0)
                    g1_ = (iw == ndw).astype(dtype)
                    dw = _sdot(g1_, dmat, ((1,), (1,)), 1)    # (WW, ZW)
                if S_RW == TX:
                    outr[oslot, :, pl.ds(y0, S_YW), zsl] = (
                        outr[oslot, :, pl.ds(y0, S_YW), zsl]
                        + dw.reshape(TX, S_YW, S_ZW))
                else:
                    outr[oslot, pl.ds(r0, 1), pl.ds(y0, S_YW), zsl] = (
                        outr[oslot, pl.ds(r0, 1), pl.ds(y0, S_YW), zsl]
                        + dw.reshape(1, S_YW, S_ZW))

            def stray_pass(outr, oslot, prev_ref, pslot, pbase, t, first):
                """In-pair stray-node boundary pass for tile t's chunks
                [soff[t], soff[t+1]).

                Stage 1 (first=True) reads state^n from the input refs and
                writes state^{n+1} to the aliased outputs; stage 2
                round-trips the outputs in place (the x-plane pattern).
                The chunk loop has STATIC bounds (maxc) with pl.when
                guards: dynamic-bound fori_loop hangs the Mosaic compile.
                Slots alternate by relative chunk parity; each slot's
                final state flush is drained at the end (the next stage's
                pass re-reads the same HBM rows)."""
                if "ode" in ABLATE or "odes" in ABLATE:
                    return
                vin_h = svh_h if first else svo_h
                gin_h = sgh_h if first else sgo_h
                c0 = ssoff[t]
                c1 = ssoff[t + 1]

                # SEGMENTED DMA: SEG chunks per copy (per-chunk copies
                # made DMA-issue cost the dominant fixed term).  The tail
                # segment over-fetches into the next tile's chunks (host
                # pads the arrays) and writes those rows back VERBATIM -
                # benign: they are not computed, the values are unchanged,
                # and each pass drains before the next one reads them.
                def sin(s, sl):
                    cs = c0 + s * S_SEG
                    b = sl * S_SEG
                    return [
                        pltpu.make_async_copy(snd_h.at[pl.ds(cs, S_SEG)],
                                              sndb.at[pl.ds(b, S_SEG)],
                                              sem_si.at[sl, 0]),
                        pltpu.make_async_copy(vin_h.at[pl.ds(cs, S_SEG)],
                                              ssvb.at[pl.ds(b, S_SEG)],
                                              sem_si.at[sl, 1]),
                        pltpu.make_async_copy(gin_h.at[pl.ds(cs, S_SEG)],
                                              ssgb.at[pl.ds(b, S_SEG)],
                                              sem_si.at[sl, 2]),
                    ]

                def sout(s, sl):
                    cs = c0 + s * S_SEG
                    b = sl * S_SEG
                    return [
                        pltpu.make_async_copy(ssvb.at[pl.ds(b, S_SEG)],
                                              svo_h.at[pl.ds(cs, S_SEG)],
                                              sem_so.at[sl, 0]),
                        pltpu.make_async_copy(ssgb.at[pl.ds(b, S_SEG)],
                                              sgo_h.at[pl.ds(cs, S_SEG)],
                                              sem_so.at[sl, 1]),
                    ]

                def seg_compute(s, sl):
                    cs = c0 + s * S_SEG

                    def jbody(j, _):
                        @pl.when(cs + j < c1)
                        def _():
                            _schunk(cs + j, sl * S_SEG + j, outr, oslot,
                                    prev_ref, pslot, pbase)
                        return _

                    jax.lax.fori_loop(0, S_SEG, jbody, None, unroll=False)

                @pl.when(c0 < c1)
                def _():
                    for cp in sin(0, 0):
                        cp.start()

                NSEG = -(-S_MAXC // S_SEG)

                def kbody(k, _):
                    s = 2 * k
                    cs = c0 + s * S_SEG

                    @pl.when(cs < c1)
                    def _():
                        for cp in sin(s, 0):
                            cp.wait()

                        @pl.when(cs + S_SEG < c1)
                        def _():
                            @pl.when(k > 0)
                            def _():
                                for cp in sout(s - 1, 1):
                                    cp.wait()
                            for cp in sin(s + 1, 1):
                                cp.start()
                        seg_compute(s, 0)
                        for cp in sout(s, 0):
                            cp.start()

                    cs2 = cs + S_SEG

                    @pl.when(cs2 < c1)
                    def _():
                        for cp in sin(s + 1, 1):
                            cp.wait()

                        @pl.when(cs2 + S_SEG < c1)
                        def _():
                            for cp in sout(s, 0):
                                cp.wait()
                            for cp in sin(s + 2, 0):
                                cp.start()
                        seg_compute(s + 1, 1)
                        for cp in sout(s + 1, 1):
                            cp.start()
                    return _

                jax.lax.fori_loop(0, (NSEG + 1) // 2, kbody, None,
                                  unroll=False)
                # drain: exactly one sout per used slot is still pending
                # (sem waits match by semaphore + size; address is not
                # part of the wait)
                nseg = (c1 - c0 + S_SEG - 1) // S_SEG

                @pl.when(nseg >= 1)
                def _():
                    for cp in sout(0, 0):
                        cp.wait()

                @pl.when(nseg >= 2)
                def _():
                    for cp in sout(0, 1):
                        cp.wait()

            def zplane_stage(outr, slot, prev_ref, pslot, pbase,
                             vin, gin, vout, gout, sfslot,
                             uin=None, uout=None, sidx=0):
                """z-normal plane ODE on an output block.

                zp_lanes are compile-time constants, so extraction and
                write-back are STATIC single-lane slices - no masks, no
                matmuls (an MXU one-hot extraction costs M*Nzp*128 MACs per
                plane set, ~3 ms/step at benchmark scale; a static lane
                slice is a handful of VREG ops per (TX, Nyp) sheet).

                CARRY: u2b comes from the carry ring (stage-major block
                sidx*PZ + p) already in plane layout — no transposing pull
                from prev_ref — and the post-ODE sheet is stashed back for
                the same stage one sweep later."""
                if "ode" in ABLATE or "odez" in ABLATE:
                    return
                sa_all = zsf[sfslot]
                zpad = (jnp.zeros((TX, Nyw - Nyp), dtype)
                        if Nyw > Nyp else None)

                def zext(p, ref=None, row0=None):
                    sheet = (outr[slot, :, :, zp_lanes[p]] if ref is None
                             else ref[pslot, row0:row0 + TX, :,
                                      zp_lanes[p]])
                    if zpad is not None:
                        sheet = jnp.concatenate([sheet, zpad], axis=1)
                    return sheet

                def zins(p, val):
                    outr[slot, :, :, zp_lanes[p]] = (val[:, :Nyp]
                                                     if zpad is not None
                                                     else val)

                _batched_plane_stage(
                    PZ, zp_lanes, zext,
                    lambda p: zext(p, prev_ref, pbase),
                    zins, sa_all, zco[:, :, 0:1],
                    vin, gin, vout, gout,
                    uin if CARRY else None, uout if CARRY else None,
                    sidx * PZ, zst)

            NCHX = -(-Nyp // CY)
            # static execution order of the x passes: stage-1 of plane p
            # runs in visit t1(p)'s stage-1 block, stage-2 one visit later
            # in the stage-2 block (which program-orders AFTER stage 1)
            if PX and not XDYN:
                xpass_order = sorted(
                    [(p, True) for p in range(PX)]
                    + [(p, False) for p in range(PX)],
                    key=lambda pf: ((xp_rows[pf[0]] - 1) // TX
                                    + (0 if pf[1] else 1),
                                    0 if pf[1] else 1, pf[0]))
                xpass_first = xpass_order[0]
            else:
                xpass_first = None
            # cross-pass cout handoff (single-device only: sharded XDYN
            # plane rows are runtime values, so the static pass order the
            # handoff needs does not exist there and each pass drains
            # itself).  Sem waits match by semaphore + SIZE, and chunk
            # sizes depend only on the chunk index, so a pass can wait the
            # PREVIOUS pass's pending flushes with its own copy objects.
            XPIPE = PX > 0 and not XDYN

            def x_cin(p, c, sl, first):
                """Chunk-in copies; vh/gh split into y-halves so the four
                loads ride separate DMA streams (a single stream plateaus
                ~120 GB/s; the chunk chain is input-DMA-bound)."""
                vin_h = xvh_h if first else xvo_h
                gin_h = xgh_h if first else xgo_h
                yc = c * CY
                cy = min(CY, Nyp - yc)
                h = (cy // 2) // 4 * 4
                return [
                    pltpu.make_async_copy(
                        vin_h.at[p, pl.ds(yc, h)],
                        xv.at[sl, pl.ds(0, h)], sem_xi.at[sl, 0]),
                    pltpu.make_async_copy(
                        vin_h.at[p, pl.ds(yc + h, cy - h)],
                        xv.at[sl, pl.ds(h, cy - h)], sem_xi.at[sl, 1]),
                    pltpu.make_async_copy(
                        gin_h.at[p, pl.ds(yc, h)],
                        xg.at[sl, pl.ds(0, h)], sem_xi.at[sl, 2]),
                    pltpu.make_async_copy(
                        gin_h.at[p, pl.ds(yc + h, cy - h)],
                        xg.at[sl, pl.ds(h, cy - h)], sem_xi.at[sl, 3]),
                    pltpu.make_async_copy(
                        xsf_h.at[p, pl.ds(yc, cy)],
                        xsb.at[sl, pl.ds(0, cy)], sem_xi.at[sl, 4]),
                ]

            def x_cout(p, c, sl):
                yc = c * CY
                cy = min(CY, Nyp - yc)
                h = (cy // 2) // 4 * 4
                return [
                    pltpu.make_async_copy(
                        xv.at[sl, pl.ds(0, h)],
                        xvo_h.at[p, pl.ds(yc, h)], sem_xo.at[sl, 0]),
                    pltpu.make_async_copy(
                        xv.at[sl, pl.ds(h, cy - h)],
                        xvo_h.at[p, pl.ds(yc + h, cy - h)],
                        sem_xo.at[sl, 1]),
                    pltpu.make_async_copy(
                        xg.at[sl, pl.ds(0, h)],
                        xgo_h.at[p, pl.ds(yc, h)], sem_xo.at[sl, 2]),
                    pltpu.make_async_copy(
                        xg.at[sl, pl.ds(h, cy - h)],
                        xgo_h.at[p, pl.ds(yc + h, cy - h)],
                        sem_xo.at[sl, 3]),
                ]

            def xplane_pass(outr, oslot, r, p, prev_ref, prev_row, first,
                            has_prev=False):
                """x-normal full-row plane ODE for plane p (STATIC tile
                ownership: everything here is compile-time constant).

                The full-row state exceeds VMEM, so (CY, MZ, Nzp) y-chunks
                round-trip HBM - the row is visited once per stage per
                sweep.  Stage 1 (first=True) reads state^n from the input
                refs and writes state^{n+1} to the aliased output refs;
                stage 2 advances the outputs in place.  With XPIPE the
                final flushes are NOT drained here: the next pass (in the
                static pass order) waits them before reusing the slots,
                and the kernel-end drain catches the last pass - the
                drain leaves the tile pipeline's critical path."""
                if "ode" in ABLATE or "odex" in ABLATE:
                    return
                nch = NCHX
                if XPIPE and has_prev:
                    # free both slots: the previous pass left its last
                    # chunks' flushes pending (same sizes, sem match)
                    for c in range(max(0, nch - 2), nch):
                        for cp in x_cout(p, c, c % 2):
                            cp.wait()
                for cp in x_cin(p, 0, 0, first):
                    cp.start()
                for c in range(nch):
                    sl = c % 2
                    if c + 1 < nch:
                        if c >= 1:
                            for cp in x_cout(p, c - 1, 1 - sl):
                                cp.wait()
                        for cp in x_cin(p, c + 1, 1 - sl, first):
                            cp.start()
                    for cp in x_cin(p, c, sl, first):
                        cp.wait()
                    yc = c * CY
                    cy = min(CY, Nyp - yc)
                    if XDYN:   # runtime plane rows (sharded SPMD)
                        ub = outr[oslot, pl.ds(r, 1), yc:yc + cy, :][0]
                        u2b = prev_ref[pl.ds(prev_row, 1),
                                       yc:yc + cy, :][0]
                    else:
                        ub = outr[oslot, r, yc:yc + cy, :]   # (cy, Nzp)
                        u2b = prev_ref[prev_row, yc:yc + cy, :]
                    ub_new, vh0, gh_new = ode(
                        ub, u2b, xv[sl, 0:cy], xg[sl, 0:cy],
                        xsb[sl, 0:cy, :], xco[p], xbet[p])
                    if XDYN:
                        outr[oslot, pl.ds(r, 1), yc:yc + cy, :] = \
                            ub_new[None]
                    else:
                        outr[oslot, r, yc:yc + cy, :] = ub_new
                    xv[sl, 0:cy] = vh0
                    xg[sl, 0:cy] = gh_new
                    for cp in x_cout(p, c, sl):
                        cp.start()
                if not XPIPE:
                    # drain before returning: the aliased state arrays are
                    # re-read by the NEXT stage's pass for this plane
                    for c in range(max(0, nch - 2), nch):
                        for cp in x_cout(p, c, c % 2):
                            cp.wait()

            def yplane_stage(outr, slot, prev_ref, pslot, pbase,
                             vin, gin, vout, gout, sfslot,
                             uin=None, uout=None, sidx=0):
                """y-normal plane ODE: STATIC sublane extraction (yp_subl
                are compile-time constants), no masks at all.  CARRY as in
                zplane_stage (sheet layout (TX, Nzp), no relayout)."""
                if "ode" in ABLATE or "odey" in ABLATE:
                    return
                sa_all = ysf[sfslot]
                ysl = slice(YZ0, YZ0 + WY)   # static z-window lanes

                def yext(p):
                    return outr[slot, :, yp_subl[p], ysl]   # (TX, WY)

                def yins(p, val):
                    outr[slot, :, yp_subl[p], ysl] = val

                _batched_plane_stage(
                    PY, yp_subl, yext,
                    lambda p: prev_ref[pslot, pbase:pbase + TX,
                                       yp_subl[p], ysl],
                    yins, sa_all, yco[:, :, 0:1],
                    vin, gin, vout, gout,
                    uin if CARRY else None, uout if CARRY else None,
                    sidx * PY, yst)

            # ------------------------------------------------- visit loop
            def loop(t, _):
                @pl.when(t + LA < NXT)
                def _():
                    start_in(t + LA)

                # ------------- stage 1: u2 rows of tile t (step n)
                @pl.when(t < NXT)
                def _():
                    wait_in(t)
                    slot = t % 3          # u2r output ring (3-deep)
                    islot = t % SLD       # slab/adj/sf input rings
                    pslot = t % U0D
                    apply_flips(slab.at[islot], t)

                    @pl.when(t >= 3)
                    def _():
                        out2_copy(t - 3).wait()

                    # the intermediate state^{n+1} is staged in the OUTPUT
                    # rings (slot t%2): the pending state flush of tile
                    # t-2 (same slot) must land first
                    @pl.when(t >= 2)
                    def _():
                        if PZ:
                            for c in z_out(t - 2):
                                c.wait()
                        if PY:
                            for c in y_out(t - 2):
                                c.wait()

                    def w2(yc, hy, v):
                        u2r[slot, :, yc:yc + hy, :] = v

                    def rs1(xo, ylo, hy):
                        return slab[islot, xo:xo + TX, ylo:ylo + hy, :]

                    def ra1(yc, hy):
                        return adjb[islot, :, yc:yc + hy, :]

                    def rp1(yc, hy):
                        return u0b[pslot, :, yc:yc + hy, :]

                    stencil_into(w2, rs1, ra1, rp1)
                    if NOFULL:
                        def rdf1(z):
                            return slab[islot, 0:TX + 2, :, z]

                        def rd1(dx, y, z):
                            return slab[islot, 1 + dx:1 + dx + TX, y, z]

                        def rp1s(y, z):
                            return u0b[pslot, :, y, z]

                        adj_fixup(u2r, slot, rdf1, rd1, rp1s, t % SLD)
                        for p in range(AX):
                            xr = xa_rows[p]
                            t1 = (xr - 1) // TX
                            r = xr - t1 * TX - 1

                            @pl.when(t == t1)
                            def _(p=p, r=r):
                                adj_fixup_xrow(
                                    u2r, slot, r, p,
                                    lambda dx, ysl, r=r:
                                        slab[islot, 1 + r + dx, ysl, :],
                                    lambda ysl, r=r: u0b[pslot, r, ysl, :])
                    apply_abc(u2r, slot, t, u0b, pslot, 0)
                    if PZ:
                        zplane_stage(u2r, slot, u0b, pslot, 0,
                                     zvi.at[t % U0D], zgi.at[t % U0D],
                                     zvo.at[t % 2], zgo.at[t % 2], t % SLD,
                                     uin=zui.at[t % SLD] if CARRY else None,
                                     uout=zuo.at[t % 2] if CARRY else None,
                                     sidx=0)
                    if PY:
                        yplane_stage(u2r, slot, u0b, pslot, 0,
                                     yvi.at[t % U0D], ygi.at[t % U0D],
                                     yvo.at[t % 2], ygo.at[t % 2], t % SLD,
                                     uin=yui.at[t % SLD] if CARRY else None,
                                     uout=yuo.at[t % 2] if CARRY else None,
                                     sidx=0)
                    if PX:
                        for p in range(PX):
                            if XDYN:
                                xl = xpr[p]
                            else:
                                xl = xp_rows[p]
                            t1 = (xl - 1) // TX
                            r = xl - t1 * TX - 1

                            @pl.when(t == t1)
                            def _(p=p, t1=t1, r=r):
                                xplane_pass(u2r, t1 % 3, r, p,
                                            u0b.at[t1 % U0D], r, True,
                                            has_prev=(xpass_first is not None
                                                      and (p, True)
                                                      != xpass_first))
                    if NST:
                        stray_pass(u2r, slot, u0b, pslot, 0, t, True)
                    if Nin:
                        inject(u2r, slot, t, 0)
                    out2_copy(t).start()

                # ------------- stage 2: u3 rows of tile t-1 (step n+1)
                @pl.when(t >= 1)
                def _():
                    tt = t - 1

                    @pl.when(tt >= 1)
                    def _():
                        slab2[0:1] = u2r[pl.ds((tt - 1) % 3, 1), TX - 1]

                    slab2[1:TX + 1] = u2r[pl.ds(tt % 3, 1)][0]

                    @pl.when(t < NXT)
                    def _():
                        slab2[TX + 1:TX + 2] = u2r[pl.ds(t % 3, 1), 0]

                    apply_flips(slab2, tt)

                    # z_out/y_out(tt-2) are waited in stage 1 (the state
                    # flush slot is re-staged there first)
                    @pl.when(tt >= 2)
                    def _():
                        out3_copy(tt - 2).wait()

                    oslot = tt % 2
                    aslot = tt % SLD      # slab/adj/sf input rings

                    def w3(yc, hy, v):
                        u3b[oslot, :, yc:yc + hy, :] = v

                    def rs2(xo, ylo, hy):
                        return slab2[xo:xo + TX, ylo:ylo + hy, :]

                    def ra2(yc, hy):
                        return adjb[aslot, :, yc:yc + hy, :]

                    def rp2(yc, hy):
                        return slab[aslot, 1:TX + 1, yc:yc + hy, :]

                    stencil_into(w3, rs2, ra2, rp2)
                    if NOFULL:
                        def rdf2(z):
                            return slab2[0:TX + 2, :, z]

                        def rd2(dx, y, z):
                            return slab2[1 + dx:1 + dx + TX, y, z]

                        def rp2s(y, z):
                            return slab[aslot, 1:1 + TX, y, z]

                        adj_fixup(u3b, oslot, rdf2, rd2, rp2s,
                                  tt % SLD)
                        for p in range(AX):
                            xr = xa_rows[p]
                            t1 = (xr - 1) // TX
                            r = xr - t1 * TX - 1

                            @pl.when(tt == t1)
                            def _(p=p, r=r):
                                adj_fixup_xrow(
                                    u3b, oslot, r, p,
                                    lambda dx, ysl, r=r:
                                        slab2[1 + r + dx, ysl, :],
                                    lambda ysl, r=r:
                                        slab[aslot, 1 + r, ysl, :])
                    apply_abc(u3b, oslot, tt, slab, aslot, 1)
                    if PZ:
                        # state^{n+1} was staged into the output ring by
                        # stage 1; advance it to state^{n+2} IN PLACE
                        zplane_stage(u3b, oslot, slab, aslot, 1,
                                     zvo.at[tt % 2], zgo.at[tt % 2],
                                     zvo.at[tt % 2], zgo.at[tt % 2],
                                     tt % SLD,
                                     uin=(zui.at[tt % SLD] if CARRY
                                          else None),
                                     uout=zuo.at[tt % 2] if CARRY else None,
                                     sidx=1)
                        for c in z_out(tt):
                            c.start()
                    if PY:
                        yplane_stage(u3b, oslot, slab, aslot, 1,
                                     yvo.at[tt % 2], ygo.at[tt % 2],
                                     yvo.at[tt % 2], ygo.at[tt % 2],
                                     tt % SLD,
                                     uin=(yui.at[tt % SLD] if CARRY
                                          else None),
                                     uout=yuo.at[tt % 2] if CARRY else None,
                                     sidx=1)
                        for c in y_out(tt):
                            c.start()
                    if PX:
                        for p in range(PX):
                            if XDYN:
                                xl = xpr[p]
                            else:
                                xl = xp_rows[p]
                            t1 = (xl - 1) // TX
                            r = xl - t1 * TX - 1

                            @pl.when(tt == t1)
                            def _(p=p, t1=t1, r=r):
                                # a stage-2 pass is never first in the
                                # static order (its stage 1 precedes it)
                                xplane_pass(u3b, t1 % 2, r, p,
                                            slab.at[t1 % SLD], 1 + r,
                                            False, has_prev=True)
                    if NST:
                        stray_pass(u3b, oslot, slab, aslot, 1, tt, False)
                    if Nin:
                        inject(u3b, oslot, tt, 1)
                    out3_copy(tt).start()

            jax.lax.fori_loop(0, NXT + 1, loop, None, unroll=False)

            if XPIPE and "ode" not in ABLATE and "odex" not in ABLATE:
                # the LAST x pass left its final state flushes pending
                pl_, _fl = xpass_order[-1]
                for c in range(max(0, NCHX - 2), NCHX):
                    for cp in x_cout(pl_, c, c % 2):
                        cp.wait()

            # drain: waits not yet issued in-loop
            for dt in range(max(0, NXT - 3), NXT):
                out2_copy(dt).wait()
            for dt in range(max(0, NXT - 2), NXT):
                out3_copy(dt).wait()
                if PZ:
                    for c in z_out(dt):
                        c.wait()
                if PY:
                    for c in y_out(dt):
                        c.wait()
            for c in pre:
                c.wait()

        plane = (Nyp, Nzp)
        scratch = dict(
            slab=pltpu.VMEM((SLD, TX + 2) + plane, dtype),
            u0b=pltpu.VMEM((U0D, TX) + plane, dtype),
            adjb=pltpu.VMEM((1, 1) if NOFULL
                            else ((SLD, TX) + plane), adt),
            u2r=pltpu.VMEM((3, TX) + plane, dtype),
            slab2=pltpu.VMEM((TX + 2,) + plane, dtype),
            u3b=pltpu.VMEM((2, TX) + plane, dtype),
            sem_in=pltpu.SemaphoreType.DMA((3, 3)),
            sem_o2=pltpu.SemaphoreType.DMA((3,)),
            sem_o3=pltpu.SemaphoreType.DMA((2,)),
            sem_pre=pltpu.SemaphoreType.DMA((4,)),
        )
        Wy = -(-Nyp // 128) * 128
        AZ8, AY8 = -(-AZ // 8) * 8, -(-AY // 8) * 8
        scratch["zadr"] = pltpu.VMEM((SLD, TX, AZ8, Wy) if AZ
                                     else (1, 1), jnp.int32)
        scratch["yadr"] = pltpu.VMEM((SLD, TX, AY8, Nzp) if AY
                                     else (1, 1), jnp.int32)
        scratch["xadb"] = pltpu.VMEM((Nyp, Nzp) if AX else (1, 1), jnp.int32)
        scratch["sem_az"] = pltpu.SemaphoreType.DMA((3,) if AZ else (1,))
        scratch["sem_ay"] = pltpu.SemaphoreType.DMA((3,) if AY else (1,))
        scratch["sem_ax"] = pltpu.SemaphoreType.DMA((1,))
        if PZ:
            zs = (2, TX, PZ, MZ, Nyw)
            zsi = (U0D, TX, PZ, MZ, Nyw)
            scratch.update(
                zvi=pltpu.VMEM(zsi, dtype), zgi=pltpu.VMEM(zsi, dtype),
                zvo=pltpu.VMEM(zs, dtype), zgo=pltpu.VMEM(zs, dtype),
                zsf=pltpu.VMEM((SLD, TX, PZ8, Nyw), dtype),
                zst=pltpu.VMEM((2, TX, PZ8, Nyw), dtype),
                sem_zin=pltpu.SemaphoreType.DMA((U0D, 4)),
                sem_zout=pltpu.SemaphoreType.DMA((2, 3)))
        else:
            for k in ("zvi", "zgi", "zvo", "zgo", "zsf", "zst"):
                scratch[k] = pltpu.VMEM((1, 1), dtype)
            scratch["sem_zin"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_zout"] = pltpu.SemaphoreType.DMA((1,))
        if PZ and CARRY:
            scratch["zui"] = pltpu.VMEM((SLD, TX, S2PZ, Nyw), dtype)
            scratch["zuo"] = pltpu.VMEM((2, TX, S2PZ, Nyw), dtype)
        else:
            scratch["zui"] = pltpu.VMEM((1, 1), dtype)
            scratch["zuo"] = pltpu.VMEM((1, 1), dtype)
        if PY:
            ys_ = (2, TX, PY, MZ, WY)
            ysi = (U0D, TX, PY, MZ, WY)
            scratch.update(
                yvi=pltpu.VMEM(ysi, dtype), ygi=pltpu.VMEM(ysi, dtype),
                yvo=pltpu.VMEM(ys_, dtype), ygo=pltpu.VMEM(ys_, dtype),
                ysf=pltpu.VMEM((SLD, TX, PY8, WY), dtype),
                yst=pltpu.VMEM((2, TX, PY8, WY), dtype),
                sem_yin=pltpu.SemaphoreType.DMA((U0D, 4)),
                sem_yout=pltpu.SemaphoreType.DMA((2, 3)))
        else:
            for k in ("yvi", "ygi", "yvo", "ygo", "ysf", "yst"):
                scratch[k] = pltpu.VMEM((1, 1), dtype)
            scratch["sem_yin"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_yout"] = pltpu.SemaphoreType.DMA((1,))
        if PY and CARRY:
            scratch["yui"] = pltpu.VMEM((SLD, TX, S2PY, WY), dtype)
            scratch["yuo"] = pltpu.VMEM((2, TX, S2PY, WY), dtype)
        else:
            scratch["yui"] = pltpu.VMEM((1, 1), dtype)
            scratch["yuo"] = pltpu.VMEM((1, 1), dtype)
        if PX:
            scratch.update(
                xv=pltpu.VMEM((2, CY, MZ, Nzp), dtype),
                xg=pltpu.VMEM((2, CY, MZ, Nzp), dtype),
                xsb=pltpu.VMEM((2, CY, Nzp), dtype),
                sem_xi=pltpu.SemaphoreType.DMA((2, 5)),
                sem_xo=pltpu.SemaphoreType.DMA((2, 4)))
        else:
            for k in ("xv", "xg", "xsb"):
                scratch[k] = pltpu.VMEM((1, 1), dtype)
            scratch["sem_xi"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_xo"] = pltpu.SemaphoreType.DMA((1,))
        if NST:
            scratch.update(
                sndb=pltpu.VMEM((2 * S_SEG, 8, S_TS), jnp.float32),
                ssvb=pltpu.VMEM((2 * S_SEG, S_MZS, S_TS), dtype),
                ssgb=pltpu.VMEM((2 * S_SEG, S_MZS, S_TS), dtype),
                sem_si=pltpu.SemaphoreType.DMA((2, 3)),
                sem_so=pltpu.SemaphoreType.DMA((2, 2)))
        else:
            for k in ("sndb", "ssvb", "ssgb"):
                scratch[k] = pltpu.VMEM((1, 1), dtype)
            scratch["sem_si"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_so"] = pltpu.SemaphoreType.DMA((1,))

        pl.run_scoped(body, **scratch)

    gshape = jax.ShapeDtypeStruct((Nxp, Nyp, Nzp), dtype)

    def fused(u1, u0, adj, sig2, states, pconsts, scal=None, ipts=None,
              xpr=None):
        """states: {fam: (vh, gh)}; pconsts: {fam: (ssaf, coefs)} - the
        static plane arrays are threaded as jit args, never closed over
        (closure-captured device arrays inline into the serialized HLO).
        adj: the packed adjacency grid, or (adj_planes mode) the
        {"z"/"y"/"x": int32 plane-adjacency} dict.  scal/ipts: sharded-mode
        SMEM scalars ([x0, is_first, is_last] and local source coords);
        xpr: sharded-mode (PX,) i32 LOCAL x-plane rows in [2, S+1];
        inactive planes point at row 2 with ssaf = 0 (exact identity -
        NEVER at the edge rows 1 / S+2, whose u3 values are garbage by
        design and would poison the state through 0 * garbage)."""
        ins = [sig2]
        if SHARDED:
            ins += [scal, ipts]
            if XDYN:
                ins.append(xpr)
        n_smem = len(ins)
        ins += [u1, u0]
        if NOFULL:
            for fam, on in (("z", AZ), ("y", AY), ("x", AX)):
                if on:
                    ins.append(adj[fam])
        else:
            ins.append(adj)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem \
            + [pl.BlockSpec(memory_space=pl.ANY)] * (len(ins) - n_smem)
        outs = [gshape, gshape]
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        # u3 output aliases u1, u2 output aliases u0 (positions shift by
        # the SMEM input count)
        al = {n_smem: 0, n_smem + 1: 1}
        idx, oidx = len(ins), 2
        fams = []
        for fam, on in (("z", PZ), ("y", PY), ("x", PX)):
            if not on:
                continue
            fc = CARRY and fam in ("z", "y")
            if fc:
                vh, gh, uc = states[fam]
            else:
                vh, gh = states[fam]
            sf, co = pconsts[fam]
            bet = co[:, 4 * MZ, 0]   # per-plane beta scalars -> SMEM
            ins += [vh, gh, sf, co, bet] + ([uc] if fc else [])
            in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3 \
                + [pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)] \
                + ([pl.BlockSpec(memory_space=pl.ANY)] if fc else [])
            outs += [jax.ShapeDtypeStruct(vh.shape, dtype),
                     jax.ShapeDtypeStruct(gh.shape, dtype)] \
                + ([jax.ShapeDtypeStruct(uc.shape, dtype)] if fc else [])
            out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * (3 if fc
                                                                else 2)
            al[idx] = oidx
            al[idx + 1] = oidx + 1
            if fc:
                al[idx + 5] = oidx + 2
            fams.append((fam, fc))
            idx += 6 if fc else 5
            oidx += 3 if fc else 2
        if NST:
            svh, sgh = states["s"]
            nd_a, tab_a, soff_a, sr0_a, sy0_a, sz0_a = pconsts["s"]
            ins += [svh, sgh, nd_a, tab_a, soff_a, sr0_a, sy0_a, sz0_a]
            in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 3 \
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] \
                + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
            outs += [jax.ShapeDtypeStruct(svh.shape, dtype),
                     jax.ShapeDtypeStruct(sgh.shape, dtype)]
            out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
            al[idx] = oidx
            al[idx + 1] = oidx + 1
            fams.append(("s", False))
            idx += 8
            oidx += 2
        res = pl.pallas_call(
            kernel,
            out_shape=outs,
            in_specs=in_specs,
            out_specs=out_specs,
            input_output_aliases=al,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(*ins)
        new_states = {}
        i = 2
        for fam, fc in fams:
            n = 3 if fc else 2
            new_states[fam] = tuple(res[i:i + n])
            i += n
        return res[0], res[1], new_states

    return fused


def lookahead_bytes_per_row(planes, itemsize: int = 4,
                            carry: bool = False) -> int:
    """Extra VMEM bytes per TX row that input lookahead LA=2 costs: one
    more vi+gi state slot + one more ssaf slot per z/y family (+ one
    carry-ring slot under u2b-carry).  The extra u0b/slab/adj blocks are
    counted by pick_tile_pair's `lookahead` argument."""
    b = 0
    if planes is not None:
        for pp in (planes.z, planes.y):
            if pp is not None:
                W = pp.ssaf.shape[2]
                b += (pp.P * 2 * pp.MZ + pp.ssaf.shape[1]) * W * itemsize
                if carry:
                    b += carry_pad(pp.P) * W * itemsize
    return b


def pick_tile_pair(Nyp, Nzp, adj_bytes=2, dtype_bytes=4,
                   budget_bytes=88 * 1024 * 1024,
                   state_bytes=0, lookahead: int = 1) -> int:
    """Largest TX whose pair-kernel scratch fits the VMEM budget.

    The budget leaves ~45 MB of the 128 MB VMEM for Mosaic's stack
    temporaries (the stencil materialises a few block-sized values per
    expression tree).  state_bytes: per-row bytes of fused plane state
    scratch (6 copies of vh/gh rings + 3 ssaf slots), added per TX row.

    TX is capped at 8: TX=12/16 (reachable on small planes) hit a
    pathological Mosaic compile mode (remote compiles of 20+ minutes
    observed where TX<=8 variants take 1-3) with no bandwidth upside -
    the per-visit DMA is already row-granular and deep."""
    env = os.environ.get("PFFDTD_PAIR_BUDGET_MB")
    if env:
        budget_bytes = int(float(env) * 1024 * 1024)
    plane = Nyp * Nzp
    # TX=6 measured HEALTHY on rigid scenes (164-Mvox box: 33.1 GVPS,
    # round 3) but pathological when plane states ride in-kernel: the
    # real Musikverein ran 33.0 ms/step at TX=6 vs 26.0 at TX=4 (round
    # 5, identical stray plans) — near-limit VMEM pressure with the
    # state rings resident.  Offer 6 only to state-free (rigid) scenes.
    cands = (8, 6, 4, 3) if state_bytes == 0 else (8, 4, 3)
    for TX in cands:
        la = max(1, lookahead)
        need = plane * (
            (2 + la) * (TX + 2) * dtype_bytes  # u1 slab ring
            + (1 + la) * TX * dtype_bytes      # u0 blocks
            + (2 + la) * TX * adj_bytes        # adj ring
            + 3 * TX * dtype_bytes             # u2 ring
            + (TX + 2) * dtype_bytes           # slab2
            + 2 * TX * dtype_bytes)            # u3 staging
        need += TX * state_bytes
        if need <= budget_bytes:
            return TX
    return 2
