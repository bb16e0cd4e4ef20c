"""Deep temporally-blocked Pallas TPU kernel: TB leapfrog steps per sweep.

Generalises the pair kernel (pallas_pair.py, TB=2) to TB in {2..8}: one
sweep over x-row tiles advances (u^{n-1}, u^n) -> (u^{n+TB-1}, u^{n+TB}),
reading u^n / u^{n-1} / adjacency ONCE and writing the two final fields
ONCE.  HBM bytes per step shrink by ~TB/2 vs the pair kernel (~4 grids +
overheads per TB steps), which matters because the v5e pair kernel is
DMA-floor-bound (measured ~460 GB/s of 819 with everything ablated).

Pipeline (stages run in ascending order inside one visit t):

    stage 1 (step n)      : F2 rows of tile t         = f(u1, u0)
    stage s (step n+s-1)  : F[s+1] rows of tile t-s+1 = f(F[s], F[s-1])
    stage TB (step n+TB-1): output rows of tile t-TB+1

Every stage trails its producer by exactly one tile.  Each field F[j]
lives in a CIRCULAR VMEM row buffer of 3*TX+2 rows: tile tau occupies
rows [1+(tau%3)*TX, ..+TX) and the (TX+2)-row stencil window of tile tau
is the CONTIGUOUS slice starting at (tau%3)*TX, thanks to two one-row
margin duplicates kept up to date by the writer (slot-0 writes copy
their first row to the tail margin, slot-2 writes their last row to the
head margin).  Compared to the round-3 first cut (3-slot rings plus a
per-stage assembly slab), this kills the (TX+2)-row copy per stage-tile
and the 2-row u1 re-read per visit, and the saved VMEM buys larger TX -
the dominant cost at benchmark scale is a fixed ~18 us per stage-tile,
and stage-tiles per step = (Nx-2)/TX regardless of TB.

All per-step physics is applied in-kernel while rows are resident: halo
mirror flips (idempotent, applied by the consuming stage on its window),
the adjacency-masked stencil + leapfrog (or unmasked bulk + static-plane
fix-ups in adj-planes mode), the Engquist-Majda ABC, the z/y/x-normal
impedance-plane ODEs, per-stage source injection, and per-stage SMEM
receiver taps for the intermediate steps that never reach HBM.

DANGER - aliasing: F[TB] overwrites u0's HBM buffer and F[TB+1]
overwrites u1's.  The schedule keeps every read ahead of the aliased
writes exactly as in the pair kernel (writes trail the prefetched reads
by >= TB-1 tiles).  Halo lanes of the OUTPUT fields are garbage by
convention (every sweep's flips rebuild them from interior lanes before
any real use), which makes the window-flip-vs-output-DMA overlap benign.

Ring-lifetime cheat-sheet:
    F[j] circular buffers   3*TX+2 rows (stencil at +-1 tile, prev)
    u0 blocks               2*TX rows   (stage-1 prev only)
    final staging           2*TX rows
    adjacency / ssaf        TB+1 tile slots (read by every stage)
    z/y ODE state levels    TB+1 levels x 2 tile slots

Reference anchors: leapfrog + rigid update gpu_engine.h:220-348; ABC
cpu_engine.h:144-172,224-229; boundary ODE cpu_engine.h:362-405; the
air/boundary dual-stream overlap this kernel replaces: gpu_engine.h:964-1056.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pffdtd_tpu.engine.pallas_pair import AdjPlanes
from pffdtd_tpu.voxelizer.vox import CART_VECTORS, FCC_VECTORS

_NO_ROLLS = bool(os.environ.get("PFFDTD_ABLATE", "").count("rolls"))


def _roll(x, shift, axis):
    if _NO_ROLLS:   # perf ablation only - numerically wrong
        return x
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def build_fused_tb(grid, sc, fcc: bool, dtype=jnp.float32, TX: int = 8,
                   TB: int = 4, interpret: bool = False, in_pts=None,
                   out_pts=None, planes=None,
                   adj_planes: AdjPlanes | None = None,
                   u2b_carry: bool = False):
    """Returns fn(u1, u0, adj, sigTB, states, pconsts) ->
    (uN1, uN, taps, new_states).

    uN1 = u^{n+TB} (aliases u1's buffer), uN = u^{n+TB-1} (aliases u0's).
    sigTB: (TB, Nin) SMEM source samples, one row per stage.  taps:
    (max(TB-2, 1), Nout) receiver values of the INTERMEDIATE steps
    u^{n+1}..u^{n+TB-2} (row s-1 = step n+s); the caller taps uN/uN1 for
    the final two steps.  out_pts: (Nout, 3) STATIC receiver-node padded
    coordinates (required when TB > 2 and receivers exist).

    planes: optional BoundaryPlanes (z/y/x impedance families);
    adj_planes: optional AdjPlanes cover -> unmasked bulk, `adj` is the
    {"z"/"y"/"x": int32} per-plane adjacency dict instead of the grid.
    Single-device only (the sharded engine stays on the pair kernel).
    """
    assert 2 <= TB <= 8, TB
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    Nxp, Nyp, Nzp = grid.shape
    folded = grid.folded
    VV = (FCC_VECTORS if fcc else CART_VECTORS).astype(np.int64)
    NN = VV.shape[0]

    NXT = -(-(Nx - 2) // TX)
    assert Nxp >= NXT * TX + 2, (Nxp, NXT, TX)
    NV = NXT + TB - 1           # visits
    RD = TB + 1                 # deep-slot depth (adj / ssaf)
    RC = 3 * TX + 2             # circular rows per intermediate field
    # u1 rows live across THREE visits (stencil window at -1/0/+1 tiles
    # plus the stage-2 prev read) while the DMA is issued two visits
    # ahead, so its circular buffer cycles over FOUR tile slots
    RC1 = 4 * TX + 2

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
    out_pts = np.zeros((0, 3), np.int64) if out_pts is None else \
        np.asarray(out_pts, np.int64)
    Nout = int(out_pts.shape[0])
    NTAP = max(TB - 2, 1)
    # PFFDTD_TB_NOTAPS=1: perf ablation only - intermediate-step receiver
    # samples come back as zeros
    do_taps = (TB > 2 and Nout > 0
               and os.environ.get("PFFDTD_TB_NOTAPS", "0") != "1")

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
    # y-family z-window (see pallas_pair: confines ssaf/states/ODE work
    # to the 128-aligned union lane span, exact on nodeless lanes)
    WY = ypl.ssaf.shape[2] if PY else 128
    YZ0 = int(getattr(ypl, "z0", 0)) if PY else 0
    # ssaf plane dims may be 8-padded (identity planes) for DMA tiling
    PZ8 = zpl.ssaf.shape[1] if PZ else 0
    PY8 = ypl.ssaf.shape[1] if PY else 0
    CY = min(xpl.CY, Nyp) if PX else 8
    if PX:
        assert all(1 <= x <= Nx - 2 for x in xp_rows), xp_rows

    # u2b carry (see pallas_pair.carry_ok): stage s's u^{n+s-2} plane
    # sheet is stage (s-2)'s post-ODE output — stages 1/2 read it from a
    # 2-block HBM array written by stages TB-1/TB one sweep earlier;
    # stages >= 3 read the within-sweep value from a 3-slot VMEM ring.
    from pffdtd_tpu.engine.pallas_pair import carry_pad

    CARRY = bool(u2b_carry) and (PZ > 0 or PY > 0)
    S2PZ = carry_pad(PZ) if (PZ and CARRY) else 0
    S2PY = carry_pad(PY) if (PY and CARRY) else 0
    NIZ = PZ * (TB - 2) if (PZ and CARRY) else 0   # intermediate blocks
    NIY = PY * (TB - 2) if (PY and CARRY) else 0

    ap = adj_planes
    NOFULL = ap is not None
    za_lanes = [int(z) for z in ap.z_lanes] if NOFULL else []
    ya_subl = [int(y) for y in ap.y_subl] if NOFULL else []
    xa_rows = [int(x) for x in ap.x_rows] if NOFULL else []
    AZ, AY, AX = len(za_lanes), len(ya_subl), len(xa_rows)
    cfull = npdt(two - sl2 * npdt(NN))
    ABLATE = set(filter(None,
                        os.environ.get("PFFDTD_ABLATE", "").split(",")))
    CYA = min(64, Nyp)
    adt = jnp.uint16 if NN == 12 else jnp.uint8

    def kernel(*refs):
        it = iter(refs)
        sig = next(it)                     # SMEM (TB, max(Nin, 1))
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
        uN1_h = next(it)                   # out u^{n+TB}  (aliases u1)
        uN_h = next(it)                    # out u^{n+TB-1} (aliases u0)
        taps_o = next(it) if do_taps else None   # SMEM (NTAP, Nout)
        zvo_h = next(it) if PZ else None
        zgo_h = next(it) if PZ else None
        zuo_h = next(it) if (PZ and CARRY) else None
        yvo_h = next(it) if PY else None
        ygo_h = next(it) if PY else None
        yuo_h = next(it) if (PY and CARRY) else None
        xvo_h = next(it) if PX else None
        xgo_h = next(it) if PX else None

        def body(C, u0b, uNb, adjb,
                 zv, zg, zsf, zst, yv, yg, ysf, yst, xv, xg, xsb,
                 zui, zuo, zuc, yui, yuo, yuc,
                 zadr, yadr, xadb,
                 sem_u1, sem_u1m, sem_u0, sem_adj, sem_oN, sem_oF,
                 sem_pre, sem_zin, sem_zout, sem_zsf, sem_yin, sem_yout,
                 sem_ysf, sem_xi, sem_xo, sem_az, sem_ay, sem_ax,
                 sem_zu, sem_yu):
            # C: tuple of TB circular (RC, Nyp, Nzp) field buffers
            # (C[0] = u1 = F[1], C[j-1] = F[j]); u0b/uNb: (2*TX, ...) flat
            # slot pairs; zv/zg: tuples of TB+1 state levels

            def off_of(tau):
                return 1 + jax.lax.rem(jnp.int32(tau), jnp.int32(3)) * TX

            def z_in(t):
                rs = t * TX + 1
                cps = [
                    pltpu.make_async_copy(zvh_h.at[pl.ds(rs, TX)],
                                          zv[0].at[t % 2],
                                          sem_zin.at[t % 2, 0]),
                    pltpu.make_async_copy(zgh_h.at[pl.ds(rs, TX)],
                                          zg[0].at[t % 2],
                                          sem_zin.at[t % 2, 1]),
                    pltpu.make_async_copy(zsf_h.at[pl.ds(rs, TX)],
                                          zsf.at[t % RD],
                                          sem_zsf.at[t % RD]),
                ]
                if CARRY:
                    cps.append(pltpu.make_async_copy(
                        zub_h.at[pl.ds(rs, TX)], zui.at[t % 3],
                        sem_zin.at[t % 2, 2]))
                return cps

            def z_out(tt):
                rs = tt * TX + 1
                return [
                    pltpu.make_async_copy(zv[TB].at[tt % 2],
                                          zvo_h.at[pl.ds(rs, TX)],
                                          sem_zout.at[tt % 2, 0]),
                    pltpu.make_async_copy(zg[TB].at[tt % 2],
                                          zgo_h.at[pl.ds(rs, TX)],
                                          sem_zout.at[tt % 2, 1]),
                ]

            def zu_out(tt):
                # carry flush (separate sem: waited in the writes_uN
                # branch one visit BEFORE the final stage's z_out wait,
                # because stage TB-1 rewrites the slot's block 0 first)
                return pltpu.make_async_copy(
                    zuo.at[tt % 2], zuo_h.at[pl.ds(tt * TX + 1, TX)],
                    sem_zu.at[tt % 2])

            def yu_out(tt):
                return pltpu.make_async_copy(
                    yuo.at[tt % 2], yuo_h.at[pl.ds(tt * TX + 1, TX)],
                    sem_yu.at[tt % 2])

            def y_in(t):
                rs = t * TX + 1
                cps = [
                    pltpu.make_async_copy(yvh_h.at[pl.ds(rs, TX)],
                                          yv[0].at[t % 2],
                                          sem_yin.at[t % 2, 0]),
                    pltpu.make_async_copy(ygh_h.at[pl.ds(rs, TX)],
                                          yg[0].at[t % 2],
                                          sem_yin.at[t % 2, 1]),
                    pltpu.make_async_copy(ysf_h.at[pl.ds(rs, TX)],
                                          ysf.at[t % RD],
                                          sem_ysf.at[t % RD]),
                ]
                if CARRY:
                    cps.append(pltpu.make_async_copy(
                        yub_h.at[pl.ds(rs, TX)], yui.at[t % 3],
                        sem_yin.at[t % 2, 2]))
                return cps

            def y_out(tt):
                rs = tt * TX + 1
                return [
                    pltpu.make_async_copy(yv[TB].at[tt % 2],
                                          yvo_h.at[pl.ds(rs, TX)],
                                          sem_yout.at[tt % 2, 0]),
                    pltpu.make_async_copy(yg[TB].at[tt % 2],
                                          ygo_h.at[pl.ds(rs, TX)],
                                          sem_yout.at[tt % 2, 1]),
                ]

            def u1_main(t):
                # TX new rows per tile into the 4-cycle u1 buffer
                return pltpu.make_async_copy(
                    u1_h.at[pl.ds(t * TX + 1, TX)],
                    C[0].at[pl.ds(1 + (t % 4) * TX, TX)],
                    sem_u1.at[t % 4])

            def u1_margin(t, which):
                # which 0: slot-0 tile's first row -> tail margin; 1:
                # slot-3 tile's last row -> head margin (straight from HBM)
                if which == 0:
                    return pltpu.make_async_copy(
                        u1_h.at[pl.ds(t * TX + 1, 1)],
                        C[0].at[pl.ds(4 * TX + 1, 1)], sem_u1m.at[0])
                return pltpu.make_async_copy(
                    u1_h.at[pl.ds(t * TX + TX, 1)],
                    C[0].at[pl.ds(0, 1)], sem_u1m.at[1])

            def u1_issue(t):
                u1_main(t).start()

                @pl.when(jax.lax.rem(jnp.int32(t), jnp.int32(4)) == 0)
                def _():
                    u1_margin(t, 0).start()

                @pl.when(jax.lax.rem(jnp.int32(t), jnp.int32(4)) == 3)
                def _():
                    u1_margin(t, 1).start()

            def u1_wait(t):
                u1_main(t).wait()

                @pl.when(jax.lax.rem(jnp.int32(t), jnp.int32(4)) == 0)
                def _():
                    u1_margin(t, 0).wait()

                @pl.when(jax.lax.rem(jnp.int32(t), jnp.int32(4)) == 3)
                def _():
                    u1_margin(t, 1).wait()

            def grid_in(t):
                cps = [
                    pltpu.make_async_copy(u0_h.at[pl.ds(t * TX + 1, TX)],
                                          u0b.at[pl.ds((t % 2) * TX, TX)],
                                          sem_u0.at[t % 2]),
                ]
                if not NOFULL:
                    cps.append(
                        pltpu.make_async_copy(
                            adj_h.at[pl.ds(t * TX + 1, TX)],
                            adjb.at[pl.ds((t % RD) * TX, TX)],
                            sem_adj.at[t % RD]))
                if AZ:
                    cps.append(
                        pltpu.make_async_copy(
                            zadj_h.at[pl.ds(t * TX + 1, TX)],
                            zadr.at[t % RD], sem_az.at[t % RD]))
                if AY:
                    cps.append(
                        pltpu.make_async_copy(
                            yadj_h.at[pl.ds(t * TX + 1, TX)],
                            yadr.at[t % RD], sem_ay.at[t % RD]))
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

            def outN_copy(tt):
                # F[TB] flush straight from its circular buffer (the DMA
                # only reads; wait before the rows are REwritten)
                return pltpu.make_async_copy(
                    C[TB - 1].at[pl.ds(1 + (tt % 3) * TX, TX)],
                    uN_h.at[pl.ds(tt * TX + 1, TX)], sem_oN.at[tt % 3])

            def outF_copy(tt):
                return pltpu.make_async_copy(
                    uNb.at[pl.ds((tt % 2) * TX, TX)],
                    uN1_h.at[pl.ds(tt * TX + 1, TX)], sem_oF.at[tt % 2])

            # output rows the tile loop never writes (global halo row 0 and
            # the x padding tail) are filled from the pre-update fields
            tail0 = NXT * TX + 1
            pre = [
                pltpu.make_async_copy(u0_h.at[pl.ds(0, 1)],
                                      uN_h.at[pl.ds(0, 1)], sem_pre.at[0]),
                pltpu.make_async_copy(u0_h.at[pl.ds(tail0, Nxp - tail0)],
                                      uN_h.at[pl.ds(tail0, Nxp - tail0)],
                                      sem_pre.at[1]),
                pltpu.make_async_copy(u1_h.at[pl.ds(0, 1)],
                                      uN1_h.at[pl.ds(0, 1)], sem_pre.at[2]),
                pltpu.make_async_copy(u1_h.at[pl.ds(tail0, Nxp - tail0)],
                                      uN1_h.at[pl.ds(tail0, Nxp - tail0)],
                                      sem_pre.at[3]),
                # global halo row 0 of u1 -> the u1 circular head margin
                # (the very first stencil window starts at it)
                pltpu.make_async_copy(u1_h.at[pl.ds(0, 1)],
                                      C[0].at[pl.ds(0, 1)], sem_pre.at[4]),
            ]
            for c in pre:
                c.start()

            start_in(0)
            u1_issue(0)
            if NXT > 1:
                u1_issue(1)

            def margins(buf, tau):
                """Keep the circular margins coherent after writing tile
                tau: slot-0 first row -> tail, slot-2 last row -> head."""
                rem3 = jax.lax.rem(jnp.int32(tau), jnp.int32(3))

                @pl.when(rem3 == 0)
                def _():
                    buf[pl.ds(3 * TX + 1, 1)] = buf[pl.ds(1, 1)]

                @pl.when(rem3 == 2)
                def _():
                    buf[pl.ds(0, 1)] = buf[pl.ds(3 * TX, 1)]

            def apply_flips(buf, woff, base_t):
                """Mirror halo flips on the (TX+2)-row window of `buf`
                starting at traced row woff (window row 0 = global row
                base_t*TX).  Idempotent - overlapping windows re-apply."""
                if "flips" in ABLATE:
                    return
                w = pl.ds(woff, TX + 2)
                buf[w, :, 0] = buf[w, :, 2]
                buf[w, :, Nz - 1] = buf[w, :, Nz - 3]
                buf[w, 0, :] = buf[w, 2, :]
                if folded:
                    buf[w, Ny - 1, :] = buf[w, Ny - 2, :]
                else:
                    buf[w, Ny - 1, :] = buf[w, Ny - 3, :]

                @pl.when(base_t == 0)
                def _():
                    buf[pl.ds(woff, 1)] = buf[pl.ds(woff + 2, 1)]

                j = Nx - 1 - base_t * TX

                @pl.when((j >= 2) & (j <= TX + 1))
                def _():
                    buf[pl.ds(woff + j, 1)] = buf[pl.ds(woff + j - 2, 1)]

            HY = -(-Nyp // 8)
            HY = -(-HY // 8) * 8

            def stencil_into(write, read_src, read_adj, read_prev):
                """Masked stencil + leapfrog, y-chunked (see pallas_pair:
                the dz-grouping rule and chunked temporaries are identical)."""
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
                                t_k = nb
                            else:
                                bit = ((a32g >> k) & 1).astype(dtype)
                                t_k = bit * nb
                                if gro:
                                    # node-aligned K for a rolled group =
                                    # the neighbour-aligned bit sum rolled
                                    # back ONCE (exact integer f32; the
                                    # wrapped lane lands on the z halo) -
                                    # one roll instead of 4 bit-extracts
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
                """Full masked stencil on one plane sheet (plain k order)."""
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

            def adj_fixup(outr, obase, rdfull, rd, rdprev, aslot):
                """Masked-stencil rewrite of the z/y cover planes (sheets
                cached across planes, see pallas_pair.adj_fixup)."""
                sheets = {}

                def sheet(z):
                    if z not in sheets:
                        sheets[z] = rdfull(z)
                    return sheets[z]

                ob = pl.ds(obase, TX)
                for p in range(AZ):
                    zl = za_lanes[p]
                    a32 = zadr[aslot, :, p, :][:, :Nyp]     # (TX, Nyp)

                    def rdz(k, dx, dy, dz, zl=zl):
                        nb = sheet(zl + dz)[1 + dx:1 + dx + TX, :]
                        return _roll(nb, -dy, 1) if dy else nb

                    outr[ob, :, zl] = _masked_val(
                        a32, rdz, sheet(zl)[1:1 + TX, :],
                        rdprev(slice(0, TX), slice(None), zl))
                for p in range(AY):
                    yl = ya_subl[p]
                    a32 = yadr[aslot, :, p, :]              # (TX, Nzp)

                    def rdy(k, dx, dy, dz, yl=yl):
                        nb = rd(dx, yl + dy, slice(None))
                        return _roll(nb, -dz, 1) if dz else nb

                    outr[ob, yl, :] = _masked_val(
                        a32, rdy, rd(0, yl, slice(None)),
                        rdprev(slice(0, TX), yl, slice(None)))

            def adj_fixup_xrow(outr, obase, r, p, rdrow, rdprevrow):
                """Masked-stencil rewrite of one x cover row (y-chunked)."""
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

                    outr[pl.ds(obase + r, 1), yc:yc + cy, :] = _masked_val(
                        a32, rdx, rdrow(0, slice(yc, yc + cy)),
                        rdprevrow(slice(yc, yc + cy)))[None]

            def apply_abc(outr, obase, t, read_prev):
                """Engquist-Majda ABC slices on the output rows at traced
                base obase; read_prev(rsl, ysl, zsl) returns the matching
                pre-update (u^{step-1}) tile rows."""
                if "abc" in ABLATE:
                    return
                w1, w2, w3 = abc_w[1], abc_w[2], abc_w[3]
                ob = pl.ds(obase, TX)
                gz1 = jax.lax.broadcasted_iota(jnp.int32, (TX, Nzp), 1)
                zext = ((gz1 == 1) | (gz1 == Nz - 2)).astype(jnp.int32)
                gx1 = (jax.lax.broadcasted_iota(jnp.int32, (TX, Nzp), 0)
                       + t * TX + 1)
                xext = ((gx1 == 1) | (gx1 == Nx - 2)).astype(jnp.int32)
                ylo = 2
                yhi = Ny - 1 if folded else Ny - 2
                y_faces = (1,) if folded else (1, Ny - 2)
                for yf in y_faces:
                    q = zext + xext + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, jnp.where(q == 2, w2, w3))
                    vals = outr[ob, yf, :]
                    pv = read_prev(slice(0, TX), yf, slice(None))
                    outr[ob, yf, :] = (vals + lv * qf * pv) * w
                gx2 = (jax.lax.broadcasted_iota(
                    jnp.int32, (TX, yhi - ylo), 0) + t * TX + 1)
                xext2 = ((gx2 == 1) | (gx2 == Nx - 2)).astype(jnp.int32)
                for zf in (1, Nz - 2):
                    q = xext2 + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, w2)
                    vals = outr[ob, ylo:yhi, zf]
                    pv = read_prev(slice(0, TX), slice(ylo, yhi), zf)
                    outr[ob, ylo:yhi, zf] = (vals + lv * qf * pv) * w
                for r in range(TX):
                    gx_r = t * TX + 1 + r

                    @pl.when((gx_r == 1) | (gx_r == Nx - 2))
                    def _(r=r):
                        vals = outr[pl.ds(obase + r, 1), ylo:yhi, 2:Nz - 2]
                        pv = read_prev(r, slice(ylo, yhi),
                                       slice(2, Nz - 2))
                        outr[pl.ds(obase + r, 1), ylo:yhi, 2:Nz - 2] = (
                            vals + lv * pv[None]) * w1

            def inject(outr, obase, t, stage):
                """Add the stage's source samples into rows owned by tile
                t (sources sit in the interior, never on halo rows)."""
                for i in range(Nin):
                    gx, gy, gz = (int(v) for v in in_pts[i])

                    @pl.when((gx >= t * TX + 1) & (gx < t * TX + TX + 1))
                    def _(gx=gx, gy=gy, gz=gz, i=i):
                        my = jax.lax.broadcasted_iota(
                            jnp.int32, (1, Nyp, Nzp), 1) == gy
                        mz = jax.lax.broadcasted_iota(
                            jnp.int32, (1, Nyp, Nzp), 2) == gz
                        m = (my & mz).astype(dtype)
                        r = gx - t * TX - 1
                        outr[pl.ds(obase + r, 1)] = (
                            outr[pl.ds(obase + r, 1)] + sig[stage, i] * m)

            def take_taps(outr, obase, t, stage):
                """Extract receiver-node values of an intermediate step
                (stage 1..TB-2) into the SMEM taps output."""
                for i in range(Nout):
                    gx, gy, gz = (int(v) for v in out_pts[i])

                    @pl.when((gx >= t * TX + 1) & (gx < t * TX + TX + 1))
                    def _(gx=gx, gy=gy, gz=gz, i=i):
                        r = gx - t * TX - 1
                        taps_o[stage - 1, i] = \
                            outr[pl.ds(obase + r, 1), gy, gz][0]

            def ode(ub, u2b, vh, gh, sa, co, bs):
                """One impedance-ODE step on dense plane values
                (cpu_engine.h:362-405 semantics); co rows lane-broadcast
                from lane 0; bs: the plane's beta as an SMEM scalar (see
                pallas_pair.ode — avoids an unsupported two-axis Mosaic
                vector.broadcast under the carry path's layouts)."""
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
                """Batched impedance ODE over a PC-plane chunk (see
                pallas_pair.ode_p: batching the plane dim into the vregs
                divides the per-tile instruction count by PC).  co is
                (PC, 5*MZ, 1); beta broadcasts from a (PC, 1) slice
                (lanes only - no two-axis Mosaic broadcast)."""
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

            PC = 8  # planes per ODE call (bounds the Mosaic stack temps)

            def _batched_plane_stage(P, coords, extract, extract_prev,
                                     insert, sa_all, co_all, vin, gin,
                                     vout, gout, ucin, rb, ucout, wb,
                                     stg):
                """Shared z/y batched plane stage (see pallas_pair);
                stg: (2, TX, P8, W) staging scratch that canonicalizes
                the offset-carrying extracted sheet layouts (Mosaic
                tpu.concatenate refuses mixed lane/sublane offsets)."""
                for p in range(P):
                    stg[0, :, p, :] = extract(p)
                if ucin is None:
                    for p in range(P):
                        stg[1, :, p, :] = extract_prev(p)
                news = []
                for p0 in range(0, P, PC):
                    pc = min(PC, P - p0)
                    ub = stg[0, :, p0:p0 + pc, :]
                    if ucin is not None:
                        u2b = ucin[:, rb + p0:rb + p0 + pc, :]
                    else:
                        u2b = stg[1, :, p0:p0 + pc, :]
                    ub_new, vh0, gh_new = ode_p(
                        ub, u2b, vin[:, p0:p0 + pc], gin[:, p0:p0 + pc],
                        sa_all[:, p0:p0 + pc], co_all[p0:p0 + pc])
                    vout[:, p0:p0 + pc] = vh0
                    gout[:, p0:p0 + pc] = gh_new
                    if ucout is not None:
                        ucout[:, wb + p0:wb + p0 + pc, :] = ub_new
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

            def zplane_stage(outr, obase, read_prev, vin, gin, vout, gout,
                             sfslot, ucin=None, rb=0, ucout=None, wb=0):
                """z-normal plane ODE: static lane extraction, P-batched.
                CARRY: u2b comes from the carry ring view ucin at block
                base rb (already in plane layout), and the post-ODE
                sheet is stashed to ucout at block base wb."""
                if "ode" in ABLATE or "odez" in ABLATE:
                    return
                sa_all = zsf[sfslot]
                ob = pl.ds(obase, TX)
                zpad = (jnp.zeros((TX, Nyw - Nyp), dtype)
                        if Nyw > Nyp else None)

                def zext(p, prev=False):
                    sheet = (read_prev(slice(0, TX), slice(None),
                                       zp_lanes[p]) if prev
                             else outr[ob, :, zp_lanes[p]])
                    if zpad is not None:
                        sheet = jnp.concatenate([sheet, zpad], axis=1)
                    return sheet

                def zins(p, val):
                    outr[ob, :, zp_lanes[p]] = (val[:, :Nyp]
                                                if zpad is not None
                                                else val)

                _batched_plane_stage(
                    PZ, zp_lanes, zext, lambda p: zext(p, prev=True),
                    zins, sa_all, zco[:, :, 0:1], vin, gin, vout, gout,
                    ucin, rb, ucout, wb, zst)

            def yplane_stage(outr, obase, read_prev, vin, gin, vout, gout,
                             sfslot, ucin=None, rb=0, ucout=None, wb=0):
                """y-normal plane ODE: static sublane extraction,
                P-batched."""
                if "ode" in ABLATE or "odey" in ABLATE:
                    return
                sa_all = ysf[sfslot]
                ob = pl.ds(obase, TX)
                ysl = slice(YZ0, YZ0 + WY)   # static z-window lanes

                def yext(p):
                    return outr[ob, yp_subl[p], ysl]        # (TX, WY)

                def yins(p, val):
                    outr[ob, yp_subl[p], ysl] = val

                _batched_plane_stage(
                    PY, yp_subl, yext,
                    lambda p: read_prev(slice(0, TX), yp_subl[p], ysl),
                    yins, sa_all, yco[:, :, 0:1], vin, gin, vout, gout,
                    ucin, rb, ucout, wb, yst)

            NCHX = -(-Nyp // CY)
            # static execution order of the x passes: stage s of plane p
            # runs at visit t1(p) + s - 1 (stages ascend within a visit);
            # the cross-pass cout handoff below needs this order
            if PX:
                xpass_order = sorted(
                    [(p, s) for p in range(PX) for s in range(1, TB + 1)],
                    key=lambda ps: ((xp_rows[ps[0]] - 1) // TX + ps[1] - 1,
                                    ps[1], ps[0]))
                xpass_first = xpass_order[0]
            else:
                xpass_first = None

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

            def xplane_pass(outr, obase, r, p, read_prev_row, first,
                            has_prev=False):
                """x-normal full-row plane ODE for plane p: (CY, MZ, Nzp)
                y-chunks round-trip HBM per stage.  The final flushes are
                NOT drained here: the next pass (static order) waits them
                before reusing the slots and the kernel-end drain catches
                the last pass - the drain leaves the critical path."""
                if "ode" in ABLATE or "odex" in ABLATE:
                    return
                nch = NCHX
                if has_prev:
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
                    ub = outr[pl.ds(obase + r, 1), yc:yc + cy, :][0]
                    u2b = read_prev_row(slice(yc, yc + cy))
                    ub_new, vh0, gh_new = ode(
                        ub, u2b, xv[sl, 0:cy], xg[sl, 0:cy],
                        xsb[sl, 0:cy, :], xco[p], xbet[p])
                    outr[pl.ds(obase + r, 1), yc:yc + cy, :] = ub_new[None]
                    xv[sl, 0:cy] = vh0
                    xg[sl, 0:cy] = gh_new
                    for cp in x_cout(p, c, sl):
                        cp.start()

            # ------------------------------------------------- visit loop
            def run_stage(s, t):
                """Stage s (1-based) at visit t: advance tile tau = t-s+1
                of field F[s+1] (s == TB writes the staging buffer)."""
                tau = t - (s - 1)
                final = s == TB
                writes_uN = s == TB - 1
                # u1 (C[0]) cycles over 4 tile slots, intermediates over 3
                woff = (jax.lax.rem(jnp.int32(tau), jnp.int32(4)) * TX if s == 1
                        else jax.lax.rem(jnp.int32(tau), jnp.int32(3)) * TX)
                obase = (jax.lax.rem(jnp.int32(tau), jnp.int32(2)) * TX if final
                         else off_of(tau))
                outr = uNb if final else C[s]
                src = C[s - 1]

                if s == 1:
                    wait_in(t)

                    @pl.when(t == 0)
                    def _():
                        u1_wait(0)

                    @pl.when(t + 1 < NXT)
                    def _():
                        u1_wait(t + 1)
                apply_flips(src, woff, tau)

                def rs(xo, ylo, hy):
                    return src[pl.ds(woff + xo, TX), ylo:ylo + hy, :]

                def rdf(z):
                    return src[pl.ds(woff, TX + 2), :, z]

                def rd(dx, y, z):
                    return src[pl.ds(woff + 1 + dx, TX), y, z]

                def rd_row(i, ysl):
                    return src[pl.ds(woff + i, 1), ysl, :][0]

                if s == 1:
                    pb = jax.lax.rem(jnp.int32(tau), jnp.int32(2)) * TX

                    def rp(rsl, ysl, zsl):
                        if isinstance(rsl, slice):
                            return u0b[pl.ds(pb + rsl.start,
                                             rsl.stop - rsl.start),
                                       ysl, zsl]
                        return u0b[pl.ds(pb + rsl, 1), ysl, zsl][0]
                else:
                    prev = C[s - 2]
                    pboff = (1 + jax.lax.rem(jnp.int32(tau), jnp.int32(4)) * TX
                             if s == 2 else off_of(tau))

                    def rp(rsl, ysl, zsl):
                        if isinstance(rsl, slice):
                            return prev[pl.ds(pboff + rsl.start,
                                              rsl.stop - rsl.start),
                                        ysl, zsl]
                        return prev[pl.ds(pboff + rsl, 1), ysl, zsl][0]

                # deep-ring flush waits before the rows are rewritten
                if writes_uN:
                    @pl.when(tau >= 3)
                    def _():
                        outN_copy(tau - 3).wait()

                    # the carry flush of tile tau-2 must land before this
                    # stage rewrites the slot's first stage block
                    if CARRY:
                        @pl.when(tau >= 2)
                        def _():
                            if PZ:
                                zu_out(tau - 2).wait()
                            if PY:
                                yu_out(tau - 2).wait()
                if final:
                    @pl.when(tau >= 2)
                    def _():
                        outF_copy(tau - 2).wait()
                        if PZ:
                            for c in z_out(tau - 2):
                                c.wait()
                        if PY:
                            for c in y_out(tau - 2):
                                c.wait()

                def w(yc, hy, v):
                    outr[pl.ds(obase, TX), yc:yc + hy, :] = v

                def ra(yc, hy):
                    return adjb[pl.ds(
                        jax.lax.rem(jnp.int32(tau), jnp.int32(RD)) * TX, TX),
                        yc:yc + hy, :]

                def rp_chunk(yc, hy):
                    return rp(slice(0, TX), slice(yc, yc + hy), slice(None))

                stencil_into(w, rs, ra, rp_chunk)
                if NOFULL:
                    adj_fixup(outr, obase, rdf, rd, rp, tau % RD)
                    for p in range(AX):
                        xr = xa_rows[p]
                        t1 = (xr - 1) // TX
                        r = xr - t1 * TX - 1

                        @pl.when(tau == t1)
                        def _(p=p, r=r):
                            adj_fixup_xrow(
                                outr, obase, r, p,
                                lambda dx, ysl, r=r: rd_row(1 + r + dx, ysl),
                                lambda ysl, r=r: rp(r, ysl, slice(None)))
                apply_abc(outr, obase, tau, rp)

                def uc_args(P_, ui, uc, uo):
                    """Carry ring views for stage s: stages 1/2 read the
                    HBM-in ring (blocks written by stages TB-1/TB one
                    sweep earlier), stages >= 3 the within-sweep VMEM
                    ring; stages <= TB-2 stash to the VMEM ring, stages
                    TB-1/TB to the HBM-out ring."""
                    if not CARRY:
                        return dict()
                    ucin = ui.at[jax.lax.rem(jnp.int32(tau),
                                             jnp.int32(3))] if s <= 2 \
                        else uc.at[jax.lax.rem(jnp.int32(tau),
                                               jnp.int32(3))]
                    rb = (s - 1) * P_ if s <= 2 else (s - 3) * P_
                    ucout = uc.at[jax.lax.rem(jnp.int32(tau),
                                              jnp.int32(3))] \
                        if s <= TB - 2 else \
                        uo.at[jax.lax.rem(jnp.int32(tau), jnp.int32(2))]
                    wb = (s - 1) * P_ if s <= TB - 2 else \
                        (s - (TB - 1)) * P_
                    return dict(ucin=ucin, rb=rb, ucout=ucout, wb=wb)

                if PZ:
                    zplane_stage(outr, obase, rp,
                                 zv[s - 1].at[tau % 2], zg[s - 1].at[tau % 2],
                                 zv[s].at[tau % 2], zg[s].at[tau % 2],
                                 tau % RD, **uc_args(PZ, zui, zuc, zuo))
                if PY:
                    yplane_stage(outr, obase, rp,
                                 yv[s - 1].at[tau % 2], yg[s - 1].at[tau % 2],
                                 yv[s].at[tau % 2], yg[s].at[tau % 2],
                                 tau % RD, **uc_args(PY, yui, yuc, yuo))
                if PX:
                    for p in range(PX):
                        xl = xp_rows[p]
                        t1 = (xl - 1) // TX
                        r = xl - t1 * TX - 1

                        @pl.when(tau == t1)
                        def _(p=p, r=r):
                            xplane_pass(
                                outr, obase, r, p,
                                lambda ysl, r=r: rp(r, ysl, slice(None)),
                                s == 1, has_prev=(p, s) != xpass_first)
                if Nin:
                    inject(outr, obase, tau, s - 1)
                if do_taps and 1 <= s <= TB - 2:
                    take_taps(outr, obase, tau, s)
                if not final:
                    margins(outr, tau)
                if writes_uN:
                    outN_copy(tau).start()
                if final:
                    outF_copy(tau).start()
                    if PZ:
                        for c in z_out(tau):
                            c.start()
                        if CARRY:
                            zu_out(tau).start()
                    if PY:
                        for c in y_out(tau):
                            c.start()
                        if CARRY:
                            yu_out(tau).start()

            def loop(t, _):
                @pl.when(t + 1 < NXT)
                def _():
                    start_in(t + 1)

                @pl.when(t + 2 < NXT)
                def _():
                    u1_issue(t + 2)

                for s in range(1, TB + 1):
                    # stage s is live while 0 <= t-s+1 < NXT
                    @pl.when((t >= s - 1) & (t - s + 1 < NXT))
                    def _(s=s):
                        run_stage(s, t)

            jax.lax.fori_loop(0, NV, loop, None, unroll=False)

            if PX and "ode" not in ABLATE and "odex" not in ABLATE:
                # the LAST x pass left its final state flushes pending
                pl_, _s = xpass_order[-1]
                for c in range(max(0, NCHX - 2), NCHX):
                    for cp in x_cout(pl_, c, c % 2):
                        cp.wait()

            # drain: waits not yet issued in-loop
            for dt in range(max(0, NXT - 3), NXT):
                outN_copy(dt).wait()
            for dt in range(max(0, NXT - 2), NXT):
                outF_copy(dt).wait()
                if PZ:
                    for c in z_out(dt):
                        c.wait()
                    if CARRY:
                        zu_out(dt).wait()
                if PY:
                    for c in y_out(dt):
                        c.wait()
                    if CARRY:
                        yu_out(dt).wait()
            for c in pre:
                c.wait()

        plane = (Nyp, Nzp)
        scratch = dict(
            C=(pltpu.VMEM((RC1,) + plane, dtype),)
            + tuple(pltpu.VMEM((RC,) + plane, dtype)
                    for _ in range(TB - 1)),
            u0b=pltpu.VMEM((2 * TX,) + plane, dtype),
            uNb=pltpu.VMEM((2 * TX,) + plane, dtype),
            adjb=pltpu.VMEM((1, 1) if NOFULL else ((RD * TX,) + plane),
                            adt),
            sem_u1=pltpu.SemaphoreType.DMA((4,)),
            sem_u1m=pltpu.SemaphoreType.DMA((2,)),
            sem_u0=pltpu.SemaphoreType.DMA((2,)),
            sem_adj=pltpu.SemaphoreType.DMA((RD,)),
            sem_oN=pltpu.SemaphoreType.DMA((3,)),
            sem_oF=pltpu.SemaphoreType.DMA((2,)),
            sem_pre=pltpu.SemaphoreType.DMA((5,)),
        )
        Wy = -(-Nyp // 128) * 128
        AZ8, AY8 = -(-AZ // 8) * 8, -(-AY // 8) * 8
        scratch["zadr"] = pltpu.VMEM((RD, TX, AZ8, Wy) if AZ else (1, 1),
                                     jnp.int32)
        scratch["yadr"] = pltpu.VMEM((RD, TX, AY8, Nzp) if AY else (1, 1),
                                     jnp.int32)
        scratch["xadb"] = pltpu.VMEM((Nyp, Nzp) if AX else (1, 1), jnp.int32)
        scratch["sem_az"] = pltpu.SemaphoreType.DMA((RD,) if AZ else (1,))
        scratch["sem_ay"] = pltpu.SemaphoreType.DMA((RD,) if AY else (1,))
        scratch["sem_ax"] = pltpu.SemaphoreType.DMA((1,))
        if PZ:
            zs = (2, TX, PZ, MZ, Nyw)
            scratch.update(
                zv=tuple(pltpu.VMEM(zs, dtype) for _ in range(TB + 1)),
                zg=tuple(pltpu.VMEM(zs, dtype) for _ in range(TB + 1)),
                zsf=pltpu.VMEM((RD, TX, PZ8, Nyw), dtype),
                zst=pltpu.VMEM((2, TX, PZ8, Nyw), dtype),
                sem_zin=pltpu.SemaphoreType.DMA((2, 3)),
                sem_zout=pltpu.SemaphoreType.DMA((2, 2)),
                sem_zsf=pltpu.SemaphoreType.DMA((RD,)))
        else:
            scratch["zv"] = tuple(pltpu.VMEM((1, 1), dtype)
                                  for _ in range(TB + 1))
            scratch["zg"] = tuple(pltpu.VMEM((1, 1), dtype)
                                  for _ in range(TB + 1))
            scratch["zsf"] = pltpu.VMEM((1, 1), dtype)
            scratch["zst"] = pltpu.VMEM((1, 1), dtype)
            scratch["sem_zin"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_zout"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_zsf"] = pltpu.SemaphoreType.DMA((1,))
        if PY:
            ys_ = (2, TX, PY, MZ, WY)
            scratch.update(
                yv=tuple(pltpu.VMEM(ys_, dtype) for _ in range(TB + 1)),
                yg=tuple(pltpu.VMEM(ys_, dtype) for _ in range(TB + 1)),
                ysf=pltpu.VMEM((RD, TX, PY8, WY), dtype),
                yst=pltpu.VMEM((2, TX, PY8, WY), dtype),
                sem_yin=pltpu.SemaphoreType.DMA((2, 3)),
                sem_yout=pltpu.SemaphoreType.DMA((2, 2)),
                sem_ysf=pltpu.SemaphoreType.DMA((RD,)))
        else:
            scratch["yv"] = tuple(pltpu.VMEM((1, 1), dtype)
                                  for _ in range(TB + 1))
            scratch["yg"] = tuple(pltpu.VMEM((1, 1), dtype)
                                  for _ in range(TB + 1))
            scratch["ysf"] = pltpu.VMEM((1, 1), dtype)
            scratch["yst"] = pltpu.VMEM((1, 1), dtype)
            scratch["sem_yin"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_yout"] = pltpu.SemaphoreType.DMA((1,))
            scratch["sem_ysf"] = pltpu.SemaphoreType.DMA((1,))
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
        if PZ and CARRY:
            scratch["zui"] = pltpu.VMEM((3, TX, S2PZ, Nyw), dtype)
            scratch["zuo"] = pltpu.VMEM((2, TX, S2PZ, Nyw), dtype)
            scratch["zuc"] = pltpu.VMEM((3, TX, NIZ, Nyw) if NIZ
                                        else (1, 1), dtype)
        else:
            for k in ("zui", "zuo", "zuc"):
                scratch[k] = pltpu.VMEM((1, 1), dtype)
        if PY and CARRY:
            scratch["yui"] = pltpu.VMEM((3, TX, S2PY, WY), dtype)
            scratch["yuo"] = pltpu.VMEM((2, TX, S2PY, WY), dtype)
            scratch["yuc"] = pltpu.VMEM((3, TX, NIY, WY) if NIY
                                        else (1, 1), dtype)
        else:
            for k in ("yui", "yuo", "yuc"):
                scratch[k] = pltpu.VMEM((1, 1), dtype)
        scratch["sem_zu"] = pltpu.SemaphoreType.DMA(
            (2,) if (PZ and CARRY) else (1,))
        scratch["sem_yu"] = pltpu.SemaphoreType.DMA(
            (2,) if (PY and CARRY) else (1,))

        pl.run_scoped(body, **scratch)

    gshape = jax.ShapeDtypeStruct((Nxp, Nyp, Nzp), dtype)

    def fused(u1, u0, adj, sigTB, states, pconsts):
        """states: {fam: (vh, gh)}; pconsts: {fam: (ssaf, coefs)}; adj:
        the packed adjacency grid, or (adj-planes mode) the {"z"/"y"/"x":
        int32 plane-adjacency} dict.  Returns (uN1, uN, taps, new_states)."""
        ins = [sigTB]
        n_smem = 1
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
        al = {n_smem: 0, n_smem + 1: 1}
        n_fixed_out = 2
        if do_taps:
            outs.append(jax.ShapeDtypeStruct((NTAP, Nout), dtype))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            n_fixed_out = 3
        idx, oidx = len(ins), n_fixed_out
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
        taps = res[2] if do_taps else jnp.zeros((NTAP, max(Nout, 1)), dtype)
        if not do_taps and Nout:
            taps = jnp.zeros((NTAP, Nout), dtype)
        new_states = {}
        i = n_fixed_out
        for fam, fc in fams:
            n = 3 if fc else 2
            new_states[fam] = tuple(res[i:i + n])
            i += n
        return res[0], res[1], taps, new_states

    return fused


def pick_tile_tb(Nyp, Nzp, TB, adj_bytes=2, dtype_bytes=4,
                 budget_bytes=96 * 1024 * 1024, state_bytes=0,
                 min_tx=3) -> int | None:
    """Largest TX whose TB-stage scratch fits the VMEM budget, or None.

    state_bytes: per-TX-row bytes of fused plane-state scratch (use
    BoundaryPlanes.state_bytes_per_row(tb=...)).  TX capped at 8 (see
    pick_tile_pair: TX=12/16 trigger pathological Mosaic compiles)."""
    plane = Nyp * Nzp
    for TX in (8, 6, 4, 3):
        if TX < min_tx:
            break
        need = plane * (
            (4 * TX + 2) * dtype_bytes          # u1 circular buffer
            + (TB - 1) * (3 * TX + 2) * dtype_bytes   # intermediates
            + 2 * TX * dtype_bytes              # u0 blocks
            + (TB + 1) * TX * adj_bytes         # adj slots
            + 2 * TX * dtype_bytes)             # final staging
        need += TX * state_bytes
        if need <= budget_bytes:
            return TX
    return None
