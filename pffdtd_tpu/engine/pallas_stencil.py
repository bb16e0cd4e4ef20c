"""Fused Pallas TPU kernel: halo flips + adjacency-masked stencil + leapfrog.

One HBM pass per timestep over x-row tiles with manual double-buffered DMA:

    read  u1 slab (TX+2 rows), u0 block (TX), adj block (TX)   ~13 B/voxel
    VMEM  apply mirror halo flips to the slab (virtual, slab-local)
          acc_k = bit_k(adj) * roll(slab, -v_k)   (adjacency-masked legs)
          unew  = (2 - sl2*K)*u1 - u0 + a2*acc    (leapfrog, EPS-safe diag)
    write unew block (TX rows)

This replaces the XLA formulation's many unfused full-grid passes with one;
the rigid-boundary update needs NO sparse work at all: adjacency bits make
air and boundary nodes one uniform branch-free expression (contrast
gpu_engine.h:220-348's separate air/boundary kernels).  The bit masking and
rolls are free — the kernel is DMA-bound (measured ~equal to a pure-copy
kernel of the same structure).

The first-order Engquist-Majda ABC is FUSED into the kernel too: each
output block gets thin face/edge slice updates (u <- (u + l*Q*u0)/(1+l*Q))
fed by the pre-update u0 rows already resident in VMEM, so no post-kernel
pass ever has to re-read the grid.

DANGER — the output ALIASES u0 (input_output_aliases={1: 0}): the kernel
DESTROYS u0's buffer as it streams output blocks in.  Nothing downstream may
read u0 after this kernel runs.  The engine's step obeys this by (a) pulling
any u0-derived values (lossy-boundary u^{n-1}) from a packed carry written
two steps earlier, never from the grid, and (b) fusing all u0-consuming work
(ABC) in-kernel.  The few rows the tile loop never computes (global row 0
and the x padding tail) are filled from u0 by two small HBM->HBM DMAs issued
before any output DMA can overwrite them, so the output buffer is always
fully defined.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pffdtd_tpu.voxelizer.vox import CART_VECTORS, FCC_VECTORS


def _roll(x, shift, axis):
    """pltpu.roll with negative shifts (wraps modulo the axis size)."""
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _roll2(x, dy, dz):
    """Shift so result[y,z] = x[y+dy, z+dz] (wrap; wrapped lanes are masked
    out by the interior select)."""
    if dy:
        x = _roll(x, -dy, 1)
    if dz:
        x = _roll(x, -dz, 2)
    return x


def build_fused_stencil(grid, sc, fcc: bool, dtype=jnp.float32, TX: int = 8,
                        interpret: bool = False, zplanes=None):
    """Returns fn(u1, u0, adj[, vh, gh, zssaf, zcoefs]) for (Nxp, Ny, Nzp)
    arrays -> unew (or (unew, vh_new, gh_new) with z-planes).

    grid: GridSpec (true extents Nx/Ny/Nz, padded Nxp=x rows, Nzp=lanes);
    sc: SchemeCoeffs.  Requires Nxp >= NXT*TX + 2 where NXT = ceil((Nx-2)/TX).

    zplanes: optional BoundaryZPlanes — frequency-dependent impedance
    boundaries on z-normal planes are updated IN-KERNEL while the slab is
    resident: the plane's lane column is extracted from the freshly computed
    output block with an iota==z mask, the branch ODE (cpu_engine.h:362-405
    semantics) runs densely over (TX, MMb, Nyp), and the column is written
    back with an exact select.  u^{n-1} at the nodes comes from the resident
    u0 block — no packed carry, and no second HBM pass over the grid.
    States/ssaf stream as one contiguous (TX, P, ...) block per tile.
    """
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz
    Nxp, Nyp, Nzp = grid.shape
    folded = grid.folded
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
    lv_ = npdt(sc.l)
    # ABC weights per Q in {0,1,2,3}: u <- (u + l*Q*u0) / (1 + l*Q)
    abc_w = [np.float64(1.0 / (1.0 + l_ * q)) for q in range(4)]

    P = zplanes.P if zplanes is not None else 0
    zp_lanes = [int(z) for z in zplanes.zp] if P else []
    # z-state arrays carry a 128-aligned lane (y) extent and a 16-padded
    # branch dim (HBM slice tiling); extracted grid columns are (TX, Nyp)
    # and get zero-padded up to match
    Nyw = zplanes.ssaf.shape[2] if P else 0
    MZ = zplanes.MZ if P else 8
    P8 = zplanes.ssaf.shape[1] if P else 0   # 8-padded plane dim

    # tile that contains the high-x halo row (its slab needs the x flip)
    t_hi = (Nx - 2 - 1) // TX           # tile updating global row Nx-2
    j_hi = (Nx - 1) - (t_hi * TX)       # slab-local index of row Nx-1 is
    # slab rows cover global [t*TX, t*TX+TX+1]; local slab idx of gx is gx-t*TX

    def kernel(*refs):
        if P:
            (u1_h, u0_h, adj_h, vh_h, gh_h, zsaf_h, zco,
             out_h, vho_h, gho_h) = refs
        else:
            u1_h, u0_h, adj_h, out_h = refs
            vh_h = gh_h = zsaf_h = zco = vho_h = gho_h = None

        def body(slab, u0b, adjb, outb, zvh, zgh, zsf,
                 sem_in, sem_out, sem_pre, sem_zin, sem_zout):

            def z_in_copies(t, slot):
                rs = t * TX
                return [
                    pltpu.make_async_copy(
                        vh_h.at[pl.ds(rs + 1, TX)], zvh.at[slot],
                        sem_zin.at[slot, 0]),
                    pltpu.make_async_copy(
                        gh_h.at[pl.ds(rs + 1, TX)], zgh.at[slot],
                        sem_zin.at[slot, 1]),
                    pltpu.make_async_copy(
                        zsaf_h.at[pl.ds(rs + 1, TX)], zsf.at[slot],
                        sem_zin.at[slot, 2]),
                ]

            def z_out_copies(t, slot):
                rs = t * TX
                return [
                    pltpu.make_async_copy(
                        zvh.at[slot], vho_h.at[pl.ds(rs + 1, TX)],
                        sem_zout.at[slot, 0]),
                    pltpu.make_async_copy(
                        zgh.at[slot], gho_h.at[pl.ds(rs + 1, TX)],
                        sem_zout.at[slot, 1]),
                ]

            def start_in(t, slot):
                rs = t * TX
                cps = [
                    pltpu.make_async_copy(
                        u1_h.at[pl.ds(rs, TX + 2)], slab.at[slot],
                        sem_in.at[slot, 0]),
                    pltpu.make_async_copy(
                        u0_h.at[pl.ds(rs + 1, TX)], u0b.at[slot],
                        sem_in.at[slot, 1]),
                    pltpu.make_async_copy(
                        adj_h.at[pl.ds(rs + 1, TX)], adjb.at[slot],
                        sem_in.at[slot, 2]),
                ]
                if P:
                    cps += z_in_copies(t, slot)
                for c in cps:
                    c.start()

            def wait_in(t, slot):
                rs = t * TX
                pltpu.make_async_copy(
                    u1_h.at[pl.ds(rs, TX + 2)], slab.at[slot],
                    sem_in.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    u0_h.at[pl.ds(rs + 1, TX)], u0b.at[slot],
                    sem_in.at[slot, 1]).wait()
                pltpu.make_async_copy(
                    adj_h.at[pl.ds(rs + 1, TX)], adjb.at[slot],
                    sem_in.at[slot, 2]).wait()
                if P:
                    for c in z_in_copies(t, slot):
                        c.wait()

            def out_copy(t, slot):
                return pltpu.make_async_copy(
                    outb.at[slot], out_h.at[pl.ds(t * TX + 1, TX)],
                    sem_out.at[slot])

            # rows this kernel never computes (the low halo row and the x
            # padding tail) are filled from u0 via direct HBM->HBM DMAs so
            # the output buffer is fully defined without aliasing u0
            pre0 = pltpu.make_async_copy(
                u0_h.at[pl.ds(0, 1)], out_h.at[pl.ds(0, 1)], sem_pre.at[0])
            pre1 = pltpu.make_async_copy(
                u0_h.at[pl.ds(NXT * TX + 1, Nxp - NXT * TX - 1)],
                out_h.at[pl.ds(NXT * TX + 1, Nxp - NXT * TX - 1)],
                sem_pre.at[1])
            pre0.start()
            pre1.start()

            start_in(0, 0)

            def loop_body(t):
                slot = t % 2

                @pl.when(t + 1 < NXT)
                def _():
                    start_in(t + 1, (t + 1) % 2)

                wait_in(t, slot)

                # ---- halo flips: in-place ref stores on the slab copy
                # (virtual flips; HBM u1 is never modified)
                slab[slot, :, :, 0] = slab[slot, :, :, 2]
                slab[slot, :, :, Nz - 1] = slab[slot, :, :, Nz - 3]
                slab[slot, :, 0, :] = slab[slot, :, 2, :]
                if folded:
                    slab[slot, :, Ny - 1, :] = slab[slot, :, Ny - 2, :]
                else:
                    slab[slot, :, Ny - 1, :] = slab[slot, :, Ny - 3, :]

                # x flips: global row 0 is slab-local row 0 of tile 0; the
                # global high halo row Nx-1 sits at slab row j = Nx-1 - t*TX
                # (mirrored from j-2) whenever it falls inside this slab's
                # update window
                @pl.when(t == 0)
                def _():
                    slab[slot, 0] = slab[slot, 2]

                j = Nx - 1 - t * TX

                @pl.when((j >= 2) & (j <= TX + 1))
                def _():
                    slab[slot, pl.ds(j, 1)] = slab[slot, pl.ds(j - 2, 1)]

                s = slab[slot]          # (TX+2, Nyp, Nzp)

                # ---- masked stencil on the TX update rows (slab rows 1..TX)
                a32 = adjb[slot].astype(jnp.int32)
                u1c = s[1:TX + 1]
                acc = None
                K = None
                for k in range(NN):
                    dx, dy, dz = VV[k]
                    nb = _roll2(s[1 + dx:TX + 1 + dx], dy, dz)
                    bit = ((a32 >> k) & 1).astype(dtype)
                    t_k = bit * nb
                    acc = t_k if acc is None else acc + t_k
                    K = bit if K is None else K + bit

                u0c = u0b[slot]
                unew = (two - sl2 * K) * u1c - u0c + a2 * acc

                # ---- write back (wait for this slot's previous out DMA)
                @pl.when(t >= 2)
                def _():
                    out_copy(t - 2, slot).wait()

                outb[slot] = unew

                # ---- ABC fused as thin slice updates on the output block:
                # disjoint regions (y faces carry the z/x extremeness in Q;
                # z faces carry x; x faces are the pure-Q=1 remainder), all
                # fed by the pre-update u0 already resident in VMEM
                w1 = npdt(abc_w[1])
                w2 = npdt(abc_w[2])
                w3 = npdt(abc_w[3])
                lv = npdt(l_)
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
                    vals = outb[slot, :, yf, :]
                    outb[slot, :, yf, :] = (vals + lv * qf
                                            * u0c[:, yf, :]) * w
                gx2 = (jax.lax.broadcasted_iota(
                    jnp.int32, (TX, yhi - ylo), 0) + t * TX + 1)
                xext2 = ((gx2 == 1) | (gx2 == Nx - 2)).astype(jnp.int32)
                for zf in (1, Nz - 2):
                    q = xext2 + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, w2)
                    vals = outb[slot, :, ylo:yhi, zf]
                    outb[slot, :, ylo:yhi, zf] = (vals + lv * qf
                                                  * u0c[:, ylo:yhi, zf]) * w
                for r in range(TX):
                    gx_r = t * TX + 1 + r

                    @pl.when((gx_r == 1) | (gx_r == Nx - 2))
                    def _(r=r):
                        vals = outb[slot, r, ylo:yhi, 2:Nz - 2]
                        outb[slot, r, ylo:yhi, 2:Nz - 2] = (
                            vals + lv * u0c[r, ylo:yhi, 2:Nz - 2]) * w1

                # ---- z-plane impedance ODE on the freshly computed block:
                # STATIC single-lane slices (zp_lanes are compile-time
                # constants) extract and write back each plane column — a
                # handful of VREG ops per (TX, Nyp) sheet, versus the
                # full-block one-hot mul/reduce/select this replaces (5
                # full-block passes per plane: ~4 ms/step at Musikverein
                # scale).  u^{n-1} comes from the u0 block still resident.
                if P:
                    zv_all = zvh[slot]          # (TX, P, MMb, Nyp)
                    zg_all = zgh[slot]
                    zs_all = zsf[slot]          # (TX, P, Nyp)
                    half = npdt(0.5)
                    for p in range(P):
                        zl = zp_lanes[p]
                        ub = outb[slot, :, :, zl]               # (TX, Nyp)
                        u2b = u0c[:, :, zl]
                        if Nyw > Nyp:
                            zpad = jnp.zeros((TX, Nyw - Nyp), dtype)
                            ub = jnp.concatenate([ub, zpad], axis=1)
                            u2b = jnp.concatenate([u2b, zpad], axis=1)
                        sa = zs_all[:, p]
                        vh = zv_all[:, p]                       # (TX,MZ,Nyw)
                        gh = zg_all[:, p]
                        b = zco[p, 0 * MZ:1 * MZ, 0:1][None]
                        bd = zco[p, 1 * MZ:2 * MZ, 0:1][None]
                        bDh = zco[p, 2 * MZ:3 * MZ, 0:1][None]
                        bFh = zco[p, 3 * MZ:4 * MZ, 0:1][None]
                        beta = zco[p, 4 * MZ:4 * MZ + 1, 0:1]   # (1, 1)
                        lo2Kbg = lo2 * sa * beta
                        ub_new = ub - lv_ * sa * jnp.sum(
                            2.0 * bDh * vh - bFh * gh, axis=1)
                        ub_new = (ub_new + lo2Kbg * u2b) / (1.0 + lo2Kbg)
                        vh0 = (b * (ub_new - u2b)[:, None, :] + bd * vh
                               - 2.0 * bFh * gh)
                        gh_new = gh + half * (vh0 + vh)
                        zvh[slot, :, p] = vh0
                        zgh[slot, :, p] = gh_new
                        outb[slot, :, :, zl] = (ub_new[:, :Nyp]
                                                if Nyw > Nyp else ub_new)
                    for c in z_out_copies(t, slot):
                        c.start()

                # NOTE: halo/pad positions in HBM may hold stale values — the
                # mirror flips rebuild every halo from interior data at the
                # start of each step, so stale halos never feed a live node.
                out_copy(t, slot).start()

            def loop(t, _):
                # a tile's z-state out-DMA must land before its VMEM slot is
                # refilled for tile t+1 (started inside loop_body)
                if P:
                    @pl.when(t >= 1)
                    def _():
                        for c in z_out_copies(t - 1, (t - 1) % 2):
                            c.wait()
                loop_body(t)

            jax.lax.fori_loop(0, NXT, loop, None, unroll=False)
            # drain the last two output DMAs + the halo/pad row fills
            @pl.when(NXT >= 2)
            def _():
                out_copy(NXT - 2, (NXT - 2) % 2).wait()

            out_copy(NXT - 1, (NXT - 1) % 2).wait()
            if P:
                for c in z_out_copies(NXT - 1, (NXT - 1) % 2):
                    c.wait()
            pre0.wait()
            pre1.wait()

        adt = jnp.uint16 if NN == 12 else jnp.uint8
        scratch = dict(
            slab=pltpu.VMEM((2, TX + 2, Nyp, Nzp), dtype),
            u0b=pltpu.VMEM((2, TX, Nyp, Nzp), dtype),
            adjb=pltpu.VMEM((2, TX, Nyp, Nzp), adt),
            outb=pltpu.VMEM((2, TX, Nyp, Nzp), dtype),
            zvh=pltpu.VMEM((2, TX, max(P, 1), max(MZ, 8),
                            max(Nyw, 128)), dtype),
            zgh=pltpu.VMEM((2, TX, max(P, 1), max(MZ, 8),
                            max(Nyw, 128)), dtype),
            zsf=pltpu.VMEM((2, TX, max(P8, 1), max(Nyw, 128)), dtype),
            sem_in=pltpu.SemaphoreType.DMA((2, 3)),
            sem_out=pltpu.SemaphoreType.DMA((2,)),
            sem_pre=pltpu.SemaphoreType.DMA((2,)),
            sem_zin=pltpu.SemaphoreType.DMA((2, 3)),
            sem_zout=pltpu.SemaphoreType.DMA((2, 2)),
        )
        if not P:  # keep the rigid kernel free of unused z scratch
            for k in ("zvh", "zgh", "zsf", "sem_zin", "sem_zout"):
                scratch[k] = pltpu.VMEM((1, 1), dtype) if k.startswith("z") \
                    else pltpu.SemaphoreType.DMA((1,))
        pl.run_scoped(body, **scratch)

    adt = jnp.uint16 if NN == 12 else jnp.uint8

    if P:
        @jax.jit
        def fused(u1, u0, adj, vh, gh, zssaf, zcoefs):
            return pl.pallas_call(
                kernel,
                out_shape=[
                    jax.ShapeDtypeStruct((Nxp, Nyp, Nzp), dtype),
                    jax.ShapeDtypeStruct(vh.shape, dtype),
                    jax.ShapeDtypeStruct(gh.shape, dtype),
                ],
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
                + [pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
                # unew aliases u0; vh/gh update in place
                input_output_aliases={1: 0, 3: 1, 4: 2},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=112 * 1024 * 1024),
                interpret=interpret,
            )(u1, u0, adj, vh, gh, zssaf, zcoefs)

        return fused

    @jax.jit
    def fused(u1, u0, adj):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Nxp, Nyp, Nzp), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            input_output_aliases={1: 0},  # out aliases u0
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(u1, u0, adj)

    return fused


def build_fused_stencil_sharded(grid, S, sc, fcc: bool, dtype=jnp.float32,
                                TX: int = 8, interpret: bool = False,
                                nxp_loc: int | None = None):
    """Shard-local variant of the fused stencil kernel.

    The GLOBAL INTERIOR rows [1, Nx-1) are split evenly into D slabs of
    S rows; a shard's local array holds its S owned rows at local [1, S+1)
    plus one ghost row each side.  Interior-shard ghosts receive the
    neighbours' edge rows (ppermute'd by the caller every step); on the
    first/last shard the ghost slot corresponds to the global halo row
    (0 / Nx-1), whose mirror flip the kernel performs in-slab exactly like
    the single-device kernel.  An SMEM scalar block
    [x0_global_of_local_row_1, flag_lo, flag_hi] localises the ABC's
    global-x coordinates and the edge behaviour, so ONE traced program
    serves every shard inside shard_map.

    Returns fn(u1_loc, u0_loc, adj_loc, scal) -> unew_loc where scal is an
    int32 (3,) array; x0 = 1 + shard*S.
    """
    Nx, Ny, Nz = grid.Nx, grid.Ny, grid.Nz    # GLOBAL extents
    _, Nyp, Nzp = grid.shape
    folded = grid.folded
    VV = (FCC_VECTORS if fcc else CART_VECTORS).astype(np.int64)
    NN = VV.shape[0]

    NXT = -(-S // TX)
    Nxp_loc = nxp_loc or (NXT * TX + 2)
    assert Nxp_loc >= NXT * TX + 2

    npdt = np.float32 if dtype == jnp.float32 else np.float64
    a2 = npdt(sc.a2)
    sl2 = npdt(sc.sl2)
    two = npdt(2.0)
    l_ = sc.l
    abc_w = [np.float64(1.0 / (1.0 + l_ * q)) for q in range(4)]

    def kernel(scal, u1_h, u0_h, adj_h, out_h):
        def body(slab, u0b, adjb, outb, sem_in, sem_out, sem_pre):
            x0 = scal[0]          # global index of local row 1
            flag_lo = scal[1]     # this shard owns the global x-low edge
            flag_hi = scal[2]

            def start_in(t, slot):
                rs = t * TX
                for c in (
                    pltpu.make_async_copy(u1_h.at[pl.ds(rs, TX + 2)],
                                          slab.at[slot], sem_in.at[slot, 0]),
                    pltpu.make_async_copy(u0_h.at[pl.ds(rs + 1, TX)],
                                          u0b.at[slot], sem_in.at[slot, 1]),
                    pltpu.make_async_copy(adj_h.at[pl.ds(rs + 1, TX)],
                                          adjb.at[slot], sem_in.at[slot, 2]),
                ):
                    c.start()

            def wait_in(t, slot):
                rs = t * TX
                pltpu.make_async_copy(u1_h.at[pl.ds(rs, TX + 2)],
                                      slab.at[slot], sem_in.at[slot, 0]).wait()
                pltpu.make_async_copy(u0_h.at[pl.ds(rs + 1, TX)],
                                      u0b.at[slot], sem_in.at[slot, 1]).wait()
                pltpu.make_async_copy(adj_h.at[pl.ds(rs + 1, TX)],
                                      adjb.at[slot], sem_in.at[slot, 2]).wait()

            def out_copy(t, slot):
                return pltpu.make_async_copy(
                    outb.at[slot], out_h.at[pl.ds(t * TX + 1, TX)],
                    sem_out.at[slot])

            # ghost/pad rows of the output buffer come from u0
            pre0 = pltpu.make_async_copy(
                u0_h.at[pl.ds(0, 1)], out_h.at[pl.ds(0, 1)], sem_pre.at[0])
            pre1 = pltpu.make_async_copy(
                u0_h.at[pl.ds(NXT * TX + 1, Nxp_loc - NXT * TX - 1)],
                out_h.at[pl.ds(NXT * TX + 1, Nxp_loc - NXT * TX - 1)],
                sem_pre.at[1])
            pre0.start()
            pre1.start()
            start_in(0, 0)

            def loop(t, _):
                slot = t % 2

                @pl.when(t + 1 < NXT)
                def _():
                    start_in(t + 1, (t + 1) % 2)

                wait_in(t, slot)

                slab[slot, :, :, 0] = slab[slot, :, :, 2]
                slab[slot, :, :, Nz - 1] = slab[slot, :, :, Nz - 3]
                slab[slot, :, 0, :] = slab[slot, :, 2, :]
                if folded:
                    slab[slot, :, Ny - 1, :] = slab[slot, :, Ny - 2, :]
                else:
                    slab[slot, :, Ny - 1, :] = slab[slot, :, Ny - 3, :]

                # x mirror flips only on the shards owning the grid edges
                @pl.when((t == 0) & (flag_lo == 1))
                def _():
                    slab[slot, 0] = slab[slot, 2]

                j = S + 1 - t * TX   # slab-local index of the high ghost row

                @pl.when((flag_hi == 1) & (j >= 2) & (j <= TX + 1))
                def _():
                    slab[slot, pl.ds(j, 1)] = slab[slot, pl.ds(j - 2, 1)]

                s = slab[slot]
                a32 = adjb[slot].astype(jnp.int32)
                u1c = s[1:TX + 1]
                acc = None
                K = None
                for k in range(NN):
                    dx, dy, dz = VV[k]
                    nb = _roll2(s[1 + dx:TX + 1 + dx], dy, dz)
                    bit = ((a32 >> k) & 1).astype(dtype)
                    t_k = bit * nb
                    acc = t_k if acc is None else acc + t_k
                    K = bit if K is None else K + bit

                u0c = u0b[slot]
                unew = (two - sl2 * K) * u1c - u0c + a2 * acc

                @pl.when(t >= 2)
                def _():
                    out_copy(t - 2, slot).wait()

                outb[slot] = unew

                # ---- ABC with GLOBAL x coordinates (x0 runtime offset)
                w1 = npdt(abc_w[1])
                w2 = npdt(abc_w[2])
                w3 = npdt(abc_w[3])
                lv = npdt(l_)
                gz1 = jax.lax.broadcasted_iota(jnp.int32, (TX, Nzp), 1)
                zext = ((gz1 == 1) | (gz1 == Nz - 2)).astype(jnp.int32)
                gx1 = (jax.lax.broadcasted_iota(jnp.int32, (TX, Nzp), 0)
                       + t * TX + x0)
                xext = ((gx1 == 1) | (gx1 == Nx - 2)).astype(jnp.int32)
                ylo = 2
                yhi = Ny - 1 if folded else Ny - 2
                y_faces = (1,) if folded else (1, Ny - 2)
                for yf in y_faces:
                    q = zext + xext + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, jnp.where(q == 2, w2, w3))
                    vals = outb[slot, :, yf, :]
                    outb[slot, :, yf, :] = (vals + lv * qf
                                            * u0c[:, yf, :]) * w
                gx2 = (jax.lax.broadcasted_iota(
                    jnp.int32, (TX, yhi - ylo), 0) + t * TX + x0)
                xext2 = ((gx2 == 1) | (gx2 == Nx - 2)).astype(jnp.int32)
                for zf in (1, Nz - 2):
                    q = xext2 + 1
                    qf = q.astype(dtype)
                    w = jnp.where(q == 1, w1, w2)
                    vals = outb[slot, :, ylo:yhi, zf]
                    outb[slot, :, ylo:yhi, zf] = (vals + lv * qf
                                                  * u0c[:, ylo:yhi, zf]) * w
                for r in range(TX):
                    gx_r = t * TX + r + x0

                    @pl.when((gx_r == 1) | (gx_r == Nx - 2))
                    def _(r=r):
                        vals = outb[slot, r, ylo:yhi, 2:Nz - 2]
                        outb[slot, r, ylo:yhi, 2:Nz - 2] = (
                            vals + lv * u0c[r, ylo:yhi, 2:Nz - 2]) * w1

                out_copy(t, slot).start()

            jax.lax.fori_loop(0, NXT, loop, None, unroll=False)

            @pl.when(NXT >= 2)
            def _():
                out_copy(NXT - 2, (NXT - 2) % 2).wait()

            out_copy(NXT - 1, (NXT - 1) % 2).wait()
            pre0.wait()
            pre1.wait()

        adt = jnp.uint16 if NN == 12 else jnp.uint8
        pl.run_scoped(
            body,
            slab=pltpu.VMEM((2, TX + 2, Nyp, Nzp), dtype),
            u0b=pltpu.VMEM((2, TX, Nyp, Nzp), dtype),
            adjb=pltpu.VMEM((2, TX, Nyp, Nzp), adt),
            outb=pltpu.VMEM((2, TX, Nyp, Nzp), dtype),
            sem_in=pltpu.SemaphoreType.DMA((2, 3)),
            sem_out=pltpu.SemaphoreType.DMA((2,)),
            sem_pre=pltpu.SemaphoreType.DMA((2,)),
        )

    def fused(u1, u0, adj, scal):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Nxp_loc, Nyp, Nzp), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            input_output_aliases={2: 0},  # out aliases u0
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(scal, u1, u0, adj)

    return fused, Nxp_loc


def pick_tile_x(Ny, Nzp, dtype_bytes=4, budget_bytes=44 * 1024 * 1024) -> int:
    """Largest TX in {32,16,8,4} whose double-buffered scratch fits VMEM."""
    plane = Ny * Nzp
    for TX in (32, 16, 8, 4):
        # 2 slots x (u1 slab + u0 + out) f32 + adj int8
        need = 2 * plane * ((TX + 2) * dtype_bytes
                            + TX * (2 * dtype_bytes + 1))
        if need <= budget_bytes:
            return TX
    return 2
