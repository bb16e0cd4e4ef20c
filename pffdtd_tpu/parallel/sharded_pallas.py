"""Multi-chip engine running the fused Pallas kernels inside shard_map.

The fast path for pod-scale grids: the global interior rows [1, Nx-1) are
split into D equal x-slabs; each shard holds a local slab with one ghost row
per side and runs the SAME fused stencil kernel as the single-device engine
(pallas_stencil.build_fused_stencil_sharded), with per-shard SMEM scalars
carrying the global-x offset and grid-edge flags.  Per step, one u1 plane
per direction is `ppermute`'d over ICI into the neighbours' ghost rows —
the direct analogue of the reference's per-step `cudaMemcpyPeerAsync` halo
exchange (gpu_engine.h:1086-1126), with all boundary work shard-local
exactly as in its `split_data` (gpu_engine.h:516-662).

The frequency-dependent boundary update runs the windowed Pallas kernel on
each shard's local window space; per-shard tile tables are padded to the
fleet maximum with inert tiles (window 0, first=1: the copy-back of an
untouched window is a no-op).  Receiver taps are psum'd across shards.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pffdtd_tpu.engine.jax_engine import EngineData
from pffdtd_tpu.engine.pallas_boundary import (WR, build_boundary_hybrid,
                                               choose_hybrid_split,
                                               partition_boundary_hybrid)
from pffdtd_tpu.engine.pallas_stencil import (build_fused_stencil_sharded,
                                              pick_tile_x)
from pffdtd_tpu.io.h5 import SimFolder
from pffdtd_tpu.parallel.sharded_engine import make_mesh

# taps beyond this fall back to flat-index gather/scatter (huge-Nout path)
MAX_TAPS = 256


def _loc3(loc, row, Nzp):
    """(D, N) local flat indices -> (D, N, 3) local (x, y, z) int32."""
    loc = np.asarray(loc, np.int64)
    return np.stack([loc // row, (loc // Nzp) % (row // Nzp), loc % Nzp],
                    axis=-1).astype(np.int32)


def _read_taps(u, xyz, mask):
    """Per-tap dynamic-slice readout: u (X, Y, Z), xyz (N, 3), mask (N,)."""
    vals = [jax.lax.dynamic_slice(u, (xyz[r, 0], xyz[r, 1], xyz[r, 2]),
                                  (1, 1, 1))[0, 0, 0]
            for r in range(xyz.shape[0])]
    return jnp.stack(vals) * mask


class ShardedPallasEngine:
    """x-slab sharded engine running the fused Pallas kernels per shard."""

    def __init__(self, folder=None, *, consts=None, vox=None, comms=None,
                 mats=None, mesh: Mesh | None = None, dtype=np.float32,
                 interpret: bool = False, tile_x: int | None = None):
        if folder is not None:
            sf = SimFolder(folder)
            consts, vox, comms, mats = sf.consts, sf.vox, sf.comms, sf.mats
        from pffdtd_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = int(self.mesh.devices.size)
        self.interpret = interpret

        # single-device prep gives the padded global layout + adjacency grid
        self.data = EngineData(consts, vox, comms, mats, dtype=dtype,
                               pad_z=128, boundary_kernel=False)
        d = self.data
        g = d.grid
        D = self.D
        if (g.Nx - 2) % D:
            raise ValueError(f"interior rows {g.Nx - 2} not divisible by "
                             f"{D} shards; pad the grid")
        S = (g.Nx - 2) // D
        self.S = S
        TX = tile_x or pick_tile_x(g.Nyp, g.Nzp)
        while TX > S:
            TX //= 2
        assert TX >= 1
        NXT = -(-S // TX)
        Nxp_loc = NXT * TX + 2
        # local flat size must divide into boundary-kernel windows
        wsize = WR * 128
        while (Nxp_loc * g.Nyp * g.Nzp) % wsize:
            Nxp_loc += 1
        self.Nxp_loc = Nxp_loc
        self.TX = TX
        self.Nt = d.Nt

        row = g.Nyp * g.Nzp

        # ---- per-shard adjacency slabs (local rows 1..S = global x0..)
        adt = d.adj_grid.dtype
        full_mask = adt.type((1 << d.NN) - 1)
        adj_loc = np.full((D, Nxp_loc, g.Nyp, g.Nzp), full_mask, adt)
        for k in range(D):
            x0 = 1 + k * S
            adj_loc[k, 1:S + 1] = d.adj_grid[x0:x0 + S]
        self._adj_loc = adj_loc.reshape(D * Nxp_loc, g.Nyp, g.Nzp)

        # ---- per-shard lossy boundary hybrids on the LOCAL flat layout
        # (dense subwindows for clustered nodes + one-hot tiles for sparse
        # strays); all shards run both kernels with fleet-max static shapes
        gx = d.bnl_ixyz // row
        rem = d.bnl_ixyz - gx * row
        shard = np.clip((gx - 1) // S, 0, D - 1)
        flat_loc = int(Nxp_loc * g.Nyp * g.Nzp)

        def _loc(k):
            own = shard == k
            loc = ((gx[own] - (1 + k * S)) + 1) * row + rem[own]
            order = np.argsort(loc)
            return (loc[order], d.ssaf_bnl[own][order],
                    d.mat_bnl[own][order])

        locs = [_loc(k) for k in range(D)]
        # one (min_fill, T, WR) for the whole fleet, chosen on the union of
        # the shards' node sets (kernel shapes must match across shards)
        mf, t_wr = choose_hybrid_split([loc for loc, _, _ in locs], flat_loc)

        def _part(k, pad_sub=None, pad_tiles=None):
            loc, sa, mt = locs[k]
            return partition_boundary_hybrid(
                loc, sa, mt, d.mc, flat_loc, dtype=d.dtype, min_fill=mf,
                pad_sub=pad_sub, pad_tiles=pad_tiles, force_both=True,
                t_wr=t_wr)

        sizes = [_part(k) for k in range(D)]
        ns_max = max(bh.dense.n_sub for bh in sizes)
        nt_max = max(bh.tiles.n_tiles for bh in sizes)
        self._bhs = [_part(k, pad_sub=ns_max, pad_tiles=nt_max)
                     for k in range(D)]

        # ---- per-shard io lists (local flat indices + masks)
        def io_lists(ixyz):
            gxi = ixyz // row
            remi = ixyz - gxi * row
            sh = np.clip((gxi - 1) // S, 0, D - 1)
            loc = np.zeros((D, ixyz.size), np.int64)
            mask = np.zeros((D, ixyz.size), d.dtype)
            for k in range(D):
                own = sh == k
                loc[k, own] = ((gxi[own] - (1 + k * S)) + 1) * row + remi[own]
                mask[k, own] = 1.0
            return loc, mask

        self._in_loc, self._in_mask = io_lists(d.in_ixyz)
        self._out_loc, self._out_mask = io_lists(d.out_ixyz)
        # 3-coordinate forms of the tap lists: flat-index gather/scatter on
        # a grid-sized operand makes XLA insert full-grid layout copies per
        # step (measured 19 vs 103 GVPS on the raw pair scan); per-tap
        # dynamic_slice reads / .at[x,y,z].add writes are ~free (the same
        # trade build_step makes, jax_engine.py:374-406)
        self._in_xyz = _loc3(self._in_loc, row, g.Nzp)
        self._out_xyz = _loc3(self._out_loc, row, g.Nzp)

        self._build()

    # ------------------------------------------------------------------ build
    def _build(self):
        d = self.data
        g = d.grid
        D, S, TX = self.D, self.S, self.TX
        Nxp_loc = self.Nxp_loc
        dtype = d.dtype
        jdt = jnp.float32 if dtype == np.float32 else jnp.float64
        row = g.Nyp * g.Nzp
        flat_loc = Nxp_loc * row

        fused, _ = build_fused_stencil_sharded(
            g, S, d.sc, d.fcc, dtype=jdt, TX=TX, interpret=self.interpret,
            nxp_loc=Nxp_loc)
        # all shards share static shapes (fleet-max padded), so shard 0's
        # update fn serves every shard; real per-shard data flows through
        # nd.  ring=False: the deep-DMA-ring kernel bakes per-scene window
        # schedules (n_seq/n_warm) into the program, which breaks fleet
        # lockstep - shards keep the auto-pipelined tiled kernel
        boundary, _ = build_boundary_hybrid(
            self._bhs[0], d.sc, flat_loc, dtype=jdt,
            interpret=self.interpret, ring=False)
        nds = [build_boundary_hybrid(bh, d.sc, flat_loc, dtype=jdt,
                                     interpret=self.interpret,
                                     ring=False)[1]
               for bh in self._bhs]
        self._bnode = jax.tree.map(lambda *a: np.stack(a), *nds)

        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]
        mesh = self.mesh
        taps_ok = (self._out_xyz.shape[1] <= MAX_TAPS
                   and self._in_xyz.shape[1] <= MAX_TAPS)

        def shard_fn(u0, u1, vh, gh, u2a, u2b, sigs_T, C):
            ax = jax.lax.axis_index("x")
            scal = jnp.stack([1 + ax * S, (ax == 0).astype(jnp.int32),
                              (ax == D - 1).astype(jnp.int32)]).astype(
                                  jnp.int32)

            def step(carry, sig_n):
                u0, u1, vh1, gh1, u2b_old, u2b_cur = carry
                # halo exchange: one plane each way over ICI
                if D > 1:
                    from_left = jax.lax.ppermute(u1[S:S + 1], "x", fwd)
                    from_right = jax.lax.ppermute(u1[1:2], "x", bwd)
                    u1 = u1.at[0:1].set(from_left)
                    u1 = u1.at[S + 1:S + 2].set(from_right)
                unew = fused(u1, u0, C["adj"], scal)
                unew_f, u2b_new, vh0, gh_new = boundary(
                    unew.reshape(-1), u2b_old, vh1, gh1, C["bnode"])
                unew = unew_f.reshape(Nxp_loc, g.Nyp, g.Nzp)
                if taps_ok:
                    # per-tap slices/adds: flat-index gather/scatter on the
                    # grid would insert full-grid layout copies per step
                    for i in range(C["in_xyz"].shape[0]):
                        p = C["in_xyz"][i]
                        unew = unew.at[p[0], p[1], p[2]].add(
                            sig_n[i].astype(dtype) * C["in_mask"][i])
                    out_n = jax.lax.psum(
                        _read_taps(u1, C["out_xyz"], C["out_mask"]), "x")
                else:
                    unew = unew.reshape(-1).at[C["in_loc"]].add(
                        sig_n.astype(dtype) * C["in_mask"]).reshape(
                            Nxp_loc, g.Nyp, g.Nzp)
                    out_n = jax.lax.psum(
                        u1.reshape(-1)[C["out_loc"]] * C["out_mask"], "x")
                return (u1, unew, vh0, gh_new, u2b_cur, u2b_new), out_n

            # two steps per scan iteration: a single-step body rotates
            # (u0, u1) -> (u1, unew) and while-loop carry slots must reuse
            # their buffers, which costs a full-slab copy per step; a pair
            # returns each field to its own slot (see jax_engine.run_scan)
            n = sigs_T.shape[0]
            if n % 2:
                carry, ys = jax.lax.scan(
                    step, (u0, u1, vh, gh, u2a, u2b), sigs_T)
                return carry, ys

            def step2(c, x2):
                c, y0 = step(c, x2[0])
                c, y1 = step(c, x2[1])
                return c, jnp.stack((y0, y1))

            pairs = sigs_T.reshape(n // 2, 2, *sigs_T.shape[1:])
            carry, ys = jax.lax.scan(step2, (u0, u1, vh, gh, u2a, u2b), pairs)
            return carry, ys.reshape(n, *ys.shape[2:])

        specs = {
            "adj": P("x"),
            "bnode": jax.tree.map(lambda _: P("x"), self._bnode),
            "in_loc": P("x"), "in_mask": P("x"),
            "out_loc": P("x"), "out_mask": P("x"),
            "in_xyz": P("x"), "out_xyz": P("x"),
        }
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("x"),) * 6 + (P(), specs),
            out_specs=((P("x"),) * 6, P()),
            check_vma=False)
        self._run = jax.jit(fn, donate_argnums=(0, 1, 2, 3, 4, 5))

        # constants go device-resident ONCE, sharded to match their specs:
        # numpy C entries would re-upload per run() call (the adjacency
        # grid alone is hundreds of MB - measured 4x whole-run slowdowns
        # over the axon tunnel)
        def flatten_lead(a):
            a = np.asarray(a)
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

        C = {
            "adj": self._adj_loc,
            "bnode": jax.tree.map(flatten_lead, self._bnode),
            "in_loc": self._in_loc.reshape(-1),
            "in_mask": self._in_mask.reshape(-1),
            "out_loc": self._out_loc.reshape(-1),
            "out_mask": self._out_mask.reshape(-1),
            "in_xyz": flatten_lead(self._in_xyz),
            "out_xyz": flatten_lead(self._out_xyz),
        }
        self._C = jax.tree.map(
            lambda a, s: jax.device_put(jnp.asarray(a),
                                        NamedSharding(mesh, s)),
            C, specs)

    # -------------------------------------------------------------------- run
    def run(self, nt: int | None = None, verbose: bool = True):
        import time

        d = self.data
        g = d.grid
        D, S = self.D, self.S
        nt = self.Nt if nt is None else nt
        sigs = (d.in_sigs[:, :nt] / d.infac).T.astype(d.dtype)

        sh = NamedSharding(self.mesh, P("x"))
        shape = (D * self.Nxp_loc, g.Nyp, g.Nzp)
        u0 = jax.device_put(jnp.zeros(shape, d.dtype), sh)
        u1 = jax.device_put(jnp.zeros(shape, d.dtype), sh)
        vhs, u2s = self._bhs[0].state_shapes()

        def zeros_sharded(s):
            return jax.device_put(
                jnp.zeros((D * s[0],) + tuple(s[1:]), d.dtype), sh)

        vh = {k: zeros_sharded(s) for k, s in vhs.items()}
        gh = {k: zeros_sharded(s) for k, s in vhs.items()}
        u2a = {k: zeros_sharded(s) for k, s in u2s.items()}
        u2b = {k: zeros_sharded(s) for k, s in u2s.items()}

        t0 = time.perf_counter()
        carry, ys = self._run(u0, u1, vh, gh, u2a, u2b, jnp.asarray(sigs),
                              self._C)
        ys = np.asarray(jax.block_until_ready(ys))
        t1 = time.perf_counter()

        self.u_out = np.float64(ys.T) * d.infac
        npts = g.Nx * g.Ny * g.Nz
        self.elapsed = t1 - t0
        self.mvps = npts * nt / self.elapsed / 1e6
        if verbose:
            print(f"--ENGINE(sharded-pallas x{self.D}): {nt} steps, "
                  f"{npts / 1e6:.2f} Mvox, {self.elapsed:.3f}s "
                  f"-> {self.mvps:.1f} MVPS")
        return self.u_out


class ShardedPairEngine:
    """x-slab sharded engine running the temporally-blocked PAIR kernel.

    Each shard's local slab carries TWO ghost rows per side; per pair call
    two u1 planes ppermute each way over ICI and the shard OVERLAP-COMPUTES
    the intermediate step u2 on its edge rows (local rows 1 and S+2 — the
    same values its neighbour computes for itself), so the second leapfrog
    step of the pair needs no mid-pair exchange at all.  Halo traffic per
    TWO steps equals the single-step engine's per ONE step — temporal
    blocking halves both HBM and ICI bytes.

    Requirements (else use ShardedPallasEngine): (Nx-2) % D == 0 and
    <= 64 sources.  x-normal planes are supported via RUNTIME plane rows
    (one fleet-max set per shard, SMEM-indexed so the SPMD program stays
    shard-uniform) unless a plane lands on a duplicated overlap row.

    ARBITRARY geometry (off-plane stray lossy nodes) runs the pair
    kernel's in-kernel packed stray pass per shard: chunks are
    partitioned on each shard's LOCAL rows with fleet-uniform static
    shapes (one TS/RW/YW/ZW choice, chunk arrays padded to the fleet
    max).  Strays on duplicated overlap rows (global m*S and m*S+1,
    computed by two shards) go to BOTH shards so the shared edge u2
    stays consistent; the duplicate's stage-2 state advance reads the
    garbage edge u3, so after every pair call the owner's state slots
    ppermute over the duplicate's (compact per-node gather -> ICI ->
    scatter).  The reference handles the same rows with per-step peer
    copies in its slab split (gpu_engine.h:516-662).
    Reference anchor: the multi-GPU pair of kernels + per-step peer halo
    copies this replaces: gpu_engine.h:964-1126.
    """

    def __init__(self, folder=None, *, consts=None, vox=None, comms=None,
                 mats=None, mesh: Mesh | None = None, dtype=np.float32,
                 interpret: bool = False, tile_x: int | None = None):
        from pffdtd_tpu.engine.pallas_pair import (build_fused_pair,
                                                   pick_tile_pair)
        from pffdtd_tpu.engine.jax_engine import GridSpec

        if folder is not None:
            sf = SimFolder(folder)
            consts, vox, comms, mats = sf.consts, sf.vox, sf.comms, sf.mats
        from pffdtd_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = int(self.mesh.devices.size)
        self.interpret = interpret

        self.data = EngineData(consts, vox, comms, mats, dtype=dtype,
                               pad_z=128)
        if len(self.data.in_ixyz) > 64:
            # each source unrolls a masked in-kernel injection per stage:
            # large lists explode compile time (JaxEngine's auto path
            # enforces the same limit before choosing the pair backend)
            raise ValueError(
                f"{len(self.data.in_ixyz)} sources exceed the pair "
                "kernel's supported 64; use ShardedPallasEngine")
        import os as _os

        d = self.data
        g = d.grid
        D = self.D
        if (g.Nx - 2) % D:
            raise ValueError(f"interior rows {g.Nx - 2} not divisible by "
                             f"{D} shards; pad the grid")
        n_stray = d.attach_planes()
        use_strays = (n_stray > 0
                      and _os.environ.get("PFFDTD_STRAYS", "1") != "0")
        if use_strays and d.planes.x is not None \
                and _os.environ.get("PFFDTD_DEMOTE_X", "1") != "0":
            # dense x rows ride the segmented stray pipeline far cheaper
            # than the inline-wait x-plane pass when the scene already
            # pays for the stray pass (jax_engine auto-path ditto)
            n_stray = d.attach_planes(demote_x=True)
        if n_stray and not use_strays:
            raise ValueError("stray lossy nodes with PFFDTD_STRAYS=0: "
                             "pair kernel needs full axis-plane coverage")
        planes = d.planes
        S = (g.Nx - 2) // D
        self.S = S
        adjb = 2 if d.NN == 12 else 1
        # thread the plane-state VMEM into the tile pick like the
        # single-device auto path does (the sharded kernel carries the
        # same in-kernel state rings; carry is disabled when sharded)
        sb = (planes.state_bytes_per_row(tb=2)
              if planes is not None else 0)
        TX = tile_x or pick_tile_pair(g.Nyp, g.Nzp, adj_bytes=adjb,
                                      state_bytes=sb)
        while TX > S + 2:
            TX = max(1, TX // 2)
        NXT = -(-(S + 2) // TX)
        Nxp_loc = NXT * TX + 2
        self.Nxp_loc = Nxp_loc
        self.TX = TX
        self.Nt = d.Nt
        self.g_loc = GridSpec(Nx=S + 4, Ny=g.Ny, Nz=g.Nz, Nzp=g.Nzp,
                              fcc_flag=g.fcc_flag, Nxp=Nxp_loc, Nyp=g.Nyp)

        x0 = np.array([k * S - 1 for k in range(D)], np.int64)
        self._x0 = x0
        self._scal = np.stack([
            x0.astype(np.int32),
            (np.arange(D) == 0).astype(np.int32),
            (np.arange(D) == D - 1).astype(np.int32)], axis=1)  # (D, 3)

        # per-shard local slabs of the adjacency grid (ghost rows carry the
        # NEIGHBOUR's adjacency: the overlap-computed edge u2 must be the
        # same value the neighbour computes for itself)
        adt = d.adj_grid.dtype
        full_mask = adt.type((1 << d.NN) - 1)
        adj_loc = np.full((D, Nxp_loc, g.Nyp, g.Nzp), full_mask, adt)
        for k in range(D):
            for i in range(Nxp_loc):
                gi = i + x0[k]
                if 0 <= gi < g.Nxp:
                    adj_loc[k, i] = d.adj_grid[gi]
        self._adj_loc = adj_loc.reshape(D * Nxp_loc, g.Nyp, g.Nzp)

        # per-shard plane arrays: rows sliced to the local layout (rows
        # outside the global grid keep ssaf = 0 -> exact identity)
        self._fams = []
        self._pconsts = {}
        self._state_shapes = {}
        self._xpr = None
        self._xdup = None
        planes_build = planes
        if planes is not None:
            for fam, pp in (("z", planes.z), ("y", planes.y)):
                if pp is None:
                    continue
                sa_g = np.asarray(pp.ssaf)             # (Nxp, P, W)
                sa_l = np.zeros((D, Nxp_loc) + sa_g.shape[1:], sa_g.dtype)
                for k in range(D):
                    for i in range(Nxp_loc):
                        gi = i + x0[k]
                        if 0 <= gi < sa_g.shape[0]:
                            sa_l[k, i] = sa_g[gi]
                self._pconsts[f"{fam}ssaf"] = sa_l.reshape(
                    (D * Nxp_loc,) + sa_g.shape[1:]).astype(d.dtype)
                self._pconsts[f"{fam}coefs"] = np.asarray(
                    pp.coefs, d.dtype)
                # state_shape(Nxp) returns (Nxp, P, MZ, W); swap the row
                # dim for the sharded local layout
                self._state_shapes[fam] = (
                    (D * Nxp_loc,) + tuple(pp.state_shape(1)[1:]))
                self._fams.append(fam)
            if planes.x is not None:
                # x-planes: one fleet-max-padded set per shard, rows from
                # an SMEM array at runtime (inactive = row 1, ssaf 0)
                xp = planes.x
                xp_arr = np.asarray(xp.xp, np.int64)
                own = np.clip((xp_arr - 1) // S, 0, D - 1)
                # planes on DUPLICATED overlap rows (global rows m*S and
                # m*S + 1 are computed by two shards): give BOTH shards
                # the plane.  Stage 1 advances both copies identically
                # (the overlap-computed edge u2 and the ghost u0 are the
                # owner's own values), but the duplicate's stage-2 pass
                # reads the garbage edge u3, so after every pair call the
                # owner's state rows ppermute OVER the duplicate's before
                # anything re-reads them (gpu_engine.h:516-662 splits the
                # same rows across GPUs with per-step peer copies)
                dups = []   # (plane, duplicate shard, owner direction)
                if D > 1:
                    for p, xr in enumerate(xp_arr):
                        m = int(xr) // S
                        if xr % S == 0 and 1 <= m <= D - 1:
                            dups.append((p, m, "l"))      # owner m-1
                        m2 = (int(xr) - 1) // S
                        if (xr - 1) % S == 0 and 1 <= m2 <= D - 1:
                            dups.append((p, m2 - 1, "r"))  # owner m2
                counts = np.bincount(own, minlength=D)
                for p, k, _ in dups:
                    counts[k] += 1
                PXm = max(1, int(counts.max()))
                # inactive planes (ssaf = 0, exact identity) point at
                # local row 2: the edge rows 1 / S+2 carry garbage u3 by
                # design and 0 * garbage would poison the state
                xpr = np.full((D, PXm), 2, np.int32)
                sa_l = np.zeros((D, PXm) + xp.ssaf.shape[1:], d.dtype)
                co_l = np.zeros((D, PXm) + xp.coefs.shape[1:], d.dtype)
                slots = [0] * D
                slot_of = {}
                for p, xr in enumerate(xp_arr):
                    k = int(own[p])
                    s = slots[k]
                    slots[k] += 1
                    slot_of[p] = s
                    xpr[k, s] = int(xr) - int(x0[k])   # local row
                    sa_l[k, s] = xp.ssaf[p]
                    co_l[k, s] = xp.coefs[p]
                xdup_l = np.full((D, PXm), -1, np.int32)
                xdup_r = np.full((D, PXm), -1, np.int32)
                for p, k, dr in dups:
                    s = slots[k]
                    slots[k] += 1
                    xpr[k, s] = int(xp_arr[p]) - int(x0[k])
                    sa_l[k, s] = xp.ssaf[p]
                    co_l[k, s] = xp.coefs[p]
                    (xdup_l if dr == "l" else xdup_r)[k, s] = slot_of[p]
                self._xdup = (xdup_l, xdup_r) if dups else None
                self._xpr = xpr
                self._pconsts["xssaf"] = sa_l.reshape((D * PXm,)
                                                      + xp.ssaf.shape[1:])
                self._pconsts["xcoefs"] = co_l.reshape((D * PXm,)
                                                       + xp.coefs.shape[1:])
                self._state_shapes["x"] = (
                    (D * PXm,) + tuple(xp.state_shape(1)[1:]))
                self._fams.append("x")
                from pffdtd_tpu.engine.pallas_boundary import (
                    BoundaryPlanes, BoundaryXPlanes)

                xp_fleet = BoundaryXPlanes(
                    P=PXm, xp=np.ones(PXm, np.int32),
                    ssaf=np.zeros((PXm,) + xp.ssaf.shape[1:], d.dtype),
                    coefs=np.zeros((PXm,) + xp.coefs.shape[1:], d.dtype),
                    CY=xp.CY)
                planes_build = BoundaryPlanes(z=planes.z, y=planes.y,
                                              x=xp_fleet, n_stray=0)

        # ---- stray nodes: per-shard partitions with fleet-uniform shapes
        row = g.Nyp * g.Nzp
        self._strays_build = None
        self._sgraft = None
        if n_stray:
            from pffdtd_tpu.engine.pallas_boundary import (
                pad_strays, partition_boundary_strays)

            NXT = -(-(S + 2) // TX)      # == build_fused_pair's local NXT
            si = planes.stray_idx
            six = np.asarray(d.bnl_ixyz)[si]
            ssa = np.asarray(d.ssaf_bnl)[si]
            smt = np.asarray(d.mat_bnl)[si]
            gxs = six // row
            rems = six - gxs * row

            def _nodes_for(k):
                # shard k's stray set = strays on its computed local rows
                # 1..S+2 (global x0[k]+1 .. x0[k]+S+2): real rows PLUS
                # both duplicated overlap-edge rows
                m = (gxs >= x0[k] + 1) & (gxs <= x0[k] + S + 2)
                return np.where(m)[0]

            members = [_nodes_for(k) for k in range(D)]
            kbig = int(np.argmax([m.size for m in members]))

            def _part(k, **pin):
                idx = members[k]
                loc = (gxs[idx] - x0[k]) * row + rems[idx]
                # rw=1: single-row windows.  The stage-2 edge u3 rows
                # (local 1 / S+2) are garbage by design; an RW=TX window
                # would mix them into REAL nodes' one-hot gathers (exact
                # 0 * stale-finite on hardware, but 0 * NaN = NaN under
                # interpret's NaN fill), and confining each window to one
                # row keeps every real node's math bit-identical to D=1
                return partition_boundary_strays(
                    loc, ssa[idx], smt[idx], d.mc,
                    (Nxp_loc, g.Nyp, g.Nzp), TX, NXT, dtype=d.dtype,
                    rw=1, **pin)

            tmpl = _part(kbig)           # fleet (TS, YW, ZW) choice
            pin = dict(ts=tmpl.TS, yw=tmpl.YW, zw=tmpl.ZW)
            parts = [tmpl if k == kbig else _part(k, **pin)
                     for k in range(D)]
            NCH = max(p.n_chunks for p in parts)
            MAXC = max(p.maxc for p in parts)
            parts = [pad_strays(p, NCH, MAXC) for p in parts]
            self._strays_build = parts[kbig]
            # flattened leading dims: shard_map slices dim 0 by D, so each
            # shard sees exactly the single-device shapes fused() expects
            self._pconsts["s_nd"] = np.concatenate([p.nd for p in parts])
            self._pconsts["s_soff"] = np.concatenate(
                [p.soff for p in parts])
            self._pconsts["s_sr0"] = np.concatenate([p.sr0 for p in parts])
            self._pconsts["s_sy0"] = np.concatenate([p.sy0 for p in parts])
            self._pconsts["s_sz0"] = np.concatenate([p.sz0 for p in parts])
            self._s_tab = tmpl.tableT.astype(d.dtype)   # global (one mat set)
            self._state_shapes["s"] = (
                (D * (NCH + tmpl.SEG),) + tuple(tmpl.state_shape()[1:]))

            # ---- overlap-row duplicate state grafts (fleet-max padded
            # slot lists; padding points at the never-read pad chunk NCH)
            TS = tmpl.TS
            PAD_SLOT = NCH * TS
            slot_of = [dict(zip(members[k],
                                np.asarray(parts[k].node_slot)))
                       for k in range(D)]

            def _slots(crit_gx):
                """(D, NG) send/recv slot arrays for one dup criterion:
                crit_gx(k) -> the global x whose nodes shard k holds."""
                lists = []
                for k in range(D):
                    cg = crit_gx(k)
                    ids = (np.sort(np.where(gxs == cg)[0])
                           if cg is not None else np.zeros(0, np.int64))
                    lists.append([int(slot_of[k][i]) for i in ids])
                ng = max((len(li) for li in lists), default=0)
                if ng == 0:
                    return None
                out = np.full((D, ng), PAD_SLOT, np.int64)
                for k, li in enumerate(lists):
                    out[k, :len(li)] = li
                return out

            # left-edge dups on shard k (global kS, k>=1) receive from
            # the owner k-1 (its real row S+1) over fwd; right-edge dups
            # (global (k+1)S+1, k<=D-2) receive from owner k+1 over bwd.
            # Sender and receiver lists sort by global node id, so slot
            # j on both sides names the SAME node.
            snd_r = _slots(lambda k: (k + 1) * S if k < D - 1 else None)
            rcv_l = _slots(lambda k: k * S if k > 0 else None)
            snd_l = _slots(lambda k: k * S + 1 if k > 0 else None)
            rcv_r = _slots(lambda k: (k + 1) * S + 1 if k < D - 1 else None)
            if D > 1 and (snd_r is not None or snd_l is not None):
                self._sgraft = {}
                if snd_r is not None:
                    assert rcv_l is not None and rcv_l.shape == snd_r.shape
                    self._sgraft["fwd"] = (snd_r, rcv_l)
                if snd_l is not None:
                    assert rcv_r is not None and rcv_r.shape == snd_l.shape
                    self._sgraft["bwd"] = (snd_l, rcv_r)

        # sources: per-shard LOCAL coordinates (the tile-range check in the
        # kernel implements ownership, including the duplicated edge rows)
        ii = np.asarray(d.in_ixyz)
        gx = ii // row
        gy = (ii // g.Nzp) % g.Nyp
        gz = ii % g.Nzp
        Nin = max(1, ii.size)
        ipts = np.full((D, 3, Nin), -(10 ** 6), np.int32)
        for k in range(D):
            ipts[k, 0, :ii.size] = gx - x0[k]
            ipts[k, 1, :ii.size] = gy
            ipts[k, 2, :ii.size] = gz
        self._ipts = ipts

        # receivers: unique owner by REAL rows (local 2..S+1)
        oo = np.asarray(d.out_ixyz)
        ogx = oo // row
        orem = oo - ogx * row
        own = np.clip((ogx - 1) // S, 0, D - 1)
        out_loc = np.zeros((D, oo.size), np.int64)
        out_mask = np.zeros((D, oo.size), d.dtype)
        for k in range(D):
            m = own == k
            out_loc[k, m] = (ogx[m] - x0[k]) * row + orem[m]
            out_mask[k, m] = 1.0
        self._out_loc, self._out_mask = out_loc, out_mask
        self._out_xyz = _loc3(out_loc, row, g.Nzp)

        # in_pts only sets the static source COUNT here (coordinates are
        # read from the per-shard SMEM array at runtime in sharded mode)
        self._fusedp = build_fused_pair(
            self.g_loc, d.sc, d.fcc, dtype=jnp.float32 if d.dtype ==
            np.float32 else jnp.float64, TX=TX, interpret=interpret,
            in_pts=np.stack([gx, gy, gz], 1), planes=planes_build,
            strays=self._strays_build, shard=(S, g.Nx))
        self._build()

    def _build(self):
        d = self.data
        g = d.grid
        D, S = self.D, self.S
        Nxp_loc = self.Nxp_loc
        dtype = d.dtype
        fams = self._fams
        fusedp = self._fusedp
        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]
        mesh = self.mesh

        has_strays = self._strays_build is not None
        sgraft = self._sgraft
        s_TS = self._strays_build.TS if has_strays else 0

        def _slot_gather(arr, slots):
            """arr (C, M, T), slots (NG,) flat chunk*TS+lane -> (NG, M)."""
            return arr[slots // s_TS, :, slots % s_TS]

        def _slot_scatter(arr, slots, vals):
            return arr.at[slots // s_TS, :, slots % s_TS].set(vals)

        def shard_fn(u0, u1, vh, gh, out_prev, sigs_T, C):
            scal = C["scal"][0]
            ipts = C["ipts"][0]
            xpr = C["xpr"][0] if "xpr" in C else None
            pconsts = {f: (C[f"{f}ssaf"], C[f"{f}coefs"]) for f in fams}
            if has_strays:
                pconsts["s"] = (C["s_nd"], C["s_tab"], C["s_soff"],
                                C["s_sr0"], C["s_sy0"], C["s_sz0"])
            zy = [f for f in fams if f != "x"]

            def step(carry, sig2):
                u0, u1, vh1, gh1, out_prev = carry
                if D > 1:
                    # two planes per side per PAIR: ghosts [0:2] from the
                    # left edge rows [S:S+2], [S+2:S+4] from the right [2:4]
                    from_left = jax.lax.ppermute(u1[S:S + 2], "x", fwd)
                    from_right = jax.lax.ppermute(u1[2:4], "x", bwd)
                    u1 = u1.at[0:2].set(from_left)
                    u1 = u1.at[S + 2:S + 4].set(from_right)
                states = {f: (vh1[f], gh1[f]) for f in fams}
                if has_strays:
                    states["s"] = (vh1["s"], gh1["s"])
                u3, u2, ns = fusedp(u1, u0, C["adj"], sig2, states,
                                    pconsts, scal=scal, ipts=ipts,
                                    xpr=xpr)
                if D > 1 and (zy or self._xdup is not None):
                    # stage 2 updates the duplicated edge-row plane states
                    # from the (by design) stale u2 ghost: overwrite each
                    # ghost state row with the neighbour's REAL row (edge
                    # shards receive zeros - their ghost rows are global
                    # halos with ssaf = 0, identity ODE)
                    ns = dict(ns)
                    for f in zy:
                        vhf, ghf = ns[f]
                        vl = jax.lax.ppermute(vhf[S + 1:S + 2], "x", fwd)
                        gl = jax.lax.ppermute(ghf[S + 1:S + 2], "x", fwd)
                        vr = jax.lax.ppermute(vhf[2:3], "x", bwd)
                        gr = jax.lax.ppermute(ghf[2:3], "x", bwd)
                        vhf = vhf.at[1:2].set(vl).at[S + 2:S + 3].set(vr)
                        ghf = ghf.at[1:2].set(gl).at[S + 2:S + 3].set(gr)
                        ns[f] = (vhf, ghf)
                    if self._xdup is not None:
                        # duplicated-overlap-row x planes: the OWNER's
                        # state rows (plane-major) replace the duplicate's
                        # (whose stage-2 advance read the garbage edge u3)
                        vhx, ghx = ns["x"]

                        def graft(arr, perm, sel):
                            nb = jax.lax.ppermute(arr, "x", perm)
                            take = jnp.take(nb, jnp.maximum(sel, 0),
                                            axis=0)
                            m = (sel >= 0)[:, None, None, None]
                            return jnp.where(m, take, arr)

                        if bool((self._xdup[0] >= 0).any()):
                            sel = C["xdup_l"][0]
                            vhx = graft(vhx, fwd, sel)
                            ghx = graft(ghx, fwd, sel)
                        if bool((self._xdup[1] >= 0).any()):
                            sel = C["xdup_r"][0]
                            vhx = graft(vhx, bwd, sel)
                            ghx = graft(ghx, bwd, sel)
                        ns["x"] = (vhx, ghx)
                if sgraft is not None:
                    # duplicated overlap-row STRAY nodes: the owner's
                    # post-pair state slots replace the duplicate's
                    # (whose stage-2 advance read the garbage edge u3).
                    # Compact per-node traffic: gather the owner's slots,
                    # ppermute the (NG, MZS) sheet, scatter into the
                    # duplicate's slots (padding slots point at the
                    # never-read pad chunk, so no masking is needed)
                    ns = dict(ns)
                    svh, sgh = ns["s"]
                    for key, perm in (("fwd", fwd), ("bwd", bwd)):
                        if key not in sgraft:
                            continue
                        snd = C[f"sg_snd_{key}"][0]
                        rcv = C[f"sg_rcv_{key}"][0]
                        for a_i, arr in enumerate((svh, sgh)):
                            vals = jax.lax.ppermute(
                                _slot_gather(arr, snd), "x", perm)
                            arr = _slot_scatter(arr, rcv, vals)
                            if a_i == 0:
                                svh = arr
                            else:
                                sgh = arr
                    ns["s"] = (svh, sgh)
                if self._out_xyz.shape[1] <= MAX_TAPS:
                    # flat-index gather on the grid-sized u2/u3 inserts
                    # full-grid layout copies per step (19 vs 103 GVPS on
                    # the raw pair scan); per-tap dynamic slices are ~free
                    out_b = jax.lax.psum(
                        _read_taps(u2, C["out_xyz"][0], C["out_mask"][0]),
                        "x")
                    out_c = jax.lax.psum(
                        _read_taps(u3, C["out_xyz"][0], C["out_mask"][0]),
                        "x")
                else:
                    out_b = jax.lax.psum(
                        u2.reshape(-1)[C["out_loc"][0]] * C["out_mask"][0],
                        "x")
                    out_c = jax.lax.psum(
                        u3.reshape(-1)[C["out_loc"][0]] * C["out_mask"][0],
                        "x")
                vh0 = {f: s[0] for f, s in ns.items()}
                gh0 = {f: s[1] for f, s in ns.items()}
                return ((u2, u3, vh0, gh0, out_c),
                        jnp.stack([out_prev, out_b]))

            n = sigs_T.shape[0]
            pairs = sigs_T.reshape(n // 2, 2, -1)
            sf = fams + (["s"] if has_strays else [])
            carry, ys = jax.lax.scan(
                step, (u0, u1, {f: vh[f] for f in sf},
                       {f: gh[f] for f in sf}, out_prev), pairs)
            return carry, ys.reshape(n, -1)

        st_spec = {f: P("x") for f in fams}
        if has_strays:
            st_spec = {**st_spec, "s": P("x")}
        specs = {
            "adj": P("x"), "scal": P("x"), "ipts": P("x"),
            "out_loc": P("x"), "out_mask": P("x"), "out_xyz": P("x"),
        }
        if self._xpr is not None:
            specs["xpr"] = P("x")
        if self._xdup is not None:
            specs["xdup_l"] = P("x")
            specs["xdup_r"] = P("x")
        for f in fams:
            specs[f + "ssaf"] = P("x")
            # x-plane materials differ per shard; z/y coefs are global
            specs[f + "coefs"] = P("x") if f == "x" else P()
        if has_strays:
            for k in ("s_nd", "s_soff", "s_sr0", "s_sy0", "s_sz0"):
                specs[k] = P("x")
            specs["s_tab"] = P()        # one global material table
            for key in sgraft or {}:
                specs[f"sg_snd_{key}"] = P("x")
                specs[f"sg_rcv_{key}"] = P("x")
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("x"), P("x"), st_spec, st_spec, P(), P(), specs),
            out_specs=((P("x"), P("x"), st_spec, st_spec, P()), P()),
            check_vma=False)
        self._run = jax.jit(fn, donate_argnums=(0, 1, 2, 3))

        # constants device-resident ONCE (numpy C entries re-upload per
        # run() call: the adjacency grid alone is hundreds of MB over the
        # axon tunnel - measured ~4x whole-run slowdowns)
        C = {"adj": self._adj_loc, "scal": self._scal, "ipts": self._ipts,
             "out_loc": self._out_loc, "out_mask": self._out_mask,
             "out_xyz": self._out_xyz}
        if self._xpr is not None:
            C["xpr"] = self._xpr
        if self._xdup is not None:
            C["xdup_l"], C["xdup_r"] = self._xdup
        if has_strays:
            C["s_tab"] = self._s_tab
            for key, (snd, rcv) in (sgraft or {}).items():
                C[f"sg_snd_{key}"] = snd
                C[f"sg_rcv_{key}"] = rcv
        C.update(self._pconsts)
        self._C = jax.tree.map(
            lambda a, s: jax.device_put(jnp.asarray(a),
                                        NamedSharding(mesh, s)),
            C, specs)

    def run(self, nt: int | None = None, verbose: bool = True):
        import time

        d = self.data
        g = d.grid
        D = self.D
        nt = self.Nt if nt is None else nt
        # the pair scan advances two steps per iteration: zero-pad an odd
        # request and trim the output back (matches JaxEngine.run)
        nt_run = nt + nt % 2
        sigs = np.zeros((nt_run, d.in_sigs.shape[0]), d.dtype)
        sigs[:nt] = (d.in_sigs[:, :nt] / d.infac).T.astype(d.dtype)

        sh = NamedSharding(self.mesh, P("x"))
        shape = (D * self.Nxp_loc, g.Nyp, g.Nzp)
        u0 = jax.device_put(jnp.zeros(shape, d.dtype), sh)
        u1 = jax.device_put(jnp.zeros(shape, d.dtype), sh)
        vh = {f: jax.device_put(jnp.zeros(s, d.dtype), sh)
              for f, s in self._state_shapes.items()}
        gh = {f: jax.device_put(jnp.zeros(s, d.dtype), sh)
              for f, s in self._state_shapes.items()}
        out0 = jnp.zeros(len(d.out_ixyz), d.dtype)

        t0 = time.perf_counter()
        carry, ys = self._run(u0, u1, vh, gh, out0, jnp.asarray(sigs),
                              self._C)
        ys = np.asarray(jax.block_until_ready(ys))[:nt]
        t1 = time.perf_counter()

        self.u_out = np.float64(ys.T) * d.infac
        npts = g.Nx * g.Ny * g.Nz
        self.elapsed = t1 - t0
        self.mvps = npts * nt / self.elapsed / 1e6
        if verbose:
            print(f"--ENGINE(sharded-pair x{self.D}): {nt} steps, "
                  f"{npts / 1e6:.2f} Mvox, {self.elapsed:.3f}s "
                  f"-> {self.mvps:.1f} MVPS")
        return self.u_out


def make_sharded_engine(folder=None, *, consts=None, vox=None, comms=None,
                        mats=None, mesh: Mesh | None = None,
                        dtype=np.float32, interpret: bool = False,
                        tile_x: int | None = None, verbose: bool = True):
    """Route a scene to the fastest eligible multi-chip engine — the
    multi-chip analogue of JaxEngine's single-chip auto-selection
    (reference anchor: the multi-GPU dispatch, gpu_engine.h:368-412).

    Tries the temporally-blocked ShardedPairEngine (two leapfrog steps
    per HBM sweep, halved halo traffic) and falls back to the windowed
    per-shard ShardedPallasEngine on its eligibility errors (off-plane
    stray geometry, > 64 sources).  Grids whose interior rows do not
    divide into the mesh are auto-padded with decoupled exterior air
    (pad_x_interior: results unchanged — the multi-GPU reference
    instead requires divisible splits)."""
    if folder is not None:
        sf = SimFolder(folder)
        consts, vox, comms, mats = sf.consts, sf.vox, sf.comms, sf.mats
    mesh = mesh if mesh is not None else make_mesh()
    D = int(mesh.devices.size)
    if (vox.Nx - 2) % D:
        from dataclasses import replace as _replace

        from pffdtd_tpu.prep import pad_x_interior
        from pffdtd_tpu.scene_setup import SimData

        sim = pad_x_interior(SimData(consts=consts, vox=vox, comms=comms,
                                     mats=mats), D)
        vox = sim.vox
    kw = dict(consts=consts, vox=vox, comms=comms, mats=mats, mesh=mesh,
              dtype=dtype, interpret=interpret, tile_x=tile_x)
    try:
        return ShardedPairEngine(**kw)
    except ValueError as e:
        if verbose:
            print(f"--SHARDED: pair path ineligible ({e}); "
                  "using the windowed per-shard engine")
        return ShardedPallasEngine(**kw)
