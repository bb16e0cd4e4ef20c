"""The TPU engine: a single jitted leapfrog timestep over HBM-resident grids.

TPU-first design (NOT a port of the reference kernel zoo):

- The air update is a dense, branch-free 7/13-point stencil over the whole
  interior — shifted-slice adds that XLA fuses into one memory-bound loop
  (12 B/voxel fp32, the same traffic as the reference CUDA kernel,
  gpu_engine.h:220-274).
- Rigid boundary nodes are handled by a sparse *correction*: for the Nb
  boundary nodes (<<Npts), delta = sl2*ncut*u1 - a2*sum(cut-leg neighbours)
  turns the full stencil into the adjacency-masked one
  (algebraically identical to cpu_engine.h:234-287).
- Frequency-dependent impedance boundaries run as (Nbl, MMb) vectorised ODE
  branches between a gather and a scatter (cpu_engine.h:362-405 semantics).
- ABCs are dense face/edge/corner slice updates with uniform Q per region —
  no sparse ABC node lists at all (semantics of sim_fdtd.py:807-813).
- The whole run is one `lax.scan`: source samples stream in as scan inputs,
  receiver samples accumulate on-device as scan outputs — zero host syncs
  inside the loop (the reference does a D2H readout every step,
  gpu_engine.h:1058-1075).
- fp32 stability uses the (1+EPS) diagonal shift of fdtd_data.h:186-194
  (configurable; the reference's round-toward-zero intrinsics have no XLA
  equivalent — the EPS eigenvalue margin is the load-bearing safeguard) plus
  the same mid-exponent input scaling (fdtd_data.h:878-925).

Energy accounting (the machine-precision oracle, sim_fdtd.py:587-620) is
available as an on-device variant of the step that materialises the Laplacian
and carries the accumulators through the scan.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from pffdtd_tpu.engine.coeffs import FP32_EPS, MatCoeffs, SchemeCoeffs
from pffdtd_tpu.engine.numpy_ref import abc_q_grid
from pffdtd_tpu.io.h5 import MMb, SimFolder
from pffdtd_tpu.voxelizer.vox import CART_VECTORS, FCC_VECTORS


# --------------------------------------------------------------------- prep
@dataclass
class GridSpec:
    """Static geometry of the (possibly padded) grid."""

    Nx: int      # true x extent
    Ny: int      # true y extent
    Nz: int      # true z extent
    Nzp: int     # padded z extent (lane-aligned on TPU)
    fcc_flag: int
    Nxp: int = 0  # padded x extent (tile-aligned for the Pallas kernel)
    Nyp: int = 0  # padded y extent (sublane-aligned for int8 DMA slices)

    def __post_init__(self):
        if not self.Nxp:
            self.Nxp = self.Nx
        if not self.Nyp:
            self.Nyp = self.Ny

    @property
    def shape(self):
        return (self.Nxp, self.Nyp, self.Nzp)

    @property
    def folded(self):
        return self.fcc_flag == 2


def _remap_indices(ixyz, Ny, Nz, Nyp, Nzp):
    """Linear indices from the file layout (Ny, Nz) to the padded layout."""
    ixyz = np.asarray(ixyz, np.int64)
    iz = ixyz % Nz
    iy = (ixyz // Nz) % Ny
    ix = ixyz // (Ny * Nz)
    return (ix * Nyp + iy) * Nzp + iz


class EngineData:
    """Host-side preparation of all static arrays the step function needs."""

    def __init__(self, consts, vox, comms, mats, dtype=np.float32,
                 pad_z: int | None = 128, fp32_eps: float | None = None,
                 tile_x: int | None = None, pad_y: int | None = 8,
                 boundary_kernel: bool = False):
        self.dtype = np.dtype(dtype)
        if fp32_eps is None:
            fp32_eps = FP32_EPS if self.dtype == np.float32 else 0.0
        self.fcc = consts.fcc_flag > 0
        self.sc = SchemeCoeffs.make(consts.l, consts.l2, self.fcc, eps=fp32_eps)
        self.mc = MatCoeffs.from_mats(mats, consts.Ts)
        self.consts = consts

        Nx, Ny, Nz = vox.Nx, vox.Ny, vox.Nz
        Nzp = Nz
        if pad_z:
            Nzp = int(-(-Nz // pad_z) * pad_z)
        Nyp = Ny
        if pad_y:
            Nyp = int(-(-Ny // pad_y) * pad_y)
        Nxp = Nx
        if tile_x:  # pallas kernel needs NXT*TX + 2 rows available
            NXT = -(-(Nx - 2) // tile_x)
            Nxp = max(Nx, NXT * tile_x + 2)
        if boundary_kernel:
            # the windowed boundary kernel views the flat grid as windows of
            # 128x128 elements: grow Nxp until the flat size divides evenly
            from pffdtd_tpu.engine.pallas_boundary import WR

            wsize = WR * 128
            while (Nxp * Nyp * Nzp) % wsize:
                Nxp += 1
        self.boundary_kernel = boundary_kernel
        self.tile_x = tile_x
        self.grid = GridSpec(Nx=Nx, Ny=Ny, Nz=Nz, Nzp=Nzp,
                             fcc_flag=int(consts.fcc_flag), Nxp=Nxp, Nyp=Nyp)

        VV = (FCC_VECTORS if self.fcc else CART_VECTORS).astype(np.int64)
        self.NN = VV.shape[0]
        strides = VV @ np.array([Nyp * Nzp, Nzp, 1])

        # rigid-boundary correction data: neighbour indices + cut masks
        bn = _remap_indices(vox.bn_ixyz, Ny, Nz, Nyp, Nzp)
        cut = ~vox.adj_bn  # (Nb, NN)
        self.bn_ixyz = bn
        self.bn_nbr = bn[:, None] + strides[None, :]
        self.bn_cut = cut.astype(self.dtype)
        self.bn_ncut = cut.sum(-1).astype(self.dtype)
        self.Nb = int(bn.size)

        # dense bit-packed adjacency grid: the uniform masked stencil makes
        # rigid-boundary handling branch-free and removes all sparse work for
        # it (TPU-first alternative to the reference's separate boundary
        # kernel, gpu_engine.h:288-348); air nodes carry the all-ones mask
        adt = np.uint16 if self.NN == 12 else np.uint8
        full_mask = adt((1 << self.NN) - 1)
        adj_grid = np.full(self.grid.shape, full_mask, adt)
        packed = np.zeros(bn.shape[0], adt)
        for k in range(self.NN):
            packed |= (vox.adj_bn[:, k].astype(adt) << adt(k))
        adj_grid.reshape(-1)[bn] = packed
        self.adj_grid = adj_grid

        # lossy boundary subset
        lossy = vox.mat_bn > -1
        self.Nbl = int(lossy.sum())
        self.bnl_ixyz = _remap_indices(vox.bn_ixyz[lossy], Ny, Nz, Nyp, Nzp)
        saf = vox.saf_bn[lossy]
        ssaf = saf * (0.5 / np.sqrt(2.0)) if self.fcc else saf
        self.ssaf_bnl = ssaf.astype(self.dtype)
        rows = self.mc.gather(vox.mat_bn[lossy])
        self.mat_rows = {k: rows[k].astype(self.dtype)
                         for k in ("b", "bd", "bDh", "bFh", "beta")}
        self.mat_rows_f64 = {k: rows[k] for k in ("D", "E", "F")}
        self.mat_bnl = vox.mat_bn[lossy].astype(np.int32)
        self.Nbl_state = self.Nbl  # rows in the vh/gh state arrays
        self.bhyb = None
        if boundary_kernel and self.Nbl:
            import os as _os

            from pffdtd_tpu.engine.pallas_boundary import \
                partition_boundary_hybrid

            flat = int(np.prod(self.grid.shape))
            mode = _os.environ.get("PFFDTD_BOUNDARY_MODE", "hybrid")
            mf = {"hybrid": None, "dense": 1, "tiled": 10 ** 9}[mode]
            zgrid = (self.grid.shape
                     if mode == "hybrid"
                     and _os.environ.get("PFFDTD_ZPLANES", "1") != "0"
                     else None)
            self.bhyb = partition_boundary_hybrid(
                self.bnl_ixyz, self.ssaf_bnl, self.mat_bnl, self.mc,
                flat, dtype=self.dtype, min_fill=mf, grid_shape=zgrid)
            vhs, u2s = self.bhyb.state_shapes()
            self.Nbl_state = sum(int(np.prod(s)) for s in u2s.values())

        # sources / receivers
        self.in_ixyz = _remap_indices(comms.in_ixyz, Ny, Nz, Nyp, Nzp)
        self.out_ixyz = _remap_indices(comms.out_ixyz, Ny, Nz, Nyp, Nzp)
        self.in_sigs = np.asarray(comms.in_sigs, np.float64)  # (Ns, Nt)
        self.Nt = int(comms.Nt)
        self.out_reorder = comms.out_reorder

        # input scaling to the middle of the floating-point exponent range
        # (fdtd_data.h:878-909); applied for fp32, identity for fp64
        if self.dtype == np.float32:
            max_in = np.abs(self.in_sigs).max()
            pow2 = int(round(0.5 * (np.finfo(np.float32).maxexp
                                    + np.finfo(np.float32).minexp)))
            self.infac = max_in / 2.0 ** pow2 if max_in > 0 else 1.0
        else:
            self.infac = 1.0

    def attach_planes(self, demote_x: bool = False) -> int:
        """Axis-plane partition of the lossy nodes for the temporally-
        blocked pair kernel; returns the stray count (0 = fully fused
        in-kernel, > 0 = the pair kernel cannot run this scene).

        demote_x: leave dense x rows to the stray pass (profitable when
        the scene pays for the stray pipeline anyway; see
        partition_boundary_planes)."""
        from pffdtd_tpu.engine.pallas_boundary import \
            partition_boundary_planes

        if not self.Nbl:
            self.planes = None
            return 0
        g = self.grid
        self.planes = partition_boundary_planes(
            self.bnl_ixyz, self.ssaf_bnl, self.mat_bnl, self.mc,
            g.shape, dtype=self.dtype, true_shape=(g.Nx, g.Ny, g.Nz),
            demote_x=demote_x)
        return self.planes.n_stray

    def attach_strays(self) -> int:
        """Pack the off-plane (stray) lossy nodes for the pair kernel's
        in-kernel windowed ODE pass; with strays attached the pair kernel
        runs arbitrary geometry.  Returns the packed chunk count."""
        from pffdtd_tpu.engine.pallas_boundary import \
            partition_boundary_strays

        self.strays = None
        planes = getattr(self, "planes", None)
        if planes is None or not planes.n_stray:
            return 0
        g = self.grid
        TX = self.tile_x or 8
        si = planes.stray_idx
        self.strays = partition_boundary_strays(
            np.asarray(self.bnl_ixyz)[si], self.ssaf_bnl[si],
            self.mat_bnl[si], self.mc, g.shape, TX,
            -(-(g.Nx - 2) // TX), dtype=self.dtype)
        return self.strays.n_chunks

    def attach_adj_planes(self) -> bool:
        """Axis-plane cover of ALL non-full-adjacency nodes: when one
        exists (box-like scenes) the pair kernel drops the per-leg bit
        unpack AND the adjacency-grid stream entirely (unmasked bulk +
        static-plane masked fix-ups).  Returns True when enabled."""
        import os as _os

        from pffdtd_tpu.engine.pallas_pair import partition_adj_planes

        self.adj_planes = None
        # opt-in (PFFDTD_ADJ_PLANES=1): measured on the v5e, the fix-up
        # passes cost more than the unmasked bulk saves — the pair kernel
        # is not bit-unpack-bound (see CLAUDE.md perf notes); the mode is
        # kept for its HBM savings (no adjacency grid on device) and as
        # the base for future fix-up fusion work
        if _os.environ.get("PFFDTD_ADJ_PLANES", "0") != "1":
            return False
        self.adj_planes = partition_adj_planes(self.adj_grid, self.grid,
                                               self.NN)
        return self.adj_planes is not None

    @classmethod
    def from_folder(cls, folder, **kw) -> "EngineData":
        sf = SimFolder(folder)
        return cls(sf.consts, sf.vox, sf.comms, sf.mats, **kw)


# --------------------------------------------------------------------- step
def _flip_halos(u, g: GridSpec):
    """Mirror the outermost layers (ABC ghost feed) + FCC fold ghost row."""
    Nz = g.Nz
    u = u.at[:, :, 0].set(u[:, :, 2])
    u = u.at[:, :, Nz - 1].set(u[:, :, Nz - 3])
    u = u.at[:, 0, :].set(u[:, 2, :])
    if g.folded:
        u = u.at[:, g.Ny - 1, :].set(u[:, g.Ny - 2, :])
    else:
        u = u.at[:, g.Ny - 1, :].set(u[:, g.Ny - 3, :])
    u = u.at[0, :, :].set(u[2, :, :])
    u = u.at[g.Nx - 1, :, :].set(u[g.Nx - 3, :, :])
    return u


def _neighbor_sum(u, g: GridSpec, VV):
    """Sum of u over all stencil neighbours, on the interior region."""
    Nx, Ny, Nz = g.Nx, g.Ny, g.Nz
    acc = None
    for dx, dy, dz in VV:
        s = u[1 + dx:Nx - 1 + dx, 1 + dy:Ny - 1 + dy, 1 + dz:Nz - 1 + dz]
        acc = s if acc is None else acc + s
    return acc


def _abc_regions(g: GridSpec):
    """Disjoint (slices, Q) regions: 6 face interiors, 12 edges, 8 corners.

    With a folded-FCC grid the high-y layer is the fold ghost, not an ABC.
    """
    Nx, Ny, Nz = g.Nx, g.Ny, g.Nz
    lo = {0: 1, 1: 1, 2: 1}
    hi = {0: Nx - 2, 1: Ny - 2, 2: Nz - 2}
    ext = {0: [1, Nx - 2], 1: ([1] if g.folded else [1, Ny - 2]),
           2: [1, Nz - 2]}
    # "mid" = interior layers that are NOT extreme along that dim; on a folded
    # grid the only y extreme is y=1, so mid-y runs up to the fold ghost
    mid = {0: slice(2, Nx - 2),
           1: slice(2, Ny - 1) if g.folded else slice(2, Ny - 2),
           2: slice(2, Nz - 2)}
    regions = []
    import itertools

    for dims in itertools.chain.from_iterable(
            itertools.combinations((0, 1, 2), r) for r in (1, 2, 3)):
        Q = len(dims)
        choices = [ext[d] if d in dims else [mid[d]] for d in (0, 1, 2)]
        for combo in itertools.product(*choices):
            regions.append((tuple(combo), Q))
    return regions


def build_step(data: EngineData, energy: bool = False,
               rigid: str = "dense", backend: str = "xla",
               interpret: bool = False):
    """Build the jittable (carry, x) -> (carry, y) step function.

    rigid: 'dense' uses the bit-packed adjacency grid (uniform masked
    stencil, no sparse rigid work); 'sparse' uses the dense-stencil +
    per-node correction formulation.
    backend: 'pallas' runs flips+stencil+ABC as one fused Pallas TPU kernel
    (the fast path); 'xla' composes jnp ops (portable; used by the energy
    oracle and CPU tests).
    """
    g = data.grid
    sc = data.sc
    dtype = data.dtype
    VV = (FCC_VECTORS if data.fcc else CART_VECTORS).astype(np.int64)
    interior = (slice(1, g.Nx - 1), slice(1, g.Ny - 1), slice(1, g.Nz - 1))

    a1 = dtype.type(sc.a1)
    a2 = dtype.type(sc.a2)
    sl2 = dtype.type(sc.sl2)
    l2 = dtype.type(sc.l2)
    l = dtype.type(sc.l)
    lo2 = dtype.type(sc.lo2)
    lfac = dtype.type(sc.lfac)
    Kfull = dtype.type(sc.K)

    # large static arrays travel as explicit inputs through the jit/scan (a
    # closure-captured device array would be inlined into the serialized HLO,
    # which breaks down at benchmark scale); build_step returns (step, consts)
    # and step has signature step(carry, sig_n, consts)
    # only what the chosen configuration actually reads goes in (unused
    # entries would still be transferred to the device on every call)
    consts = {
        "in_ixyz": np.asarray(data.in_ixyz),
        "out_ixyz": np.asarray(data.out_ixyz),
    }
    if rigid == "sparse" or energy:
        consts.update({
            "bn": np.asarray(data.bn_ixyz),
            "bn_nbr": np.asarray(data.bn_nbr),
            "bn_cut": np.asarray(data.bn_cut),
            "bn_ncut": np.asarray(data.bn_ncut),
        })
    # per-node ODE rows are read by the XLA path, the energy oracle, and
    # the pallas backend's no-hybrid fallback; the pair/TB kernels fuse all
    # lossy work in-kernel (uploading (Nbl, MMb) rows there would waste
    # ~0.5 GB HBM at benchmark scale)
    if data.Nbl and (energy or backend == "xla"
                     or (backend == "pallas" and data.bhyb is None)):
        consts.update({
            "bnl": np.asarray(data.bnl_ixyz),
            "ssaf": np.asarray(data.ssaf_bnl),
            "mrows": {k: np.asarray(v) for k, v in data.mat_rows.items()},
        })
    abc_regions = _abc_regions(g)

    if energy:
        # raw DEF rows and constants for the energy functionals.  The
        # grid-sized Q/V/absmask arrays MUST travel as jit args: closure-
        # captured device arrays are inlined into the serialized HLO and
        # the remote compiler rejects the request body at bench scale
        # (HTTP 413 — the exact failure BENCH_r04 recorded on the
        # energy_on=True path).
        V_fac = dtype.type(2.0 if data.fcc else 1.0)
        e_h = dtype.type(data.consts.h)
        e_c = dtype.type(data.consts.c)
        e_Ts = dtype.type(data.consts.Ts)
        Qg = abc_q_grid(g.Nx, g.Ny, g.Nz, folded_y=g.folded)
        Qg = np.pad(Qg, ((0, g.Nxp - g.Nx), (0, g.Nyp - g.Ny),
                         (0, g.Nzp - g.Nz)))
        consts.update({
            "e_D": data.mat_rows_f64["D"].astype(dtype),
            "e_E": data.mat_rows_f64["E"].astype(dtype),
            "e_F": data.mat_rows_f64["F"].astype(dtype),
            "e_Q": Qg.astype(dtype),
            "e_V": (2.0 ** -Qg.astype(np.float64)).astype(dtype),
            "e_absmask": (Qg > 0).astype(dtype),
        })

    if rigid == "dense":
        consts["adj_grid"] = data.adj_grid
    two = dtype.type(2.0)

    # XLA's gather/scatter on a grid-sized operand forces full-grid layout
    # copies on TPU (measured: flat-index readout caps the pair kernel at
    # ~19 GVPS vs ~103 with per-tap dynamic slices).  Source/receiver taps
    # are STATIC coordinates, so both fast paths unroll tiny dynamic-slice
    # reads / at[].add writes instead; the flat forms remain for huge tap
    # counts and the portable XLA path.
    MAX_TAPS = 256

    def _pts3(ixyz):
        ii = np.asarray(ixyz)
        return [(int(i // (g.Nyp * g.Nzp)), int((i // g.Nzp) % g.Nyp),
                 int(i % g.Nzp)) for i in ii]

    out_pts = _pts3(data.out_ixyz)
    in_pts3 = _pts3(data.in_ixyz)
    taps_ok = len(out_pts) <= MAX_TAPS and len(in_pts3) <= MAX_TAPS

    def read_taps(u):
        if not taps_ok:
            return u.reshape(-1)[jnp.asarray(np.asarray(data.out_ixyz))]
        return jnp.stack([
            jax.lax.dynamic_slice(u, p, (1, 1, 1))[0, 0, 0]
            for p in out_pts])

    def add_sources(u, sig_n):
        if not taps_ok:
            uf = u.reshape(-1).at[
                jnp.asarray(np.asarray(data.in_ixyz))].add(
                    sig_n.astype(dtype))
            return uf.reshape(g.shape)
        for i, p in enumerate(in_pts3):
            u = u.at[p].add(sig_n[i].astype(dtype))
        return u

    if backend in ("pallas_pair", "pallas_tb"):
        # temporally-blocked fast path: ONE kernel call advances TB steps
        # (u0, u1) -> (u^{n+TB-1}, u^{n+TB}); receiver samples for the
        # final two steps come from the output fields, deeper-blocked
        # intermediates from in-kernel taps; sources inject in-kernel
        from pffdtd_tpu.engine.pallas_pair import build_fused_pair
        from pffdtd_tpu.engine.pallas_tb import build_fused_tb

        assert not energy, "energy accounting uses the xla backend"
        assert rigid == "dense"
        jdt = jnp.float32 if dtype == np.float32 else jnp.float64
        NyNz = g.Nyp * g.Nzp
        ii = np.asarray(data.in_ixyz)
        in_pts = np.stack([ii // NyNz, (ii // g.Nzp) % g.Nyp, ii % g.Nzp], 1)
        oo = np.asarray(data.out_ixyz)
        o_pts = np.stack([oo // NyNz, (oo // g.Nzp) % g.Nyp, oo % g.Nzp], 1)
        planes = getattr(data, "planes", None)
        apl = getattr(data, "adj_planes", None)
        strays = getattr(data, "strays", None)
        TB = getattr(data, "tb", 2)
        if backend == "pallas_tb":
            assert strays is None, "stray fusion is pair-kernel only"
            from pffdtd_tpu.engine.pallas_pair import carry_ok

            ucarry = getattr(data, "u2b_carry", None)
            if ucarry is None:
                ucarry = carry_ok(planes, in_pts)
                data.u2b_carry = ucarry
            fusedp = build_fused_tb(g, sc, data.fcc, dtype=jdt,
                                    TX=data.tile_x or 4, TB=TB,
                                    interpret=interpret, in_pts=in_pts,
                                    out_pts=o_pts, planes=planes,
                                    adj_planes=apl, u2b_carry=ucarry)
        else:
            from pffdtd_tpu.engine.pallas_pair import carry_ok

            ucarry = getattr(data, "u2b_carry", None)
            if ucarry is None:
                ucarry = carry_ok(planes, in_pts)
                data.u2b_carry = ucarry
            fusedp = build_fused_pair(g, sc, data.fcc, dtype=jdt,
                                      TX=data.tile_x or 8,
                                      interpret=interpret,
                                      in_pts=in_pts, planes=planes,
                                      lookahead=getattr(data, "lookahead",
                                                        1),
                                      adj_planes=apl, strays=strays,
                                      u2b_carry=ucarry)
        if apl is not None:
            # the full adjacency grid is never read in this mode: only the
            # small per-plane adjacency arrays go to the device
            consts.pop("adj_grid", None)
            consts["adjpl"] = {
                fam: arr for fam, arr in
                (("z", apl.zadj), ("y", apl.yadj), ("x", apl.xadj))
                if arr is not None}
        fam_list = []
        if planes is not None:
            for fam, pp in (("z", planes.z), ("y", planes.y),
                            ("x", planes.x)):
                if pp is not None:
                    consts[f"{fam}ssaf"] = pp.ssaf.astype(dtype)
                    consts[f"{fam}coefs"] = pp.coefs.astype(dtype)
                    fam_list.append(fam)
        has_strays = strays is not None and int(strays.soff[-1]) > 0
        if has_strays:
            consts["s_nd"] = strays.nd
            consts["s_tab"] = strays.tableT.astype(dtype)
            consts["s_soff"] = strays.soff
            consts["s_sr0"] = strays.sr0
            consts["s_sy0"] = strays.sy0
            consts["s_sz0"] = strays.sz0

        def step_pair(carry, sigG, C):
            # the u^n receiver sample is CARRIED from the previous
            # iteration's final-field gather: reading u1 here would force
            # XLA to copy the whole grid to protect the aliased input
            u0, u1, vh1, gh1, out_prev = carry
            # u2b-carry families thread their plane sheets as a third
            # state leaf (stored in the vh dict under "<fam>c")
            cfams = ({f for f in ("z", "y") if f in fam_list}
                     if getattr(data, "u2b_carry", False) else set())
            states = {f: ((vh1[f], gh1[f], vh1[f + "c"]) if f in cfams
                          else (vh1[f], gh1[f])) for f in fam_list}
            pconsts = {f: (C[f"{f}ssaf"], C[f"{f}coefs"]) for f in fam_list}
            if has_strays:
                states["s"] = (vh1["s"], gh1["s"])
                pconsts["s"] = (C["s_nd"], C["s_tab"], C["s_soff"],
                                C["s_sr0"], C["s_sy0"], C["s_sz0"])
            adj_arg = C["adjpl"] if apl is not None else C["adj_grid"]
            if backend == "pallas_tb":
                uN1, uN, taps, ns = fusedp(u1, u0, adj_arg,
                                           sigG.astype(dtype), states,
                                           pconsts)
                rows = ([out_prev]                       # u^n
                        + [taps[i] for i in range(TB - 2)]  # u^{n+1..TB-2}
                        + [read_taps(uN)])               # u^{n+TB-1}
            else:
                uN1, uN, ns = fusedp(u1, u0, adj_arg,
                                     sigG.astype(dtype), states, pconsts)
                rows = [out_prev, read_taps(uN)]
            out_c = read_taps(uN1)   # u^{n+TB}, next iteration's out_prev
            vh0 = {f: s[0] for f, s in ns.items()}
            gh0 = {f: s[1] for f, s in ns.items()}
            for f, s in ns.items():
                if len(s) == 3:      # u2b-carry sheet rides in the vh dict
                    vh0[f + "c"] = s[2]
            return ((uN, uN1, vh0, gh0, out_c), jnp.stack(rows))

        return step_pair, consts

    if backend == "pallas":
        from pffdtd_tpu.engine.pallas_stencil import build_fused_stencil

        assert not energy, "energy accounting uses the xla backend"
        assert rigid == "dense"
        jdt = jnp.float32 if dtype == np.float32 else jnp.float64
        zpl = data.bhyb.zplanes if data.bhyb is not None else None
        fused = build_fused_stencil(g, sc, data.fcc, dtype=jdt,
                                    TX=data.tile_x or 8, interpret=interpret,
                                    zplanes=zpl)
        if zpl is not None:
            consts["zssaf"] = zpl.ssaf
            consts["zcoefs"] = zpl.coefs

        def _lossy_xla(u2b, unew, vh1, gh1, C):
            unew_f = unew.reshape(-1)
            vh0, gh_new = vh1, gh1
            if data.Nbl:
                bnl, ssaf, mrows = C["bnl"], C["ssaf"], C["mrows"]
                ub = unew_f[bnl]
                lo2Kbg = lo2 * ssaf * mrows["beta"]
                ub = ub - l * ssaf * jnp.sum(
                    2.0 * mrows["bDh"] * vh1 - mrows["bFh"] * gh1, -1)
                ub = (ub + lo2Kbg * u2b) / (1.0 + lo2Kbg)
                unew_f = unew_f.at[bnl].set(ub)
                vh0 = (mrows["b"] * (ub - u2b)[:, None] + mrows["bd"] * vh1
                       - 2.0 * mrows["bFh"] * gh1)
                gh_new = gh1 + 0.5 * (vh0 + vh1)
            return unew_f.reshape(g.shape), vh0, gh_new

        lossy_update = None
        if data.bhyb is not None and (data.bhyb.dense is not None
                                      or data.bhyb.tiles is not None):
            from pffdtd_tpu.engine.pallas_boundary import \
                build_boundary_hybrid

            lossy_update, node_data = build_boundary_hybrid(
                data.bhyb, sc, int(np.prod(g.shape)), dtype=jdt,
                interpret=interpret)
            consts["bnode"] = node_data

        def step_pallas(carry, sig_n, C):
            # carry holds a packed copy of the previous step's boundary-node
            # values (u2bp) so nothing ever re-reads u0 after the stencil
            # kernel destroys its buffer (output aliasing); the ABC face
            # slices are extracted from u0 BEFORE the kernel for the same
            # reason (a post-kernel read would force a full-grid copy)
            u0, u1, vh1, gh1, (u2b_old, u2b_cur) = carry
            u0_bnl = (u0.reshape(-1)[C["bnl"]]
                      if (data.bhyb is None and data.Nbl) else None)
            # flips + masked stencil + leapfrog + ABC (+ the z-plane
            # impedance ODE), one fused HBM pass (u0's buffer is destroyed
            # by output aliasing — nothing reads u0 afterwards: lossy u2b
            # comes from the packed carry; z-planes take u^{n-1} from the
            # resident u0 block inside the kernel)
            if zpl is not None:
                unew, vhz, ghz = fused(u1, u0, C["adj_grid"], vh1["z"],
                                       gh1["z"], C["zssaf"], C["zcoefs"])
            else:
                unew = fused(u1, u0, C["adj_grid"])
            u2b_pair = (u2b_old, u2b_cur)
            if lossy_update is not None:
                # u2b is u^{n-1} at the nodes = the boundary output from TWO
                # steps back (this step computes u^{n+1}): 2-deep pipeline
                unew_f, u2b_new, vh0, gh_new = lossy_update(
                    unew.reshape(-1), u2b_old, vh1, gh1, C["bnode"])
                unew = unew_f.reshape(g.shape)
                u2b_pair = (u2b_cur, u2b_new)
            elif data.bhyb is None:
                unew, vh0, gh_new = _lossy_xla(u0_bnl, unew, vh1, gh1, C)
            else:
                vh0, gh_new = {}, {}
            if zpl is not None:
                vh0 = {**vh0, "z": vhz}
                gh_new = {**gh_new, "z": ghz}
            unew = add_sources(unew, sig_n)
            out_n = read_taps(u1)
            return (u1, unew, vh0, gh_new, u2b_pair), out_n

        return step_pallas, consts

    def _step_core(u0, u1, vh1, gh1, sig_n, C):
        """Shared update; returns (unew, u1f, vh0, gh_new, extras)."""
        u1f = _flip_halos(u1, g)

        if rigid == "dense":
            # uniform adjacency-masked stencil: one branch-free pass handles
            # air AND rigid-boundary nodes (K and the legs come from bits)
            a = C["adj_grid"][interior]
            acc = None
            K = None
            for k, (dx, dy, dz) in enumerate(VV):
                bit = ((a >> k) & 1).astype(dtype)
                s = u1f[1 + dx:g.Nx - 1 + dx, 1 + dy:g.Ny - 1 + dy,
                        1 + dz:g.Nz - 1 + dz]
                t = bit * s
                acc = t if acc is None else acc + t
                K = bit if K is None else K + bit
            unew_int = (two - sl2 * K) * u1f[interior] - u0[interior] + a2 * acc
            unew = u0.at[interior].set(unew_int)
            unew_f = unew.reshape(-1)
        else:
            nsum = _neighbor_sum(u1f, g, VV)
            unew_int = a1 * u1f[interior] - u0[interior] + a2 * nsum
            unew = u0.at[interior].set(unew_int)
            unew_f = unew.reshape(-1)
            if data.Nb:
                # rigid-boundary correction: remove cut legs, fix diagonal
                u1_flat = u1f.reshape(-1)
                cut_nbrs = u1_flat[C["bn_nbr"]]       # (Nb, NN)
                cutsum = jnp.sum(C["bn_cut"] * cut_nbrs, -1)
                delta = sl2 * C["bn_ncut"] * u1_flat[C["bn"]] - a2 * cutsum
                unew_f = unew_f.at[C["bn"]].add(delta)

        vh0 = vh1
        gh_new = gh1
        if data.Nbl:
            bnl, ssaf, mrows = C["bnl"], C["ssaf"], C["mrows"]
            u2b = u0.reshape(-1)[bnl]
            ub = unew_f[bnl]
            lo2Kbg = lo2 * ssaf * mrows["beta"]
            ub = ub - l * ssaf * jnp.sum(
                2.0 * mrows["bDh"] * vh1 - mrows["bFh"] * gh1, -1)
            ub = (ub + lo2Kbg * u2b) / (1.0 + lo2Kbg)
            unew_f = unew_f.at[bnl].set(ub)
            vh0 = (mrows["b"] * (ub - u2b)[:, None] + mrows["bd"] * vh1
                   - 2.0 * mrows["bFh"] * gh1)
            gh_new = gh1 + 0.5 * (vh0 + vh1)

        unew = unew_f.reshape(g.shape)

        # ABCs: disjoint uniform-Q regions, fed by pre-update u0 values
        for sl, Q in abc_regions:
            lQ = dtype.type(sc.l * Q)
            unew = unew.at[sl].set((unew[sl] + lQ * u0[sl]) / (1.0 + lQ))

        # source injection / receiver readout
        unew_f = unew.reshape(-1)
        unew_f = unew_f.at[C["in_ixyz"]].add(sig_n.astype(dtype))
        unew = unew_f.reshape(g.shape)
        out_n = u1f.reshape(-1)[C["out_ixyz"]]
        return unew, u1f, vh0, gh_new, out_n

    if not energy:

        def step(carry, sig_n, C):
            u0, u1, vh1, gh1 = carry
            unew, u1f, vh0, gh_new, out_n = _step_core(
                u0, u1, vh1, gh1, sig_n, C)
            return (u1f, unew, vh0, gh_new), out_n

        return step, consts

    def step_energy(carry, sig_n, C):
        """Energy-instrumented step: carries L(u^{n-1}) and the accumulators."""
        u0, u1, vh1, gh1, Lu_prev, E_lost, E_in = carry

        # --- H_tot[n] from u^n (=u1), u^{n-1} (=u0), L u^{n-1} (=Lu_prev)
        du = (u1 - u0)[interior]
        core = du * du / l2 - (u1 * Lu_prev)[interior]
        H = V_fac * 0.5 * e_h * jnp.sum(core)
        corr = (1.0 - C["e_V"]) * ((u1 - u0) ** 2 / l2 - u1 * Lu_prev) * C["e_absmask"]
        H = H - V_fac * 0.5 * e_h * jnp.sum(corr)
        if data.Nbl:
            H = H + V_fac * 0.5 * e_c / l2 * jnp.sum(
                C["ssaf"][:, None] * (vh1 ** 2 * C["e_D"]
                                      + (e_Ts * gh1) ** 2 * C["e_F"]))
        u2in = u0.reshape(-1)[C["in_ixyz"]]

        unew, u1f, vh0, gh_new, out_n = _step_core(
            u0, u1, vh1, gh1, sig_n, C)

        # --- store L(u^n) for the next step's H (recomputed to match the
        # oracle's split formulation: lfac * (nsum - K*u1))
        nsum = _neighbor_sum(u1f, g, VV)
        Lu_int = lfac * (nsum - Kfull * u1f[interior])
        Lu = jnp.zeros(g.shape, dtype).at[interior].set(Lu_int)
        if data.Nb:
            # masked Lu = dense Lu + lfac*(ncut*u1 - cut-leg sum)
            u1_flat = u1f.reshape(-1)
            cutsum = jnp.sum(C["bn_cut"] * u1_flat[C["bn_nbr"]], -1)
            deltaL = lfac * (C["bn_ncut"] * u1_flat[C["bn"]] - cutsum)
            Lu = Lu.reshape(-1).at[C["bn"]].add(deltaL).reshape(g.shape)

        # --- losses and input energy
        if data.Nbl:
            E_lost = E_lost + V_fac * 0.25 * e_h / l * jnp.sum(
                C["ssaf"][:, None] * ((vh0 + vh1) ** 2 * C["e_E"]))
        E_lost = E_lost + 0.5 * V_fac * e_h / l * jnp.sum(
            (C["e_V"] * C["e_Q"]) * (unew - u0) ** 2 * C["e_absmask"])
        E_in = E_in + (V_fac * e_h / l2) * 0.5 * jnp.sum(
            (unew.reshape(-1)[C["in_ixyz"]] - u2in) * sig_n.astype(dtype))

        return ((u1f, unew, vh0, gh_new, Lu, E_lost, E_in),
                (out_n, H, E_lost, E_in))

    return step_energy, consts


# ------------------------------------------------------------------- runner
class JaxEngine:
    """Single-device engine: jitted scan over the full simulation.

    For the multi-device slab-decomposed engine see
    pffdtd_tpu.parallel.sharded_engine.
    """

    def __init__(self, folder=None, *, consts=None, vox=None, comms=None,
                 mats=None, dtype=np.float32, energy_on=False,
                 pad_z: int | None = 128, fp32_eps: float | None = None,
                 rigid: str = "dense", backend: str = "auto",
                 tile_x: int | None = None):
        if folder is not None:
            sf = SimFolder(folder)
            consts, vox, comms, mats = sf.consts, sf.vox, sf.comms, sf.mats
        from pffdtd_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        import os as _os

        Nzp = int(-(-vox.Nz // (pad_z or 1)) * (pad_z or 1)) if pad_z \
            else vox.Nz
        Nyp = -(-vox.Ny // 8) * 8
        adjb = 2 if consts.fcc_flag else 1
        self.data = None
        if backend == "auto":
            # the fused Pallas kernels are the fast path on real TPUs;
            # energy accounting and CPU runs use the portable XLA
            # composition.  The temporally-blocked pair kernel needs ALL
            # boundary work fusable in-kernel: rigid-only scenes qualify
            # outright; lossy scenes qualify when the axis-plane partition
            # covers every lossy node (no strays).
            on_tpu = jax.devices()[0].platform not in ("cpu",)
            if on_tpu and not energy_on and rigid == "dense" \
                    and dtype == np.float32:
                backend = "pallas"
                pair_try = (len(comms.in_ixyz) <= 64
                            and _os.environ.get("PFFDTD_PAIR", "1") != "0")
                if pair_try:
                    from pffdtd_tpu.engine.pallas_pair import pick_tile_pair

                    tp = tile_x or pick_tile_pair(Nyp, Nzp, adj_bytes=adjb)
                    data = EngineData(consts, vox, comms, mats, dtype=dtype,
                                      pad_z=pad_z, fp32_eps=fp32_eps,
                                      tile_x=tp)
                    n_stray = data.attach_planes()
                    # sloped/curved geometry leaves off-plane (stray)
                    # lossy nodes: the pair kernel fuses them via the
                    # windowed in-kernel ODE pass (PFFDTD_STRAYS=0 falls
                    # back to the single-step + tiled-boundary path)
                    use_strays = (n_stray > 0 and _os.environ.get(
                        "PFFDTD_STRAYS", "1") != "0")
                    # dense x rows ride the segmented stray pipeline far
                    # cheaper than the inline-wait x-plane pass whenever
                    # the scene pays for the stray pass anyway (MV r4
                    # ablation: 26 ms/step of x passes vs ~0.6 ms strayed)
                    demoted = (use_strays and data.planes.x is not None
                               and _os.environ.get("PFFDTD_DEMOTE_X",
                                                   "1") != "0")
                    if demoted:
                        n_stray = data.attach_planes(demote_x=True)
                    if use_strays:
                        # empirical route model (VERDICT r3 #1a): predict
                        # BOTH routes and never auto-pick a path slower
                        # than its own fallback.  Rates fit on the v5e
                        # round-4 probes: bulk streams every padded voxel
                        # at a TX-dependent rate (ghost-row DMA
                        # amplification), strays ~5 ns/node through the
                        # segmented pass, the hybrid boundary kernel
                        # ~4 ns/lossy-node plus a ~1.4x single-step bulk
                        # premium (no pair amortization).
                        TXR = {8: 0.037, 6: 0.038, 4: 0.040, 3: 0.047,
                               2: 0.056}
                        g_ = data.grid
                        npad_ = g_.Nxp * g_.Nyp * g_.Nzp
                        pair_ms = (TXR.get(int(tp), 0.06) * npad_
                                   + 5.0 * n_stray) / 1e6
                        hyb_ms = (1.4 * TXR.get(2, 0.056) * npad_
                                  + 4.0 * data.Nbl) / 1e6
                        route = _os.environ.get("PFFDTD_ROUTE", "")
                        pick_hyb = (route == "hybrid"
                                    or (route != "pair"
                                        and hyb_ms < pair_ms))
                        print(f"--ENGINE(jax): route model pair "
                              f"{pair_ms:.1f} ms/step vs hybrid "
                              f"{hyb_ms:.1f} -> "
                              f"{'hybrid' if pick_hyb else 'pair'}"
                              f"{' (forced)' if route else ''}")
                        if pick_hyb:
                            use_strays = False
                    if n_stray == 0 or use_strays:
                        backend = "pallas_pair"
                        nofull = (False if use_strays
                                  else data.attach_adj_planes())

                        def _sb(tb):
                            return (data.planes.state_bytes_per_row(tb=tb)
                                    if data.planes is not None else 0)

                        # u2b-carry eligibility (pallas_pair.carry_ok);
                        # enabled per backend below only when the carry
                        # rings fit VMEM WITHOUT shrinking TX (TX is the
                        # dominant lever)
                        from pffdtd_tpu.engine.pallas_pair import (
                            carry_bytes_per_row, carry_ok)

                        g_ = data.grid
                        ii_ = np.asarray(data.in_ixyz)
                        pts_ = np.stack(
                            [ii_ // (g_.Nyp * g_.Nzp),
                             (ii_ // g_.Nzp) % g_.Nyp,
                             ii_ % g_.Nzp], 1)
                        uc_able = carry_ok(data.planes, pts_)

                        # deeper temporal blocking (TB > 2 steps per HBM
                        # sweep) when the VMEM rings fit: the pair kernel
                        # is DMA-floor-bound, so fewer bytes/step wins
                        tb_env = _os.environ.get("PFFDTD_TB", "auto")
                        want = None
                        if tb_env not in ("0", "2") and not use_strays \
                                and len(comms.out_ixyz) <= 64:
                            from pffdtd_tpu.engine.pallas_tb import \
                                pick_tile_tb

                            # TB=3 first: measured best on the v5e (the
                            # dominant fixed cost is per stage-tile and
                            # tiles/step = (Nx-2)/TX regardless of TB, so
                            # the TB that affords the larger TX wins:
                            # fcc_lossy bench TB3/TX8 21.4 GVPS vs
                            # TB4/TX6 16.9)
                            cands = ([int(tb_env)] if tb_env != "auto"
                                     else [3, 4])
                            for tbc in cands:
                                txc = pick_tile_tb(
                                    Nyp, Nzp, tbc,
                                    adj_bytes=0 if nofull else adjb,
                                    state_bytes=_sb(tbc), min_tx=4)
                                if not txc:
                                    continue
                                uc_tb = False
                                if uc_able and data.planes is not None:
                                    uc_tb = txc == pick_tile_tb(
                                        Nyp, Nzp, tbc,
                                        adj_bytes=0 if nofull else adjb,
                                        state_bytes=_sb(tbc)
                                        + carry_bytes_per_row(
                                            data.planes, tb=tbc),
                                        min_tx=4)
                                want = (tbc, txc, uc_tb)
                                break
                        uc_ = False
                        if want is not None:
                            backend = "pallas_tb"
                            tbc, tp2, uc_ = want
                        elif tile_x is None:
                            tp2 = pick_tile_pair(
                                Nyp, Nzp, adj_bytes=0 if nofull else adjb,
                                state_bytes=_sb(2))
                            uc_ = uc_able and tp2 > 2 \
                                and data.planes is not None
                            if uc_:
                                uc_ = tp2 == pick_tile_pair(
                                    Nyp, Nzp,
                                    adj_bytes=0 if nofull else adjb,
                                    state_bytes=_sb(2)
                                    + carry_bytes_per_row(data.planes))
                        else:
                            # explicit tile_x: still enable u2b-carry when
                            # the carry rings fit VMEM at the pinned TX
                            tp2 = tp
                            uc_ = uc_able and tp > 2 \
                                and data.planes is not None
                            if uc_:
                                uc_ = tp <= pick_tile_pair(
                                    Nyp, Nzp,
                                    adj_bytes=0 if nofull else adjb,
                                    state_bytes=_sb(2)
                                    + carry_bytes_per_row(data.planes))
                            if uc_able and not uc_:
                                print("--ENGINE(jax): u2b-carry skipped "
                                      f"at pinned TX={tp} (VMEM)")
                        if tp2 != tp:
                            data = EngineData(
                                consts, vox, comms, mats, dtype=dtype,
                                pad_z=pad_z, fp32_eps=fp32_eps,
                                tile_x=tp2)
                            data.attach_planes(demote_x=demoted)
                            if nofull:
                                data.attach_adj_planes()
                            tp = tp2
                        if want is not None:
                            data.tb = want[0]
                        if backend in ("pallas_pair", "pallas_tb"):
                            data.u2b_carry = uc_
                        if backend == "pallas_pair":
                            # input-DMA lookahead LA=2 is implemented
                            # (one more u0b/state slot, 4-deep
                            # slab/adj/sf rings) and bit-exact, but
                            # measured FLAT on the real hall (26.1 vs
                            # 26.0 ms/step): the per-tile stall is not
                            # input-DMA-bound.  Default off; opt in
                            # with PFFDTD_PAIR_LA=2 (VMEM permitting —
                            # the auto-fit check below guards TX)
                            la_env = _os.environ.get("PFFDTD_PAIR_LA", "")
                            la = int(la_env) if la_env else 1
                            if la > 1:
                                from pffdtd_tpu.engine.pallas_pair import \
                                    lookahead_bytes_per_row

                                sb_la = (_sb(2)
                                         + (carry_bytes_per_row(
                                             data.planes) if uc_ else 0)
                                         + lookahead_bytes_per_row(
                                             data.planes, carry=uc_))
                                # <=: a pinned tp below the affordable
                                # TX still fits; tp == 2 is the picker's
                                # unvalidated floor, so LA stays 1 there
                                if tp <= 2 or tp > pick_tile_pair(
                                        Nyp, Nzp,
                                        adj_bytes=0 if nofull else adjb,
                                        state_bytes=sb_la, lookahead=la):
                                    print("--ENGINE(jax): PFFDTD_PAIR_LA"
                                          f"={la} does not fit VMEM at "
                                          f"TX={tp}; keeping LA=1")
                                    la = 1
                            data.lookahead = la
                        if use_strays:
                            data.attach_strays()   # after the final TX
                        tile_x = tp
                        self.data = data
            else:
                backend = "xla"
        if backend == "pallas" and tile_x is None:
            from pffdtd_tpu.engine.pallas_stencil import pick_tile_x

            tile_x = pick_tile_x(Nyp, Nzp)
        elif backend == "pallas_pair" and tile_x is None:
            from pffdtd_tpu.engine.pallas_pair import pick_tile_pair

            # explicit-backend path: a token state_bytes keeps TX=6 off
            # the table for lossy scenes (the engine attaches plane
            # states below; TX=6 with states measured VMEM thrash)
            lossy_ = bool(np.any(np.asarray(vox.mat_bn) >= 0))
            tile_x = pick_tile_pair(Nyp, Nzp, adj_bytes=adjb,
                                    state_bytes=1 if lossy_ else 0)
        elif backend == "pallas_tb" and tile_x is None:
            from pffdtd_tpu.engine.pallas_tb import pick_tile_tb

            tb = int(_os.environ.get("PFFDTD_TB", "4"))
            tile_x = pick_tile_tb(Nyp, Nzp, tb, adj_bytes=adjb, min_tx=3)
            assert tile_x, "no TX fits the TB-stage VMEM rings"
        self.backend = backend
        pal = backend in ("pallas", "pallas_pair", "pallas_tb")
        if self.data is None:
            self.data = EngineData(consts, vox, comms, mats, dtype=dtype,
                                   pad_z=pad_z, fp32_eps=fp32_eps,
                                   tile_x=tile_x if pal else None,
                                   boundary_kernel=(backend == "pallas"))
            if backend in ("pallas_pair", "pallas_tb"):
                ns = self.data.attach_planes()
                if ns and backend == "pallas_pair":
                    if self.data.planes.x is not None \
                            and _os.environ.get("PFFDTD_DEMOTE_X",
                                                "1") != "0":
                        self.data.attach_planes(demote_x=True)
                    self.data.attach_strays()   # fuse off-plane nodes
                else:
                    assert ns == 0, ("the TB kernel requires full "
                                     "axis-plane boundary coverage")
                    self.data.attach_adj_planes()
                if backend == "pallas_tb":
                    self.data.tb = int(_os.environ.get("PFFDTD_TB", "4"))
        self.energy_on = energy_on
        self._folder = folder
        self.Nt = self.data.Nt
        step, step_consts = build_step(self.data, energy=energy_on,
                                       rigid=rigid, backend=backend)
        # device-resident once: repeated run() calls must not re-upload
        self._step_consts = jax.tree.map(jnp.asarray, step_consts)

        # steps grouped per scan iteration: the leapfrog rotates (u0, u1)
        # -> (u1, unew), and a while-loop carry slot must reuse its own
        # buffer, so a single-step body forces XLA to COPY the full grid
        # (u1 -> slot 0) every step.  After an even number of steps each
        # field is back in its original slot (unew lands in the donated
        # buffer via the kernel's output aliasing) and the copy vanishes.
        # The TB kernel advances G = TB steps per call.
        G = getattr(self.data, "tb", 2) if backend == "pallas_tb" else 2
        self.step_group = G

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_scan(carry, sigs_T, C):
            n = sigs_T.shape[0]
            if n % G:  # callers pad; safety net for direct calls
                if backend not in ("pallas_pair", "pallas_tb"):
                    def body(c, x):
                        return step(c, x, C)

                    return jax.lax.scan(body, carry, sigs_T)
                # the fused kernels consume (G, Ns) signal groups:
                # zero-pad the tail steps and trim the extra output rows
                pad = G - n % G
                sigs_T = jnp.concatenate(
                    [sigs_T] + [jnp.zeros_like(sigs_T[:1])] * pad, axis=0)

            groups = sigs_T.reshape(-1, G, *sigs_T.shape[1:])

            if backend in ("pallas_pair", "pallas_tb"):
                # the kernel itself advances G steps per call and returns
                # the (G, Nr) readout rows
                def bodyg(c, xg):
                    return step(c, xg, C)
            else:
                def bodyg(c, xg):
                    c, y0 = step(c, xg[0], C)
                    c, y1 = step(c, xg[1], C)
                    return c, jax.tree.map(
                        lambda a, b: jnp.stack((a, b)), y0, y1)

            carry, ys = jax.lax.scan(bodyg, carry, groups)
            ys = jax.tree.map(
                lambda a: a.reshape(-1, *a.shape[2:])[:n], ys)
            return carry, ys

        self._run_scan = run_scan

    def init_carry(self):
        d = self.data
        g = d.grid
        u0 = jnp.zeros(g.shape, d.dtype)
        u1 = jnp.zeros(g.shape, d.dtype)  # distinct buffers (donation)
        # branch states: tile-order transposed (MMb, N) for the windowed
        # kernel (lane-padding economics), (N, MMb) for the XLA path
        if d.bhyb is not None:
            vhs, _ = d.bhyb.state_shapes()
            vh = {k: jnp.zeros(s, d.dtype) for k, s in vhs.items()}
            gh = {k: jnp.zeros(s, d.dtype) for k, s in vhs.items()}
        else:
            vh = jnp.zeros((d.Nbl_state, MMb), d.dtype)
            gh = jnp.zeros((d.Nbl_state, MMb), d.dtype)
        if self.energy_on:
            return (u0, u1, vh, gh, jnp.zeros(g.shape, d.dtype),
                    jnp.zeros((), d.dtype), jnp.zeros((), d.dtype))
        if self.backend in ("pallas_pair", "pallas_tb"):
            planes = getattr(d, "planes", None)
            vhp, ghp = {}, {}
            if planes is not None:
                for fam, pp in (("z", planes.z), ("y", planes.y),
                                ("x", planes.x)):
                    if pp is not None:
                        s = pp.state_shape(g.Nxp)
                        vhp[fam] = jnp.zeros(s, d.dtype)
                        ghp[fam] = jnp.zeros(s, d.dtype)
                if getattr(d, "u2b_carry", False):
                    # carried u^{step-1} plane sheets (zero fields => 0)
                    from pffdtd_tpu.engine.pallas_pair import carry_pad

                    for fam, pp in (("z", planes.z), ("y", planes.y)):
                        if pp is not None:
                            vhp[fam + "c"] = jnp.zeros(
                                (g.Nxp, carry_pad(pp.P), pp.ssaf.shape[2]),
                                d.dtype)
            strays = getattr(d, "strays", None)
            if strays is not None and int(strays.soff[-1]) > 0:
                s = strays.state_shape()
                vhp["s"] = jnp.zeros(s, d.dtype)
                ghp["s"] = jnp.zeros(s, d.dtype)
            # u^0 = 0: the carried previous-step receiver sample starts 0
            out0 = jnp.zeros(len(d.out_ixyz), d.dtype)
            return (u0, u1, vhp, ghp, out0)
        if self.backend == "pallas":
            # packed boundary-node values of the two previous steps
            # (zeros == the zero initial condition)
            if d.bhyb is not None:
                _, u2s = d.bhyb.state_shapes()
                z = lambda: {k: jnp.zeros(s, d.dtype)
                             for k, s in u2s.items()}
                return (u0, u1, vh, gh, (z(), z()))
            return (u0, u1, vh, gh, (jnp.zeros((1,), d.dtype),
                                     jnp.zeros((1,), d.dtype)))
        return (u0, u1, vh, gh)

    def bn_ms_per_step(self, iters: int = 30) -> float | None:
        """Measured boundary-update time per step (ms), or None.

        The reference dashboard splits air vs boundary rates because its
        kernels run on separate streams (fdtd_common.h:106-190).  Our
        single-step pallas path has the same two-phase structure (fused
        stencil kernel + hybrid boundary kernels), so the boundary share
        is measured by timing the hybrid update alone; the pair/TB
        kernels fuse everything into one sweep (no split exists).
        """
        d = self.data
        if self.backend != "pallas" or d.bhyb is None or not d.Nbl:
            return None
        if getattr(self, "_bn_ms", None) is not None:
            return self._bn_ms
        import time

        from pffdtd_tpu.engine.pallas_boundary import build_boundary_hybrid

        jdt = jnp.float32 if d.dtype == np.float32 else jnp.float64
        upd, nd = build_boundary_hybrid(d.bhyb, d.sc,
                                        int(np.prod(d.grid.shape)), dtype=jdt)
        vhs, u2s = d.bhyb.state_shapes()
        nd = jax.tree.map(jnp.asarray, nd)

        @jax.jit
        def loop(unew, u2b, vh, gh):
            def body(_, c):
                return upd(c[0], c[1], c[2], c[3], nd)
            return jax.lax.fori_loop(0, iters, body, (unew, u2b, vh, gh))

        unew = jnp.zeros(int(np.prod(d.grid.shape)), d.dtype)
        # the hybrid update handles the dense/tiled families only (the
        # z-plane states are fused into the stencil kernel)
        u2b = {k: jnp.zeros(s, d.dtype) for k, s in u2s.items()
               if k in ("d", "t")}
        vh = {k: jnp.zeros(s, d.dtype) for k, s in vhs.items()
              if k in ("d", "t")}
        gh = {k: jnp.zeros(s, d.dtype) for k, s in vhs.items()
              if k in ("d", "t")}
        out = loop(unew, u2b, vh, gh)          # compile + warm
        float(jnp.sum(out[0]))                 # real readback sync
        t0 = time.perf_counter()
        out = loop(*out)
        float(jnp.sum(out[0]))
        self._bn_ms = (time.perf_counter() - t0) / iters * 1e3
        return self._bn_ms

    def run(self, nt: int | None = None, verbose: bool = True,
            chunk: int | None = None, checkpoint_every: int | None = None,
            checkpoint_path=None, resume: bool = False, on_chunk=None):
        """Run the simulation; returns u_out (Nr, Nt) in float64.

        chunk: run the scan in blocks of this many steps, printing a live
        progress line per block (the reference's print_progress dashboard,
        fdtd_common.h:106-190, reports the same total/instantaneous MVPS
        plus the measured air/boundary split where one exists).
        on_chunk: callable(step, carry) invoked after every chunk (e.g. a
        viz.LiveSliceView for the reference's run_plot live view).
        checkpoint_every/checkpoint_path: save the full wavefield state
        (u0,u1,vh,gh + step counter) every N blocks; resume=True restarts
        from the latest checkpoint — the reference has NO mid-simulation
        checkpointing (SURVEY §5), a killed run restarts from t=0.
        """
        import time

        d = self.data
        nt = self.Nt if nt is None else nt
        sigs_all = (d.in_sigs[:, :nt] / d.infac).T.astype(d.dtype)  # (Nt, Ns)

        n0 = 0
        carry = self.init_carry()
        ys_parts = []
        if resume and checkpoint_path and Path(checkpoint_path).exists():
            carry, n0, ys_prev = self._load_checkpoint(checkpoint_path)
            ys_parts.append(ys_prev)
            if verbose:
                print(f"--ENGINE(jax): resumed at step {n0}")

        G = getattr(self, "step_group", 2)
        chunk = chunk or (nt - n0)
        chunk = -(-chunk // G) * G  # keep chunk boundaries group-aligned
        g = d.grid
        npts = g.Nx * g.Ny * g.Nz
        t0 = time.perf_counter()
        n = n0
        blocks = 0
        while n < nt:
            m = min(chunk, nt - n)
            tb = time.perf_counter()
            sl = sigs_all[n:n + m]
            if m % G:  # final partial chunk: zero-input pad steps, trimmed
                sl = np.concatenate(
                    [sl, np.zeros((G - m % G, sl.shape[1]), sl.dtype)])
            carry, ys = self._run_scan(carry, jnp.asarray(sl),
                                       self._step_consts)
            ys = jax.tree.map(
                lambda a: np.asarray(jax.block_until_ready(a))[:m], ys)
            ys_parts.append(ys)
            n += m
            blocks += 1
            if on_chunk is not None:
                on_chunk(n, carry)
            if verbose and n < nt:
                dt_b = time.perf_counter() - tb
                dt_tot = time.perf_counter() - t0
                inst = npts * m / dt_b / 1e6
                tot = npts * (n - n0) / dt_tot / 1e6
                eta = (nt - n) * dt_tot / max(n - n0, 1)
                split = ""
                bn_ms = self.bn_ms_per_step() if blocks == 1 else \
                    getattr(self, "_bn_ms", None)
                if bn_ms is not None:
                    bn_pct = min(100.0, 100.0 * bn_ms / (dt_b / m * 1e3))
                    split = f", air {100 - bn_pct:.0f}% / bn {bn_pct:.0f}%"
                print(f"--ENGINE(jax): {n}/{nt} "
                      f"[{100 * n / nt:.0f}%] {inst:.1f} MVPS inst, "
                      f"{tot:.1f} MVPS avg, ETA {eta:.1f}s{split}",
                      flush=True)
            if (checkpoint_every and checkpoint_path
                    and blocks % checkpoint_every == 0):
                self._save_checkpoint(checkpoint_path, carry, n, ys_parts)
        t1 = time.perf_counter()

        ys = jax.tree.map(lambda *a: np.concatenate(a, axis=0), *ys_parts)
        if self.energy_on:
            out_T, H, E_lost, E_in = ys
            self.H_tot = np.float64(H) * d.infac ** 2
            self.E_lost = np.float64(E_lost) * d.infac ** 2
            self.E_in = np.float64(E_in) * d.infac ** 2
        else:
            out_T = ys
        self.u_out = np.float64(out_T.T) * d.infac

        self.elapsed = t1 - t0
        self.mvps = npts * (nt - n0) / self.elapsed / 1e6
        if verbose:
            print(f"--ENGINE(jax): {nt - n0} steps over {npts / 1e6:.2f} "
                  f"Mvox in {self.elapsed:.3f}s -> {self.mvps:.1f} MVPS")
        return self.u_out

    # ------------------------------------------------------- checkpointing
    def _save_checkpoint(self, path, carry, n, ys_parts):
        ys = jax.tree.map(lambda *a: np.concatenate(a, axis=0), *ys_parts)
        cflat, _ = jax.tree.flatten(carry)
        flat = {f"carry{i}": np.asarray(c) for i, c in enumerate(cflat)}
        yflat, _ = jax.tree.flatten(ys)
        flat.update({f"ys{i:02d}": np.asarray(y) for i, y in enumerate(yflat)})
        np.savez(path, n=n, **flat)

    def _load_checkpoint(self, path):
        z = np.load(path)
        _, ctree = jax.tree.flatten(self.init_carry())
        nc = ctree.num_leaves
        carry = jax.tree.unflatten(
            ctree, [jnp.asarray(z[f"carry{i}"]) for i in range(nc)])
        ys_keys = sorted(k for k in z.files if k.startswith("ys"))
        ys = tuple(z[k] for k in ys_keys)
        if len(ys) == 1:
            ys = ys[0]
        return carry, int(z["n"]), ys

    def energy_balance(self):
        from pffdtd_tpu.utils import rel_diff

        assert self.energy_on
        # scan outputs are post-step accumulations; H_tot[n] pairs with the
        # PRE-step accumulations (oracle indexing), hence the shift
        e_in = np.r_[0.0, self.E_in[:-1]]
        e_lost = np.r_[0.0, self.E_lost[:-1]]
        live = e_in > 0
        return rel_diff((self.H_tot + e_lost)[live], e_in[live])

    def save_outputs(self, folder=None):
        from pffdtd_tpu.io.h5 import write_outputs

        folder = folder or self._folder
        write_outputs(folder, self.u_out, self.data.out_reorder)

    def print_last_samples(self, Np=5):
        ro = self.data.out_reorder
        for i in range(self.u_out.shape[0]):
            print(f"--ENGINE(jax): out {i}")
            for n in range(self.Nt - Np, self.Nt):
                print(f"--ENGINE(jax): sample {n}: {self.u_out[ro[i], n]:.16e}")
