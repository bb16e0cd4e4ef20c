"""Windowed Pallas kernel for the frequency-dependent impedance boundaries.

XLA's gather/scatter on TPU serialises (~19 ns/element measured), which makes
the per-step lossy-boundary update (gather u at Nbl nodes -> (Nbl, MMb) ODE
branches -> scatter back) the dominant cost at benchmark scale.  This kernel
exploits the geometric coherence of boundary nodes: sorted by flat grid index
they cluster into dense bands along walls, so the grid is viewed as windows
of WR consecutive 128-lane rows and nodes are processed in tiles of T per
window:

    HBM   window block of unew + u0 (pipelined via PrefetchScalarGridSpec:
          the block index comes from a prefetched per-tile window-id array)
    VMEM  one-hot row/lane selection matrices built from iota (MXU matmuls:
          gather = G @ window, scatter = G^T @ delta) — exact in f32 since
          every product is value*1 or value*0
          per-node material coefficients come from a one-hot lookup into the
          tiny (Nmat+1, 4*MMb+1) table (the reference keeps them in GPU
          constant memory, gpu_engine.h:66-78)
          the (MMb, T) ODE branch update (pure VPU)
    HBM   the accumulated window flushes when the window id changes
          (the canonical revisiting-output reduction pattern)

Branch states vh/gh are stored TRANSPOSED, (MMb, Nbl_pad): a (N, 12) layout
would be lane-padded 12->128 on TPU (10.7x HBM blowup); (12, N) pads only
the sublanes 12->16.  The ODE math is bit-identical to the XLA path
(cpu_engine.h:362-405 / sim_fdtd.py:815-837 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pffdtd_tpu.io.h5 import MMb

import os

# rows per window (window = WR * 128 grid elements); larger windows pack
# node tiles better on sparse (floor-like) boundaries at the cost of bigger
# one-hot gather matmuls
WR = int(os.environ.get("PFFDTD_BOUNDARY_WR", "1024"))
# nodes per tile: per-node vectors are laid out (n_tiles, T) so blocks are
# 2-D (1, T) — T only needs lane alignment (a multiple of 128).  The total
# one-hot matmul cost is n_tiles*T*WR*128 MACs, linear in T for span-matched
# windows, so smaller tiles trade MXU work against per-tile overhead.
TILE_T = int(os.environ.get("PFFDTD_BOUNDARY_T", "1024"))


@dataclass
class BoundaryTiles:
    """Host-partitioned per-tile node data."""

    n_tiles: int
    win_ids: np.ndarray      # (n_tiles,) i32
    first: np.ndarray        # (n_tiles,) i32, 1 = first tile of its window
    rows: np.ndarray         # (n_tiles*T,) i32 row within window
    lanes: np.ndarray        # (n_tiles*T,) i32
    ssaf: np.ndarray         # (n_tiles*T,)
    mat: np.ndarray          # (n_tiles*T,) i32; Nmat = rigid/padding row
    table: np.ndarray        # (Nmat+1, 4*MMb+1): b|bd|bDh|bFh|beta
    n_windows: int
    node_slot: np.ndarray    # (Nbl,) position of each input node in tile order


def partition_boundary(bnl_ixyz, ssaf, mat_bnl, mat_coeffs, n_elements,
                       dtype=np.float32, T: int = TILE_T) -> BoundaryTiles:
    """Group sorted boundary nodes into window tiles of T nodes.

    mat_bnl: per-node material index (>= 0); mat_coeffs: MatCoeffs (rows
    0..Nmat-1 real materials, row Nmat all-zero = rigid/padding).
    """
    assert np.all(np.diff(bnl_ixyz) > 0), "bnl indices must be sorted/unique"
    wsize = WR * 128
    n_windows = -(-int(n_elements) // wsize)
    win = bnl_ixyz // wsize
    rem = bnl_ixyz - win * wsize
    rows = (rem // 128).astype(np.int32)
    lanes = (rem % 128).astype(np.int32)

    tiles = []  # (win_id, first, slice)
    i = 0
    N = bnl_ixyz.size
    while i < N:
        w = win[i]
        first = 1
        j = i
        while j < N and win[j] == w:
            k = j
            while k < N and win[k] == w and k - j < T:
                k += 1
            tiles.append((int(w), first, slice(j, k)))
            first = 0
            j = k
        i = j

    n_tiles = max(1, len(tiles))
    Nm = mat_coeffs.b.shape[0] - 1  # rows 0..Nm-1 materials, Nm = rigid
    table = np.zeros((Nm + 1, 4 * MMb + 1), dtype)
    table[:, 0 * MMb:1 * MMb] = mat_coeffs.b
    table[:, 1 * MMb:2 * MMb] = mat_coeffs.bd
    table[:, 2 * MMb:3 * MMb] = mat_coeffs.bDh
    table[:, 3 * MMb:4 * MMb] = mat_coeffs.bFh
    table[:, 4 * MMb] = mat_coeffs.beta

    bt = BoundaryTiles(
        n_tiles=n_tiles,
        win_ids=np.zeros(n_tiles, np.int32),
        first=np.ones(n_tiles, np.int32),
        rows=np.zeros(n_tiles * T, np.int32),
        lanes=np.zeros(n_tiles * T, np.int32),
        ssaf=np.zeros(n_tiles * T, dtype),
        mat=np.full(n_tiles * T, Nm, np.int32),  # padding -> rigid row
        table=table,
        n_windows=n_windows,
        node_slot=np.zeros(N, np.int64),
    )
    for ti, (w, first, sl) in enumerate(tiles):
        n = sl.stop - sl.start
        s0 = ti * T
        bt.win_ids[ti] = w
        bt.first[ti] = first
        bt.rows[s0:s0 + n] = rows[sl]
        bt.lanes[s0:s0 + n] = lanes[sl]
        bt.ssaf[s0:s0 + n] = ssaf[sl]
        bt.mat[s0:s0 + n] = mat_bnl[sl]
        bt.node_slot[sl] = np.arange(s0, s0 + n)
    return bt


def build_boundary_update(bt: BoundaryTiles, sc, n_elements, dtype=jnp.float32,
                          T: int = TILE_T, interpret: bool = False):
    """Returns (update, node_data): update(unew, u0, vh1, gh1, nd) ->
    (unew', vh0, gh_new).

    unew/u0: flat grids of n_elements (a multiple of WR*128); vh1/gh1:
    (MMb, n_tiles*T) in tile order.  node_data must be threaded through the
    caller's jit as explicit inputs.
    """
    wsize = WR * 128
    assert n_elements % wsize == 0
    NW = n_elements // wsize
    n_tiles = bt.n_tiles
    NmT = bt.table.shape[0]
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    l = npdt(sc.l)
    lo2 = npdt(sc.lo2)
    one = npdt(1.0)

    def kernel(win_ids, first, uw, u2b_in, rows, lanes, ssaf, mat, table,
               vh1, gh1, out_w, ub_o, vh0_o, gh_o):
        i = pl.program_id(0)

        @pl.when(first[i] == 1)
        def _():
            out_w[...] = uw[...]

        win = out_w[0]          # (WR, 128), accumulated across tiles
        r = rows[0]             # (T,) from the (1, T) block
        ln = lanes[0]
        G = (jax.lax.broadcasted_iota(jnp.int32, (T, WR), 1)
             == r[:, None]).astype(dtype)
        L = (jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
             == ln[:, None]).astype(dtype)

        picked = jnp.dot(G, win, preferred_element_type=dtype)   # (T, 128)
        ub = jnp.sum(picked * L, -1)
        # u^{n-1} at the nodes is the previous step's packed output (carried
        # by the engine), NOT re-gathered from u0 — saves a window stream and
        # lets the stencil kernel alias/destroy u0
        u2b = u2b_in[0]

        # material coefficients via one-hot table lookup (T, 4*MMb+1)
        M = (jax.lax.broadcasted_iota(jnp.int32, (T, NmT), 1)
             == mat[0][:, None]).astype(dtype)
        co = jnp.dot(M, table[...], preferred_element_type=dtype)
        b = co[:, 0 * MMb:1 * MMb].T      # (MMb, T)
        bd = co[:, 1 * MMb:2 * MMb].T
        bDh = co[:, 2 * MMb:3 * MMb].T
        bFh = co[:, 3 * MMb:4 * MMb].T
        beta = co[:, 4 * MMb]             # (T,)

        sa = ssaf[0]
        vh = vh1[...]                     # (MMb, T)
        gh = gh1[...]
        lo2Kbg = lo2 * sa * beta
        ub_new = ub - l * sa * jnp.sum(2.0 * bDh * vh - bFh * gh, 0)
        ub_new = (ub_new + lo2Kbg * u2b) / (one + lo2Kbg)
        vh0 = b * (ub_new - u2b)[None, :] + bd * vh - 2.0 * bFh * gh
        gh_new = gh + 0.5 * (vh0 + vh)

        delta = ub_new - ub
        scat = jnp.dot(G.T, delta[:, None] * L, preferred_element_type=dtype)
        out_w[0] = win + scat
        ub_o[0] = ub_new
        vh0_o[...] = vh0
        gh_o[...] = gh_new

    win_map = lambda i, win_ids, first: (win_ids[i], 0, 0)
    vec_map = lambda i, win_ids, first: (i, 0)     # (1, T) per-node blocks
    st_map = lambda i, win_ids, first: (0, i)      # (MMb, T) state blocks
    tbl_map = lambda i, win_ids, first: (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, WR, 128), win_map),      # unew windows
            pl.BlockSpec((1, T), vec_map),            # u2b (packed, carried)
            pl.BlockSpec((1, T), vec_map),            # rows
            pl.BlockSpec((1, T), vec_map),            # lanes
            pl.BlockSpec((1, T), vec_map),            # ssaf
            pl.BlockSpec((1, T), vec_map),            # mat
            pl.BlockSpec(bt.table.shape, tbl_map),    # coefficient table
            pl.BlockSpec((MMb, T), st_map),           # vh1
            pl.BlockSpec((MMb, T), st_map),           # gh1
        ],
        out_specs=[
            pl.BlockSpec((1, WR, 128), win_map),      # updated windows
            pl.BlockSpec((1, T), vec_map),            # ub (next step's u2b)
            pl.BlockSpec((MMb, T), st_map),           # vh0
            pl.BlockSpec((MMb, T), st_map),           # gh_new
        ],
    )

    node_data = {
        "rows": bt.rows.reshape(n_tiles, T),
        "lanes": bt.lanes.reshape(n_tiles, T),
        "ssaf": bt.ssaf.reshape(n_tiles, T),
        "mat": bt.mat.reshape(n_tiles, T),
        "table": bt.table, "win_ids": bt.win_ids, "first": bt.first,
    }

    def update(unew, u2b, vh1, gh1, nd):
        """Traceable; nd is the node_data pytree threaded by the caller.

        u2b: (n_tiles*T,) packed node values of the previous step (the
        engine carries this; zeros at t=0 matches u0=0)."""
        win_ids = nd["win_ids"]
        first = nd["first"]
        shape = unew.shape
        uw = unew.reshape(NW, WR, 128)
        out_w, ub, vh0, gh_new = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NW, WR, 128), dtype),
                jax.ShapeDtypeStruct((n_tiles, T), dtype),
                jax.ShapeDtypeStruct((MMb, n_tiles * T), dtype),
                jax.ShapeDtypeStruct((MMb, n_tiles * T), dtype),
            ],
            # out windows alias unew; u2b/vh/gh alias their inputs
            input_output_aliases={2: 0, 3: 1, 9: 2, 10: 3},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(win_ids, first, uw, u2b.reshape(n_tiles, T), nd["rows"],
          nd["lanes"], nd["ssaf"], nd["mat"], nd["table"], vh1, gh1)
        return out_w.reshape(shape), ub.reshape(-1), vh0, gh_new

    return update, node_data
