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
          the (T, MMb) ODE branch update (pure VPU)
    HBM   the accumulated window flushes when the window id changes
          (the canonical revisiting-output reduction pattern)

Per-node cost ~ 3*WR*128 MACs on the MXU; padding entries carry zero
coefficients and row/lane 0, making their gathers and scatters no-ops.

The ODE math is bit-identical to the XLA path (cpu_engine.h:362-405 /
sim_fdtd.py:815-837 semantics): gathers select exactly one value, scatters
add exact deltas.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pffdtd_tpu.io.h5 import MMb

WR = 128        # rows per window; window = WR * 128 grid elements
TILE_T = 1024   # nodes per tile (1-D i32/f32 operands need 1024-aligned blocks)


@dataclass
class BoundaryTiles:
    """Host-partitioned per-tile node data (all stacked over tiles)."""

    n_tiles: int
    win_ids: np.ndarray      # (n_tiles,) i32
    first: np.ndarray        # (n_tiles,) i32, 1 = first tile of its window
    rows: np.ndarray         # (n_tiles, T) i32 row within window
    lanes: np.ndarray        # (n_tiles, T) i32
    ssaf: np.ndarray         # (n_tiles, T)
    beta: np.ndarray         # (n_tiles, T)
    b: np.ndarray            # (n_tiles, T, MMb)
    bd: np.ndarray
    bDh: np.ndarray
    bFh: np.ndarray
    n_windows: int


def partition_boundary(bnl_ixyz, ssaf, mat_rows, n_elements, dtype=np.float32,
                       T: int = TILE_T) -> BoundaryTiles:
    """Group sorted boundary nodes into window tiles of T nodes."""
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
    bt = BoundaryTiles(
        n_tiles=n_tiles,
        win_ids=np.zeros(n_tiles, np.int32),
        first=np.ones(n_tiles, np.int32),
        rows=np.zeros((n_tiles, T), np.int32),
        lanes=np.zeros((n_tiles, T), np.int32),
        ssaf=np.zeros((n_tiles, T), dtype),
        beta=np.zeros((n_tiles, T), dtype),
        b=np.zeros((n_tiles, T, MMb), dtype),
        bd=np.zeros((n_tiles, T, MMb), dtype),
        bDh=np.zeros((n_tiles, T, MMb), dtype),
        bFh=np.zeros((n_tiles, T, MMb), dtype),
        n_windows=n_windows,
    )
    for ti, (w, first, sl) in enumerate(tiles):
        n = sl.stop - sl.start
        bt.win_ids[ti] = w
        bt.first[ti] = first
        bt.rows[ti, :n] = rows[sl]
        bt.lanes[ti, :n] = lanes[sl]
        bt.ssaf[ti, :n] = ssaf[sl]
        bt.beta[ti, :n] = mat_rows["beta"][sl]
        for name in ("b", "bd", "bDh", "bFh"):
            getattr(bt, name)[ti, :n] = mat_rows[name][sl]
    return bt


def build_boundary_update(bt: BoundaryTiles, sc, n_elements, dtype=jnp.float32,
                          T: int = TILE_T, interpret: bool = False):
    """Returns fn(unew, u0, vh1, gh1) -> (unew', vh0, gh_new).

    unew/u0 are flat-viewable grids of n_elements (padded to whole windows by
    the caller's layout: n_elements must be a multiple of WR*128); vh1/gh1
    are (n_tiles*T, MMb) in tile order.
    """
    wsize = WR * 128
    assert n_elements % wsize == 0
    NW = n_elements // wsize
    n_tiles = bt.n_tiles
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    l = npdt(sc.l)
    lo2 = npdt(sc.lo2)
    one = npdt(1.0)

    def kernel(win_ids, first, uw, u0w, rows, lanes, ssaf, beta,
               b, bd, bDh, bFh, vh1, gh1, out_w, vh0_o, gh_o):
        i = pl.program_id(0)

        @pl.when(first[i] == 1)
        def _():
            out_w[...] = uw[...]

        win = out_w[0]          # (WR, 128), accumulated across tiles
        r = rows[...]           # (T,)
        ln = lanes[...]
        G = (jax.lax.broadcasted_iota(jnp.int32, (T, WR), 1)
             == r[:, None]).astype(dtype)
        L = (jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
             == ln[:, None]).astype(dtype)

        picked = jnp.dot(G, win, preferred_element_type=dtype)   # (T, 128)
        ub = jnp.sum(picked * L, -1)
        picked0 = jnp.dot(G, u0w[0], preferred_element_type=dtype)
        u2b = jnp.sum(picked0 * L, -1)

        sa = ssaf[...]
        vh = vh1[...]
        gh = gh1[...]
        lo2Kbg = lo2 * sa * beta[...]
        ub_new = ub - l * sa * jnp.sum(2.0 * bDh[...] * vh - bFh[...] * gh, -1)
        ub_new = (ub_new + lo2Kbg * u2b) / (one + lo2Kbg)
        vh0 = (b[...] * (ub_new - u2b)[:, None] + bd[...] * vh
               - 2.0 * bFh[...] * gh)
        gh_new = gh + 0.5 * (vh0 + vh)

        delta = ub_new - ub
        scat = jnp.dot(G.T, delta[:, None] * L, preferred_element_type=dtype)
        out_w[0] = win + scat
        vh0_o[...] = vh0
        gh_o[...] = gh_new

    # block-shape rules: the last two dims must be (8k, 128k) aligned or
    # equal the array dims — per-tile vectors go flat (T,) (T % 128 == 0) and
    # coefficient blocks are (T, MMb) with MMb equal to the array dim
    win_map = lambda i, win_ids, first: (win_ids[i], 0, 0)
    vec_map = lambda i, win_ids, first: (i,)
    mat_map = lambda i, win_ids, first: (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, WR, 128), win_map),      # unew windows
            pl.BlockSpec((1, WR, 128), win_map),      # u0 windows
            pl.BlockSpec((T,), vec_map),              # rows
            pl.BlockSpec((T,), vec_map),              # lanes
            pl.BlockSpec((T,), vec_map),              # ssaf
            pl.BlockSpec((T,), vec_map),              # beta
            pl.BlockSpec((T, MMb), mat_map),          # b
            pl.BlockSpec((T, MMb), mat_map),          # bd
            pl.BlockSpec((T, MMb), mat_map),          # bDh
            pl.BlockSpec((T, MMb), mat_map),          # bFh
            pl.BlockSpec((T, MMb), mat_map),          # vh1
            pl.BlockSpec((T, MMb), mat_map),          # gh1
        ],
        out_specs=[
            pl.BlockSpec((1, WR, 128), win_map),      # updated windows
            pl.BlockSpec((T, MMb), mat_map),          # vh0
            pl.BlockSpec((T, MMb), mat_map),          # gh_new
        ],
    )

    # node data must travel as explicit inputs through the caller's jit/scan
    # (closure-captured device arrays are inlined into the serialized HLO,
    # which breaks down at benchmark scale)
    node_data = {}
    for k in ("rows", "lanes", "ssaf", "beta"):
        node_data[k] = getattr(bt, k).reshape(-1)
    for k in ("b", "bd", "bDh", "bFh"):
        node_data[k] = getattr(bt, k).reshape(-1, MMb)
    win_ids = jnp.asarray(bt.win_ids)    # small: fine as constants
    first = jnp.asarray(bt.first)

    def update(unew, u0, vh1, gh1, nd):
        """Traceable update; nd is the node_data pytree threaded by the caller."""
        shape = unew.shape
        uw = unew.reshape(NW, WR, 128)
        u0w = u0.reshape(NW, WR, 128)
        out_w, vh0, gh_new = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NW, WR, 128), dtype),
                jax.ShapeDtypeStruct((n_tiles * T, MMb), dtype),
                jax.ShapeDtypeStruct((n_tiles * T, MMb), dtype),
            ],
            input_output_aliases={2: 0},  # out windows alias the unew input
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(win_ids, first, uw, u0w, nd["rows"], nd["lanes"],
          nd["ssaf"], nd["beta"], nd["b"], nd["bd"],
          nd["bDh"], nd["bFh"], vh1, gh1)
        return out_w.reshape(shape), vh0, gh_new

    return update, node_data
