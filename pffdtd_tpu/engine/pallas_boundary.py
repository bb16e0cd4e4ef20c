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
WR = int(os.environ.get("PFFDTD_BOUNDARY_WR", "512"))
# nodes per tile: per-node vectors are laid out (n_tiles, T) so blocks are
# 2-D (1, T) — T only needs lane alignment (a multiple of 128).  The total
# one-hot matmul cost is n_tiles*T*WR*128 MACs, linear in T for span-matched
# windows, so smaller tiles trade MXU work against per-tile overhead.
TILE_T = int(os.environ.get("PFFDTD_BOUNDARY_T", "512"))


def _stream_coef():
    """ms per (window * WR) of window streaming.

    1.5e-5 = the depth-2 auto-pipeline's ~68 GB/s effective (latency
    exposed per revisited block); 3.4e-6 = the manual deep-DMA ring's
    ~300 GB/s (round-3 Musikverein fit)."""
    return (3.4e-6 if os.environ.get("PFFDTD_BOUNDARY_RING", "1") == "1"
            else 1.5e-5)


def choose_tile_params(bnl_arrays, n_elements, with_cost: bool = False):
    """Pick (T, WR) minimizing a fitted v5e cost model for the tiled kernel.

    cost[ms] = 7.2e-9 * n_tiles*T*WR  (exact one-hot MXU matmuls)
             + 5.0e-4 * n_tiles       (per-tile fixed overhead)
             + coef   * n_win*WR      (window stream; see _stream_coef)
    (least-squares fit of the 248-Mvox full-lossy box sweep, residual ~1 ms).
    bnl_arrays: one sorted node-index array per shard; costs are summed so
    every shard runs the same static shapes.  Env PFFDTD_BOUNDARY_T/WR pin
    the choice.  WR candidates must divide the flat grid into whole windows.
    """
    env_t = os.environ.get("PFFDTD_BOUNDARY_T")
    env_w = os.environ.get("PFFDTD_BOUNDARY_WR")
    cand_t = [int(env_t)] if env_t else [128, 256, 512, 1024]
    cand_w = [int(env_w)] if env_w else [
        w for w in (128, 256, 512, 1024) if n_elements % (w * 128) == 0]
    if not cand_w:
        cand_w = [128]
    scoef = _stream_coef()
    best, best_cost = (cand_t[-1], cand_w[-1]), np.inf
    for wr in cand_w:
        nwin = 0
        counts = []
        for a in bnl_arrays:
            _, c = np.unique(np.asarray(a) // (wr * 128),
                             return_counts=True)
            counts.append(c)
            nwin += c.size
        for T in cand_t:
            ntl = sum(int(np.ceil(c / T).sum()) for c in counts)
            cost = 7.2e-9 * ntl * T * wr + 5e-4 * ntl + scoef * nwin * wr
            if cost < best_cost:
                best, best_cost = (T, wr), cost
    return (best, best_cost) if with_cost else best


# measured per-subwindow dense-kernel cost on v5e: streaming two
# (MMb, 1024) f32 state planes in and out (~196 KB at ~335 GB/s) plus
# fixed per-block overhead
COST_PER_SUB_MS = 1.1e-3


def choose_hybrid_split(bnl_arrays, n_elements):
    """Jointly pick (min_fill, (T, WR)) minimizing dense + tiled cost.

    For each min-fill candidate, subwindows at or above the threshold go
    dense (cost = n_sub * COST_PER_SUB_MS) and the strays are priced by
    choose_tile_params' model; the cheapest split wins.  Env
    PFFDTD_BOUNDARY_MIN_FILL pins the threshold."""
    env_mf = os.environ.get("PFFDTD_BOUNDARY_MIN_FILL")
    # candidates cap at 96: the model's dense term is optimistic for very
    # sparse subwindows and measured MV runs regress above this threshold
    cand_mf = ([int(env_mf)] if env_mf else [16, 24, 32, 48, 64, 96])
    subs = [np.asarray(a) // SUBW for a in bnl_arrays]
    ucs = [np.unique(s, return_counts=True) for s in subs]
    best, best_cost = None, np.inf
    for mf in cand_mf:
        n_sub = sum(int((c >= mf).sum()) for _, c in ucs)
        strays = [a[~np.isin(s, u[c >= mf])]
                  for a, s, (u, c) in zip(bnl_arrays, subs, ucs)]
        if any(s.size for s in strays):
            t_wr, tiled_cost = choose_tile_params(
                strays, n_elements, with_cost=True)
        else:
            t_wr, tiled_cost = None, 0.0
        cost = n_sub * COST_PER_SUB_MS + tiled_cost
        if cost < best_cost:
            best, best_cost = (mf, t_wr), cost
    return best


def split_dense_mask(bnl_ixyz, min_fill=None) -> np.ndarray:
    """True for nodes whose 1024-element subwindow is filled enough to go
    through the dense (gather-free) kernel."""
    mf = MIN_FILL if min_fill is None else min_fill
    sub = np.asarray(bnl_ixyz) // SUBW
    uniq, counts = np.unique(sub, return_counts=True)
    return np.isin(sub, uniq[counts >= mf])


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
    T: int = 1024            # nodes per tile
    wr: int = 1024           # window rows


def partition_boundary(bnl_ixyz, ssaf, mat_bnl, mat_coeffs, n_elements,
                       dtype=np.float32, T: int | None = None,
                       wr: int | None = None) -> BoundaryTiles:
    """Group sorted boundary nodes into window tiles of T nodes.

    mat_bnl: per-node material index (>= 0); mat_coeffs: MatCoeffs (rows
    0..Nmat-1 real materials, row Nmat all-zero = rigid/padding).
    """
    assert np.all(np.diff(bnl_ixyz) > 0), "bnl indices must be sorted/unique"
    T = TILE_T if T is None else T
    wr = WR if wr is None else wr
    wsize = wr * 128
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

    # pad the tile count to a multiple of 8: per-node vectors are blocked
    # (8, T) on TPU (sublane alignment), tile i reading row i % 8.  Padding
    # tiles revisit the LAST real window with first=0 and all-rigid nodes
    # (zero coefficients -> zero scatter delta), a benign no-op.
    n_tiles = -(-max(1, len(tiles)) // 8) * 8
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
        T=T, wr=wr,
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
    if tiles:  # alignment padding: revisit the last real window, no reset
        bt.win_ids[len(tiles):] = tiles[-1][0]
        bt.first[len(tiles):] = 0
    else:
        bt.first[:] = 0
        bt.first[0] = 1
    return bt


def _dot_onehot_exact(G, W, dtype):
    """Exact f32 one-hot matmul on the MXU via a 3-way bf16 split.

    Mosaic lowers a plain f32 `jnp.dot` to a SINGLE bf16 MXU pass (measured
    ~4e-3 relative error — silently lossy) and Precision.HIGHEST is slower
    than three explicit bf16 passes.  G's entries are {0, 1} (exact in
    bf16); W splits exactly into hi+mid+lo bf16 planes (8+8+8 mantissa
    bits), each pass accumulates in f32, and the reconstruction is
    bit-exact for a one-hot G (one term per output, no rounding)."""
    if dtype != jnp.float32:
        return jax.lax.dot_general(G, W, (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=dtype)
    gb = G.astype(jnp.bfloat16)
    hi = W.astype(jnp.bfloat16)
    r1 = W - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(gb, hi, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(gb, mid, preferred_element_type=jnp.float32)
    return acc + jnp.dot(gb, lo, preferred_element_type=jnp.float32)


def build_boundary_update(bt: BoundaryTiles, sc, n_elements, dtype=jnp.float32,
                          interpret: bool = False):
    """Returns (update, node_data): update(unew, u0, vh1, gh1, nd) ->
    (unew', vh0, gh_new).

    unew/u0: flat grids of n_elements (a multiple of bt.wr*128); vh1/gh1:
    (n_tiles, MMb, T) in tile order.  node_data must be threaded through the
    caller's jit as explicit inputs.
    """
    T, WR = bt.T, bt.wr  # noqa: N806 — shadow the module defaults on purpose
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
        j = jax.lax.rem(jnp.int32(i), jnp.int32(8))  # row within (8, T) block

        @pl.when(first[i] == 1)
        def _():
            out_w[...] = uw[...]

        @pl.when(j == 0)
        def _():
            # the ub output block is revisited by 8 consecutive tiles; seed
            # it with the aliased input so untouched rows survive the flush
            ub_o[...] = u2b_in[...]

        win = out_w[0]          # (WR, 128), accumulated across tiles
        r = rows[pl.ds(j, 1)][0]       # (T,) row of the (8, T) block
        ln = lanes[pl.ds(j, 1)][0]
        G = (jax.lax.broadcasted_iota(jnp.int32, (T, WR), 1)
             == r[:, None]).astype(dtype)
        L = (jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
             == ln[:, None]).astype(dtype)

        picked = _dot_onehot_exact(G, win, dtype)                # (T, 128)
        ub = jnp.sum(picked * L, -1)
        # u^{n-1} at the nodes is the previous step's packed output (carried
        # by the engine), NOT re-gathered from u0 — saves a window stream and
        # lets the stencil kernel alias/destroy u0
        u2b = u2b_in[pl.ds(j, 1)][0]

        # material coefficients via one-hot table lookup (T, 4*MMb+1)
        M = (jax.lax.broadcasted_iota(jnp.int32, (T, NmT), 1)
             == mat[pl.ds(j, 1)][0][:, None]).astype(dtype)
        co = _dot_onehot_exact(M, table[...], dtype)
        b = co[:, 0 * MMb:1 * MMb].T      # (MMb, T)
        bd = co[:, 1 * MMb:2 * MMb].T
        bDh = co[:, 2 * MMb:3 * MMb].T
        bFh = co[:, 3 * MMb:4 * MMb].T
        beta = co[:, 4 * MMb]             # (T,)

        sa = ssaf[pl.ds(j, 1)][0]
        vh = vh1[0]                       # (MMb, T)
        gh = gh1[0]
        lo2Kbg = lo2 * sa * beta
        ub_new = ub - l * sa * jnp.sum(2.0 * bDh * vh - bFh * gh, 0)
        ub_new = (ub_new + lo2Kbg * u2b) / (one + lo2Kbg)
        vh0 = b * (ub_new - u2b)[None, :] + bd * vh - 2.0 * bFh * gh
        gh_new = gh + 0.5 * (vh0 + vh)

        delta = ub_new - ub
        scat = _dot_onehot_exact(G.T, delta[:, None] * L, dtype)
        out_w[0] = win + scat
        ub_o[pl.ds(j, 1)] = ub_new[None]
        vh0_o[0] = vh0
        gh_o[0] = gh_new

    win_map = lambda i, win_ids, first: (win_ids[i], 0, 0)
    vec_map = lambda i, win_ids, first: (i // 8, 0)  # (8, T) per-node blocks
    st_map = lambda i, win_ids, first: (i, 0, 0)   # (1, MMb, T) states
    tbl_map = lambda i, win_ids, first: (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, WR, 128), win_map),      # unew windows
            pl.BlockSpec((8, T), vec_map),            # u2b (packed, carried)
            pl.BlockSpec((8, T), vec_map),            # rows
            pl.BlockSpec((8, T), vec_map),            # lanes
            pl.BlockSpec((8, T), vec_map),            # ssaf
            pl.BlockSpec((8, T), vec_map),            # mat
            pl.BlockSpec(bt.table.shape, tbl_map),    # coefficient table
            pl.BlockSpec((1, MMb, T), st_map),        # vh1
            pl.BlockSpec((1, MMb, T), st_map),        # gh1
        ],
        out_specs=[
            pl.BlockSpec((1, WR, 128), win_map),      # updated windows
            pl.BlockSpec((8, T), vec_map),            # ub (next step's u2b)
            pl.BlockSpec((1, MMb, T), st_map),        # vh0
            pl.BlockSpec((1, MMb, T), st_map),        # gh_new
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
                jax.ShapeDtypeStruct((n_tiles, MMb, T), dtype),
                jax.ShapeDtypeStruct((n_tiles, MMb, T), dtype),
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


def build_boundary_ring(bt: BoundaryTiles, sc, n_elements, dtype=jnp.float32,
                        interpret: bool = False, ring_k: int = 8,
                        lookahead: int = 6):
    """Manual deep-DMA-ring version of the tiled boundary kernel.

    Same math and data contract as build_boundary_update, but the window
    stream is hand-rolled: Mosaic's automatic BlockSpec pipeline is capped
    at double buffering, which exposes the full ~2 us HBM latency on every
    revisited 32-512 KB window block (~68 GB/s effective measured on the
    real Musikverein, the dominant cost of the fallback engine).  Here up
    to `ring_k` window DMAs are in flight at once (prefetched `lookahead`
    tiles ahead via host-precomputed SMEM schedules), which restores the
    ~335 GB/s Pallas aggregate.  Node-vector and branch-state blocks ride
    a 2-deep ring at (8, T)-block granularity.

    The processing order is the host-defined tile order, so outputs are
    bit-identical to the auto-pipelined kernel.
    """
    T, WR = bt.T, bt.wr
    wsize = WR * 128
    assert n_elements % wsize == 0
    NW = n_elements // wsize
    n_tiles = bt.n_tiles
    assert n_tiles % 8 == 0
    n_groups = n_tiles // 8
    NmT = bt.table.shape[0]
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    l = npdt(sc.l)
    lo2 = npdt(sc.lo2)
    one = npdt(1.0)
    K = ring_k
    L = min(lookahead, K - 2)

    # ---- host-precomputed window schedule (all static SMEM arrays)
    first = bt.first.astype(np.int64)
    seq_of_tile = (np.cumsum(first) - 1).astype(np.int32)  # window seq per tile
    first_tiles = np.flatnonzero(first)
    n_seq = int(first.sum())
    assert n_seq >= 1
    seq_win = bt.win_ids[first_tiles].astype(np.int32)     # HBM window per seq
    # strictly increasing window ids = in-flight reads never overlap the
    # aliased out-writes behind them
    assert np.all(np.diff(seq_win) > 0), "window ids must increase"
    start_at = first_tiles - L
    n_warm = int((start_at <= 0).sum())                    # started up front
    w_in_start = np.full(n_tiles, -1, np.int32)
    for q in range(n_warm, n_seq):
        w_in_start[start_at[q]] = q
    # flush window seq[i-1] when tile i opens a new window
    w_flush = np.full(n_tiles, -1, np.int32)
    nz = first_tiles[first_tiles > 0]
    w_flush[nz] = seq_of_tile[nz - 1]

    def kernel(seq_tile, seqw, w_in, w_fl, first_s,
               uw, u2b_in, rows, lanes, ssaf, mat, table, vh1, gh1,
               out_w, ub_o, vh0_o, gh_o):
        def body(wbuf, nb, st, ob, so, sem_win_in, sem_win_out,
                 sem_nb, sem_st, sem_ob, sem_so):
            # wbuf: (K, WR, 128) window ring; nb: (2, 5, 8, T) node-vector
            # ring (u2b|rows|lanes|ssaf|mat as f32/int reinterpreted rows);
            # st: (2, 2, MMb, 8T) vh/gh ring; ob: (2, 8, T) ub out ring;
            # so: (2, 2, MMb, 8T) vh0/gh out ring

            def win_in(q):
                qk = jax.lax.rem(jnp.int32(q), jnp.int32(K))
                return pltpu.make_async_copy(
                    uw.at[pl.ds(seqw[q], 1)], wbuf.at[pl.ds(qk, 1)],
                    sem_win_in.at[qk])

            def win_out(q):
                qk = jax.lax.rem(jnp.int32(q), jnp.int32(K))
                return pltpu.make_async_copy(
                    wbuf.at[pl.ds(qk, 1)], out_w.at[pl.ds(seqw[q], 1)],
                    sem_win_out.at[qk])

            def grp_in(g):
                s = g % 2
                return [
                    pltpu.make_async_copy(u2b_in.at[pl.ds(g * 8, 8)],
                                          nb.at[s, 0], sem_nb.at[s, 0]),
                    pltpu.make_async_copy(rows.at[pl.ds(g * 8, 8)],
                                          nb.at[s, 1], sem_nb.at[s, 1]),
                    pltpu.make_async_copy(lanes.at[pl.ds(g * 8, 8)],
                                          nb.at[s, 2], sem_nb.at[s, 2]),
                    pltpu.make_async_copy(ssaf.at[pl.ds(g * 8, 8)],
                                          nb.at[s, 3], sem_nb.at[s, 3]),
                    pltpu.make_async_copy(mat.at[pl.ds(g * 8, 8)],
                                          nb.at[s, 4], sem_nb.at[s, 4]),
                    pltpu.make_async_copy(
                        vh1.at[pl.ds(g * 8, 8)],
                        st.at[s, 0], sem_st.at[s, 0]),
                    pltpu.make_async_copy(
                        gh1.at[pl.ds(g * 8, 8)],
                        st.at[s, 1], sem_st.at[s, 1]),
                ]

            def grp_out(g):
                s = g % 2
                return [
                    pltpu.make_async_copy(ob.at[s],
                                          ub_o.at[pl.ds(g * 8, 8)],
                                          sem_ob.at[s]),
                    pltpu.make_async_copy(
                        so.at[s, 0], vh0_o.at[pl.ds(g * 8, 8)],
                        sem_so.at[s, 0]),
                    pltpu.make_async_copy(
                        so.at[s, 1], gh_o.at[pl.ds(g * 8, 8)],
                        sem_so.at[s, 1]),
                ]

            # warm-up: first windows + first node group
            for q in range(min(n_warm, n_seq)):
                win_in(q).start()
            for c in grp_in(0):
                c.start()

            def tile_step(i, g, j):
                """Process tile i = 8g + j against its resident window."""
                q_in = w_in[i]

                @pl.when(q_in >= 0)
                def _():
                    @pl.when(q_in >= K)
                    def _():
                        win_out(q_in - K).wait()
                    win_in(q_in).start()

                qf = w_fl[i]

                @pl.when(qf >= 0)
                def _():
                    win_out(qf).start()

                q = seq_tile[i]
                qk = jax.lax.rem(jnp.int32(q), jnp.int32(K))

                @pl.when(first_s[i] == 1)
                def _():
                    win_in(q).wait()

                s = g % 2
                win = wbuf[qk]                        # (WR, 128)
                rr = rows_i32(s, j)
                ln = lanes_i32(s, j)
                G = (jax.lax.broadcasted_iota(jnp.int32, (T, WR), 1)
                     == rr[:, None]).astype(dtype)
                Lm = (jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                      == ln[:, None]).astype(dtype)
                picked = _dot_onehot_exact(G, win, dtype)     # (T, 128)
                ubv = jnp.sum(picked * Lm, -1)
                u2b = nb[s, 0, j]

                M = (jax.lax.broadcasted_iota(jnp.int32, (T, NmT), 1)
                     == mat_i32(s, j)[:, None]).astype(dtype)
                co = _dot_onehot_exact(M, table[...], dtype)
                b = co[:, 0 * MMb:1 * MMb].T
                bd = co[:, 1 * MMb:2 * MMb].T
                bDh = co[:, 2 * MMb:3 * MMb].T
                bFh = co[:, 3 * MMb:4 * MMb].T
                beta = co[:, 4 * MMb]

                sa = nb[s, 3, j]
                vh = st[s, 0, j]                      # (MMb, T)
                gh = st[s, 1, j]
                lo2Kbg = lo2 * sa * beta
                ub_new = ubv - l * sa * jnp.sum(2.0 * bDh * vh - bFh * gh, 0)
                ub_new = (ub_new + lo2Kbg * u2b) / (one + lo2Kbg)
                vh0 = b * (ub_new - u2b)[None, :] + bd * vh - 2.0 * bFh * gh
                gh_new = gh + 0.5 * (vh0 + vh)

                delta = ub_new - ubv
                scat = _dot_onehot_exact(G.T, delta[:, None] * Lm, dtype)
                wbuf[qk] = win + scat
                ob[s, j] = ub_new
                so[s, 0, j] = vh0
                so[s, 1, j] = gh_new

            def rows_i32(s, j):
                return nb[s, 1, j].astype(jnp.int32)

            def lanes_i32(s, j):
                return nb[s, 2, j].astype(jnp.int32)

            def mat_i32(s, j):
                return nb[s, 4, j].astype(jnp.int32)

            def group(g, _):
                @pl.when(g + 1 < n_groups)
                def _():
                    for c in grp_in(g + 1):
                        c.start()

                @pl.when(g >= 2)
                def _():
                    for c in grp_out(g - 2):
                        c.wait()
                for c in grp_in(g):
                    c.wait()
                for j in range(8):
                    tile_step(g * 8 + j, g, j)
                for c in grp_out(g):
                    c.start()

            jax.lax.fori_loop(0, n_groups, group, None, unroll=False)

            # drain: final window(s) + trailing group outs
            win_out(n_seq - 1).start()
            for q in range(max(0, n_seq - K), n_seq):
                win_out(q).wait()
            for g in range(max(0, n_groups - 2), n_groups):
                for c in grp_out(g):
                    c.wait()

        pl.run_scoped(
            body,
            wbuf=pltpu.VMEM((K, WR, 128), dtype),
            nb=pltpu.VMEM((2, 5, 8, T), dtype),
            st=pltpu.VMEM((2, 2, 8, MMb, T), dtype),
            ob=pltpu.VMEM((2, 8, T), dtype),
            so=pltpu.VMEM((2, 2, 8, MMb, T), dtype),
            sem_win_in=pltpu.SemaphoreType.DMA((K,)),
            sem_win_out=pltpu.SemaphoreType.DMA((K,)),
            sem_nb=pltpu.SemaphoreType.DMA((2, 5)),
            sem_st=pltpu.SemaphoreType.DMA((2, 2)),
            sem_ob=pltpu.SemaphoreType.DMA((2,)),
            sem_so=pltpu.SemaphoreType.DMA((2, 2)),
        )

    node_data = {
        # node vectors as f32 rows (int fields hold small exact integers;
        # the kernel casts back) so one homogeneous (2, 5, 8, T) VMEM ring
        # serves all five
        "rows": bt.rows.reshape(n_tiles, T).astype(np.float32),
        "lanes": bt.lanes.reshape(n_tiles, T).astype(np.float32),
        "ssaf": bt.ssaf.reshape(n_tiles, T),
        "mat": bt.mat.reshape(n_tiles, T).astype(np.float32),
        "table": bt.table, "win_ids": bt.win_ids,
        "seq_tile": seq_of_tile, "seq_win": seq_win,
        "w_in": w_in_start, "w_flush": w_flush,
        "first": bt.first,
    }

    def update(unew, u2b, vh1, gh1, nd):
        shape = unew.shape
        uw = unew.reshape(NW, WR, 128)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        anyb = pl.BlockSpec(memory_space=pl.ANY)
        out_w, ub, vh0, gh_new = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((NW, WR, 128), dtype),
                jax.ShapeDtypeStruct((n_tiles, T), dtype),
                jax.ShapeDtypeStruct((n_tiles, MMb, T), dtype),
                jax.ShapeDtypeStruct((n_tiles, MMb, T), dtype),
            ],
            in_specs=[smem] * 5 + [anyb] * 6
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] + [anyb] * 2,
            out_specs=[anyb] * 4,
            # out windows alias unew; u2b/vh/gh alias their inputs
            input_output_aliases={5: 0, 6: 1, 12: 2, 13: 3},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(nd["seq_tile"], nd["seq_win"], nd["w_in"],
          nd["w_flush"], nd["first"],
          uw, u2b.reshape(n_tiles, T), nd["rows"], nd["lanes"], nd["ssaf"],
          nd["mat"], nd["table"], vh1, gh1)
        return out_w.reshape(shape), ub.reshape(-1), vh0, gh_new

    return update, node_data


# ---------------------------------------------------------------- dense mode
# The gather-free redesign: instead of compacting nodes into tiles and paying
# O(T*WR*128) one-hot MXU gathers/scatters per tile, view the grid as
# SUBWINDOWS of 1024 contiguous elements (8 sublanes x 128 lanes — exactly
# one aligned VMEM tile) and run the branch ODE DENSELY over every element of
# each subwindow that contains at least one boundary node.  Non-node elements
# carry the all-zero "rigid" material row, for which the update is exactly
# the identity, so no gather, no scatter, and no selection matmuls exist at
# all: the only MXU work is a tiny one-hot material-table lookup, and the
# block writes are aligned (8, 128) stores.  Boundary nodes hug walls, so
# sorted flat indices fill subwindows densely (z-runs along surfaces are
# contiguous); the VPU/DMA overspend on empty lanes is far cheaper than the
# selection matmuls it replaces.  Branch states become (n_sub, MMb, 1024).

SUBW = 1024   # elements per subwindow: one (8, 128) f32 VMEM tile


@dataclass
class BoundaryDense:
    """Host-built dense subwindow data."""

    n_sub: int
    sub_ids: np.ndarray     # (n_sub,) i32 subwindow index, strictly increasing
    mat: np.ndarray         # (n_sub, 8, 128) i32; Nmat row = rigid/no node
    ssaf: np.ndarray        # (n_sub, 8, 128)
    table: np.ndarray       # (Nmat+1, 4*MMb+1) f32
    table_split: np.ndarray  # (3*(4*MMb+1), Nmat+1) bf16 hi|mid|lo, transposed
    node_slot: np.ndarray   # (Nbl,) dense position of each node


def _split_bf16_T(table):
    """Exact 3-way bf16 split of an f32 table, stacked and transposed."""
    import ml_dtypes

    t = table.astype(np.float32)
    hi = t.astype(ml_dtypes.bfloat16)
    r1 = t - hi.astype(np.float32)
    mid = r1.astype(ml_dtypes.bfloat16)
    lo = (r1 - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.concatenate([hi.T, mid.T, lo.T], axis=0)


def partition_boundary_dense(bnl_ixyz, ssaf, mat_bnl, mat_coeffs, n_elements,
                             dtype=np.float32, pad_sub: int | None = None,
                             empty_pad: bool = False) -> BoundaryDense:
    """Scatter sorted boundary nodes into dense (8, 128) subwindows.

    pad_sub: pad the subwindow count to this value (multi-shard lockstep);
    padding entries point at an all-rigid subwindow, whose dense update is
    the identity.  empty_pad requires such a node-free subwindow to exist.
    """
    assert np.all(np.diff(bnl_ixyz) > 0), "bnl indices must be sorted/unique"
    assert n_elements % SUBW == 0
    sub = (bnl_ixyz // SUBW).astype(np.int64)
    sub_ids, starts = np.unique(sub, return_index=True)
    n_sub = sub_ids.size
    Nm = mat_coeffs.b.shape[0] - 1

    target = max(n_sub, pad_sub or 0, 1)
    mat = np.full((target, SUBW), Nm, np.int32)
    sa = np.zeros((target, SUBW), dtype)
    within = (bnl_ixyz % SUBW).astype(np.int64)
    pos = np.searchsorted(sub_ids, sub)
    mat[pos, within] = mat_bnl
    sa[pos, within] = ssaf
    node_slot = pos * SUBW + within

    ids = np.zeros(target, np.int32)
    ids[:n_sub] = sub_ids
    if target > n_sub:
        # padding subwindows must NOT revisit a real one: a revisit would
        # recompute from the pristine input block and overwrite real updates
        used = set(sub_ids.tolist())
        free = next(s for s in range(n_elements // SUBW) if s not in used)
        ids[n_sub:] = free
    if n_sub == 0:
        ids[:] = 0

    table = np.zeros((Nm + 1, 4 * MMb + 1), dtype)
    table[:, 0 * MMb:1 * MMb] = mat_coeffs.b
    table[:, 1 * MMb:2 * MMb] = mat_coeffs.bd
    table[:, 2 * MMb:3 * MMb] = mat_coeffs.bDh
    table[:, 3 * MMb:4 * MMb] = mat_coeffs.bFh
    table[:, 4 * MMb] = mat_coeffs.beta

    return BoundaryDense(
        n_sub=target, sub_ids=ids,
        mat=mat.reshape(target, 8, 128), ssaf=sa.reshape(target, 8, 128),
        table=table, table_split=_split_bf16_T(table), node_slot=node_slot)


def build_boundary_dense(bd: BoundaryDense, sc, n_elements,
                         dtype=jnp.float32, interpret: bool = False):
    """Returns (update, node_data): update(unew, u2b, vh1, gh1, nd) ->
    (unew', ub, vh0, gh_new) with states (n_sub, MMb, SUBW) and u2b/ub flat
    (n_sub*SUBW,).  Bit-identical to the XLA path at node positions and the
    exact identity elsewhere."""
    assert n_elements % SUBW == 0
    NR = n_elements // 128
    n_sub = bd.n_sub
    NmT = bd.table.shape[0]
    C = 4 * MMb + 1
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    l = npdt(sc.l)
    lo2 = npdt(sc.lo2)
    f32 = dtype == jnp.float32

    def kernel(sub_ids, uw, u2b_in, mat, ssaf, tbl, vh1, gh1,
               out_w, ub_o, vh0_o, gh_o):
        ub = uw[...]                       # (8, 128)
        u2b = u2b_in[0]
        mflat = mat[0].reshape(SUBW)
        MT = (jax.lax.broadcasted_iota(jnp.int32, (NmT, SUBW), 0)
              == mflat[None, :])
        if f32:
            # one bf16 MXU pass against the pre-split hi|mid|lo table, then
            # an exact f32 reconstruction (one-hot -> no rounding anywhere)
            co3 = jnp.dot(tbl[...], MT.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)   # (3C, SUBW)
            co = co3[0:C] + co3[C:2 * C] + co3[2 * C:3 * C]
        else:
            co = jax.lax.dot_general(
                tbl[...], MT.astype(dtype), (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype)                    # (C, SUBW)
        b = co[0 * MMb:1 * MMb].reshape(MMb, 8, 128)
        bdc = co[1 * MMb:2 * MMb].reshape(MMb, 8, 128)
        bDh = co[2 * MMb:3 * MMb].reshape(MMb, 8, 128)
        bFh = co[3 * MMb:4 * MMb].reshape(MMb, 8, 128)
        beta = co[4 * MMb].reshape(8, 128)

        sa = ssaf[0]
        vh = vh1[0].reshape(MMb, 8, 128)
        gh = gh1[0].reshape(MMb, 8, 128)
        lo2Kbg = lo2 * sa * beta
        ub_new = ub - l * sa * jnp.sum(2.0 * bDh * vh - bFh * gh, 0)
        ub_new = (ub_new + lo2Kbg * u2b) / (1.0 + lo2Kbg)
        vh0 = b * (ub_new - u2b)[None] + bdc * vh - 2.0 * bFh * gh
        gh_new = gh + 0.5 * (vh0 + vh)

        out_w[...] = ub_new
        ub_o[0] = ub_new
        vh0_o[0] = vh0.reshape(MMb, SUBW)
        gh_o[0] = gh_new.reshape(MMb, SUBW)

    sub_map = lambda i, sub_ids: (sub_ids[i], 0)
    own_map = lambda i, sub_ids: (i, 0, 0)
    st_map = lambda i, sub_ids: (i, 0, 0)
    tbl_map = lambda i, sub_ids: (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec((8, 128), sub_map),              # u subwindow
            pl.BlockSpec((1, 8, 128), own_map),           # u2b (carried)
            pl.BlockSpec((1, 8, 128), own_map),           # material index
            pl.BlockSpec((1, 8, 128), own_map),           # ssaf
            pl.BlockSpec(bd.table_split.shape if f32 else bd.table.T.shape,
                         tbl_map),                        # coefficient table
            pl.BlockSpec((1, MMb, SUBW), st_map),         # vh1
            pl.BlockSpec((1, MMb, SUBW), st_map),         # gh1
        ],
        out_specs=[
            pl.BlockSpec((8, 128), sub_map),              # updated subwindow
            pl.BlockSpec((1, 8, 128), own_map),           # ub (next u2b)
            pl.BlockSpec((1, MMb, SUBW), st_map),         # vh0
            pl.BlockSpec((1, MMb, SUBW), st_map),         # gh_new
        ],
    )

    node_data = {
        "sub_ids": bd.sub_ids, "mat": bd.mat, "ssaf": bd.ssaf,
        "table": bd.table_split if f32 else np.ascontiguousarray(bd.table.T),
    }

    def update(unew, u2b, vh1, gh1, nd):
        shape = unew.shape
        uw = unew.reshape(NR, 128)
        out_w, ub, vh0, gh_new = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((NR, 128), dtype),
                jax.ShapeDtypeStruct((n_sub, 8, 128), dtype),
                jax.ShapeDtypeStruct((n_sub, MMb, SUBW), dtype),
                jax.ShapeDtypeStruct((n_sub, MMb, SUBW), dtype),
            ],
            # untouched subwindows keep unew's values via output aliasing
            input_output_aliases={1: 0, 2: 1, 6: 2, 7: 3},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(nd["sub_ids"], uw, u2b.reshape(n_sub, 8, 128), nd["mat"],
          nd["ssaf"], nd["table"], vh1, gh1)
        return out_w.reshape(shape), ub.reshape(-1), vh0, gh_new

    return update, node_data


# -------------------------------------------------------------- zplane mode
# Surfaces whose normal is the fastest (z) axis are strided by Nzp in flat
# order: one or two nodes per 1024-element subwindow.  Until round 2 they
# went through the tiled one-hot kernel, whose window stream re-reads and
# re-writes essentially the WHOLE grid once per step (floors/ceilings touch
# every window).  The z-plane partition removes that traffic entirely: nodes
# at a common (z, material) form a dense (x, y) plane, and the impedance ODE
# for a plane is evaluated INSIDE the fused stencil kernel while the slab is
# already resident in VMEM — the only extra HBM traffic is the branch states
# themselves ((x, MMb, y) blocks, node-proportional) plus a small per-plane
# ssaf sheet.  Lane extraction/insertion uses an iota==z mask (TPUs have no
# vector gather; a masked reduce over the resident block is ~1k VPU cycles).
# FCC parity holes and positions outside the room carry ssaf = 0, for which
# the pressure update is the exact identity.

ZPLANE_MIN_COUNT = int(os.environ.get("PFFDTD_ZPLANE_MIN_COUNT", "1024"))
# a plane streams full (Nxp, MMb, Nyp) state blocks regardless of fill, so
# the cost-relevant density is nodes / (Nxp*Nyp); floors/ceilings sit at
# 0.5-1.0 (FCC parity: 0.5), perimeter "rings" of x/y-normal walls at a
# given z are O(1/sqrt(area)) and must stay in the dense/tiled partitions
ZPLANE_MIN_DENSITY = float(os.environ.get("PFFDTD_ZPLANE_MIN_DENSITY",
                                          "0.05"))


@dataclass
class BoundaryZPlanes:
    """Host-built per-z-plane boundary data (single material per plane).

    Arrays are x-major — states (Nxp, P, MMb, Nyp), ssaf (Nxp, P, Nyp) — so
    the stencil kernel fetches ONE contiguous (TX, P, MMb, Nyp) block per
    x-row tile covering every plane at once.
    """

    P: int
    zp: np.ndarray       # (P,) int32 lane index of each plane (static)
    xlo: np.ndarray      # (P,) int32 first x row with a node
    xhi: np.ndarray      # (P,) int32 one past the last x row with a node
    ssaf: np.ndarray     # (Nxp, P, Nyw)  (y lane-padded to 128)
    coefs: np.ndarray    # (P, 5*MZ, Nyw): b|bd|bDh|bFh|beta rows,
    #                      replicated across the lane (y) dim; MZ = MMb
    #                      sublane-padded to 16 (HBM slices tile (8, 128))
    node_plane: np.ndarray  # plane id of each selected node
    node_x: np.ndarray
    node_y: np.ndarray

    @property
    def MZ(self):
        return self.coefs.shape[1] // 5

    def state_shape(self, Nxp):
        return (Nxp, self.P, self.MZ, self.ssaf.shape[2])


def partition_boundary_zplanes(bnl_ixyz, ssaf, mat_bnl, mat_coeffs,
                               grid_shape, dtype=np.float32,
                               min_count: int | None = None,
                               min_density: float | None = None,
                               true_shape=None):
    """Extract (z, material) groups dense enough for the in-kernel plane ODE.

    Returns (BoundaryZPlanes | None, selected_mask).  A group qualifies when
    it has >= min_count nodes covering >= min_density of the full (x, y)
    plane (the cost-relevant fill: state blocks stream at full plane width).
    """
    mc = (int(os.environ.get("PFFDTD_ZPLANE_MIN_COUNT", ZPLANE_MIN_COUNT))
          if min_count is None else min_count)
    md = (float(os.environ.get("PFFDTD_ZPLANE_MIN_DENSITY",
                               ZPLANE_MIN_DENSITY))
          if min_density is None else min_density)
    Nxp, Nyp, Nzp = grid_shape
    Nxt, Nyt, _ = true_shape or grid_shape  # density over TRUE extents
    bnl_ixyz = np.asarray(bnl_ixyz)
    iz = (bnl_ixyz % Nzp).astype(np.int32)
    iy = ((bnl_ixyz // Nzp) % Nyp).astype(np.int32)
    ix = (bnl_ixyz // (Nzp * Nyp)).astype(np.int32)

    sel = np.zeros(bnl_ixyz.size, bool)
    planes = []
    key = iz.astype(np.int64) * 256 + mat_bnl.astype(np.int64)
    for k in np.unique(key):
        m = key == k
        n = int(m.sum())
        if n < mc:
            continue
        if n < md * Nxt * Nyt:
            continue
        x0, x1 = int(ix[m].min()), int(ix[m].max()) + 1
        planes.append((int(k // 256), int(k % 256), x0, x1, m))
        sel |= m

    if not planes:
        return None, sel

    P = len(planes)
    # per-tile state DMA slices tile (8, 128) on the last two dims: the
    # branch dim pads to MZ=16 (zero coefficient rows are exact no-ops) and
    # the lane (y) extent to a 128 multiple
    MZ = -(-MMb // 8) * 8
    Nyw = -(-Nyp // 128) * 128
    # ssaf is 3-D: its plane dim sits in SUBLANES, so a (TX, P, W) DMA
    # slice needs P <= 8 or 8-aligned (Mosaic tiling); pad with ssaf=0
    # identity planes (the kernel only loops the true P)
    P8 = P if P <= 8 else -(-P // 8) * 8
    ssaf_pl = np.zeros((Nxp, P8, Nyw), dtype)
    # coefficient rows are per-plane CONSTANTS: store one 128-lane tile
    # and broadcast in-kernel (lane-replicating to plane width costs MBs
    # of VMEM at hall scale)
    coefs = np.zeros((P, 5 * MZ, 128), dtype)
    zp = np.zeros(P, np.int32)
    xlo = np.zeros(P, np.int32)
    xhi = np.zeros(P, np.int32)
    node_plane = np.full(bnl_ixyz.size, -1, np.int32)
    for p, (z, mat, x0, x1, m) in enumerate(planes):
        zp[p] = z
        xlo[p], xhi[p] = x0, x1
        ssaf_pl[ix[m], p, iy[m]] = ssaf[m]
        node_plane[m] = p
        pad = np.zeros(MZ - MMb)
        co = np.concatenate([mat_coeffs.b[mat], pad, mat_coeffs.bd[mat], pad,
                             mat_coeffs.bDh[mat], pad, mat_coeffs.bFh[mat],
                             pad, np.full(MMb, mat_coeffs.beta[mat]), pad])
        coefs[p] = co[:, None]
    bz = BoundaryZPlanes(P=P, zp=zp, xlo=xlo, xhi=xhi, ssaf=ssaf_pl,
                         coefs=coefs, node_plane=node_plane[sel],
                         node_x=ix[sel], node_y=iy[sel])
    return bz, sel


# ------------------------------------------------------- axis-plane families
# The temporally-blocked pair kernel (pallas_pair.py) fuses ALL lossy
# boundary work in-kernel, which requires every lossy node to live on an
# axis-normal plane dense enough to stream as a per-row state block:
#   z-planes: nodes at one (z, material) - lane-masked extraction (above);
#   y-planes: nodes at one (y, material) - STATIC sublane extraction;
#   x-planes: nodes at one (x, material) - the whole (y, z) row gets the
#             dense ODE with y-chunked state streaming (a full-row state
#             exceeds VMEM, so chunks round-trip HBM between the stages).
# Axis-aligned rooms partition completely; nodes left over (sloped/curved
# surfaces) are "strays" and force the single-step kernel + hybrid pass.


@dataclass
class BoundaryYPlanes:
    """Per-y-plane boundary data (single material per plane).

    States are x-major - (Nxp, P, MZ, W) - so the stencil kernel fetches
    one contiguous (TX, P, MZ, W) block per x-row tile.  W is the
    128-aligned z-window [z0, z0 + W) covering every selected node
    (lanes outside the union span carry no nodes, and the plane ODE is
    an exact identity on ssaf = 0 lanes, so the kernels only touch the
    window: at Musikverein scale the window cuts 17% of the y-family
    state DMA, VMEM and ODE vector work)."""

    P: int
    yp: np.ndarray       # (P,) int32 sublane (y) index of each plane
    ssaf: np.ndarray     # (Nxp, P, W)
    coefs: np.ndarray    # (P, 5*MZ, 128) b|bd|bDh|bFh|beta lane tile
    z0: int = 0          # first lane of the z-window (128-aligned)

    @property
    def MZ(self):
        return self.coefs.shape[1] // 5

    def state_shape(self, Nxp):
        return (Nxp, self.P, self.MZ, self.ssaf.shape[2])


@dataclass
class BoundaryXPlanes:
    """Per-x-plane boundary data (single material per plane).

    One x-plane covers the full (y, z) row at its grid row; states are
    (P, Nyp, MZ, Nzp) and stream through the kernel in CY-row y-chunks."""

    P: int
    xp: np.ndarray       # (P,) int32 x row of each plane
    ssaf: np.ndarray     # (P, Nyp, Nzp) ssaf sheets (y-chunk DMA slices
    #                      stay tile-aligned: CY and Nyp are 8-multiples)
    coefs: np.ndarray    # (P, 5*MZ, Nzp)
    CY: int = 64         # y-chunk rows per state DMA

    @property
    def MZ(self):
        return self.coefs.shape[1] // 5

    def state_shape(self, Nxp):
        P, Nyp, Nzp = self.ssaf.shape
        return (P, Nyp, self.MZ, Nzp)


@dataclass
class BoundaryPlanes:
    """Axis-plane partition consumed by the pair kernel."""

    z: "BoundaryZPlanes | None"
    y: BoundaryYPlanes | None
    x: BoundaryXPlanes | None
    n_stray: int         # lossy nodes NOT covered by any plane family
    stray_idx: np.ndarray | None = None  # their indices into the bnl arrays

    def state_bytes_per_row(self, itemsize=4, tb: int = 2):
        """VMEM scratch bytes per TX row for a TB-stage kernel.

        Per family: vh+gh level rings = 2 arrays x (tb+1) levels x 2
        slots, plus tb+1 ssaf slots (the pair kernel's 3-level/3-slot
        layout is the tb=2 instance, counted at its worst case)."""
        # the pair kernel (tb=2) stages the intermediate state level in
        # its output rings (no separate v1/g1 scratch); the TB kernel
        # still carries tb+1 levels
        copies = 4 * tb if tb == 2 else 4 * (tb + 1)
        nsf = tb + 1
        b = 0
        if self.z is not None:
            W = self.z.ssaf.shape[2]
            b += self.z.P * (copies * self.z.MZ * W + nsf * W) * itemsize
        if self.y is not None:
            W = self.y.ssaf.shape[2]
            b += self.y.P * (copies * self.y.MZ * W + nsf * W) * itemsize
        return b


def _plane_coefs(mat_coeffs, mats, MZ, W, dtype):
    """(P, 5*MZ, 128) b|bd|bDh|bFh|beta rows (one lane tile: the kernels
    broadcast from lane 0 - W is accepted for call-site compatibility)."""
    P = len(mats)
    W = 128
    out = np.zeros((P, 5 * MZ, W), dtype)
    pad = np.zeros(MZ - MMb)
    for p, mat in enumerate(mats):
        co = np.concatenate([
            mat_coeffs.b[mat], pad, mat_coeffs.bd[mat], pad,
            mat_coeffs.bDh[mat], pad, mat_coeffs.bFh[mat], pad,
            np.full(MMb, mat_coeffs.beta[mat]), pad])
        out[p] = co[:, None]
    return out


def partition_boundary_yplanes(bnl_ixyz, ssaf, mat_bnl, mat_coeffs,
                               grid_shape, dtype=np.float32,
                               min_count: int | None = None,
                               min_density: float | None = None,
                               true_shape=None):
    """Extract (y, material) groups dense enough for the in-kernel ODE.

    Returns (BoundaryYPlanes | None, selected_mask)."""
    mc = (int(os.environ.get("PFFDTD_ZPLANE_MIN_COUNT", ZPLANE_MIN_COUNT))
          if min_count is None else min_count)
    md = (float(os.environ.get("PFFDTD_ZPLANE_MIN_DENSITY",
                               ZPLANE_MIN_DENSITY))
          if min_density is None else min_density)
    Nxp, Nyp, Nzp = grid_shape
    bnl_ixyz = np.asarray(bnl_ixyz)
    iz = (bnl_ixyz % Nzp).astype(np.int32)
    iy = ((bnl_ixyz // Nzp) % Nyp).astype(np.int32)
    ix = (bnl_ixyz // (Nzp * Nyp)).astype(np.int32)

    sel = np.zeros(bnl_ixyz.size, bool)
    planes = []
    Nxt, _, Nzt = true_shape or grid_shape
    key = iy.astype(np.int64) * 256 + mat_bnl.astype(np.int64)
    for k in np.unique(key):
        m = key == k
        n = int(m.sum())
        if n < mc or n < md * Nxt * Nzt:
            continue
        planes.append((int(k // 256), int(k % 256), m))
        sel |= m
    if not planes:
        return None, sel

    P = len(planes)
    MZ = -(-MMb // 8) * 8
    P8 = P if P <= 8 else -(-P // 8) * 8   # see z-plane ssaf note
    # z-window: the union occupied lane span, 128-aligned (static slices
    # in the kernels stay vreg-aligned); only offered when Nzp itself is
    # lane-tiled so the upper clamp stays aligned
    z0, W = 0, Nzp
    if Nzp % 128 == 0 and sel.any():
        zmin = int(iz[sel].min())
        zmax = int(iz[sel].max())
        z0 = zmin // 128 * 128
        W = min(-(-(zmax + 1 - z0) // 128) * 128, Nzp - z0)
    ssaf_pl = np.zeros((Nxp, P8, W), dtype)
    yp = np.zeros(P, np.int32)
    for p, (y, mat, m) in enumerate(planes):
        yp[p] = y
        ssaf_pl[ix[m], p, iz[m] - z0] = ssaf[m]
    coefs = _plane_coefs(mat_coeffs, [m for _, m, _ in planes], MZ, W,
                         dtype)
    return BoundaryYPlanes(P=P, yp=yp, ssaf=ssaf_pl, coefs=coefs,
                           z0=z0), sel


def partition_boundary_xplanes(bnl_ixyz, ssaf, mat_bnl, mat_coeffs,
                               grid_shape, dtype=np.float32,
                               min_count: int | None = None,
                               min_density: float | None = None,
                               true_shape=None):
    """Extract (x, material) groups dense enough for the in-kernel ODE.

    Returns (BoundaryXPlanes | None, selected_mask)."""
    mc = (int(os.environ.get("PFFDTD_ZPLANE_MIN_COUNT", ZPLANE_MIN_COUNT))
          if min_count is None else min_count)
    md = (float(os.environ.get("PFFDTD_ZPLANE_MIN_DENSITY",
                               ZPLANE_MIN_DENSITY))
          if min_density is None else min_density)
    Nxp, Nyp, Nzp = grid_shape
    bnl_ixyz = np.asarray(bnl_ixyz)
    iz = (bnl_ixyz % Nzp).astype(np.int32)
    iy = ((bnl_ixyz // Nzp) % Nyp).astype(np.int32)
    ix = (bnl_ixyz // (Nzp * Nyp)).astype(np.int32)

    sel = np.zeros(bnl_ixyz.size, bool)
    planes = []
    _, Nyt, Nzt = true_shape or grid_shape
    key = ix.astype(np.int64) * 256 + mat_bnl.astype(np.int64)
    for k in np.unique(key):
        m = key == k
        n = int(m.sum())
        if n < mc or n < md * Nyt * Nzt:
            continue
        planes.append((int(k // 256), int(k % 256), m))
        sel |= m
    if not planes:
        return None, sel

    P = len(planes)
    MZ = -(-MMb // 8) * 8
    ssaf_pl = np.zeros((P, Nyp, Nzp), dtype)
    xp = np.zeros(P, np.int32)
    for p, (x, mat, m) in enumerate(planes):
        xp[p] = x
        ssaf_pl[p, iy[m], iz[m]] = ssaf[m]
    coefs = _plane_coefs(mat_coeffs, [m for _, m, _ in planes], MZ, Nzp,
                         dtype)
    cy = int(os.environ.get("PFFDTD_XPLANE_CY", "0")) or 64
    cy = max(8, min(-(-cy // 8) * 8, -(-Nyp // 8) * 8))
    return BoundaryXPlanes(P=P, xp=xp, ssaf=ssaf_pl, coefs=coefs,
                           CY=cy), sel


@dataclass
class BoundaryStrays:
    """Packed stray-node chunks for the IN-PAIR boundary pass.

    Lossy nodes not on any axis plane (sloped/curved geometry) are grouped
    by the pair kernel's x-row tile and, within a tile, by a static
    (row-window, y-window): chunk c holds <= TS nodes sharing window rows
    [r0[c], r0[c]+RW) x [y0[c], y0[c]+YW) of the resident output block.
    The kernel gathers node values from the block via exact one-hot MXU
    matmuls (3-way bf16 split; both transposed-contraction dot_general
    forms measured bit-exact on the v5e), runs the impedance ODE on the
    packed vectors, and scatters the delta back into the VMEM ring before
    the block's HBM flush - no HBM window stream at all.  States
    round-trip HBM between the pair's two stages (the x-plane pattern).
    Replaces the air/boundary stream split of gpu_engine.h:964-1056 for
    arbitrary geometry.

    Node-data rows of `nd` (f32, exact for values < 2^24): 0 = widx
    (rw*YW + y-y0), 1 = z lane, 2 = material, 3 = ssaf, 4 = valid.
    Padding nodes carry valid=0, mat=Nmat (the rigid all-zero column):
    their delta and states are forced to exactly 0 in-kernel.
    """

    n_chunks: int
    TS: int
    RW: int              # rows per window (1 or TX)
    YW: int              # y rows per window (multiple of 8)
    ZW: int              # z lanes per window (multiple of 128; may be Nzp)
    maxc: int            # max chunks owned by one tile (static loop bound)
    SEG: int             # chunks per state/nd DMA segment; the arrays are
    #                      padded by SEG rows so tail segments over-fetch
    nd: np.ndarray       # (n_chunks + SEG, 8, TS) f32 packed node data
    soff: np.ndarray     # (NXT + 1,) i32 chunk offset per x tile
    sr0: np.ndarray      # (n_chunks,) i32 window first row (within tile)
    sy0: np.ndarray      # (n_chunks,) i32 window first y (8-aligned)
    sz0: np.ndarray      # (n_chunks,) i32 window first z (128-aligned)
    tableT: np.ndarray   # (CR8, NmP) b|bd|bDh|bFh|beta coefficient ROWS,
    #                      one column per material (rigid = zeros)
    n_mats: int          # true column count Nmat+1 (incl. the rigid col)
    node_slot: np.ndarray  # (Nstray,) chunk*TS + lane of each input node

    @property
    def MZS(self):
        return -(-MMb // 8) * 8

    def state_shape(self):
        return (self.n_chunks + self.SEG, self.MZS, self.TS)


def _stray_chunk_cost(counts, TS, RW, YW, ZW):
    """Fitted per-step cost (us) of a chunking choice, per chunk:
    matmul-issue overhead + state DMA (~0.8 ns/slot at the 335 GB/s
    pallas plateau) + the exact-one-hot MXU MACs (gather K=3*WW stacked
    + scatter K=3*TS: single issues each) + the (ZW, TS) VPU z-resolve
    elementwise terms.  Recalibrated round 4: the VPU terms — not
    hidden overhead — were the old model's unexplained 'fixed' cost
    (MV: 5157 chunks at TS=512/RW=4/YW=32/ZW=128 predict 7.9 ms,
    measured 7.5; the all-stray box sweep rankings reproduce)."""
    nch = int(np.ceil(counts / TS).sum())
    mac_us = 9.0 * TS * RW * YW * ZW / 197e6
    vpu_us = 6.0 * ZW * TS / 1e6
    return nch * (0.35 + 0.0008 * TS + mac_us + vpu_us)


def _greedy_1d(gkey, coord, W, align, hi_clamp):
    """Per-group greedy fixed-width interval cover.

    Nodes sorted by coord within each gkey group are covered left to
    right by intervals [s, s+W) with s = the first uncovered coord
    floored to `align` (clamped to hi_clamp so the window stays in
    range).  Floating starts capture wall runs that straddle the
    aligned-block boundaries the old `coord // W * W` grouping cut at.
    Returns each node's interval start."""
    N = gkey.size
    out = np.zeros(N, np.int32)
    order = np.lexsort((coord, gkey))
    gk = gkey[order]
    cv = coord[order]
    bounds = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1]]) if N else \
        np.zeros(0, np.int64)
    bounds = np.r_[bounds, N]
    for a, b in zip(bounds[:-1], bounds[1:]):
        i = a
        while i < b:
            s = min(int(cv[i]) // align * align, hi_clamp)
            j = i + int(np.searchsorted(cv[i:b], s + W))
            out[order[i:j]] = s
            i = j
    return out


def partition_boundary_strays(bnl_ixyz, ssaf, mat_bnl, mat_coeffs,
                              grid_shape, TX: int, nxt: int,
                              dtype=np.float32,
                              ts: int | None = None, yw: int | None = None,
                              rw: int | None = None,
                              zw: int | None = None) -> BoundaryStrays:
    """Pack stray nodes into per-tile window chunks for the in-pair pass.

    bnl_ixyz must be the PADDED-layout flat indices of the stray subset.
    nxt: the pair kernel's tile count ceil((Nx-2)/TX).  (TS, RW, YW, ZW)
    are chosen by the cost model unless pinned via arguments /
    PFFDTD_STRAY_{TS,YW,RW,ZW} env knobs (the sharded engine pins all
    four so every shard's kernel shares one static kernel shape)."""
    Nxp, Nyp, Nzp = grid_shape
    bnl_ixyz = np.asarray(bnl_ixyz)
    N = bnl_ixyz.size
    iz = (bnl_ixyz % Nzp).astype(np.int32)
    iy = ((bnl_ixyz // Nzp) % Nyp).astype(np.int32)
    ix = (bnl_ixyz // (Nzp * Nyp)).astype(np.int32)
    t = (ix - 1) // TX                  # stage-1 tile owning the node
    r = ix - 1 - t * TX                 # row within the tile [0, TX)
    NXT = int(nxt)
    assert N == 0 or int(t.max()) < NXT, (int(t.max()), NXT)
    assert iz.size == 0 or int(iz.max()) < 2 ** 24   # f32-exact node data

    ts = ts or int(os.environ.get("PFFDTD_STRAY_TS", "0"))
    yw = yw or int(os.environ.get("PFFDTD_STRAY_YW", "0"))
    rw = rw or int(os.environ.get("PFFDTD_STRAY_RW", "0"))
    zw_env = zw or int(os.environ.get("PFFDTD_STRAY_ZW", "0"))

    def _wins(RW, YW, ZW):
        """Greedy per-tile window assignment (z intervals first, y
        intervals within each): returns each node's (ywin, zwin)."""
        tkey = t.astype(np.int64) * TX + (r if RW == 1 else 0)
        zz = (np.zeros(N, np.int32) if ZW >= Nzp else
              _greedy_1d(tkey, iz, ZW, 128, max(Nzp - ZW, 0)))
        yy = _greedy_1d(tkey * (1 << 20) + zz, iy, YW, 8,
                        max(Nyp - YW, 0))
        return yy, zz

    # sub-Nzp z windows need 128-aligned dynamic lane slices: only offer
    # them when Nzp itself is a multiple of 128 (so the tail clamp stays
    # aligned)
    zws = [min(zw_env, Nzp)] if zw_env else sorted(
        {Nzp} | ({z for z in (128, 256, 512) if z < Nzp}
                 if Nzp % 128 == 0 else set()))
    cand = []
    for RW in ([rw] if rw else sorted({1, TX})):
        for ZW in zws:
            for YW in ([yw] if yw else [16, 32, 64, 128]):
                if YW > Nyp:
                    continue
                yy, zz = _wins(RW, YW, ZW)
                key = ((t.astype(np.int64) * TX
                        + (r if RW == 1 else 0)) * (1 << 40)
                       + yy.astype(np.int64) * (1 << 20) + zz)
                _, counts = np.unique(key, return_counts=True)
                for TS in ([ts] if ts else [128, 256, 512, 1024, 2048]):
                    # the (ZW, TS) gather/scatter temporaries live on the
                    # Mosaic VMEM stack (~6 block-sized values) - cap them
                    if not ts and 6 * 4 * TS * ZW > 16 * 1024 * 1024:
                        continue
                    cand.append((_stray_chunk_cost(counts, TS, RW, YW, ZW),
                                 RW, YW, ZW, TS))
    if not cand:   # tiny Nyp: single full-height window per tile
        cand = [(0.0, rw or TX, Nyp, zw_env or Nzp, ts or 512)]
    _, RW, YW, ZW, TS = min(cand)

    ywin, zwin = _wins(RW, YW, ZW)
    key = ((t.astype(np.int64) * TX + (r if RW == 1 else 0)) * (1 << 40)
           + ywin.astype(np.int64) * (1 << 20) + zwin)
    order = np.lexsort((bnl_ixyz, key))
    ks = key[order]
    # chunk boundaries: new key group or TS-full (vectorised - the naive
    # per-node loop costs minutes at hall scale)
    if N:
        newg = np.r_[True, ks[1:] != ks[:-1]]
        gstart = np.maximum.accumulate(np.where(newg, np.arange(N), 0))
        cstart = newg | ((np.arange(N) - gstart) % TS == 0)
        cid = np.cumsum(cstart) - 1            # chunk id per sorted node
        starts = np.flatnonzero(cstart)
        ends = np.r_[starts[1:], N]
    else:
        cid = np.zeros(0, np.int64)
        starts = ends = np.zeros(0, np.int64)
    chunks = [(int(t[order[i]]), 0 if RW != 1 else int(r[order[i]]),
               int(ywin[order[i]]), int(zwin[order[i]]), slice(i, j))
              for i, j in zip(starts, ends)]
    n_chunks = max(1, len(chunks))

    Nm = mat_coeffs.b.shape[0] - 1
    CR8 = -(-(4 * MMb + 1) // 8) * 8
    NmP = -(-(Nm + 1) // 128) * 128
    tableT = np.zeros((CR8, NmP), dtype)
    tableT[0 * MMb:1 * MMb, :Nm + 1] = mat_coeffs.b.T
    tableT[1 * MMb:2 * MMb, :Nm + 1] = mat_coeffs.bd.T
    tableT[2 * MMb:3 * MMb, :Nm + 1] = mat_coeffs.bDh.T
    tableT[3 * MMb:4 * MMb, :Nm + 1] = mat_coeffs.bFh.T
    tableT[4 * MMb, :Nm + 1] = mat_coeffs.beta

    SEG = 4
    nd = np.zeros((n_chunks + SEG, 8, TS), np.float32)
    nd[:, 2, :] = Nm                      # padding -> rigid (zero) column
    soff = np.zeros(NXT + 1, np.int32)
    sr0 = np.zeros(n_chunks, np.int32)
    sy0 = np.zeros(n_chunks, np.int32)
    sz0 = np.zeros(n_chunks, np.int32)
    node_slot = np.zeros(N, np.int64)
    per_tile = np.zeros(NXT, np.int64)
    for c, (tc, r0, y0, z0, sl) in enumerate(chunks):
        per_tile[tc] += 1
        sr0[c] = r0
        sy0[c] = y0
        sz0[c] = z0
        o = order[sl]
        n = o.size
        assert 0 <= int((r[o] - r0).min()) and int((r[o] - r0).max()) < RW
        nd[c, 0, :n] = (r[o] - r0) * YW + (iy[o] - y0)
        nd[c, 1, :n] = iz[o] - z0
        nd[c, 2, :n] = mat_bnl[o]
        nd[c, 3, :n] = np.asarray(ssaf[o], np.float32)
        nd[c, 4, :n] = 1.0
        node_slot[o] = c * TS + np.arange(n)
    soff[1:] = np.cumsum(per_tile)
    assert soff[-1] == len(chunks) or not chunks
    maxc = int(per_tile.max()) if chunks else 0
    assert ZW == Nzp or (ZW % 128 == 0 and not np.any(sz0 % 128))
    return BoundaryStrays(n_chunks=n_chunks, TS=TS, RW=RW, YW=YW, ZW=ZW,
                          maxc=maxc, SEG=SEG, nd=nd, soff=soff, sr0=sr0,
                          sy0=sy0, sz0=sz0, tableT=tableT, n_mats=Nm + 1,
                          node_slot=node_slot)


def pad_strays(st: BoundaryStrays, n_chunks: int,
               maxc: int) -> BoundaryStrays:
    """Pad a stray partition to fleet-max static shapes (sharded SPMD:
    one kernel serves every shard, so chunk-array extents and the static
    chunk-loop bound must match across shards).

    Padding chunks are appended AFTER the real ones and never enter any
    tile's [soff[t], soff[t+1]) range — they are simply never processed;
    their nd rows keep the rigid-column template (valid = 0)."""
    from dataclasses import replace

    assert n_chunks >= st.n_chunks and maxc >= st.maxc
    if n_chunks == st.n_chunks and maxc == st.maxc:
        return st
    nd = np.zeros((n_chunks + st.SEG, 8, st.TS), np.float32)
    nd[:, 2, :] = st.n_mats - 1          # rigid (zero) material column
    nd[:st.n_chunks] = st.nd[:st.n_chunks]

    def _pad1(a):
        out = np.zeros(n_chunks, a.dtype)
        out[:st.n_chunks] = a
        return out

    return replace(st, n_chunks=n_chunks, maxc=maxc, nd=nd,
                   sr0=_pad1(st.sr0), sy0=_pad1(st.sy0), sz0=_pad1(st.sz0))


def partition_boundary_planes(bnl_ixyz, ssaf, mat_bnl, mat_coeffs,
                              grid_shape, dtype=np.float32,
                              true_shape=None,
                              demote_x: bool = False) -> BoundaryPlanes:
    """Greedy z -> y -> x axis-plane partition of the lossy boundary nodes.

    Each node joins the first family whose (coordinate, material) group
    passes the density thresholds; the leftover count is n_stray (> 0
    forces the engine off the pair kernel onto the hybrid path).

    demote_x: skip the x family and leave its nodes to the stray pass.
    The x-plane pass round-trips full (Nyp, MZ, Nzp) state sheets through
    HBM with inline waits and measured ~1.6 ms/plane/step on the real
    Musikverein (26 of 59 ms at PX=8, round-4 ablation) while the same
    nodes ride the segmented stray pipeline at ~0.6 ms TOTAL - when the
    scene already pays for the stray pass, dense x rows belong there."""
    bnl_ixyz = np.asarray(bnl_ixyz)
    ssaf = np.asarray(ssaf)
    mat_bnl = np.asarray(mat_bnl)
    z, zsel = partition_boundary_zplanes(
        bnl_ixyz, ssaf, mat_bnl, mat_coeffs, grid_shape, dtype=dtype,
        true_shape=true_shape)
    r = ~zsel
    y, ysel = partition_boundary_yplanes(
        bnl_ixyz[r], ssaf[r], mat_bnl[r], mat_coeffs, grid_shape, dtype=dtype,
        true_shape=true_shape)
    r2 = np.where(r)[0][~ysel]
    if demote_x:
        return BoundaryPlanes(z=z, y=y, x=None, n_stray=int(r2.size),
                              stray_idx=r2)
    x, xsel = partition_boundary_xplanes(
        bnl_ixyz[r2], ssaf[r2], mat_bnl[r2], mat_coeffs, grid_shape,
        dtype=dtype, true_shape=true_shape)
    stray_idx = r2[~xsel]
    return BoundaryPlanes(z=z, y=y, x=x, n_stray=int(stray_idx.size),
                          stray_idx=stray_idx)


# --------------------------------------------------------------- hybrid mode
# Remaining nodes split by subwindow fill: clustered nodes (x/y-normal
# walls: contiguous z-runs) take the gather-free dense kernel, sparse
# stragglers take the one-hot tiled kernel.

MIN_FILL = int(os.environ.get("PFFDTD_BOUNDARY_MIN_FILL", "96"))


@dataclass
class BoundaryHybrid:
    dense: BoundaryDense | None
    tiles: BoundaryTiles | None
    zplanes: BoundaryZPlanes | None = None
    Nxp: int = 0  # grid x extent (z-plane state shape)

    def state_shapes(self):
        """(vh/gh shapes, u2b sizes) keyed like the runtime pytrees.

        z-plane states carry no packed u2b: the stencil kernel reads
        u^{n-1} at the plane lanes straight from the resident u0 block."""
        vh = {}
        u2b = {}
        if self.dense is not None:
            vh["d"] = (self.dense.n_sub, MMb, SUBW)
            u2b["d"] = (self.dense.n_sub * SUBW,)
        if self.tiles is not None:
            # (n_tiles, MMb, T): tile-major so manual DMA rings can slice
            # whole tiles on dim 0 (a lane-offset slice of the old
            # (MMb, N) layout is not a legal Mosaic DMA); the sublane pad
            # 12->16 costs the same either way
            vh["t"] = (self.tiles.n_tiles, MMb, self.tiles.T)
            u2b["t"] = (self.tiles.n_tiles * self.tiles.T,)
        if self.zplanes is not None:
            vh["z"] = self.zplanes.state_shape(self.Nxp)
        return vh, u2b


def _pad_tiles_to(bt: BoundaryTiles, n_tiles: int, dtype) -> BoundaryTiles:
    """Extend a tile set with benign padding tiles (fleet-lockstep)."""
    add = n_tiles - bt.n_tiles
    if add <= 0:
        return bt
    T = bt.rows.size // bt.n_tiles
    Nm = bt.table.shape[0] - 1
    return BoundaryTiles(
        n_tiles=n_tiles,
        win_ids=np.r_[bt.win_ids,
                      np.full(add, bt.win_ids[-1], np.int32)],
        first=np.r_[bt.first, np.zeros(add, np.int32)],
        rows=np.r_[bt.rows, np.zeros(add * T, np.int32)],
        lanes=np.r_[bt.lanes, np.zeros(add * T, np.int32)],
        ssaf=np.r_[bt.ssaf, np.zeros(add * T, dtype)],
        mat=np.r_[bt.mat, np.full(add * T, Nm, np.int32)],
        table=bt.table, n_windows=bt.n_windows,
        node_slot=bt.node_slot, T=bt.T, wr=bt.wr)


def partition_boundary_hybrid(bnl_ixyz, ssaf, mat_bnl, mat_coeffs,
                              n_elements, dtype=np.float32,
                              min_fill: int | None = None,
                              pad_sub: int | None = None,
                              pad_tiles: int | None = None,
                              force_both: bool = False,
                              t_wr: tuple[int, int] | None = None,
                              grid_shape: tuple[int, int, int] | None = None,
                              ) -> BoundaryHybrid:
    """Split nodes into z-plane + dense + tiled partitions.

    grid_shape (Nxp, Nyp, Nzp) enables the z-plane extraction (fused into
    the stencil kernel); without it the round-1 dense/tiled split runs
    unchanged (the sharded engines use that form for fleet lockstep).
    pad_sub / pad_tiles / force_both / t_wr keep multiple shards in kernel
    lockstep: every shard runs both kernels with fleet-max static shapes.
    min_fill=None jointly optimizes the split threshold AND the tiled
    kernel's (T, WR) against the fitted cost model (choose_hybrid_split);
    both can be pinned via min_fill / t_wr or the env knobs."""
    zplanes = None
    Nxp = 0
    if grid_shape is not None and bnl_ixyz.size:
        Nxp = int(grid_shape[0])
        zplanes, zsel = partition_boundary_zplanes(
            bnl_ixyz, ssaf, mat_bnl, mat_coeffs, grid_shape, dtype=dtype)
        if zplanes is not None:
            bnl_ixyz = bnl_ixyz[~zsel]
            ssaf = ssaf[~zsel]
            mat_bnl = mat_bnl[~zsel]
    if not bnl_ixyz.size and zplanes is not None and not (pad_sub or
                                                          pad_tiles or
                                                          force_both):
        return BoundaryHybrid(dense=None, tiles=None, zplanes=zplanes,
                              Nxp=Nxp)
    if min_fill is None:
        mf, auto_twr = choose_hybrid_split([bnl_ixyz], n_elements)
        if t_wr is None:
            t_wr = auto_twr
    else:
        mf = min_fill
    dense_mask = split_dense_mask(bnl_ixyz, mf)

    bdense = None
    if dense_mask.any() or pad_sub or force_both:
        bdense = partition_boundary_dense(
            bnl_ixyz[dense_mask], ssaf[dense_mask], mat_bnl[dense_mask],
            mat_coeffs, n_elements, dtype=dtype, pad_sub=pad_sub)

    btiles = None
    tm = ~dense_mask
    T = wr = None
    if t_wr is not None:
        T, wr = t_wr
    elif tm.any():
        T, wr = choose_tile_params([bnl_ixyz[tm]], n_elements)
    if tm.any():
        btiles = partition_boundary(bnl_ixyz[tm], ssaf[tm], mat_bnl[tm],
                                    mat_coeffs, n_elements, dtype=dtype,
                                    T=T, wr=wr)
    elif pad_tiles or force_both:
        Nm = mat_coeffs.b.shape[0] - 1
        btiles = partition_boundary(
            np.array([0], np.int64), np.zeros(1, dtype),
            np.full(1, Nm, np.int32), mat_coeffs, n_elements, dtype=dtype,
            T=T, wr=wr)
    if btiles is not None and pad_tiles:
        btiles = _pad_tiles_to(btiles, pad_tiles, dtype)
    return BoundaryHybrid(dense=bdense, tiles=btiles, zplanes=zplanes,
                          Nxp=Nxp)


def build_boundary_hybrid(bh: BoundaryHybrid, sc, n_elements,
                          dtype=jnp.float32, interpret: bool = False,
                          ring: bool | None = None):
    """Returns (update, node_data): update(unew, u2b, vh1, gh1, nd) ->
    (unew', u2b_new, vh0, gh_new) where u2b/vh/gh are {"d": ..., "t": ...}
    pytrees matching bh.state_shapes().

    ring: use the manual deep-DMA-ring tiled kernel (bit-identical math;
    ~5x the window-stream bandwidth of the depth-2 auto pipeline).
    Default on; PFFDTD_BOUNDARY_RING=0 reverts to the auto pipeline."""
    if ring is None:
        ring = os.environ.get("PFFDTD_BOUNDARY_RING", "1") == "1"
    upd_d = upd_t = None
    node_data = {}
    if bh.dense is not None:
        upd_d, node_data["d"] = build_boundary_dense(
            bh.dense, sc, n_elements, dtype=dtype, interpret=interpret)
    if bh.tiles is not None:
        build_t = build_boundary_ring if ring else build_boundary_update
        upd_t, node_data["t"] = build_t(
            bh.tiles, sc, n_elements, dtype=dtype, interpret=interpret)

    def update(unew, u2b, vh1, gh1, nd):
        ub, vh0, gh_new = {}, {}, {}
        if upd_d is not None:
            unew, ub["d"], vh0["d"], gh_new["d"] = upd_d(
                unew, u2b["d"], vh1["d"], gh1["d"], nd["d"])
        if upd_t is not None:
            unew, ub["t"], vh0["t"], gh_new["t"] = upd_t(
                unew, u2b["t"], vh1["t"], gh1["t"], nd["t"])
        return unew, ub, vh0, gh_new

    return update, node_data
