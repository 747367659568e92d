"""Routed CSR SpMV: a Pallas kernel for *unstructured* sparse matrices.

Why this shape (measured on TPU v5e, see docs/performance.md):

- XLA 1-D gather/scatter serialise (~0.13 Gelem/s) — any ``x[colind]``
  formulation is ~500x off the HBM roofline.
- Inside Pallas, ``tpu.dynamic_gather`` is *shape-preserving*: lane
  gathers (``take_along_axis(src, idx, axis=1)`` with src/idx/out all
  ``(S,128)``) run at ~306 Gelem/s, (128,128) transposes are nearly
  free, and cross-vreg sublane gathers are unsupported.

So the kernel never chases pointers. A **host-built routing plan**
(one-time per structure, cached) decomposes the arbitrary ``x[col]``
access pattern into shape-preserving primitives only:

1. Columns are split into **slices** of 16384; slice ``x`` lives as a
   ``(128,128)`` tile ``X2`` (source row ``rr`` = column window, lane
   ``lc`` = position in window).
2. Rows are packed into a row-ELL dest tile ``(512,128)`` per grid
   step: sublane group ``k`` of ``R = 512/K`` sublanes holds the k-th
   routed entry of ``R*128`` consecutive rows (lane = row % 128).
3. Per (128,128) dest block, the route ``X2[rr, lc] -> slot (sdb, l)``
   is the classic 2-corner-turn network::

       H  = take(X2, F1, axis=1)      # H[rr, m]  = X2[rr, F1[rr, m]]
       S  = take(H.T, F2, axis=1)     # S[m, sdb] = H[F2[m,sdb], m]
       Z  = take(S.T, F3, axis=1)     # Z[sdb, l] = S[F3[sdb,l], sdb]

   where the intermediate lane ``m`` per request is a plan-time edge
   coloring (per dest row: distinct m; per (source row, m): a single
   payload — duplicates may share, giving free fan-out/multicast).
4. ``P = Z * VALS`` (values pre-laid-out in dest ELL order, pads = 0)
   and ``y_block = sum_k P[k*R:(k+1)*R]`` (static slices, VPU adds).
5. The grid is ``(T steps, S slices)``; the output block revisits the
   same ``y`` rows across slices and accumulates in VMEM.

Entries that cannot be routed (rows wider than K, coloring overflow on
adversarial structures) are returned as a COO *spill* added via the
XLA path; plans report ``spill_frac`` so dispatch can bail out.

Reference scope: SpMV is absent from the reference (intent only,
``csr.rs:16-17``); this is north-star N1 for unstructured matrices.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["RoutePlan", "build_route_plan", "route_spmv", "route_spmm",
           "simulate_route"]

_LANE = 128
_BLK = 128                  # rows per block == windows per slice
_HMAX = 512                 # max dest tile sublanes (H = K * R per plan;
                            # spill levels use shorter pages, r4)
_SLICE_COLS = _BLK * _LANE  # 16384 columns per slice
_MAX_TABLE_BYTES = 2 << 30


@dataclass(eq=False)  # identity hash: plans are jit-static
class RoutePlan:
    """Host-built routing tables for one CSR structure.

    The three stage tables are byte-packed into one int32 plane
    (``FP = F1 | F2<<8 | F3<<16``; every entry is a lane index < 128)
    so the streamed table traffic is 8 B/slot (4 B routing + 4 B value)
    instead of 16 B — the difference between a ~55 % and a >100 %
    ceiling against the 12 B/nnz CSR roofline line.
    """

    nrows: int
    ncols: int
    K: int                  # ELL width (routed entries per row per slice)
    R: int                  # sublanes per k-group (= 512 // K)
    T: int                  # row steps
    S: int                  # column slices
    RPP: int                # rows used per page (<= R*128; load slack)
    H: int                  # dest tile sublanes (= K * R; <= 512)
    FP: jax.Array           # (T*S, 512, 128) i32 — packed F1|F2<<8|F3<<16
    val_slot: np.ndarray    # (n_routed,) flat index into VALS per entry
    val_src: np.ndarray     # (n_routed,) original-values index per entry
    vrow_src: np.ndarray    # (n_virtual,) real row of each virtual row
    spill: Tuple[np.ndarray, np.ndarray, np.ndarray]  # rows, cols, src
    spill_frac: float
    nnz: int
    spill_plan: "RoutePlan | None" = None  # recursive plan for spill
    compact_src: np.ndarray = None  # row-compacted level: orig row per
                                    # compact row (partials merge back
                                    # through the top merge_plan)
    nrows_full: int = 0             # original row-space size (== nrows
                                    # unless this level is compacted)
    # active-page packing (r5): when set, FP/VALS hold only the active
    # pages and these arrays drive the 1-D prefetch grid
    pk_t: np.ndarray = None         # (P,) i32 dest step per page
    pk_s: np.ndarray = None         # (P,) i32 source slice per page
    pk_first: np.ndarray = None     # (P,) i32 1 on first page of step
    merge_plan: "RoutePlan | None" = None  # top level only: routes the
                                           # concatenated partials into y
    G: int = 1              # slice-group degree (r5b): packed pages
                            # stack G source slices; slot slice-select
                            # rides table bits 24-26
    default_values: np.ndarray = None  # values passed at build time
    rows_np: np.ndarray = None   # (nnz,) entry row ids (top level only)
    cols_np: np.ndarray = None   # (nnz,) entry col ids (top level only)
    _baked: dict = None     # id(values) -> (values ref, VALS) bake cache

    def bake(self, values) -> jax.Array:
        """VALS table for concrete ``values`` (host scatter, cached).

        Values live separately from the routing structure so
        ``with_values`` updates and grad-through-values reuse the plan
        (VERDICT r1 item 6)."""
        if self._baked is None:
            object.__setattr__(self, "_baked", {})
        hit = self._baked.get(id(values))
        if hit is not None and hit[0] is values:
            return hit[1]
        v = np.zeros(self.n_pages * self.H * _LANE, np.float32)
        v[self.val_slot] = np.asarray(values, np.float32)[self.val_src]
        # committed constant, NOT trace-scoped: bake() may first run
        # inside a caller's jit trace (e.g. the merge plan's ones) and
        # the cached table must outlive that trace
        with jax.ensure_compile_time_eval():
            VALS = jnp.asarray(v.reshape(self.n_pages, self.H, _LANE))
        if len(self._baked) >= 4:
            self._baked.pop(next(iter(self._baked)))
        self._baked[id(values)] = (values, VALS)
        return VALS

    def device_vals(self, values: jax.Array) -> jax.Array:
        """VALS table from (possibly traced) values — one device
        scatter whose transpose is a gather, so grads are cheap."""
        v = values.astype(jnp.float32)[jnp.asarray(self.val_src)]
        flat = jnp.zeros(self.n_pages * self.H * _LANE, jnp.float32)
        flat = flat.at[jnp.asarray(self.val_slot)].set(v)
        return flat.reshape(self.n_pages, self.H, _LANE)

    @property
    def rows_per_step(self) -> int:
        return self.R * _LANE

    @property
    def n_pages(self) -> int:
        return int(self.FP.shape[0])

    @property
    def packed(self) -> bool:
        return self.pk_t is not None

    @property
    def table_bytes(self) -> int:
        return self.n_pages * int(self.H) * _LANE * 8

    @property
    def xla_resid_frac(self) -> float:
        """Fraction of the TOP-level nnz that falls through every
        routed tier onto the XLA gather/scatter residual path — the
        dispatch-quality metric (top-level ``spill_frac`` counts
        recursively ROUTED entries too, r5)."""
        resid = 0
        p = self
        while p is not None:
            if p.spill_plan is None:
                resid += p.spill[0].size
            p = p.spill_plan
        return float(resid / max(self.nnz, 1))

    # unpacked views (host/test convenience; the kernel unpacks in-register)
    @property
    def F1(self) -> jax.Array:
        return self.FP & 0xFF

    @property
    def F2(self) -> jax.Array:
        return (self.FP >> 8) & 0xFF

    @property
    def F3(self) -> jax.Array:
        return (self.FP >> 16) & 0xFF


def _color_requests(grp, forb, share, rng, iters=48):
    """Vectorised Las-Vegas edge coloring (bulk phase).

    Returns (m, bad): colors in [0,128) with
      - distinct m among equal ``grp`` (dest row slots), and
      - equal ``share`` among equal ``(forb, m)`` (payload sharing).
    Slots still conflicting after ``iters`` rounds are flagged ``bad``
    and handed to the exact repair pass.
    """
    n = grp.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    m = rng.integers(0, _LANE, size=n).astype(np.int64)

    def conflicts(m):
        bad = np.zeros(n, bool)
        k1 = grp * _LANE + m
        o = np.argsort(k1, kind="stable")
        s = k1[o]
        d = np.concatenate([[False], s[1:] == s[:-1]])
        bad[o[d]] = True
        k2 = forb * _LANE + m
        o2 = np.lexsort((share, m, forb))
        s2, sh2 = k2[o2], share[o2]
        new = np.concatenate([[True], s2[1:] != s2[:-1]])
        run = np.cumsum(new) - 1
        first_share = sh2[np.flatnonzero(new)][run]
        bad[o2[sh2 != first_share]] = True
        return bad

    n_prev = n + 1
    for _ in range(iters):
        bad = conflicts(m)
        nb = int(bad.sum())
        if nb == 0:
            return m, bad
        if nb * 400 < n or nb >= n_prev:  # converged enough / stalled
            break
        n_prev = nb
        m[bad] = rng.integers(0, _LANE, size=nb)
    return m, conflicts(m)


def _repair_colors(grp, forb, share, m, bad):
    """Exact repair of residual conflicts via alternating-path
    recoloring (bipartite edge coloring, Konig-style chains).

    Panels (distinct ``grp >> 7``... callers pass grp = panel*128+sdb,
    forb = panel*128+rr with a shared panel id, so grp//128 == forb//128
    == panel). State per panel: occupancy arrays (128 x 128).
    Returns updated (m, ok).
    """
    ok = ~bad
    if not bad.any():
        return m, ok
    panels_bad = np.unique(grp[bad] // _BLK)
    panel_of = grp // _BLK
    sel_panel = np.isin(panel_of, panels_bad)
    idxs = np.flatnonzero(sel_panel)
    order = np.argsort(panel_of[idxs], kind="stable")
    idxs = idxs[order]
    bounds = np.searchsorted(panel_of[idxs], panels_bad)
    bounds = np.append(bounds, idxs.size)

    for pi, panel in enumerate(panels_bad):
        ids = idxs[bounds[pi]:bounds[pi + 1]]
        g_l = (grp[ids] % _BLK).astype(np.int64)
        f_l = (forb[ids] % _BLK).astype(np.int64)
        sh_l = share[ids]
        m_l = m[ids].copy()
        good_l = ok[ids].copy()
        # occupancy: gcol[g, c] = local edge id or -1
        gcol = np.full((_BLK, _LANE), -1, np.int64)
        fcol = np.full((_BLK, _LANE), -1, np.int64)
        fpay = np.full((_BLK, _LANE), -1, np.int64)
        fcnt = np.zeros((_BLK, _LANE), np.int64)
        gl = np.flatnonzero(good_l)
        gcol[g_l[gl], m_l[gl]] = gl
        fcol[f_l[gl], m_l[gl]] = gl
        fpay[f_l[gl], m_l[gl]] = sh_l[gl]
        np.add.at(fcnt, (f_l[gl], m_l[gl]), 1)

        for e in np.flatnonzero(~good_l):
            g, f, p = int(g_l[e]), int(f_l[e]), int(sh_l[e])
            placed = False
            # 1) free-free or share
            for c in range(_LANE):
                if gcol[g, c] != -1:
                    continue
                if fcnt[f, c] == 0 or fpay[f, c] == p:
                    m_l[e] = c
                    gcol[g, c] = e
                    if fcnt[f, c] == 0:
                        fcol[f, c], fpay[f, c] = e, p
                    fcnt[f, c] += 1
                    good_l[e] = True
                    placed = True
                    break
            if placed:
                continue
            # 2) alternating chain: a free at g, b free at f
            afree = np.flatnonzero(gcol[g] == -1)
            bfree = np.flatnonzero(fcnt[f] == 0)
            for a in afree[:24]:
                if placed:
                    break
                for b in bfree[:24]:
                    # follow chain from f along colors a/b
                    chain = []
                    node_is_f, node, want = True, f, int(a)
                    okc = True
                    while True:
                        if node_is_f:
                            e2 = fcol[node, want]
                            if fcnt[node, want] == 0:
                                break
                            if e2 == -1 or fcnt[node, want] > 1:
                                okc = False  # shared/pinned cell
                                break
                            chain.append(e2)
                            node, node_is_f = int(g_l[e2]), False
                            want = int(b if want == a else a)
                        else:
                            e2 = gcol[node, want]
                            if e2 == -1:
                                break
                            # flipping e2 vacates its f-cell; invalid
                            # if that cell is shared with other edges
                            if fcnt[f_l[e2], m_l[e2]] != 1:
                                okc = False
                                break
                            chain.append(e2)
                            node, node_is_f = int(f_l[e2]), True
                            want = int(b if want == a else a)
                        if len(chain) > 4 * _LANE:
                            okc = False
                            break
                    if not okc:
                        continue
                    # flip chain colors a<->b
                    for e2 in chain:
                        c_old = int(m_l[e2])
                        c_new = int(b if c_old == a else a)
                        g2, f2, p2 = (int(g_l[e2]), int(f_l[e2]),
                                      int(sh_l[e2]))
                        gcol[g2, c_old] = -1
                        fcol[f2, c_old] = -1
                        fpay[f2, c_old] = -1
                        fcnt[f2, c_old] = 0
                        m_l[e2] = c_new
                    for e2 in chain:
                        c_new = int(m_l[e2])
                        g2, f2, p2 = (int(g_l[e2]), int(f_l[e2]),
                                      int(sh_l[e2]))
                        gcol[g2, c_new] = e2
                        fcol[f2, c_new] = e2
                        fpay[f2, c_new] = p2
                        fcnt[f2, c_new] = 1
                    # now color a is free at f (chain moved it away)
                    if gcol[g, a] == -1 and fcnt[f, a] == 0:
                        m_l[e] = a
                        gcol[g, a] = e
                        fcol[f, a], fpay[f, a] = e, p
                        fcnt[f, a] = 1
                        good_l[e] = True
                        placed = True
                        break
            # else: spill (stays not-ok)
        m[ids] = m_l
        ok[ids] = good_l
    return m, ok


_TARGET_LOAD = 0.88     # coloring load ceiling (slack pages beyond)
_VROW_COST = 0.006      # XLA scatter-add cost per virtual row, in
                        # units of one (512,128) table page
_HEAVY_FACTOR = 4       # rows wider than _HEAVY_FACTOR*K use vrows
_SPILL_CALL = 3.0       # fixed cost of the extra spill pallas call
                        # (page units; launch + output add glue)
_COMPACT_MAX = 16384    # spill levels with <= this many distinct rows
                        # re-index rows densely (T_rows = 1 at K=4);
                        # their partials merge back through ONE routed
                        # merge call


def _page_geometry(K: int, H: int, nrows_tot: int, nnz: int, S: int):
    """(T, RPP): pages per slice and rows used per page.

    T covers all (real+virtual) rows AND keeps average slot load under
    ``_TARGET_LOAD`` (dense packing makes the edge coloring infeasible
    — per-source-row request counts overflow the 128 colors).
    """
    R = H // K
    cap = R * _LANE
    T_rows = -(-nrows_tot // cap)
    T_load = -(-nnz // max(1, int(_TARGET_LOAD * S * H * _LANE)))
    T = max(1, T_rows, T_load)
    RPP = min(cap, -(-nrows_tot // T // _LANE) * _LANE)
    RPP = max(RPP, _LANE)
    T = max(1, -(-nrows_tot // RPP))
    return T, RPP


def _tail_cost(gcounts: np.ndarray, S: int, nrows_bound: int,
               depth: int) -> float:
    """Estimated cost (in page units) of draining these per-(row,
    slice) leftover counts through the recursive spill chain.

    A flat per-entry constant (r4) mispriced the chain both ways —
    spill levels are row-coverage-bound at low density and chain-depth
    -bound at small K — so this recurses the actual geometry: each
    candidate K pays its pages + call fixed cost + the cost of ITS
    leftover, with row compaction below ``_COMPACT_MAX`` (r5)."""
    total = int(gcounts.sum())
    if total == 0:
        return 0.0
    if total < 256 or depth > 3:
        return total * _VROW_COST      # XLA residual path
    best = None
    ngroups = int((gcounts > 0).sum())
    nrows_eff = min(nrows_bound, ngroups)
    for K, H in ((1, 512), (2, 512), (4, 512), (8, 512)):
        R = H // K
        T_rows = -(-nrows_eff // (R * _LANE))
        over = np.maximum(gcounts - K, 0)
        n_over = int(over.sum())
        routed = total - n_over
        T_load = -(-routed // max(1, int(_TARGET_LOAD * S * H * _LANE)))
        T = max(1, T_rows, T_load)
        c = (T * S * (H / 512.0) + _SPILL_CALL
             + _tail_cost(over[over > 0], S, nrows_eff, depth + 1))
        if best is None or c < best:
            best = c
    return best


def _choose_K(maxcnt_per_row: np.ndarray, nrows: int, S: int,
              nnz: int, gcounts: np.ndarray, grows: np.ndarray,
              depth: int, n_active: int | None = None) -> int:
    """Pick the ELL width minimising table pages + overflow cost.

    Overflow beyond K per (row, slice) has two exits (r4 redesign —
    the ELL load cap *is* the mean/max count ratio, so shrinking K
    below the max is the main lever on table pages):

    - at depth 0, *heavy* rows (wider than ``_HEAVY_FACTOR*K`` per
      slice) absorb overflow in virtual rows — one XLA scatter-add
      element per vrow;
    - everything else spills to the *recursive routed plan*, whose
      marginal cost per entry is tiny but which pays one extra
      pallas-call dispatch.

    Spill levels (depth >= 1) never use virtual rows (r5: the vrow
    cost model poisoned K=1/K=2 choices, forcing narrow-R pages whose
    row-coverage floor dominated the measured chain — three spill
    calls cost 99 us of a 143 us SpMV). ``n_active`` is the number of
    distinct rows when the level is row-compacted.
    """
    if maxcnt_per_row.size == 0 or maxcnt_per_row.max() == 0:
        return 1, 128
    rows_eff = nrows if n_active is None else n_active
    best, bestK, bestH = None, 1, _HMAX
    for H in (128, 256, 512):
        K = 1
        while K <= H and H // K >= 8:  # R >= 8 (sublane alignment)
            if depth == 0:
                heavy = maxcnt_per_row > _HEAVY_FACTOR * K
                nvr = int(((np.maximum(maxcnt_per_row[heavy], 1) - 1)
                           // K).sum())
                light_g = ~heavy[grows]
                leftover = np.maximum(gcounts[light_g] - K, 0)
            else:
                nvr = 0
                leftover = np.maximum(gcounts - K, 0)
            over = int(leftover.sum())
            if depth >= 3:
                # last recursion level: no further spill plan — overflow
                # pays the slow XLA scatter per entry
                cost_over = over * _VROW_COST
            else:
                cost_over = _tail_cost(leftover[leftover > 0], S,
                                       rows_eff, depth + 1)
            T, _ = _page_geometry(K, H, rows_eff + nvr, nnz - over, S)
            # page cost scales with its height (DMA + vreg ops)
            cost = T * S * (H / 512.0) + nvr * _VROW_COST + cost_over
            if best is None or cost <= best:  # ties -> larger K
                best, bestK, bestH = cost, K, H
            K *= 2
    return bestK, bestH


def _color_all(grp, forb, share, rng):
    """Color all requests: native first-fit+chain repair when the C++
    library is available (fast path), NumPy Las-Vegas + Python chains
    otherwise. Returns (m, ok)."""
    from ...native import lib as native

    if grp.size and native.available():
        panel = grp // _BLK
        order = np.argsort(panel, kind="stable")
        panels, starts = np.unique(panel[order], return_index=True)
        panel_ptr = np.append(starts, grp.size).astype(np.int64)
        m_s, ok_s = native.route_color(
            panel_ptr, grp[order] % _BLK, forb[order] % _BLK, share[order])
        m = np.empty(grp.size, np.int64)
        ok = np.empty(grp.size, bool)
        m[order] = m_s
        ok[order] = ok_s
        return m, ok
    m, bad = _color_requests(grp, forb, share, rng)
    return _repair_colors(grp, forb, share, m, bad)


def build_route_plan(rowptr, colind, values, nrows, ncols,
                     seed: int = 0, _depth: int = 0,
                     _entry_src=None, _compact_ok: bool = True
                     ) -> "RoutePlan":
    """Build the routing plan on host (NumPy). O(nnz) vectorised plus
    an exact repair pass on residual coloring conflicts. Spilled
    entries large enough to matter get their own (recursive) plan.

    The plan is pure structure: values enter only through
    ``val_slot``/``val_src`` (and the ``default_values`` convenience
    reference), so one plan serves any values over the same sparsity.
    ``_entry_src`` maps this (sub)structure's entries back to the
    original value array (used by the recursive spill plans)."""
    rowptr = np.asarray(rowptr, dtype=np.int64)
    colind = np.asarray(colind, dtype=np.int64)
    values = np.asarray(values)
    nnz = int(rowptr[-1])
    colind, values = colind[:nnz], values[:nnz]
    entry_src = (np.arange(nnz, dtype=np.int64) if _entry_src is None
                 else np.asarray(_entry_src, dtype=np.int64))
    rng = np.random.default_rng(seed)

    S = max(1, -(-ncols // _SLICE_COLS))
    nrows_orig = nrows
    rows = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(rowptr))
    orig_rows = rows
    compact_src = None
    if _depth >= 1 and nnz and _compact_ok:
        # row compaction (r5): a sparse spill level re-indexes its
        # distinct rows densely so page count follows the ACTIVE row
        # count, not nrows; the partial sums merge back into y through
        # one routed merge call built at the top level.
        uniq = np.unique(rows)
        if uniq.size <= _COMPACT_MAX:
            compact_src = uniq
            remap = np.zeros(nrows, np.int64)
            remap[uniq] = np.arange(uniq.size)
            rows = remap[rows]
            nrows = int(uniq.size)
    sl = colind // _SLICE_COLS

    # per-(row, slice-group) rank: entries are sorted by (row, col)
    # hence by (row, group) — rank within group = running index. With
    # G = 1 a group is a single slice (the r1-r4 layout).
    def _group_stats(slk, stride):
        key = rows * stride + slk
        if nnz:
            new = np.concatenate([[True], key[1:] != key[:-1]])
            gstart = np.flatnonzero(new)
            run = np.cumsum(new) - 1
            kpos = np.arange(nnz, dtype=np.int64) - gstart[run]
            gcounts = np.diff(np.append(gstart, nnz))
            grows = rows[gstart]
            maxcnt_per_row = np.zeros(nrows, np.int64)
            np.maximum.at(maxcnt_per_row, grows, gcounts)
        else:
            kpos = np.zeros(0, np.int64)
            gcounts = np.zeros(0, np.int64)
            grows = np.zeros(0, np.int64)
            maxcnt_per_row = np.zeros(nrows, np.int64)
        return key, kpos, gcounts, grows, maxcnt_per_row

    n_active = (nrows if compact_src is None else int(compact_src.size))
    key, kpos, gcounts, grows, maxcnt_per_row = _group_stats(sl, S)
    K, H = _choose_K(maxcnt_per_row, nrows, S, nnz, gcounts, grows,
                     _depth, n_active=n_active)

    # --- slice-group degree (r5b) -----------------------------------
    # Coverage-bound structures (merge plans, spill levels, banded
    # matrices: most (step, slice) pairs active at low slot load) stack
    # G consecutive source slices per page — the per-slot slice select
    # rides table bits 24-26 and masks G stage-1 gathers, so page count
    # divides by ~G while per-page cost grows ~(4+1.3G)/5.3. Dest slots
    # are ranked within (row, GROUP), so K/H re-chosen on the grouped
    # counts. Capped at 4: the SpMM kernel streams G*ncol source panes
    # per page and G=8 would exceed VMEM at ncol=64. Grouped plans are
    # always stored packed (the dense grid has no slice-select path).
    G = 1
    if nnz and S > 1:
        _T0, RPP0 = _page_geometry(K, H, nrows, nnz, S)
        t0 = rows // RPP0
        best_c = np.unique(t0 * S + sl).size * 5.3
        for Gc in (2, 4):
            act = max(1, np.unique(t0 * S + sl // Gc).size)
            if nnz / (act * H * _LANE) > 0.6:
                continue  # grouped slot load would strain the coloring
            cost = act * (4.0 + 1.3 * Gc)
            if cost < best_c:
                best_c, G = cost, Gc
    SG = -(-S // G)
    w_all = sl % G
    if G > 1:
        key, kpos, gcounts, grows, maxcnt_per_row = _group_stats(
            sl // G, SG)
        K, H = _choose_K(maxcnt_per_row, nrows, SG, nnz, gcounts,
                         grows, _depth, n_active=n_active)
    R = H // K
    D = H // _BLK

    # --- overflow beyond K per (row, slice) ------------------------
    # heavy rows absorb it in virtual rows (entry with chunk
    # q = kpos // K >= 1 lands in virtual row (r, q); y[r] +=
    # y_virtual afterwards, one scatter-add element per vrow); light
    # overflow goes to the recursive spill plan instead — K can then
    # sit near the MEAN per-(row, slice) count rather than the max,
    # which is the ELL slot-load lever (r4). Spill levels (depth >= 1)
    # never use vrows (r5 — see _choose_K).
    q = kpos // K
    kk = kpos % K
    if _depth >= 1:
        heavy = np.zeros(nrows, bool)
    else:
        heavy = maxcnt_per_row > _HEAVY_FACTOR * K
        if nnz:
            light_over = int(np.maximum(
                gcounts[~heavy[grows]] - K, 0).sum())
            if light_over < 1024:
                # too little overflow to justify a recursive spill
                # call: absorb it all in virtual rows (r3 behaviour)
                heavy = maxcnt_per_row > K
    nvr_per_row = np.where(
        heavy,
        np.maximum((np.maximum(maxcnt_per_row, 1) - 1) // K, 0), 0)
    vrow_base = nrows + np.concatenate(
        [[0], np.cumsum(nvr_per_row)])[:-1]
    vrow_src = np.repeat(np.arange(nrows, dtype=np.int64), nvr_per_row)
    nvr = int(nvr_per_row.sum())
    routable = (q == 0) | heavy[rows]
    n_over = int(nnz - routable.sum())
    dest_row = np.where(q == 0, rows, vrow_base[rows] + (q - 1))
    dest_row = np.where(routable, dest_row, 0)  # dummy for spilled

    nrows_tot = nrows + nvr
    T, RPP = _page_geometry(K, H, nrows_tot, nnz - n_over, SG)
    if T * SG * H * _LANE * 16 > _MAX_TABLE_BYTES:
        raise ValueError("route plan tables would exceed memory budget")

    cl = colind % _SLICE_COLS
    # column-major window mapping: consecutive columns hit distinct
    # source rows, spreading coloring load for banded / small-ncols
    # structures (X2[rr, lc] = x_slice[lc*128 + rr]).
    rr = cl % _LANE                         # source row (window)
    lc = cl // _LANE                        # source lane

    # --- stage coloring: one per (step, slice, dest block) ----------
    # Only routable entries enter the coloring (spill-bound overflow
    # would waste slots and manufacture false conflicts). Residual
    # conflicts cost far more than their count suggests (each spilled
    # entry pays XLA gather+scatter, x ncol for SpMM), so the whole
    # coloring retries with the k-slot assignment of CONFLICTED
    # (row, slice) groups rotated — a bijection on the group's slots,
    # so within-group uniqueness is preserved while every failed
    # request lands in a different dest row with fresh neighbours.
    ridx = np.flatnonzero(routable)
    best = None
    kk_try = kk
    for _round in range(3):
        t_r = dest_row // RPP
        lr = dest_row % RPP
        sdest = kk_try * R + lr // _LANE    # dest sublane in [0, H)
        l_r = lr % _LANE                    # dest lane
        d_r = sdest // _BLK                 # dest block
        sdb = sdest % _BLK                  # dest row within block
        page = t_r * SG + sl // G
        grp = (page * D + d_r) * _BLK + sdb
        forb = (page * D + d_r) * _BLK + rr
        # sharing payload is (lc, w): same-(rr, lc) entries from
        # different group slices are different source elements
        m_s, ok_s = _color_all(grp[ridx], forb[ridx],
                               (lc + w_all * _LANE)[ridx], rng)
        nfail = int(ridx.size - ok_s.sum())
        if best is None or nfail < best[0]:
            best = (nfail, kk_try, m_s, ok_s)
        if nfail == 0 or K == 1:
            break
        # rotate k-slots of groups containing a failure
        bad_groups = np.zeros(nnz, bool)
        bad_groups[ridx[~ok_s]] = True
        grp_bad = np.zeros(nrows * SG + SG, bool)
        np.logical_or.at(grp_bad, key[bad_groups], True)
        rot = grp_bad[key] & routable
        kk_try = np.where(rot, (kk_try + 1 + _round) % K, kk_try)
    _nfail, kk, m_s, ok_s = best
    t_r = dest_row // RPP
    lr = dest_row % RPP
    sdest = kk * R + lr // _LANE
    l_r = lr % _LANE
    d_r = sdest // _BLK
    sdb = sdest % _BLK
    page = t_r * SG + sl // G
    m = np.zeros(nnz, np.int64)
    ok = np.zeros(nnz, bool)
    m[ridx] = m_s
    ok[ridx] = ok_s

    # --- materialise tables -----------------------------------------
    g = ok
    # --- active-page packing (r5) -----------------------------------
    # Structures whose entries touch few (t, s) pairs (merge plans,
    # banded matrices, sparse spill levels) waste most of the dense
    # (T, S) grid streaming empty pages — the SpGEMM tail merge ran
    # 1079 dense pages where ~130 were active. When under 70 % of the
    # grid is active, only active pages are stored; per-page dest-step
    # / slice / first-of-step ids ride scalar-prefetch arrays.
    pg_used = np.unique(page[g]) if g.any() else np.zeros(0, np.int64)
    present_t = np.zeros(T, bool)
    present_t[pg_used // SG] = True
    miss_t = np.flatnonzero(~present_t)
    keep = np.sort(np.concatenate([pg_used, miss_t * SG]))
    # grouped plans always pack: the dense-grid kernels have no slice
    # -select path, and a grouped structure is coverage-bound anyway
    packed = G > 1 or keep.size < 0.7 * T * S
    if packed:
        pmap = np.full(T * SG, -1, np.int64)
        pmap[keep] = np.arange(keep.size)
        pg_of = pmap[page]
        pk_t = (keep // SG).astype(np.int32)
        pk_s = (keep % SG).astype(np.int32)
        pk_first = np.concatenate(
            [np.ones(1, np.int32),
             (pk_t[1:] != pk_t[:-1]).astype(np.int32)])
        n_pages = keep.size
    else:
        pg_of = page
        pk_t = pk_s = pk_first = None
        n_pages = T * S

    F1 = np.zeros((n_pages, H, _LANE), np.int32)
    F2 = np.zeros((n_pages, H, _LANE), np.int32)
    F3 = np.zeros((n_pages, H, _LANE), np.int32)
    F1[pg_of[g], d_r[g] * _BLK + rr[g], m[g]] = lc[g] | (w_all[g] << 24)
    F2[pg_of[g], d_r[g] * _BLK + m[g], sdb[g]] = rr[g]
    F3[pg_of[g], d_r[g] * _BLK + sdb[g], l_r[g]] = m[g]
    val_slot = (pg_of[g] * H + sdest[g]) * _LANE + l_r[g]
    val_src = entry_src[g]

    sp_rows = orig_rows[~g]
    sp_cols = colind[~g]
    sp_src = entry_src[~g]

    spill_plan = None
    # route even small residues: 433 spilled entries cost ~0.6 ms on
    # the XLA gather+scatter path for SpMM (x ncol), vs a fraction of
    # one short page through a recursive plan
    # depth cap matches _choose_K's pricing: at depth >= 3 the chooser
    # assumes NO further spill tier, so none is built (ADVICE r4 low —
    # the two constants previously disagreed at _depth == 3)
    if sp_rows.size >= 256 and _depth < 3:
        # spill entries are in (row, col) order (masked row-major scan)
        sp_ptr = np.zeros(nrows_orig + 1, np.int64)
        np.add.at(sp_ptr, sp_rows + 1, 1)
        np.cumsum(sp_ptr, out=sp_ptr)
        spill_plan = build_route_plan(sp_ptr, sp_cols, values[~g],
                                      nrows_orig, ncols, seed=seed + 1,
                                      _depth=_depth + 1,
                                      _entry_src=sp_src)

    FP = F1 | (F2 << 8) | (F3 << 16)

    plan = RoutePlan(
        nrows=nrows, ncols=ncols, K=K, R=R, T=T, S=S, RPP=RPP, H=H,
        FP=jnp.asarray(FP),
        val_slot=val_slot, val_src=val_src, vrow_src=vrow_src,
        spill=(sp_rows, sp_cols, sp_src),
        spill_frac=float(sp_rows.size / max(nnz, 1)), nnz=nnz,
        spill_plan=spill_plan,
        compact_src=compact_src, nrows_full=nrows_orig,
        pk_t=pk_t, pk_s=pk_s, pk_first=pk_first, G=G,
        default_values=(None if _entry_src is not None
                        else values.astype(np.float32)),
        rows_np=(None if _entry_src is not None
                 else orig_rows.astype(np.int32)),
        cols_np=(None if _entry_src is not None
                 else colind.astype(np.int32)),
    )
    if _depth == 0:
        _attach_merge_plan(plan, nrows_orig, seed)
    return plan


def _attach_merge_plan(plan: "RoutePlan", nrows: int, seed: int) -> None:
    """Build the routed merge-back plan over every row-compacted spill
    level in the chain (r5).

    Compacted levels emit partial sums in their dense row spaces; the
    merge plan routes the CONCATENATED partial vector back into y as
    one 0/1 SpMV (``y += M @ partials``) — the only alternative, an
    XLA scatter-add, costs ~8 us + 9 ns/element, which at 10k+
    partials is more than the whole spill chain."""
    segs = []          # (orig_row_of_partial, chain order)
    off = 0
    p = plan.spill_plan
    while p is not None:
        if p.compact_src is not None:
            segs.append(p.compact_src)
        p = p.spill_plan
    if not segs:
        return
    rows_m = np.concatenate(segs)
    cols_m = np.arange(rows_m.size, dtype=np.int64)
    order = np.lexsort((cols_m, rows_m))
    rows_m, cols_m = rows_m[order], cols_m[order]
    ptr_m = np.zeros(nrows + 1, np.int64)
    np.add.at(ptr_m, rows_m + 1, 1)
    np.cumsum(ptr_m, out=ptr_m)
    merge = build_route_plan(ptr_m, cols_m,
                             np.ones(rows_m.size, np.float32),
                             nrows, int(rows_m.size), seed=seed + 17,
                             _depth=3, _compact_ok=False)
    object.__setattr__(plan, "merge_plan", merge)


# ---------------------------------------------------------------------
# NumPy simulator (exact kernel math; used by tests)
# ---------------------------------------------------------------------

def simulate_route(plan: RoutePlan, x: np.ndarray,
                   values=None) -> np.ndarray:
    """Replay the kernel's routing in NumPy (routed entries only)."""
    K, R, T, S = plan.K, plan.R, plan.T, plan.S
    H, D = plan.H, plan.H // _BLK
    G = plan.G
    SP = -(-S // G) * G
    X = np.zeros(SP * _SLICE_COLS, np.float32)
    X[: plan.ncols] = np.asarray(x, np.float32)[: plan.ncols]
    # column-major slices: X[s][rr, lc] = x_slice[lc*128 + rr]
    X = X.reshape(SP, _LANE, _BLK).transpose(0, 2, 1)
    if values is None:
        values = plan.default_values
    FP = np.asarray(plan.FP)
    F1, F2, F3 = FP & 0xFF, (FP >> 8) & 0xFF, (FP >> 16) & 0xFF
    SEL = FP >> 24
    VALS = np.asarray(plan.bake(values)).reshape(plan.n_pages, H, _LANE)
    # page enumeration: dense (t, s) grid, or the packed active list
    # (pk_s holds slice-GROUP ids when G > 1)
    if plan.packed:
        pages = [(int(plan.pk_t[p]), int(plan.pk_s[p]), p)
                 for p in range(plan.n_pages)]
    else:
        pages = [(t, s, t * S + s) for t in range(T) for s in range(S)]
    by_t = {}
    for t, s, p in pages:
        by_t.setdefault(t, []).append((s, p))
    y = np.zeros((T, R * _LANE), np.float32)
    for t in range(T):
        acc = np.zeros((R, _LANE), np.float32)
        for s, p in by_t.get(t, []):
            P = np.zeros((H, _LANE), np.float32)
            for d in range(D):
                b = slice(d * _BLK, (d + 1) * _BLK)
                if G == 1:
                    Hm = np.take_along_axis(X[s], F1[p, b], axis=1)
                else:
                    Hm = np.zeros((_BLK, _LANE), np.float32)
                    for i in range(G):
                        Hi = np.take_along_axis(X[s * G + i],
                                                F1[p, b], axis=1)
                        Hm += Hi * (SEL[p, b] == i)
                Sm = np.take_along_axis(Hm.T, F2[p, b], axis=1)
                P[b] = np.take_along_axis(Sm.T, F3[p, b], axis=1)
            P *= VALS[p]
            for k in range(K):
                acc += P[k * R:(k + 1) * R]
        y[t] = acc.reshape(-1)
    yr = y[:, : plan.RPP].reshape(-1)
    out = yr[: plan.nrows].copy()
    nvr = plan.vrow_src.size
    if nvr:
        np.add.at(out, plan.vrow_src, yr[plan.nrows: plan.nrows + nvr])
    return out


# ---------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------

_LANE_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _take_lane(src, idx):
    """``out[s, l] = src[s, idx[s, l]]`` (Mosaic tpu.dynamic_gather).

    Direct ``lax.gather`` in the exact form ``take_along_axis`` lowers
    to, but with int32 indices regardless of ``jax_enable_x64`` — the
    kernel must stay 32-bit whatever the caller's x64 mode, and
    re-tracing under an ``enable_x64(False)`` context leaks tracers
    when the caller is itself inside a jit.
    """
    return jax.lax.gather(
        src, idx[..., None], _LANE_GATHER_DNUMS, (1, 1),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP, fill_value=0.0)


def _blocked_takes(X2, fp, D, G=1):
    """The 2-corner-turn routing for all D dest blocks in 3 batched
    lane gathers (vs 3*D small ones — per-step op issues bound these
    kernels; the source tile is replicated per block).

    ``G > 1`` (r5b slice grouping): ``X2`` stacks G source slices
    (G*128 rows); the per-slot slice select rides bits 24-26 of the
    table word and masks G stage-1 gathers. Coverage-bound plans
    (merge plans, spill levels, banded structures) trade ~G-fold
    fewer pages for the extra gathers."""
    if G == 1:
        Xr = X2 if D == 1 else jnp.concatenate([X2] * D, axis=0)
        H = _take_lane(Xr, fp & jnp.int32(0xFF))
    else:
        sel = fp >> jnp.int32(24)
        H = jnp.zeros((D * _BLK, _LANE), jnp.float32)
        for i in range(G):
            Xi = jax.lax.slice(X2, (i * _BLK, 0),
                               ((i + 1) * _BLK, _LANE))
            Xr = Xi if D == 1 else jnp.concatenate([Xi] * D, axis=0)
            Hi = _take_lane(Xr, fp & jnp.int32(0xFF))
            H = H + Hi * (sel == jnp.int32(i)).astype(jnp.float32)
    Ht = jnp.swapaxes(H.reshape(D, _BLK, _LANE), 1, 2)
    Sm = _take_lane(Ht.reshape(D * _BLK, _LANE),
                    (fp >> jnp.int32(8)) & jnp.int32(0xFF))
    St = jnp.swapaxes(Sm.reshape(D, _BLK, _LANE), 1, 2)
    return _take_lane(St.reshape(D * _BLK, _LANE),
                      (fp >> jnp.int32(16)) & jnp.int32(0xFF))


def _route_kernel(x_ref, fp_ref, v_ref, o_ref, *, K, R, D):
    s = pl.program_id(1)
    P = _blocked_takes(x_ref[...], fp_ref[0], D) * v_ref[0]
    acc = jnp.zeros((R, _LANE), jnp.float32)
    for k in range(K):
        acc = acc + P[k * R:(k + 1) * R]

    # int32 literals: int64 weak types fail Mosaic under jax_enable_x64
    @pl.when(s == jnp.int32(0))
    def _():
        o_ref[0] = acc

    @pl.when(s != jnp.int32(0))
    def _():
        o_ref[0] = o_ref[0] + acc


@partial(jax.jit, static_argnames=("S",))
def _prep_x(x, *, S):
    """Column-major slice layout of the operand, shared by every
    route level of one SpMV (they all have the same ncols/S).

    Padded to a multiple of 8 slices so grouped levels (G in {2,4,8})
    can read (G*128, 128) blocks without overrunning the array."""
    S8 = -(-S // 8) * 8
    X = jnp.zeros((S8 * _SLICE_COLS,), jnp.float32)
    X = X.at[: x.shape[0]].set(x.astype(jnp.float32))
    X = X.reshape(S8, _LANE, _BLK).transpose(0, 2, 1)
    return X.reshape(S8 * _BLK, _LANE)


@partial(jax.jit, static_argnames=("K", "R", "H", "T", "S", "RPP",
                                   "nrows", "interpret"))
def _route_call(FP, VALS, X, *, K, R, H, T, S, RPP, nrows,
                interpret=False):
    # Index maps must return i32 everywhere: a Python literal ``0``
    # traces as weak-i64 under the package-global ``jax_enable_x64``
    # and Mosaic then fails to legalize the map's ``func.return``
    # (observed on libtpu v5e AOT: "(i32, i64) -> ()").
    _z = lambda: jnp.int32(0)
    stream = lambda: pl.BlockSpec(
        (1, H, _LANE), lambda t, s: (t * S + s, _z(), _z()),
        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        partial(_route_kernel, K=K, R=R, D=H // _BLK),
        grid=(T, S),
        in_specs=[
            pl.BlockSpec((_BLK, _LANE), lambda t, s: (s, _z()),
                         memory_space=pltpu.VMEM),
            stream(), stream(),
        ],
        out_specs=pl.BlockSpec((1, R, _LANE), lambda t, s: (t, _z(), _z()),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R, _LANE), jnp.float32),
        interpret=interpret,
        # 64 MB VMEM budget: deeper stream double-buffering — measured
        # 65 -> 52.7 us on the 32-page bench plan (r4)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
    )
    y = fn(X, FP, VALS)
    return y.reshape(T, R * _LANE)[:, :RPP].reshape(-1)


def _route_kernel_pk(s_ref, t_ref, fi_ref, x_ref, fp_ref, v_ref, o_ref,
                     *, K, R, D, G):
    p = pl.program_id(0)
    P = _blocked_takes(x_ref[...], fp_ref[0], D, G) * v_ref[0]
    acc = jnp.zeros((R, _LANE), jnp.float32)
    for k in range(K):
        acc = acc + P[k * R:(k + 1) * R]

    @pl.when(fi_ref[p] == jnp.int32(1))
    def _():
        o_ref[0] = acc

    @pl.when(fi_ref[p] != jnp.int32(1))
    def _():
        o_ref[0] = o_ref[0] + acc


@partial(jax.jit, static_argnames=("K", "R", "H", "T", "S", "RPP", "G",
                                   "interpret"))
def _route_call_pk(FP, VALS, X, pk_s, pk_t, pk_first, *, K, R, H, T, S,
                   RPP, G=1, interpret=False):
    """Active-page packed variant of ``_route_call``: 1-D grid over
    the stored pages; dest step / source slice ride scalar-prefetch
    arrays (r5 — merge plans and banded structures activate few of the
    dense (T, S) grid's pages). ``G > 1``: each page reads a stacked
    (G*128, 128) slice-group block (pk_s holds group ids)."""
    _z = lambda: jnp.int32(0)
    n_pages = int(FP.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pages,),
        in_specs=[
            pl.BlockSpec((G * _BLK, _LANE),
                         lambda p, sl, *_: (sl[p], _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, _LANE), lambda p, *_: (p, _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, _LANE), lambda p, *_: (p, _z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, _LANE), lambda p, sl, tt, fi: (tt[p], _z(), _z()),
            memory_space=pltpu.VMEM),
    )
    fn = pl.pallas_call(
        partial(_route_kernel_pk, K=K, R=R, D=H // _BLK, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, R, _LANE), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
    )
    y = fn(pk_s, pk_t, pk_first, X, FP, VALS)
    return y.reshape(T, R * _LANE)[:, :RPP].reshape(-1)


def _pk_arrays(plan: RoutePlan):
    arrs = getattr(plan, "_pk_dev", None)
    if arrs is None:
        with jax.ensure_compile_time_eval():
            arrs = tuple(jnp.asarray(np.asarray(a, np.int32))
                         for a in (plan.pk_s, plan.pk_t, plan.pk_first))
        object.__setattr__(plan, "_pk_dev", arrs)
    return arrs


def route_spmv(plan: RoutePlan, x, values=None, *,
               interpret: bool = False):
    """``y = A @ x`` through the routing plan (+ XLA spill path).

    ``values`` defaults to the build-time values. Passing a different
    array (concrete or traced — e.g. under ``jax.grad``) reuses the
    routing structure: concrete values bake a cached VALS table on the
    host, traced values build it with one device scatter. Reverse-mode
    AD uses the closed-form VJP (dx = Aᵀg, dvals = g[rows]·x[cols])
    instead of transposing the kernel."""
    if values is None:
        values = plan.default_values
    values = jnp.asarray(values) if isinstance(values, np.ndarray) else values
    return _route_spmv_ad(plan, interpret, x, values)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _route_spmv_ad(plan, interpret, x, values):
    return _route_spmv_impl(plan, x, values, interpret)


def _route_spmv_ad_fwd(plan, interpret, x, values):
    return _route_spmv_impl(plan, x, values, interpret), (x, values)


def _route_spmv_ad_bwd(plan, interpret, res, g):
    x, values = res
    rows = jnp.asarray(plan.rows_np)
    cols = jnp.asarray(plan.cols_np)
    nnz = rows.shape[0]
    gv = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    vf = values.astype(jnp.float32)[:nnz]
    dvals = gv[rows] * xf[cols]
    if values.shape[0] > nnz:  # padded nse slots get zero cotangent
        dvals = jnp.pad(dvals, (0, values.shape[0] - nnz))
    dx = jnp.zeros(x.shape[0], jnp.float32).at[cols].add(vf * gv[rows])
    return dx.astype(x.dtype), dvals.astype(values.dtype)


_route_spmv_ad.defvjp(_route_spmv_ad_fwd, _route_spmv_ad_bwd)


# ---------------------------------------------------------------------
# SpMM through the same routing plan (north-star N2, BASELINE config[1]).
# The routing tables are column-independent: one grid step streams the
# page's FP/VALS once and routes every RHS column through it, so the
# 8 B/slot table traffic amortises over K columns while the lane
# gathers stay shape-preserving per column.
# ---------------------------------------------------------------------


def _route_spmm_kernel(x_ref, fp_ref, v_ref, o_ref, *, K_ell, R, D,
                       ncol, chunk):
    s = pl.program_id(1)
    fp = fp_ref[0]
    v = v_ref[0]
    # Column chunking batches the lane gathers: one (chunk*128, 128)
    # take replaces `chunk` small (128,128) takes — per-step take-issue
    # count, not gathered elements, bounds this kernel (probe_r3: 768
    # takes per step at ncol=64 measured take-issue-bound). The r4
    # attempt at chunk == ncol lost to index-tile copies (3.2 ms vs
    # 1.6); r5 builds the tiles ONCE PER PAGE (they are column
    # -independent) and reuses them across every chunk, which moves
    # the optimum to chunk ~8.
    if chunk > 1:
        f1 = fp & jnp.int32(0xFF)
        f2 = (fp >> jnp.int32(8)) & jnp.int32(0xFF)
        f3 = (fp >> jnp.int32(16)) & jnp.int32(0xFF)
        tiles = []
        for d in range(D):
            b = slice(d * _BLK, (d + 1) * _BLK)
            tiles.append(tuple(
                jnp.concatenate([f[b]] * chunk, axis=0)
                for f in (f1, f2, f3)))
    for c0 in range(0, ncol, chunk):
        X3 = x_ref[0, c0:c0 + chunk]                  # (CH, 128, 128)
        if chunk == 1:
            ps = [_blocked_takes(X3[0], fp, D) * v]   # (H, 128)
            P = jnp.stack(ps, axis=0)                 # (1, H, 128)
        else:
            src = X3.reshape(chunk * _BLK, _LANE)
            zs = []
            for d in range(D):
                f1t, f2t, f3t = tiles[d]
                Hm = _take_lane(src, f1t)
                Ht = jnp.swapaxes(Hm.reshape(chunk, _BLK, _LANE),
                                  1, 2).reshape(chunk * _BLK, _LANE)
                Sm = _take_lane(Ht, f2t)
                St = jnp.swapaxes(Sm.reshape(chunk, _BLK, _LANE),
                                  1, 2).reshape(chunk * _BLK, _LANE)
                Z = _take_lane(St, f3t)
                zs.append(Z.reshape(chunk, _BLK, _LANE)
                          * v[d * _BLK:(d + 1) * _BLK][None])
            P = jnp.concatenate(zs, axis=1)           # (CH, H, 128)
        acc = jnp.zeros((chunk, R, _LANE), jnp.float32)
        for k in range(K_ell):
            acc = acc + P[:, k * R:(k + 1) * R]

        @pl.when(s == jnp.int32(0))
        def _():
            o_ref[0, c0:c0 + chunk] = acc

        @pl.when(s != jnp.int32(0))
        def _():
            o_ref[0, c0:c0 + chunk] = o_ref[0, c0:c0 + chunk] + acc


@partial(jax.jit, static_argnames=("K_ell", "R", "H", "T", "S", "RPP",
                                   "ncol", "interpret"))
def _route_spmm_call(FP, VALS, X, *, K_ell, R, H, T, S, RPP, ncol,
                     interpret=False):
    X = X.astype(jnp.float32)
    Xp = jnp.zeros((S * _SLICE_COLS, ncol), jnp.float32)
    Xp = Xp.at[: X.shape[0]].set(X)
    # per column: column-major slices as in _route_call; layout
    # (S, ncol, 128, 128) so each (slice, column) pane is a contiguous
    # lane-gatherable (sublane, lane) tile.
    Xp = Xp.reshape(S, _LANE, _BLK, ncol).transpose(0, 3, 2, 1)

    _z = lambda: jnp.int32(0)
    stream = lambda: pl.BlockSpec(
        (1, H, _LANE), lambda t, s: (t * S + s, _z(), _z()),
        memory_space=pltpu.VMEM)
    # chunk > 1 batches the lane gathers across RHS columns; the index
    # tiles are built once per page inside the kernel (Mosaic has no
    # 3-D batched gather) and amortise over ncol/chunk chunks. chunk=8
    # balances take-issue count against tile size (r5).
    import os

    chunk = 1
    # v5e sweep at ncol=64: chunk 8 -> 81 GF, 16 -> 85, 32 -> 112,
    # 64 -> 93 (tile VMEM pressure); 32 is the optimum
    pref = int(os.environ.get("SPALINALG_SPMM_CHUNK", "32"))
    for c in (pref, 32, 16, 8, 4, 2):
        if 1 < c <= ncol and ncol % c == 0:
            chunk = c
            break
    fn = pl.pallas_call(
        partial(_route_spmm_kernel, K_ell=K_ell, R=R, D=H // _BLK,
                ncol=ncol, chunk=chunk),
        grid=(T, S),
        in_specs=[
            pl.BlockSpec((1, ncol, _BLK, _LANE),
                         lambda t, s: (s, _z(), _z(), _z()),
                         memory_space=pltpu.VMEM),
            stream(), stream(),
        ],
        out_specs=pl.BlockSpec((1, ncol, R, _LANE),
                               lambda t, s: (t, _z(), _z(), _z()),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, ncol, R, _LANE), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
    )
    Y = fn(Xp, FP, VALS)
    # (T, ncol, R, 128) -> rows-major (T, R*128, ncol) -> trim RPP
    Y = Y.transpose(0, 2, 3, 1).reshape(T, R * _LANE, ncol)
    return Y[:, :RPP].reshape(T * RPP, ncol)


def _route_spmm_kernel_pk(s_ref, t_ref, fi_ref, x_ref, fp_ref, v_ref,
                          o_ref, *, K_ell, R, D, ncol, chunk, G):
    p = pl.program_id(0)
    fp = fp_ref[0]
    v = v_ref[0]
    if chunk > 1:
        f1 = fp & jnp.int32(0xFF)
        f2 = (fp >> jnp.int32(8)) & jnp.int32(0xFF)
        f3 = (fp >> jnp.int32(16)) & jnp.int32(0xFF)
        sel = fp >> jnp.int32(24)
        tiles = []
        for d in range(D):
            b = slice(d * _BLK, (d + 1) * _BLK)
            tiles.append(tuple(
                jnp.concatenate([f[b]] * chunk, axis=0)
                for f in (f1, f2, f3))
                + ((jnp.concatenate([sel[b]] * chunk, axis=0),)
                   if G > 1 else (None,)))
    for c0 in range(0, ncol, chunk):
        X3 = x_ref[:, c0:c0 + chunk]                  # (G, CH, 128, 128)
        if chunk == 1:
            xx = (X3[0, 0] if G == 1
                  else X3[:, 0].reshape(G * _BLK, _LANE))
            P = jnp.stack([_blocked_takes(xx, fp, D, G) * v], axis=0)
        else:
            zs = []
            for d in range(D):
                f1t, f2t, f3t, selt = tiles[d]
                if G == 1:
                    src = X3[0].reshape(chunk * _BLK, _LANE)
                    Hm = _take_lane(src, f1t)
                else:
                    Hm = jnp.zeros((chunk * _BLK, _LANE), jnp.float32)
                    for i in range(G):
                        src = X3[i].reshape(chunk * _BLK, _LANE)
                        Hi = _take_lane(src, f1t)
                        Hm = Hm + Hi * (selt == jnp.int32(i)
                                        ).astype(jnp.float32)
                Ht = jnp.swapaxes(Hm.reshape(chunk, _BLK, _LANE),
                                  1, 2).reshape(chunk * _BLK, _LANE)
                Sm = _take_lane(Ht, f2t)
                St = jnp.swapaxes(Sm.reshape(chunk, _BLK, _LANE),
                                  1, 2).reshape(chunk * _BLK, _LANE)
                Z = _take_lane(St, f3t)
                zs.append(Z.reshape(chunk, _BLK, _LANE)
                          * v[d * _BLK:(d + 1) * _BLK][None])
            P = jnp.concatenate(zs, axis=1)           # (CH, H, 128)
        acc = jnp.zeros((chunk, R, _LANE), jnp.float32)
        for k in range(K_ell):
            acc = acc + P[:, k * R:(k + 1) * R]

        @pl.when(fi_ref[p] == jnp.int32(1))
        def _():
            o_ref[0, c0:c0 + chunk] = acc

        @pl.when(fi_ref[p] != jnp.int32(1))
        def _():
            o_ref[0, c0:c0 + chunk] = o_ref[0, c0:c0 + chunk] + acc


@partial(jax.jit, static_argnames=("K_ell", "R", "H", "T", "S", "RPP",
                                   "ncol", "G", "interpret"))
def _route_spmm_call_pk(FP, VALS, X, pk_s, pk_t, pk_first, *, K_ell, R,
                        H, T, S, RPP, ncol, G=1, interpret=False):
    """Active-page packed SpMM call (see ``_route_call_pk``)."""
    X = X.astype(jnp.float32)
    S8 = -(-S // 8) * 8  # grouped levels read (G, ...) stacked blocks
    Xp = jnp.zeros((S8 * _SLICE_COLS, ncol), jnp.float32)
    Xp = Xp.at[: X.shape[0]].set(X)
    Xp = Xp.reshape(S8, _LANE, _BLK, ncol).transpose(0, 3, 2, 1)

    _z = lambda: jnp.int32(0)
    import os

    chunk = 1
    pref = int(os.environ.get("SPALINALG_SPMM_CHUNK", "32"))
    for c in (pref, 32, 16, 8, 4, 2):
        if 1 < c <= ncol and ncol % c == 0:
            chunk = c
            break
    n_pages = int(FP.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pages,),
        in_specs=[
            pl.BlockSpec((G, ncol, _BLK, _LANE),
                         lambda p, sl, *_: (sl[p], _z(), _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, _LANE), lambda p, *_: (p, _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, _LANE), lambda p, *_: (p, _z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ncol, R, _LANE),
            lambda p, sl, tt, fi: (tt[p], _z(), _z(), _z()),
            memory_space=pltpu.VMEM),
    )
    fn = pl.pallas_call(
        partial(_route_spmm_kernel_pk, K_ell=K_ell, R=R, D=H // _BLK,
                ncol=ncol, chunk=chunk, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, ncol, R, _LANE), jnp.float32),
        interpret=interpret,
        # the G*ncol source panes push past the default 64 MB budget
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=(96 if G > 1 else 64) << 20),
    )
    Y = fn(pk_s, pk_t, pk_first, Xp, FP, VALS)
    Y = Y.transpose(0, 2, 3, 1).reshape(T, R * _LANE, ncol)
    return Y[:, :RPP].reshape(T * RPP, ncol)


def route_spmm(plan: RoutePlan, X, values=None, *,
               interpret: bool = False):
    """``Y = A @ X`` (dense tall-skinny X) through the routing plan.

    Same table reuse semantics as :func:`route_spmv`; reverse-mode AD
    uses the closed-form VJP on the plan's entry lists."""
    if values is None:
        values = plan.default_values
    values = jnp.asarray(values) if isinstance(values, np.ndarray) else values
    return _route_spmm_ad(plan, interpret, X, values)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _route_spmm_ad(plan, interpret, X, values):
    return _route_spmm_impl(plan, X, values, interpret)


def _route_spmm_ad_fwd(plan, interpret, X, values):
    return _route_spmm_impl(plan, X, values, interpret), (X, values)


def _route_spmm_ad_bwd(plan, interpret, res, g):
    X, values = res
    rows = jnp.asarray(plan.rows_np)
    cols = jnp.asarray(plan.cols_np)
    nnz = rows.shape[0]
    gf = g.astype(jnp.float32)
    xf = X.astype(jnp.float32)
    vf = values.astype(jnp.float32)[:nnz]
    dvals = jnp.sum(gf[rows] * xf[cols], axis=1)
    if values.shape[0] > nnz:
        dvals = jnp.pad(dvals, (0, values.shape[0] - nnz))
    dX = jnp.zeros(X.shape, jnp.float32).at[cols].add(
        vf[:, None] * gf[rows])
    return dX.astype(X.dtype), dvals.astype(values.dtype)


_route_spmm_ad.defvjp(_route_spmm_ad_fwd, _route_spmm_ad_bwd)


def _route_spmm_impl(plan: RoutePlan, X, values, interpret,
                     _parts=None):
    top = _parts is None
    if top:
        _parts = []
    traced = isinstance(values, jax.core.Tracer)
    VALS = plan.device_vals(values) if traced else plan.bake(values)
    ncol = int(X.shape[1])
    if plan.packed:
        pk_s, pk_t, pk_first = _pk_arrays(plan)
        Yr = _route_spmm_call_pk(plan.FP, VALS, X, pk_s, pk_t, pk_first,
                                 K_ell=plan.K, R=plan.R, H=plan.H,
                                 T=plan.T, S=plan.S, RPP=plan.RPP,
                                 ncol=ncol, G=plan.G,
                                 interpret=interpret)
    else:
        Yr = _route_spmm_call(plan.FP, VALS, X,
                              K_ell=plan.K, R=plan.R, H=plan.H,
                              T=plan.T, S=plan.S, RPP=plan.RPP,
                              ncol=ncol, interpret=interpret)
    Yl = Yr[: plan.nrows]
    nvr = plan.vrow_src.size
    if nvr:
        Yl = Yl.at[jnp.asarray(plan.vrow_src)].add(
            Yr[plan.nrows: plan.nrows + nvr])
    if plan.compact_src is None:
        Y = Yl
    else:
        _parts.append(Yl)            # (ncomp, ncol) partial panel
        Y = None
    if plan.spill_plan is not None:
        sub = _route_spmm_impl(plan.spill_plan, X, values, interpret,
                               _parts=_parts)
        Y = sub if Y is None else (Y + sub if sub is not None else Y)
    elif plan.spill[0].size:
        sp_rows, sp_cols, sp_src = plan.spill
        if traced:
            sp_vals = values.astype(jnp.float32)[jnp.asarray(sp_src)]
        else:
            sp_vals = jnp.asarray(
                np.asarray(values, np.float32)[sp_src])
        contrib = sp_vals[:, None] * X.astype(jnp.float32)[
            jnp.asarray(sp_cols)]
        if Y is None:
            Y = jnp.zeros((plan.nrows_full, ncol), jnp.float32)
        Y = Y.at[jnp.asarray(sp_rows)].add(contrib)
    if top and plan.merge_plan is not None and _parts:
        P = jnp.concatenate(_parts, axis=0)
        Y = Y + _route_spmm_impl(plan.merge_plan, P,
                                 _merge_ones(plan.merge_plan),
                                 interpret)
    return Y


def _route_spmv_impl(plan: RoutePlan, x, values, interpret, _X=None,
                     _parts=None, _FP=None):
    """One route level; recursion over the spill chain.

    Row-compacted levels (r5) append their dense partial vectors to
    ``_parts`` instead of adding into y; the TOP level then routes the
    concatenated partials back through ``plan.merge_plan`` in one
    extra (tiny) pallas call — replacing the XLA scatter-adds that
    made the r4 spill chain cost 99 us of a 143 us SpMV.

    ``_FP`` overrides the top level's table (callers inside an
    enclosing jit thread large tables through that jit's arguments —
    as closure constants they blow the remote-compile payload)."""
    top = _parts is None
    if top:
        _parts = []
    traced = isinstance(values, jax.core.Tracer)
    VALS = plan.device_vals(values) if traced else plan.bake(values)
    # one shared operand layout for the whole spill chain (same ncols)
    X = _prep_x(x, S=plan.S) if _X is None else _X
    FPx = plan.FP if _FP is None else _FP
    if plan.packed:
        pk_s, pk_t, pk_first = _pk_arrays(plan)
        yr = _route_call_pk(FPx, VALS, X, pk_s, pk_t, pk_first,
                            K=plan.K, R=plan.R, H=plan.H, T=plan.T,
                            S=plan.S, RPP=plan.RPP, G=plan.G,
                            interpret=interpret)
    else:
        yr = _route_call(FPx, VALS, X,
                         K=plan.K, R=plan.R, H=plan.H, T=plan.T,
                         S=plan.S, RPP=plan.RPP, nrows=plan.nrows,
                         interpret=interpret)
    yl = yr[: plan.nrows]
    nvr = plan.vrow_src.size
    if nvr:
        yl = yl.at[jnp.asarray(plan.vrow_src)].add(
            yr[plan.nrows: plan.nrows + nvr])
    if plan.compact_src is None:
        y = yl                       # original row space
    else:
        _parts.append(yl)            # dense partials; top level merges
        y = None
    if plan.spill_plan is not None:
        sub = _route_spmv_impl(plan.spill_plan, x, values, interpret,
                               _X=X, _parts=_parts)
        y = sub if y is None else (y + sub if sub is not None else y)
    elif plan.spill[0].size:
        sp_rows, sp_cols, sp_src = plan.spill
        if traced:
            sp_vals = values.astype(jnp.float32)[jnp.asarray(sp_src)]
        else:
            sp_vals = jnp.asarray(
                np.asarray(values, np.float32)[sp_src])
        contrib = sp_vals * x.astype(jnp.float32)[jnp.asarray(sp_cols)]
        if y is None:
            y = jnp.zeros(plan.nrows_full, jnp.float32)
        y = y.at[jnp.asarray(sp_rows)].add(contrib)
    if top and plan.merge_plan is not None and _parts:
        p = jnp.concatenate(_parts)
        y = y + _route_spmv_impl(plan.merge_plan, p,
                                 _merge_ones(plan.merge_plan),
                                 interpret)
    return y


def _merge_ones(mp: RoutePlan) -> np.ndarray:
    """Unit values for the merge plan, cached on the plan (its
    ``default_values`` do not survive the value-stripping disk store)."""
    v = getattr(mp, "_ones_vals", None)
    if v is None:
        v = np.ones(int(mp.nnz), np.float32)
        object.__setattr__(mp, "_ones_vals", v)
    return v
