"""Paired routed gather: the SpGEMM numeric-phase kernel.

The SpGEMM numeric phase is ``C.values[g] = Σ_t A.values[a_idx[t]] *
B.values[b_idx[t]]`` over product terms ``t`` grouped by output slot
``g`` — two arbitrary gathers and a segmented sum, all with *constant*
structure. XLA's dynamic gather runs at ~0.14 Gelem/s on TPU
(tools/probe_r3_results.jsonl), 100× off the roofline; scatter is as
bad. The routed-gather network of ``csr_route.py`` moves a *traced*
vector through constant lane-gather tables at ~306 Gelem/s — so this
kernel runs the whole phase in one pallas_call:

1. Terms are assigned **dest ELL slots** ``(output slot g, k)`` exactly
   like the SpMV router assigns matrix entries (K-wide rows, virtual
   rows absorb overflow, spills fall back to XLA).
2. Two independent routing tables are built over the same dest slots:
   ``FPA`` routes ``A.values[a_idx[t]]`` into slot(t), ``FPB`` routes
   ``B.values[b_idx[t]]`` into the same slot. Each packs its 3-stage
   lane routes plus a validity bit (``F1|F2<<8|F3<<16|ok<<24``) — no
   separate VALS table, values ride the traced input streams.
3. The kernel accumulates each route's slot payloads across source
   slices into VMEM scratch (each slot is fed by exactly one slice per
   route), multiplies the two completed slot planes, and K-sums into
   the output rows: ``y[g] = Σ_k A_slot[g,k] * B_slot[g,k]``.

Table traffic is 8 B/slot for both routes combined (vs 24 B/term of
the XLA formulation's minimal traffic), and the products never touch
HBM.

Reference scope: SpGEMM semantics are `src/csr/ops/mul.rs:5-58`; the
reference's Gustavson loop is the CPU oracle, this is north-star N3.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .csr_route import (_BLK, _LANE, _SLICE_COLS, _VROW_COST,
                        _color_all, _page_geometry, _take_lane)

_H = 512                # pair-route pages stay full height
_D = _H // _BLK


def _choose_K_pair(maxcnt, nrows, S, nnz):
    """ELL width for the pair tables: pages vs virtual-row tradeoff
    (the SpGEMM tail has no recursive spill tier — overflow rides
    virtual output rows folded by the merged tail scatter)."""
    if maxcnt.size == 0 or maxcnt.max() == 0:
        return 1
    best, bestK = None, 1
    K = 1
    while K <= _H:
        nvr = int(((np.maximum(maxcnt, 1) - 1) // K).sum())
        T, _ = _page_geometry(K, _H, nrows + nvr, nnz, S)
        cost = T * S + nvr * _VROW_COST
        if best is None or cost <= best:
            best, bestK = cost, K
        K *= 2
    return bestK

__all__ = ["PairRoutePlan", "build_pair_route_plan", "pair_route_apply",
           "simulate_pair_route"]

_MAX_PAIR_TABLE_BYTES = 1 << 30  # FPA+FPB combined budget


@dataclass(eq=False)  # identity hash: plans are jit-static
class PairRoutePlan:
    """Host-built paired routing tables for one SpGEMM term structure.

    r5 layout: only ACTIVE (dest step, slice-group, route) pages are
    stored, packed into one table streamed by a 1-D grid whose per-page
    slice-group/route/output-step ids ride scalar-prefetch arrays. The
    r4 dense (T, S)-grid streamed both route tables for every page —
    518 MB and 1976 grid steps on the bench case where only 1113
    route-pages had any entries (slot load 4.3 %).

    r5b slice grouping: a route whose pages are COVERAGE-bound (most
    (step, slice) pairs active at low slot load — route b on the bench
    case ran 988 pages at 4.5 % load) groups G consecutive source
    slices per page. The per-entry source slice-within-group rides 3
    spare bits of the stage-1 table word (bits 25-27); the kernel runs
    G stage-1 gathers masked-summed by those bits, so per-page cost
    grows ~(4+1.3G)/5.3 while page count shrinks ~G-fold."""

    n_out: int              # output slots (C nnz)
    nnz_a: int
    nnz_b: int
    n_terms: int
    K: int
    R: int
    T: int
    S: int                  # max source slices across the two routes
    RPP: int
    Ga: int                 # slice-group degree, route a
    Gb: int                 # slice-group degree, route b
    FPP: jax.Array          # (P, 512, 128) i32 packed active pages
    page_slice_a: np.ndarray  # (P,) i32 route-a block index (fwd-filled)
    page_slice_b: np.ndarray  # (P,) i32 route-b block index (fwd-filled)
    page_route: np.ndarray  # (P,) i32 0 = route a, 1 = route b
    page_t: np.ndarray      # (P,) i32 dest step per page (ascending)
    page_first: np.ndarray  # (P,) i32 1 on the first page of its t
    page_last: np.ndarray   # (P,) i32 1 on the last page of its t
    vrow_src: np.ndarray    # (n_virtual,) real output slot per virtual row
    # coloring-retry regions: terms recolored in fresh tail pages;
    # each entry adds yr[start:start+len] into y at `gids`
    retry: list
    spill: Tuple[np.ndarray, np.ndarray, np.ndarray]  # gid, a_idx, b_idx
    spill_frac: float
    tail_merge: object = None  # (stage1, stage2) RoutePlans folding the
                               # vrow + retry tail into y: tail -> its
                               # distinct dests -> y (two routed 0/1
                               # SpMVs replace a ~200k XLA scatter; the
                               # compact stage kills the coverage cost)

    @property
    def n_pages(self) -> int:
        return int(self.FPP.shape[0])

    @property
    def table_bytes(self) -> int:
        return self.n_pages * _H * _LANE * 4


def build_pair_route_plan(gid, a_idx, b_idx, n_out: int, nnz_a: int,
                          nnz_b: int, seed: int = 0) -> PairRoutePlan:
    """Build the paired plan on host (NumPy + native coloring).

    ``gid`` must be sorted nondecreasing (terms grouped by output slot);
    ``a_idx``/``b_idx`` are the per-term operand value indices."""
    gid = np.asarray(gid, dtype=np.int64)
    a_idx = np.asarray(a_idx, dtype=np.int64)
    b_idx = np.asarray(b_idx, dtype=np.int64)
    n_terms = int(gid.size)
    rng = np.random.default_rng(seed)

    S = max(1, -(-max(nnz_a, 1) // _SLICE_COLS),
            -(-max(nnz_b, 1) // _SLICE_COLS))

    # rank within output slot (gid sorted)
    if n_terms:
        new = np.concatenate([[True], gid[1:] != gid[:-1]])
        gstart = np.flatnonzero(new)
        run = np.cumsum(new) - 1
        kpos = np.arange(n_terms, dtype=np.int64) - gstart[run]
        gcounts = np.diff(np.append(gstart, n_terms))
        maxcnt = np.zeros(n_out, np.int64)
        maxcnt[gid[gstart]] = gcounts
    else:
        kpos = np.zeros(0, np.int64)
        maxcnt = np.zeros(n_out, np.int64)

    K = _choose_K_pair(maxcnt, n_out, S, n_terms)
    R = _H // K

    q = kpos // K
    kk = kpos % K
    nvr_per = np.maximum((np.maximum(maxcnt, 1) - 1) // K, 0)
    vrow_base = n_out + np.concatenate([[0], np.cumsum(nvr_per)])[:-1]
    vrow_src = np.repeat(np.arange(n_out, dtype=np.int64), nvr_per)
    nvr = int(nvr_per.sum())
    dest_row = np.where(q == 0, gid, vrow_base[gid] + (q - 1))

    nrows_tot = n_out + nvr
    T, RPP = _page_geometry(K, _H, nrows_tot, n_terms, S)
    # Slot-load slack: at 100 % packing each (block, source-row) pair
    # sees Poisson(128) requests against exactly 128 colors, forcing a
    # structural ~4 % coloring overflow (measured). ~12 % slack pulls
    # the mean to ~112 and the overflow tail near zero for ~12 % more
    # table pages.
    cap = R * _LANE
    RPP = min(RPP, max(_LANE, int(cap * 0.88) // _LANE * _LANE))
    T = max(1, -(-nrows_tot // RPP))
    # the stored table covers only ACTIVE pages (checked after packing);
    # this guards the transient host-side page-id space
    if T * S > (1 << 22):
        raise ValueError("pair route page space would exceed budget")

    # --- slice-group degree per route (r5b) --------------------------
    # A coverage-bound route (nearly every (step, slice) pair active at
    # low slot load) groups G consecutive slices per page: page count
    # divides by ~G while per-page cost grows by the extra stage-1
    # gathers (~(4 + 1.3 G) vs 5.3 units). Chosen per route from the
    # round-0 placement; guarded so grouped slot load stays colorable.
    t0 = dest_row // RPP

    def _choose_G(idx):
        env = os.environ.get("SPALINALG_PAIR_GROUP", "")
        if env:
            try:
                return max(1, min(8, int(env.strip())))
            except ValueError:
                pass
        best, bestG = None, 1
        for G in (1, 2, 4, 8):
            act = max(1, np.unique(t0 * S + idx // (_SLICE_COLS * G)).size)
            load = n_terms / (act * _H * _LANE)
            if G > 1 and load > 0.6:
                continue
            cost = act * (4.0 + 1.3 * G)
            if best is None or cost < best:
                best, bestG = cost, G
        return bestG

    Ga = _choose_G(a_idx) if n_terms else 1
    Gb = _choose_G(b_idx) if n_terms else 1
    SGa = -(-S // Ga)
    SGb = -(-S // Gb)

    def slot_geom(rows, kk_s):
        """Dest-slot coordinates for given dest rows.

        Interleaved slot layout: consecutive output slots advance the
        SUBLANE (sdest), not the lane — lr = l*R + r. Consecutive
        gids' terms have correlated sources (one A row / one B row
        feeds runs of consecutive slots); packing them into one dest
        sublane made that sublane's 128-color matching near-perfect-
        rainbow and spill ~9 % (probe_r3). Striding across sublanes
        decorrelates every coloring group."""
        t_r = rows // RPP
        lr = rows % RPP
        sdest = kk_s * R + lr % R
        l_r = lr // R
        return t_r, sdest, l_r, sdest // _BLK, sdest % _BLK

    def color(idx, t_r, d_r, sdb, G, SG):
        sl = idx // _SLICE_COLS
        gsl = sl // G
        w = sl % G                 # slice within group (table bits 25+)
        cl = idx % _SLICE_COLS
        rr = cl % _LANE            # source row (col-major window)
        lc = cl // _LANE           # source lane
        # group page: all G slices share one coloring space, so the
        # stage-table slot invariants hold across the whole group.
        # The sharing payload must be (lc, w), not lc alone: two
        # entries from DIFFERENT group slices with the same (rr, lc)
        # are different source elements — sharing a stage-1 slot would
        # silently drop one slice-select (measured: ~0.1 % of bench
        # terms fetched the wrong slice before this).
        page = t_r * SG + gsl
        grp = (page * _D + d_r) * _BLK + sdb
        forb = (page * _D + d_r) * _BLK + rr
        m, ok = _color_all(grp, forb, lc + w * _LANE, rng)
        return gsl, w, rr, lc, m, ok

    # Coloring rounds: terms that fail the first coloring retry in
    # fresh tail rows on fresh pages (disjoint coloring spaces), so
    # their products ride the kernel + one slice-scatter instead of
    # the far costlier XLA gather-gather-scatter spill path. Residual
    # failures after the rounds become true spills.
    placed = []            # (term_idx, t_r, sdest, l_r, per-route data)
    retry = []             # (tail_row_start_in_yr, gids) per round
    cur = np.arange(n_terms, dtype=np.int64)
    rows_cur = dest_row
    kk_cur = kk
    next_row = -(-nrows_tot // RPP) * RPP
    for _round in range(3):
        t_r, sdest, l_r, d_r, sdb = slot_geom(rows_cur, kk_cur)
        ra = color(a_idx[cur], t_r, d_r, sdb, Ga, SGa)
        rb = color(b_idx[cur], t_r, d_r, sdb, Gb, SGb)
        ok = ra[5] & rb[5]
        g = np.flatnonzero(ok)
        placed.append((cur[g], t_r[g], sdest[g], l_r[g],
                       tuple(x[g] for x in ra[:5]),
                       tuple(x[g] for x in rb[:5])))
        bad = np.flatnonzero(~ok)
        if bad.size == 0 or _round == 2:
            cur = cur[bad]
            break
        retry.append((next_row, gid[cur[bad]]))
        rows_cur = next_row + np.arange(bad.size, dtype=np.int64)
        kk_cur = np.zeros(bad.size, np.int64)
        cur = cur[bad]
        next_row = -(-(next_row + bad.size) // RPP) * RPP

    rows_used = (retry[-1][0] + retry[-1][1].size) if retry else nrows_tot
    T = max(T, -(-rows_used // RPP))

    # --- pack ACTIVE (t, route, slice-group) pages (r5) --------------
    # Active-page discovery from the placed records (vectorised).
    def active(route_sel, SG):
        ps = np.zeros(T * SG, bool)
        for rec in placed:
            t_r = rec[1]
            gsl = rec[4][0] if route_sel == 0 else rec[5][0]
            ps[t_r * SG + gsl] = True
        return ps

    ia = np.flatnonzero(active(0, SGa))
    ib = np.flatnonzero(active(1, SGb))
    allp = np.concatenate([
        np.stack([ia // SGa, np.zeros_like(ia), ia % SGa], 1),
        np.stack([ib // SGb, np.ones_like(ib), ib % SGb], 1)])
    # every dest step needs >= 1 page so its output block is written
    present = np.zeros(T, bool)
    if allp.size:
        present[allp[:, 0]] = True
    miss = np.flatnonzero(~present)
    if miss.size:
        z = np.zeros_like(miss)
        allp = np.concatenate([allp, np.stack([miss, z, z], 1)])
    order = np.lexsort((allp[:, 2], allp[:, 1], allp[:, 0]))
    allp = allp[order]
    P_pages = allp.shape[0]
    if P_pages * _H * _LANE * 4 > _MAX_PAIR_TABLE_BYTES:
        raise ValueError("pair route tables would exceed memory budget")
    FPP = np.zeros((P_pages, _H, _LANE), np.int32)
    pmap_a = np.full(T * SGa, -1, np.int64)
    pmap_b = np.full(T * SGb, -1, np.int64)
    sel_a = allp[:, 1] == 0
    pmap_a[allp[sel_a, 0] * SGa + allp[sel_a, 2]] = np.flatnonzero(sel_a)
    pmap_b[allp[~sel_a, 0] * SGb + allp[~sel_a, 2]] = np.flatnonzero(~sel_a)

    def fill(route_sel):
        pmap_r, SG = (pmap_a, SGa) if route_sel == 0 else (pmap_b, SGb)
        for rec in placed:
            _idx, t_r, sdest, l_r = rec[0], rec[1], rec[2], rec[3]
            gsl, w, rr, lc, m = rec[4] if route_sel == 0 else rec[5]
            d_r = sdest // _BLK
            sdb = sdest % _BLK
            page = pmap_r[t_r * SG + gsl]
            FPP[page, d_r * _BLK + rr, m] |= lc | (w << 25)
            FPP[page, d_r * _BLK + m, sdb] |= rr << 8
            FPP[page, d_r * _BLK + sdb, l_r] |= (m << 16) | (1 << 24)

    fill(0)
    fill(1)
    # per-operand block indices with forward fill: a page of the OTHER
    # route keeps the previous index so Pallas skips the re-fetch and
    # the index stays in bounds for that operand's (smaller) block grid
    def _ffill(x):
        idx = np.where(x >= 0, np.arange(x.size), 0)
        np.maximum.accumulate(idx, out=idx)
        out = x[idx]
        out[out < 0] = 0
        return out

    gsl_np = allp[:, 2]
    page_slice_a = _ffill(np.where(allp[:, 1] == 0, gsl_np, -1))
    page_slice_b = _ffill(np.where(allp[:, 1] == 1, gsl_np, -1))
    page_t = allp[:, 0].astype(np.int32)
    bnd = (page_t[1:] != page_t[:-1]).astype(np.int32)
    one = np.ones(1, np.int32)
    page_first = np.concatenate([one, bnd])
    page_last = np.concatenate([bnd, one])

    # Routed tail merge (r5): the vrow + retry partials previously
    # folded into y with one XLA scatter-add — ~1.8 ms at the bench
    # tail of ~200k elements (8 us/op + 9 ns/element). As a 0/1 routed
    # SpMV over the concatenated tail vector it rides the same
    # lane-route network at ~0.7 us/page.
    #
    # r5b: TWO-STAGE compact fold. A direct tail->y merge is coverage
    # -bound: its dest space is all of y (47 steps on the bench) and
    # its ~200k sources scatter over every slice — 206 active pages.
    # Stage 1 sums the tail into its DISTINCT destinations (a ~150k-row
    # compact space: 3 steps, and the sources are g-sorted vrow/retry
    # runs, so each step draws from few slices); stage 2 merges the
    # compact partials into y with sources SORTED BY DEST (~1 slice per
    # step). ~65 pages replace 206 on the bench case.
    tail_dst_parts = [vrow_src] + [g for _s, g in retry]
    tail_merge = None
    tail_n = int(sum(p.size for p in tail_dst_parts))
    if tail_n >= 4096:
        from .csr_route import build_route_plan

        dst = np.concatenate(tail_dst_parts)
        pos = np.arange(tail_n, dtype=np.int64)
        order = np.lexsort((pos, dst))
        dst_s, pos_s = dst[order], pos[order]
        uniq, inv = np.unique(dst_s, return_inverse=True)
        ndist = int(uniq.size)
        ptr1 = np.zeros(ndist + 1, np.int64)
        np.add.at(ptr1, inv + 1, 1)
        np.cumsum(ptr1, out=ptr1)
        stage1 = build_route_plan(
            ptr1, pos_s, np.ones(tail_n, np.float32), ndist, tail_n,
            seed=seed + 23, _depth=3, _compact_ok=False)
        ptr2 = np.zeros(n_out + 1, np.int64)
        np.add.at(ptr2, uniq + 1, 1)
        np.cumsum(ptr2, out=ptr2)
        stage2 = build_route_plan(
            ptr2, np.arange(ndist, dtype=np.int64),
            np.ones(ndist, np.float32), n_out, ndist,
            seed=seed + 29, _depth=3, _compact_ok=False)
        tail_merge = (stage1, stage2)

    return PairRoutePlan(
        n_out=n_out, nnz_a=nnz_a, nnz_b=nnz_b, n_terms=n_terms,
        K=K, R=R, T=T, S=S, RPP=RPP, Ga=Ga, Gb=Gb,
        FPP=jnp.asarray(FPP),
        page_slice_a=page_slice_a.astype(np.int32),
        page_slice_b=page_slice_b.astype(np.int32),
        page_route=allp[:, 1].astype(np.int32),
        page_t=page_t, page_first=page_first, page_last=page_last,
        vrow_src=vrow_src, retry=retry,
        spill=(gid[cur], a_idx[cur], b_idx[cur]),
        spill_frac=float(cur.size / max(n_terms, 1)),
        tail_merge=tail_merge,
    )


# ---------------------------------------------------------------------
# NumPy simulator (exact kernel math; used by tests)
# ---------------------------------------------------------------------

def simulate_pair_route(plan: PairRoutePlan, a_vals, b_vals) -> np.ndarray:
    """Replay the kernel's routing in NumPy (routed terms only)."""
    K, R, T, S = plan.K, plan.R, plan.T, plan.S

    def slices(v, nnz, G):
        SG = -(-S // G)
        X = np.zeros(SG * G * _SLICE_COLS, np.float32)
        X[:nnz] = np.asarray(v, np.float32)[:nnz]
        return X.reshape(SG * G, _LANE, _BLK).transpose(0, 2, 1)

    Xa = slices(a_vals, plan.nnz_a, plan.Ga)
    Xb = slices(b_vals, plan.nnz_b, plan.Gb)
    FPP = np.asarray(plan.FPP)
    y = np.zeros((T, R * _LANE), np.float32)
    za = zb = None
    for p in range(plan.n_pages):
        if plan.page_first[p]:
            za = np.zeros((_H, _LANE), np.float32)
            zb = np.zeros((_H, _LANE), np.float32)
        ra = plan.page_route[p] == 0
        G = plan.Ga if ra else plan.Gb
        gsl = (plan.page_slice_a if ra else plan.page_slice_b)[p]
        Xs = (Xa if ra else Xb)[gsl * G:(gsl + 1) * G]
        z = za if ra else zb
        for d in range(_D):
            b = slice(d * _BLK, (d + 1) * _BLK)
            sel = FPP[p][b] >> 25
            H = np.zeros((_BLK, _LANE), np.float32)
            for i in range(G):
                Hi = np.take_along_axis(Xs[i], FPP[p][b] & 0xFF, axis=1)
                H += Hi * (sel == i)
            fp = FPP[p]
            Sm = np.take_along_axis(H.T, (fp[b] >> 8) & 0xFF, axis=1)
            Z = np.take_along_axis(Sm.T, (fp[b] >> 16) & 0xFF, axis=1)
            z[b] += Z * ((fp[b] >> 24) & 1)
        if plan.page_last[p]:
            P = za * zb
            acc = np.zeros((R, _LANE), np.float32)
            for k in range(K):
                acc += P[k * R:(k + 1) * R]
            y[plan.page_t[p]] = acc.T.reshape(-1)  # lr = l*R + r
    yr = y[:, : plan.RPP].reshape(-1)
    out = yr[: plan.n_out].copy()
    nvr = plan.vrow_src.size
    if nvr:
        np.add.at(out, plan.vrow_src, yr[plan.n_out: plan.n_out + nvr])
    for start, gids in plan.retry:
        np.add.at(out, gids, yr[start: start + gids.size])
    return out


# ---------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------


def _pair_kernel(sla_ref, slb_ref, rt_ref, t_ref, fi_ref, la_ref,
                 xa_ref, xb_ref, fp_ref, o_ref, za, zb, *, K, R,
                 Ga, Gb):
    """One packed active page per step (r5). A grouped-resident
    variant (G pages/step, VMEM-resident operands + output panel with
    dynamic stores) measured ~30 % SLOWER on v5e — the per-step
    streaming pipeline beats dynamic slicing here.

    r5b: a page sources from G stacked slices; stage 1 runs G gathers
    masked-summed by the slice-select bits (25-27) of the table word.
    """
    p = pl.program_id(0)

    @pl.when(fi_ref[p] == jnp.int32(1))
    def _():
        za[...] = jnp.zeros_like(za)
        zb[...] = jnp.zeros_like(zb)

    fp = fp_ref[0]                                   # (512, 128)

    def takes(X, G):
        # stage 1 batches all 4 dest blocks in one lane gather per
        # group slice: the source tile is replicated per block, and
        # each gathered plane is masked by the slice-select bits
        if G == 1:
            Xr = jnp.concatenate([X] * _D, axis=0)   # (512, 128)
            H = _take_lane(Xr, fp & jnp.int32(0xFF))
        else:
            sel = fp >> jnp.int32(25)
            H = jnp.zeros((_H, _LANE), jnp.float32)
            for i in range(G):
                Xi = jax.lax.slice(X, (i * _BLK, 0),
                                   ((i + 1) * _BLK, _LANE))
                Xr = jnp.concatenate([Xi] * _D, axis=0)
                Hi = _take_lane(Xr, fp & jnp.int32(0xFF))
                H = H + Hi * (sel == jnp.int32(i)).astype(jnp.float32)
        H = H.reshape(_D, _BLK, _LANE)
        Ht = jnp.swapaxes(H, 1, 2).reshape(_D * _BLK, _LANE)
        Sm = _take_lane(Ht, (fp >> jnp.int32(8)) & jnp.int32(0xFF))
        Sm = Sm.reshape(_D, _BLK, _LANE)
        St = jnp.swapaxes(Sm, 1, 2).reshape(_D * _BLK, _LANE)
        Z = _take_lane(St, fp >> jnp.int32(16) & jnp.int32(0xFF))
        return Z * ((fp >> jnp.int32(24)) & jnp.int32(1)
                    ).astype(jnp.float32)

    @pl.when(rt_ref[p] == jnp.int32(0))
    def _():
        za[...] = za[...] + takes(xa_ref[...], Ga)

    @pl.when(rt_ref[p] == jnp.int32(1))
    def _():
        zb[...] = zb[...] + takes(xb_ref[...], Gb)

    @pl.when(la_ref[p] == jnp.int32(1))
    def _():
        P = za[...] * zb[...]
        acc = jnp.zeros((R, _LANE), jnp.float32)
        for k in range(K):
            acc = acc + P[k * R:(k + 1) * R]
        o_ref[0] = acc


@partial(jax.jit, static_argnames=("K", "R", "T", "S", "RPP", "nnz_a",
                                   "nnz_b", "Ga", "Gb", "interpret"))
def _pair_call(FPP, page_slice_a, page_slice_b, page_route, page_t,
               page_first, page_last, a_vals, b_vals, *, K, R, T, S,
               RPP, nnz_a, nnz_b, Ga=1, Gb=1, interpret=False):
    def slices(v, nnz, G):
        SG = -(-S // G)
        X = jnp.zeros((SG * G * _SLICE_COLS,), jnp.float32)
        X = X.at[:nnz].set(v.astype(jnp.float32)[:nnz])
        X = X.reshape(SG * G, _LANE, _BLK).transpose(0, 2, 1)
        return X.reshape(SG * G * _BLK, _LANE)

    Xa = slices(a_vals, nnz_a, Ga)
    Xb = slices(b_vals, nnz_b, Gb)
    P_pages = int(FPP.shape[0])

    _z = lambda: jnp.int32(0)
    xspec_a = pl.BlockSpec(
        (Ga * _BLK, _LANE), lambda p, sla, *_: (sla[p], _z()),
        memory_space=pltpu.VMEM)
    xspec_b = pl.BlockSpec(
        (Gb * _BLK, _LANE), lambda p, sla, slb, *_: (slb[p], _z()),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(P_pages,),
        in_specs=[
            xspec_a, xspec_b,
            pl.BlockSpec((1, _H, _LANE), lambda p, *_: (p, _z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, _LANE),
            lambda p, sla, slb, rt, tt, fi, la: (tt[p], _z(), _z()),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_H, _LANE), jnp.float32),
                        pltpu.VMEM((_H, _LANE), jnp.float32)],
    )
    fn = pl.pallas_call(
        partial(_pair_kernel, K=K, R=R, Ga=Ga, Gb=Gb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, R, _LANE), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
    )
    y = fn(page_slice_a, page_slice_b, page_route, page_t, page_first,
           page_last, Xa, Xb, FPP)
    # interleaved slot layout (lr = l*R + r): one XLA transpose per call
    y = y.transpose(0, 2, 1).reshape(T, _LANE * R)
    return y[:, :RPP].reshape(-1)


def pair_route_apply(plan: PairRoutePlan, a_vals, b_vals, *,
                     tables=None, interpret: bool = False) -> jax.Array:
    """Numeric SpGEMM through the paired plan (+ XLA spill path).

    ``tables``: optional table override — the packed ``FPP``, or a
    ``(FPP, tail_FP)`` pair including the tail-merge route table. When
    calling from inside an enclosing ``jit``, pass the plan's tables
    through that jit's *arguments* and hand them in here — captured as
    closure constants they are serialised into the compile payload,
    which for large plans (100s of MB) breaks remote-compile
    transports and bloats compilation."""
    tail_FP = None
    if isinstance(tables, (tuple, list)):
        FPP, tail_FP = tables
    else:
        FPP = tables if tables is not None else plan.FPP
    # prefetch arrays must be i32: s64 operands hit XLA's unimplemented
    # X64-rewrite path for tpu_custom_call
    i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
    yr = _pair_call(FPP, i32(plan.page_slice_a), i32(plan.page_slice_b),
                    i32(plan.page_route), i32(plan.page_t),
                    i32(plan.page_first), i32(plan.page_last),
                    a_vals, b_vals,
                    K=plan.K, R=plan.R, T=plan.T, S=plan.S,
                    RPP=plan.RPP, nnz_a=plan.nnz_a, nnz_b=plan.nnz_b,
                    Ga=plan.Ga, Gb=plan.Gb, interpret=interpret)
    y = yr[: plan.n_out]
    # tail fold (vrow region + retry regions): through the routed 0/1
    # merge when the plan built one (~200k-element XLA scatters cost
    # ~1.8 ms; the routed fold runs at ~0.7 us/page); XLA scatter-add
    # with batched plan-constant indices for small tails
    val_parts = []
    idx_parts = []
    nvr = plan.vrow_src.size
    if nvr:
        idx_parts.append(np.asarray(plan.vrow_src, np.int64))
        val_parts.append(yr[plan.n_out: plan.n_out + nvr])
    for start, gids in plan.retry:
        idx_parts.append(np.asarray(gids, np.int64))
        val_parts.append(yr[start: start + gids.size])
    if val_parts and plan.tail_merge is not None:
        from .csr_route import _merge_ones, _route_spmv_impl

        stage1, stage2 = plan.tail_merge
        fp1, fp2 = tail_FP if tail_FP is not None else (None, None)
        tail = jnp.concatenate(val_parts)
        yc = _route_spmv_impl(stage1, tail, _merge_ones(stage1),
                              interpret, _FP=fp1)
        y = y + _route_spmv_impl(stage2, yc, _merge_ones(stage2),
                                 interpret, _FP=fp2)
    elif idx_parts:
        tail_idx = jnp.asarray(np.concatenate(idx_parts))
        y = y.at[tail_idx].add(jnp.concatenate(val_parts))
    sp_g, sp_a, sp_b = plan.spill
    if sp_g.size:
        contrib = (a_vals.astype(jnp.float32)[jnp.asarray(sp_a)]
                   * b_vals.astype(jnp.float32)[jnp.asarray(sp_b)])
        y = y.at[jnp.asarray(sp_g)].add(contrib)
    return y
