"""Relational / streaming-style operators the engine supports beyond the
search core: tumbling-window aggregation over the ``events`` stream table and
a broadcast hash join — the two wide-operation patterns SURVEY.md §2 maps to
"custom operators" (windowed aggregate; small-side broadcast instead of a
shuffle join).

Both are exactly SQL-expressible and oracle-checked in ``__ray_entry__``.

Scale shapes:
- ``windowed_events``: window key computed map-side (pure integer floor of
  the epoch-µs timestamp — no Python datetime per row), then map-side
  PARTIAL aggregation per (window, event_type) inside each batch before the
  small groupby — the pre-aggregate-before-shuffle pattern (A2 analogue).
- ``broadcast_join_orders``: the dimension side (customer ⋈ nation, tiny)
  is built once on the driver and broadcast via ``ray.put``; every fact
  batch maps through a numpy searchsorted lookup — no all-to-all exchange
  of the fact table (SURVEY.md §2.4 J1-J3 pattern at fact-table scale).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.fulltext import _round_vec
from searchengine_ray.sources import read_parquet_clean

WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def windowed_events(sf_dir: str):
    """Tumbling 1-hour windows over events: (window_start, event_type,
    n_events, sum_value_r). Partial per-batch combine → small groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // WINDOW_US) * WINDOW_US
        df = pd.DataFrame(
            {
                "window_us": win,
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "n": 1,
                "v": batch["value"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["window_us", "event_type"], as_index=False).agg(
            n=("n", "sum"), v=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["window_us", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("v", alias_name="sum_value"))
    )
    out = ds.to_pandas()
    out["sum_value_r"] = _round_vec(out["sum_value"].to_numpy())
    out["n_events"] = out["n_events"].astype("int64")
    return out[["window_us", "event_type", "n_events", "sum_value_r"]]


SESSION_GAP_US = 1_800_000_000  # 30 minutes

_USER_PARTITIONS = 64


def sessionize_events(sf_dir: str):
    """Gap-based session windows per user (gap > 30 min starts a new
    session): (user_id, session_start_us, n_events, duration_us).

    Shape: hash users into a FIXED number of partitions, then ONE vectorized
    pass per partition — sort by (user, ts), session boundaries = user
    change OR gap, stats via reduceat. NOT ``groupby(user_id).map_groups``:
    per-group Python dispatch is O(users) (the high-cardinality-group
    disease); the partitioned pass does every user in the partition at
    once. The SQL mirror is the classic lag/cumsum session assignment."""
    import ray.data as rd

    def add_part(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            }
        )

    def sessions(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_sess = np.empty(uid.size, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > SESSION_GAP_US)
        starts = np.nonzero(new_sess)[0]
        ends = np.concatenate((starts[1:], [uid.size]))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "session_start_us": pa.array(ts[starts], type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "duration_us": pa.array(ts[ends - 1] - ts[starts], type=pa.int64()),
            }
        )

    # returned as a Dataset: one row per session is O(user activity) — at
    # web scale that must stay distributed, not round-trip the driver
    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(sessions, batch_format="pyarrow")
    )


def asof_join_events(sf_dir: str):
    """As-of join (an operator Ray Data lacks): each 'click' event matched
    to the SAME user's most recent 'view' event at ts ≤ click ts.

    Shape: vectorized-mask pre-filter to view/click rows (no per-row Python
    filter), hash users into fixed partitions, then one vectorized pass per
    partition: sort by (user, ts, view-before-click), running
    ``np.maximum.accumulate`` of view positions gives every click its
    latest-view index, invalidated across user boundaries by an id check.
    The partitioning assumption is that a user's history lives in one
    partition (hash-partitioning guarantees it); range-salting by time
    would bound pathological partitions. Returns
    (event_id, user_id, ts_us, view_ts_us, view_value_r)."""
    import ray.data as rd

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        mask = (et == "view") | (et == "click")
        sub = batch.filter(pa.array(mask))
        u = sub["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": sub["event_id"],
                "user_id": sub["user_id"],
                "ts_us": sub["ts"].cast(pa.int64()),
                "is_click": pa.array(
                    sub["event_type"].to_numpy(zero_copy_only=False) == "click"
                ),
                "value": sub["value"],
                "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            }
        )

    def asof_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_click = group["is_click"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = group["value"].to_numpy(zero_copy_only=False)
        # views sort before clicks at equal (uid, ts) → "ts <= click ts"
        order = np.lexsort((is_click, ts, uid))
        uid, ts, is_click, eid, val = (
            uid[order], ts[order], is_click[order], eid[order], val[order]
        )
        idx = np.arange(uid.size)
        last_view = np.maximum.accumulate(np.where(~is_click, idx, -1))
        ci = np.nonzero(is_click & (last_view >= 0))[0]
        vi = last_view[ci]
        same = uid[vi] == uid[ci]  # accumulate crosses user boundaries
        ci, vi = ci[same], vi[same]
        return pa.table(
            {
                "event_id": pa.array(eid[ci], type=pa.int64()),
                "user_id": pa.array(uid[ci], type=pa.int64()),
                "ts_us": pa.array(ts[ci], type=pa.int64()),
                "view_ts_us": pa.array(ts[vi], type=pa.int64()),
                "view_value_r": pa.array(_round_vec(val[vi]), type=pa.float64()),
            }
        )

    # returned as a Dataset: one row per click is O(events) — at web scale
    # the joined fact table must stay distributed, not round-trip the driver
    return (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type", "value"],
        )
        .map_batches(prep, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(asof_partition, batch_format="pyarrow")
    )


def broadcast_join_orders(sf_dir: str):
    """Revenue per nation: orders ⋈ customer ⋈ nation with the dimension
    side broadcast. Returns (n_name, n_orders, revenue_r)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    ckey = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order_c = np.argsort(ckey, kind="stable")
    nkey = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    order_n = np.argsort(nkey, kind="stable")
    dim_ref = ray.put((ckey[order_c], cnat[order_c], nkey[order_n], nname[order_n]))

    def join_batch(batch: pa.Table) -> pa.Table:
        ck, cn, nk, nn = ray.get(dim_ref)
        ocust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck, ocust)
        pos = np.minimum(pos, ck.size - 1)
        ok = ck[pos] == ocust
        natkeys = cn[pos[ok]]
        npos = np.searchsorted(nk, natkeys)
        npos_c = np.minimum(npos, nk.size - 1)
        # inner-join semantics on BOTH hops: drop rows whose nation key is
        # absent instead of attributing them to a neighboring nation
        nok = nk[npos_c] == natkeys
        names = nn[npos_c[nok]]
        prices = batch["o_totalprice"].to_numpy(zero_copy_only=False)[ok][nok]
        return pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "price": pa.array(prices, type=pa.float64()),
            }
        )

    ds = (
        read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(join_batch, batch_format="pyarrow", batch_size=8192)
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("price", alias_name="revenue"))
    )
    out = ds.to_pandas()
    out["revenue_r"] = _round_vec(out["revenue"].to_numpy(), 2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["n_name", "n_orders", "revenue_r"]]


# ---------------------------------------------------------------------------
# Exact distributed quantiles (selection by counting, no sort)
# ---------------------------------------------------------------------------


def exact_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    column: str = "value", n_buckets: int = 8192,
                    max_pull: int = 262_144):
    """(q, value) EXACT discrete quantiles of ``events.column`` — the
    element at rank ceil(n·q) (DuckDB ``quantile_disc`` convention).

    Distributed selection by counting, not sorting: a global sort of the
    column is an all-to-all shuffle of every row, but the k-th order
    statistic only needs (1) one pass for (n, min, max), (2) one histogram
    pass (fixed buckets over [min, max], counts summed driver-side —
    n_buckets ints per task), (3) a filtered pull of ONLY the buckets that
    straddle a target rank (expected n/n_buckets rows each), finished with
    an exact in-memory selection. A pathological value distribution that
    overfills a target bucket (> max_pull rows) recurses one level with a
    re-histogram of just that bucket's range. Ties handled exactly —
    selection is by rank, not by value uniqueness.

    The pruned value column is materialized once and shared by every pass
    (object-store-resident, spillable). When the single column is itself
    too hot for the store, drop the ``materialize()`` — each pass then
    re-reads just that column from parquet, trading ~3 pruned scans for
    zero store residency; the algorithm is unchanged."""
    import ray.data as rd

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=[column]
    ).materialize()

    def stats(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"n": pa.array([0], type=pa.int64()),
                             "lo": pa.array([np.inf]), "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([v.size], type=pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    st = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    n = int(st["n"].sum())
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    lo, hi = float(st["lo"].min()), float(st["hi"].max())
    if lo == hi:  # constant column: every quantile is that value
        return pa.table({"q": pa.array(sorted(float(q) for q in qs), type=pa.float64()),
                         "value": pa.array([lo] * len(qs), type=pa.float64())})
    ranks = {q: max(int(np.ceil(n * q)), 1) for q in qs}

    hist_memo: dict[tuple, tuple] = {}

    def _histogram(lo_: float, hi_: float, closed_hi: bool):
        """One counting pass: per-batch histogram over [lo_, hi_) — the
        upper edge is included only when ``closed_hi`` (the global max).
        Values == hi_ are pre-filtered so np.histogram's always-closed last
        bin can't over-count at interior recursion boundaries. Memoized:
        every quantile's top-level call shares the same [lo, hi] range, so
        k quantiles cost ONE histogram pass, not k."""
        key = (lo_, hi_, closed_hi)
        if key in hist_memo:
            return hist_memo[key]
        edges = np.linspace(lo_, hi_, n_buckets + 1)

        def hist(batch: pa.Table) -> pa.Table:
            v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
            m = ~np.isnan(v) & (v >= lo_) & ((v <= hi_) if closed_hi else (v < hi_))
            c, _ = np.histogram(v[m], bins=edges)
            return pa.table({"b": pa.array(np.arange(n_buckets, dtype=np.int64)),
                             "c": pa.array(c.astype(np.int64))})

        h = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
        counts = np.zeros(n_buckets, dtype=np.int64)
        np.add.at(counts, h["b"].to_numpy(), h["c"].to_numpy())
        hist_memo[key] = (edges, counts)
        return edges, counts

    def _pull(lo_: float, hi_: float, closed_hi: bool) -> np.ndarray:
        def sel(batch: pa.Table) -> pa.Table:
            v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
            m = ~np.isnan(v) & (v >= lo_) & ((v <= hi_) if closed_hi else (v < hi_))
            return pa.table({column: pa.array(v[m])})

        out = ds.map_batches(sel, batch_format="pyarrow").to_pandas()
        return out[column].to_numpy()

    def _select(k: int, lo_: float, hi_: float, below: int, depth: int = 0) -> float:
        """Exact k-th smallest (1-based, global) within [lo_, hi_], where
        ``below`` values are < lo_."""
        edges, counts = _histogram(lo_, hi_, closed_hi=(hi_ == hi))
        cum = below + np.cumsum(counts)
        b = int(np.searchsorted(cum, k))  # first bucket reaching rank k
        b_lo = float(edges[b])
        b_hi = float(edges[b + 1])
        b_below = int(cum[b] - counts[b])
        # histogram's second-to-last bins are [lo, hi); the last bin of a
        # closed-hi histogram additionally holds v == hi_
        b_closed = (b == n_buckets - 1) and (hi_ == hi)
        if counts[b] > max_pull and depth < 2 and b_hi > b_lo:
            return _select(k, b_lo, b_hi, b_below, depth + 1)
        vals = _pull(b_lo, b_hi, b_closed)
        vals.sort()
        return float(vals[k - b_below - 1])

    rows = [(float(q), _select(ranks[q], lo, hi, 0)) for q in sorted(qs)]
    return pa.table({"q": pa.array([r[0] for r in rows], type=pa.float64()),
                     "value": pa.array([r[1] for r in rows], type=pa.float64())})


def group_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    by: str = "event_type", column: str = "value",
                    n_buckets: int = 8192, max_pull: int = 262_144):
    """(event_type, q, value): EXACT per-group discrete quantiles — the
    grouped form of :func:`exact_quantiles` (rank ceil(n_g·q) within each
    group, DuckDB ``quantile_disc ... GROUP BY`` convention).

    Same selection-by-counting shape, but ONE histogram pass serves EVERY
    group simultaneously: the stats pass yields per-group (n, lo, hi), the
    histogram pass bins each batch per group against broadcast per-group
    edges and emits (g, b, c) rows (G × n_buckets ints per task, G = group
    cardinality — small by definition for a groupable key), and the driver
    walks each group's counts for all its target ranks. Only pathological
    buckets (> max_pull rows) trigger a per-(group, bucket) recursion pass;
    the final pulls fetch expected n_g/n_buckets rows each. A naive
    per-group loop over exact_quantiles would cost G × 3 passes; this costs
    3 + pathology."""
    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=[by, column]
    ).materialize()

    def stats(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        g = np.asarray(batch[by].to_pylist(), dtype=object)
        m = ~np.isnan(v)
        df = pd.DataFrame({"g": g[m], "v": v[m]})
        out = df.groupby("g", as_index=False).agg(
            n=("v", "size"), lo=("v", "min"), hi=("v", "max")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    st = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    if st.empty:
        return pa.table({by: pa.array([], type=pa.string()),
                         "q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    st = st.groupby("g", as_index=False).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max")
    ).sort_values("g")
    groups = st["g"].tolist()
    n_g = dict(zip(groups, (int(x) for x in st["n"])))
    lo_g = dict(zip(groups, (float(x) for x in st["lo"])))
    hi_g = dict(zip(groups, (float(x) for x in st["hi"])))

    hist_memo: dict[tuple, np.ndarray] = {}

    def _runs(batch: pa.Table):
        """Yield (group key, values) per group-run of the batch after ONE
        factorize + stable argsort — shared by the histogram and pull
        passes so neither re-scans the batch per spec."""
        import pandas as pd

        v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
        g = np.asarray(batch[by].to_pylist(), dtype=object)
        codes, uniques = pd.factorize(g)
        order = np.argsort(codes, kind="stable")
        sc, sv = codes[order], v[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(sc))[0] + 1, [sc.size]))
        for s, t in zip(starts[:-1], starts[1:]):
            if s == t or sc[s] < 0:  # empty batch / null group key
                continue
            yield uniques[sc[s]], sv[s:t]

    def _histogram(specs: list) -> dict:
        """ONE pass: per-spec histogram over each spec's window. ``specs``
        are (key, lo_, hi_, closed_hi) tuples — refinement windows for MANY
        groups (even several windows of one group) batch into a single
        scan. Memoized per spec: several quantiles recursing into the SAME
        overfull bucket cost one pass (the sibling exact_quantiles'
        hist_memo trade). Returns spec → counts[n_buckets]."""
        import ray

        missing = [s for s in dict.fromkeys(specs) if s not in hist_memo]
        if missing:
            spec_ref = ray.put(missing)

            def hist(batch: pa.Table) -> pa.Table:
                import ray as _ray

                sp = _ray.get(spec_ref)
                of_key: dict = {}
                for i, s in enumerate(sp):
                    of_key.setdefault(s[0], []).append(i)
                out_i, out_b, out_c = [], [], []
                for key, vals in _runs(batch):
                    idxs = of_key.get(key)
                    if not idxs:
                        continue
                    nn = vals[~np.isnan(vals)]
                    for i in idxs:
                        _, lo_, hi_, cl = sp[i]
                        vv = nn[(nn >= lo_) & ((nn <= hi_) if cl else (nn < hi_))]
                        if vv.size == 0:
                            continue
                        c, _ = np.histogram(
                            vv, bins=np.linspace(lo_, hi_, n_buckets + 1)
                        )
                        nz = np.nonzero(c)[0]
                        out_i.append(np.full(nz.size, i, dtype=np.int64))
                        out_b.append(nz.astype(np.int64))
                        out_c.append(c[nz].astype(np.int64))
                if not out_b:
                    return pa.table({"i": pa.array([], type=pa.int64()),
                                     "b": pa.array([], type=pa.int64()),
                                     "c": pa.array([], type=pa.int64())})
                return pa.table({"i": pa.array(np.concatenate(out_i)),
                                 "b": pa.array(np.concatenate(out_b)),
                                 "c": pa.array(np.concatenate(out_c))})

            h = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
            res = {s: np.zeros(n_buckets, dtype=np.int64) for s in missing}
            for i, sub in h.groupby("i"):
                np.add.at(res[missing[int(i)]], sub["b"].to_numpy(),
                          sub["c"].to_numpy())
            hist_memo.update(res)
        return {s: hist_memo[s] for s in specs}

    def _pull_many(specs: list) -> dict:
        """ONE pass serving EVERY given pull window — run-sliced like the
        histogram pass, so each spec's window mask runs over ITS group's
        run only (one nan-filter per run, shared across that group's
        specs), never a full-batch compare per spec. Returns spec →
        ASCENDING values array."""
        import ray

        uniq = list(dict.fromkeys(specs))
        spec_ref = ray.put(uniq)

        def sel(batch: pa.Table) -> pa.Table:
            import ray as _ray

            sp = _ray.get(spec_ref)
            of_key: dict = {}
            for i, s in enumerate(sp):
                of_key.setdefault(s[0], []).append(i)
            out_i, out_v = [], []
            for key, vals in _runs(batch):
                idxs = of_key.get(key)
                if not idxs:
                    continue
                nn = vals[~np.isnan(vals)]
                for i in idxs:
                    _, lo_, hi_, cl = sp[i]
                    vv = nn[(nn >= lo_) & ((nn <= hi_) if cl else (nn < hi_))]
                    if vv.size:
                        out_i.append(np.full(vv.size, i, dtype=np.int64))
                        out_v.append(vv)
            if not out_i:
                return pa.table({"i": pa.array([], type=pa.int64()),
                                 "v": pa.array([], type=pa.float64())})
            return pa.table({"i": pa.array(np.concatenate(out_i)),
                             "v": pa.array(np.concatenate(out_v))})

        out = ds.map_batches(sel, batch_format="pyarrow").to_pandas()
        res = {s: np.array([], dtype=np.float64) for s in uniq}
        for i, sub in out.groupby("i"):
            a = sub["v"].to_numpy(dtype=np.float64)
            a.sort()
            res[uniq[int(i)]] = a
        return res

    # level-0 histograms for every non-degenerate group in ONE pass
    level0 = _histogram(
        [(k, lo_g[k], hi_g[k], True) for k in groups if lo_g[k] < hi_g[k]]
    )

    rows = []
    # Each selection walks its group's memoized histogram toward a
    # pull-sized bucket. Refinements of overfull buckets batch
    # LEVEL-SYNCHRONOUSLY: every selection still active at depth d joins
    # one _histogram pass — at most 2 extra passes total, never one per
    # group. No data is pulled during the walk.
    active = []  # [key, q, rank, lo_, hi_, ranks below window, counts, depth]
    for key in groups:
        for q in sorted(float(q) for q in qs):
            if lo_g[key] == hi_g[key]:  # constant group
                rows.append((key, q, lo_g[key]))
                continue
            k = max(int(np.ceil(n_g[key] * q)), 1)
            active.append([key, q, k, lo_g[key], hi_g[key], 0,
                           level0[(key, lo_g[key], hi_g[key], True)], 0])
    pending = []  # (key, q, rank, pull spec, ranks below bucket, bucket n)
    while active:
        nxt = []
        for st in active:
            key, q, k, lo_, hi_, below, counts, depth = st
            edges = np.linspace(lo_, hi_, n_buckets + 1)
            cum = below + np.cumsum(counts)
            b = int(np.searchsorted(cum, k))  # first bucket reaching rank k
            b_lo, b_hi = float(edges[b]), float(edges[b + 1])
            b_below = int(cum[b] - counts[b])
            b_closed = (b == n_buckets - 1) and (hi_ == hi_g[key])
            if counts[b] > max_pull and depth < 2 and b_hi > b_lo:
                nxt.append([key, q, k, b_lo, b_hi, b_below, None, depth + 1])
            else:
                pending.append((key, q, k, (key, b_lo, b_hi, b_closed),
                                b_below, int(counts[b])))
        if nxt:
            hres = _histogram(
                [(s[0], s[3], s[4], s[4] == hi_g[s[0]]) for s in nxt]
            )
            for s in nxt:
                s[6] = hres[(s[0], s[3], s[4], s[4] == hi_g[s[0]])]
        active = nxt
    if pending:
        # Chunk the pulls so co-resident pulled values stay bounded on the
        # driver: each spec's in-window row count is known exactly (its
        # bucket count), so greedy-pack specs up to ~8·max_pull values per
        # pass — one pass in the common case; a pathological depth-capped
        # overfull bucket rides alone rather than OOMing the batch.
        want: dict = {}
        for _, _, _, spec, _, cnt in pending:
            want.setdefault(spec, cnt)
        chunks, cur, cur_n = [], [], 0
        for spec, cnt in want.items():
            if cur and cur_n + cnt > max_pull * 8:
                chunks.append(cur)
                cur, cur_n = [], 0
            cur.append(spec)
            cur_n += cnt
        chunks.append(cur)
        for chunk in chunks:
            pulled = _pull_many(chunk)
            members = set(chunk)
            for key, q, k, spec, b_below, _ in pending:
                if spec in members:
                    rows.append((key, q, float(pulled[spec][k - b_below - 1])))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({by: pa.array([r[0] for r in rows], type=pa.string()),
                     "q": pa.array([r[1] for r in rows], type=pa.float64()),
                     "value": pa.array([r[2] for r in rows], type=pa.float64())})


SLIDE_US = WINDOW_US // 4  # 15-minute slide


def sliding_window_events(sf_dir: str):
    """SLIDING 1-hour windows with a 15-minute slide over events:
    (window_us, event_type, n_events, sum_value_r) — the overlapping-window
    streaming aggregate ``windowed_events`` (tumbling) doesn't cover.

    Map-side each event explodes into the WINDOW/SLIDE = 4 windows that
    contain it and partially combines within the batch BEFORE the shuffle
    (the explode factor is paid once into the tiny partial rows, never into
    an all-to-all of raw events); the final groupby is over (window, type)
    aggregates only. Windows are aligned to the slide; a window's key is
    its start."""
    import pandas as pd
    from ray.data.aggregate import Sum

    k = WINDOW_US // SLIDE_US

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        # last slide-aligned window start containing ts, then k-1 earlier ones
        last = (ts // SLIDE_US) * SLIDE_US
        win = np.concatenate([last - i * SLIDE_US for i in range(k)])
        df = pd.DataFrame(
            {
                "window_us": win,
                "event_type": np.tile(et, k),
                "n": 1,
                "v": np.tile(val, k),
            }
        )
        g = df.groupby(["window_us", "event_type"], as_index=False).agg(
            n=("n", "sum"), v=("v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["window_us", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("v", alias_name="sum_value"))
    )
    out = ds.to_pandas()
    out["sum_value_r"] = _round_vec(out["sum_value"].to_numpy())
    out["n_events"] = out["n_events"].astype("int64")
    return out[["window_us", "event_type", "n_events", "sum_value_r"]]


def range_join_events(sf_dir: str, delta_us: int = WINDOW_US):
    """Range (interval) join — an operator Ray Data lacks: every 'click'
    event matched to ALL of the same user's 'view' events with
    ``view.ts ∈ [click.ts − delta_us, click.ts]`` (inclusive), the
    attribution-window join of event analytics. Output
    (click_id, view_id, lag_us), one row per qualifying pair.

    Shape (the as-of join's partitioning, generalized from latest-1 to
    all-in-window): users hash into fixed partitions, so every qualifying
    pair is partition-local; per partition ONE vectorized pass — views
    lexsorted by (user, ts) and packed into a (dense user rank << 42) | Δts
    composite key, per-click [lo, hi) bounds via two ``np.searchsorted``
    calls over the packed keys, pair expansion via repeat + offset arange
    (no Python over clicks or pairs). Partitioning assumption: pairs join
    within a user — time does NOT partition (a window straddles any time
    cut), which is why the key is the user, exactly like ``asof_join``."""
    import ray.data as rd

    def add_part(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_type": batch["event_type"],
                "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            }
        )

    empty = pa.table(
        {
            "click_id": pa.array([], type=pa.int64()),
            "view_id": pa.array([], type=pa.int64()),
            "lag_us": pa.array([], type=pa.int64()),
        }
    )

    def join_window(group: pa.Table) -> pa.Table:
        et = group["event_type"].to_numpy(zero_copy_only=False)
        is_c, is_v = et == "click", et == "view"
        if not (is_c.any() and is_v.any()):
            return empty
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dense user ranks shared by both sides; ts offsets must fit the low
        # 42 bits of the packed key (≈ 50 days of µs — the events table
        # spans weeks; a wider span would bump the shift, not the algorithm)
        uranks = np.unique(uid)
        t0 = int(ts.min())
        span = int(ts.max()) - t0
        shift = max(42, span.bit_length() + 1)
        # int64 headroom: distinct users per PARTITION must fit above the
        # ts bits (2^21 at shift=42). _USER_PARTITIONS is the scale knob —
        # more partitions ⇒ fewer users each; fail loud rather than wrap.
        if (uranks.size >> (63 - shift)) > 0:
            raise ValueError(
                f"range_join key overflow: {uranks.size} users × 2^{shift} ts "
                "bits — raise _USER_PARTITIONS for this corpus"
            )
        ur = np.searchsorted(uranks, uid).astype(np.int64)
        key = (ur << shift) | (ts - t0)

        vsel = np.nonzero(is_v)[0]
        vkey = np.sort(key[vsel])
        vorder = vsel[np.argsort(key[vsel], kind="stable")]
        csel = np.nonzero(is_c)[0]
        lo_ts = np.maximum(ts[csel] - delta_us - t0, 0)
        lo = np.searchsorted(vkey, (ur[csel] << shift) | lo_ts, side="left")
        hi = np.searchsorted(vkey, (ur[csel] << shift) | (ts[csel] - t0), side="right")
        counts = hi - lo
        keep = counts > 0
        if not keep.any():
            return empty
        csel, lo, counts = csel[keep], lo[keep], counts[keep]
        total = int(counts.sum())
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        vidx = vorder[np.repeat(lo, counts) + np.arange(total) - np.repeat(starts, counts)]
        cidx = np.repeat(csel, counts)
        return pa.table(
            {
                "click_id": pa.array(eid[cidx], type=pa.int64()),
                "view_id": pa.array(eid[vidx], type=pa.int64()),
                "lag_us": pa.array(ts[cidx] - ts[vidx], type=pa.int64()),
            }
        )

    return (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        .map_batches(add_part, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(join_window, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Fact-fact co-partition join (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

Q3_CUTOFF_US = 896_659_200_000_000  # 1998-06-01 epoch-µs
_OKEY_PARTITIONS = 64
_Q3_MIX = np.uint64(0x9E3779B97F4A7C15)


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING"):
    """TPC-H Q3 shape: revenue per qualifying order — customers in one
    market segment, orders placed before the cutoff, revenue from line
    items shipped after it. Returns (l_orderkey, o_orderdate_us,
    revenue_r) for every qualifying order (no LIMIT: the top-k pattern is
    covered elsewhere and a rounded-revenue cut would be float-boundary
    brittle).

    The join story this entry adds: a FACT-FACT equi-join. Neither side is
    broadcastable at scale, so both sides hash-co-partition on o_orderkey
    into ``_OKEY_PARTITIONS`` fixed partitions and a vectorized searchsorted
    zip finishes each partition — no ``Dataset.join`` actor pools, no
    all-to-all beyond the one co-partition exchange, and the lineitem side
    pre-aggregates revenue per order INSIDE each batch before shuffling
    (map-side combine), so the exchange carries one row per (batch, order),
    not one per line item. The customer segment filter is a broadcast
    semi-join (customer is the small dimension here; were it fact-sized it
    would join through the same co-partition path)."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    seg = np.asarray(cust["c_mktsegment"].to_pylist(), dtype=object) == segment
    ckeys = np.sort(cust["c_custkey"].to_numpy(zero_copy_only=False)[seg])
    ck_ref = ray.put(ckeys)

    def orders_side(batch: pa.Table) -> pa.Table:
        ck = ray.get(ck_ref)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ocust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        odate = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = odate < Q3_CUTOFF_US
        if ck.size:
            pos = np.minimum(np.searchsorted(ck, ocust), ck.size - 1)
            m &= ck[pos] == ocust
        else:
            m &= False
        okey, odate = okey[m], odate[m]
        q = ((okey.astype(np.uint64) * _Q3_MIX) % np.uint64(_OKEY_PARTITIONS)).astype(np.int64)
        return pa.table(
            {
                "q": pa.array(q),
                "side": pa.array(np.zeros(okey.size, dtype=np.int64)),
                "okey": pa.array(okey),
                "odate": pa.array(odate),
                "rev": pa.array(np.zeros(okey.size, dtype=np.float64)),
            }
        )

    def lineitem_side(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        m = ship > Q3_CUTOFF_US
        okey = okey[m]
        # prices/discounts are 2-dp by contract: integer cents × hundredths
        # keeps every partial sum EXACT, so the engine's summation order can
        # never flip a rounding boundary against the SQL oracle (one row in
        # 1290 did at sf0.01 with float partials)
        rev = np.rint(price[m] * 100.0) * np.rint((1.0 - disc[m]) * 100.0)
        # map-side combine: one row per distinct order in the batch
        uk, inv = np.unique(okey, return_inverse=True)
        rsum = np.bincount(inv, weights=rev, minlength=uk.size)
        q = ((uk.astype(np.uint64) * _Q3_MIX) % np.uint64(_OKEY_PARTITIONS)).astype(np.int64)
        return pa.table(
            {
                "q": pa.array(q),
                "side": pa.array(np.ones(uk.size, dtype=np.int64)),
                "okey": pa.array(uk),
                "odate": pa.array(np.zeros(uk.size, dtype=np.int64)),
                "rev": pa.array(rsum.astype(np.float64)),
            }
        )

    def join_partition(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        okey = group["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        odate = group["odate"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = group["rev"].to_numpy(zero_copy_only=False)
        o_m = side == 0
        ok_sorted = np.sort(okey[o_m])
        od_sorted = odate[o_m][np.argsort(okey[o_m], kind="stable")]
        lk, lr = okey[~o_m], rev[~o_m]
        empty = pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "o_orderdate_us": pa.array([], type=pa.int64()),
                "revenue_r": pa.array([], type=pa.float64()),
            }
        )
        if ok_sorted.size == 0 or lk.size == 0:
            return empty
        pos = np.minimum(np.searchsorted(ok_sorted, lk), ok_sorted.size - 1)
        hit = ok_sorted[pos] == lk
        lk, lr, pos = lk[hit], lr[hit], pos[hit]
        if lk.size == 0:
            return empty
        # sum per-batch revenue partials per order (keys are partition-local)
        uk, inv = np.unique(lk, return_inverse=True)
        rsum = np.bincount(inv, weights=lr, minlength=uk.size)
        upos = np.searchsorted(ok_sorted, uk)
        # rsum holds exact integers (cents × hundredths); /1e4 and round(2)
        # operate on the SAME double the SQL oracle derives from its integer
        return pa.table(
            {
                "l_orderkey": pa.array(uk),
                "o_orderdate_us": pa.array(od_sorted[upos]),
                "revenue_r": pa.array(_round_vec(rsum / 10000.0, 2), type=pa.float64()),
            }
        )

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow", batch_size=8192)
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    return orders.union(items).groupby("q").map_groups(
        join_partition, batch_format="pyarrow"
    )
