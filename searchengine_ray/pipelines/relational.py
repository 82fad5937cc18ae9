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

from searchengine_ray.pipelines.dedup import _memoized_hash64, _simhash_hash64
from searchengine_ray.pipelines.fulltext import _round_vec, round_half_away
from searchengine_ray.sources import read_parquet_clean

WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def _bucket_partial(batch: pa.Table, bucket_us: int, key: str,
                    with_value: bool = True) -> pa.Table:
    """Shared map-side partial for the time-bucketed aggregates
    (windowed_events hourly, cube_events daily, hourly_gap_fill counts):
    integer-floor bucket key (no Python datetime per row), per-(bucket,
    type) combine inside the batch BEFORE any exchange — the single copy
    of the pattern. ``with_value=False`` skips the value-sum column for
    count-only callers. The timestamp normalizes to µs before the int64
    view so a ns-resolution file can't scale the bucket width; null
    event types drop here (pandas groupby dropna), map-side."""
    import pandas as pd

    ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
          .to_numpy(zero_copy_only=False))
    win = (ts // bucket_us) * bucket_us
    cols = {
        key: win,
        "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
        "n": 1,
    }
    aggs = {"n": ("n", "sum")}
    if with_value:
        cols["v"] = batch["value"].to_numpy(zero_copy_only=False)
        aggs["v"] = ("v", "sum")
    g = pd.DataFrame(cols).groupby([key, "event_type"],
                                   as_index=False).agg(**aggs)
    return pa.Table.from_pandas(g, preserve_index=False)


def windowed_events(sf_dir: str):
    """Tumbling 1-hour windows over events: (window_start, event_type,
    n_events, sum_value_r). Partial per-batch combine → small groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "event_type", "value"],
        )
        .map_batches(lambda b: _bucket_partial(b, WINDOW_US, "window_us"),
                     batch_format="pyarrow", batch_size=8192)
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


def _user_part_table(batch: pa.Table, extra: dict) -> pa.Table:
    """Shared user-hash shuffle projection for the per-user event
    operators (running/funnel/retention/event_transitions): q = user %
    _USER_PARTITIONS plus the µs timestamp, with operator-specific extra
    columns appended. The r3-frozen kernels (sessionize, as-of) keep their
    inline copies — touching them would re-open their
    unchanged-since-driver-green rotation status for a pure refactor."""
    u = batch["user_id"].to_numpy(zero_copy_only=False)
    cols = {
        "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
        "user_id": batch["user_id"],
        # normalize resolution BEFORE the int cast: a timestamp[ns]
        # input (e.g. pandas-written parquet) must still yield µs
        "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
    }
    cols.update(extra)
    return pa.table(cols)


def running_user_totals(sf_dir: str):
    """Per-user RUNNING window aggregates over event time — the ROWS-frame
    window-function surface (sum/count/max OVER (PARTITION BY user ORDER BY
    ts ROWS UNBOUNDED PRECEDING) plus a ROWS 3 PRECEDING moving sum) that
    the bucket-window entries (tumbling/sliding/sessionize) don't cover:
    (user_id, event_id, ts_us, cum_n, cum_value_r, run_max_r, mov_sum4_r).

    Shape: hash users into ``_USER_PARTITIONS`` fixed partitions, ONE
    vectorized pass per partition — sort by (user, ts), then segmented
    cumsum / cummax / frame-diff over the whole partition at once (no
    per-user Python dispatch). Values are 2-dp by contract → int64 cents
    keep every running sum EXACT, so accumulation order can never drift a
    cent against the SQL oracle. Output is one row per event and stays a
    distributed Dataset."""

    def add_part(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return _user_part_table(
            batch, {"event_id": batch["event_id"], "cents": pa.array(cents)}
        )

    def running(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = group["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, eid, ts, cents = uid[order], eid[order], ts[order], cents[order]
        n = uid.size
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(new) - 1  # segment id per row
        starts = np.nonzero(new)[0]
        start_of = starts[seg]  # segment start index per row
        idx = np.arange(n, dtype=np.int64)
        cum_n = idx - start_of + 1
        c = np.cumsum(cents)
        base = np.where(start_of > 0, c[start_of - 1], 0)
        cum = c - base
        # segmented cummax: cents < 2^31 by contract, so (seg << 32) | x is
        # monotone across segment boundaries and plain maximum.accumulate
        # restarts per segment after the shift is removed
        run_max = (
            np.maximum.accumulate((seg << np.int64(32)) + cents)
            - (seg << np.int64(32))
        )
        # ROWS 3 PRECEDING frame: cum[i] - cum[i-4], clamped at segment head
        j = idx - 4
        valid = j >= start_of
        mov4 = c - np.where(valid, c[np.maximum(j, 0)], base)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(eid),
                "ts_us": pa.array(ts),
                "cum_n": pa.array(cum_n),
                "cum_value_r": pa.array(cum / 100.0, type=pa.float64()),
                "run_max_r": pa.array(run_max / 100.0, type=pa.float64()),
                "mov_sum4_r": pa.array(mov4 / 100.0, type=pa.float64()),
            }
        )

    return (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "ts", "value"],
        )
        .map_batches(add_part, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(running, batch_format="pyarrow")
    )


FUNNEL_STEPS = ("view", "click", "signup", "purchase")
FUNNEL_GAP_US = 24 * 3_600_000_000  # conversion window per step


def funnel_depth(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS,
                 gap_us: int = FUNNEL_GAP_US):
    """Ordered event-sequence matching (product-analytics funnel): anchor
    each user at their FIRST ``steps[0]`` event, then advance one step per
    EARLIEST matching event that falls strictly after the previous match
    and within its ``gap_us`` conversion window — the standard
    fixed-anchor + conversion-window funnel definition (depth is a
    property of the first occurrence chain, NOT a search over alternative
    anchors) → (user_id, depth, ts1_us..ts4_us; -1 for unreached steps —
    a hashable sentinel, never NULL/NaN).

    Shape: users hash into ``_USER_PARTITIONS`` fixed partitions; ONE
    vectorized pass per partition — sort by (user, ts), then per step a
    boolean-mask + first-per-user reduction (np.unique on the eligible
    rows' user index) advances every user's frontier at once. No per-user
    Python dispatch, no self-joins; non-step events still mark user
    presence (depth 0 rows), mirroring the oracle's DISTINCT-user base."""

    step_set = pa.array(list(steps), type=pa.string())

    def add_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized step coding: index_in gives the step index or null
        code = pc.fill_null(
            pc.index_in(batch["event_type"], value_set=step_set), -1
        ).cast(pa.int64())
        return _user_part_table(batch, {"code": code})

    n_steps = len(steps)

    def funnel(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = group["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts, code = uid[order], ts[order], code[order]
        ud, inv = np.unique(uid, return_inverse=True)
        depth = np.zeros(ud.size, dtype=np.int64)
        t_prev = np.full(ud.size, np.iinfo(np.int64).min // 2, dtype=np.int64)
        ts_out = np.full((n_steps, ud.size), -1, dtype=np.int64)
        for k in range(n_steps):
            elig = (code == k) & (depth[inv] == k) & (ts > t_prev[inv])
            if k > 0:  # conversion window (anchor step is unconstrained)
                elig &= ts <= t_prev[inv] + gap_us
            if not elig.any():
                continue
            rows = np.nonzero(elig)[0]
            # rows are (user, ts)-sorted: the first row per user IS the
            # earliest eligible event for that user
            iu, first = np.unique(inv[rows], return_index=True)
            hit = rows[first]
            depth[iu] = k + 1
            t_prev[iu] = ts[hit]
            ts_out[k][iu] = ts[hit]
        cols = {"user_id": pa.array(ud), "depth": pa.array(depth)}
        for k in range(n_steps):
            cols[f"ts{k + 1}_us"] = pa.array(ts_out[k])
        return pa.table(cols)

    return (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        .map_batches(add_part, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(funnel, batch_format="pyarrow")
    )


def retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users cohorted by the DAY of their first
    ``signup`` event; for every (cohort_day, week_offset) cell, the number
    of DISTINCT cohort members with any event in that week (events before
    the cohort day are excluded) → (cohort_day_us, week_offset, n_users).

    Shape: one co-partition on user — each fixed user-hash partition owns
    every event of its users, so the first-signup anchor (segmented min),
    the per-event week offsets, and the DISTINCT (cohort, week, user)
    dedup all resolve locally in one vectorized pass; only per-cell count
    partials (≤ cohorts × weeks rows per partition) reach the final
    aggregate. The cell matrix is bounded by the calendar, not the corpus,
    so the driver-side final is contractually small."""

    def add_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return _user_part_table(
            batch,
            {"signup": pc.equal(
                pc.fill_null(batch["event_type"], ""), "signup")},
        )

    def cells(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        sgn = group["signup"].to_numpy(zero_copy_only=False)
        empty = pa.table({"cohort_day_us": pa.array([], type=pa.int64()),
                          "week_offset": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if not sgn.any():
            return empty
        ud, inv = np.unique(uid, return_inverse=True)
        # first-signup anchor per user, truncated to day
        first = np.full(ud.size, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, inv[sgn], ts[sgn])
        cohorted = first != np.iinfo(np.int64).max
        cohort_day = np.where(cohorted, (first // DAY_US) * DAY_US, -1)
        # per-event cells for cohorted users, events at/after the cohort day
        row_cd = cohort_day[inv]
        day = (ts // DAY_US) * DAY_US
        m = cohorted[inv] & (day >= row_cd)
        week = (day[m] - row_cd[m]) // (7 * DAY_US)
        # distinct (cohort, week, user) — partition owns all of a user's
        # events, so local dedup IS global dedup
        trip = np.unique(np.stack([row_cd[m], week, uid[m]], axis=1), axis=0)
        cw, n = np.unique(trip[:, :2], axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_day_us": pa.array(cw[:, 0]),
                "week_offset": pa.array(cw[:, 1]),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    parts = (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        .map_batches(add_part, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(cells, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pa.table({"cohort_day_us": pa.array([], type=pa.int64()),
                         "week_offset": pa.array([], type=pa.int64()),
                         "n_users": pa.array([], type=pa.int64())})
    agg = parts.groupby(["cohort_day_us", "week_offset"], as_index=False)["n"].sum()
    agg = agg.sort_values(["cohort_day_us", "week_offset"]).reset_index(drop=True)
    return pa.table(
        {
            "cohort_day_us": pa.array(agg["cohort_day_us"].to_numpy(dtype=np.int64)),
            "week_offset": pa.array(agg["week_offset"].to_numpy(dtype=np.int64)),
            "n_users": pa.array(agg["n"].to_numpy(dtype=np.int64)),
        }
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


def _counting_selector(ds, column: str, n_buckets: int, max_pull: int):
    """The distributed selection-by-counting kernel shared by
    ``exact_quantiles`` (rank = ceil(n·q), quantile_disc) and
    ``interp_quantiles`` (two ranks + interpolation, quantile_cont):
    returns (n, lo, hi, select) where ``select(k)`` is the EXACT k-th
    smallest value (1-based) of ``ds[column]``.

    A global sort of the column is an all-to-all shuffle of every row,
    but a k-th order statistic only needs (1) one pass for (n, min, max),
    (2) one histogram pass (fixed buckets over [min, max], counts summed
    driver-side — n_buckets ints per task), (3) a filtered pull of ONLY
    the bucket straddling the target rank (expected n/n_buckets rows),
    finished with an exact in-memory selection. A pathological value
    distribution that overfills a target bucket (> max_pull rows)
    recurses one level with a re-histogram of just that bucket's range.
    Ties handled exactly — selection is by rank, not value uniqueness.
    The histogram memo is shared across every select() call on the same
    selector, so k quantiles cost ONE histogram pass, not k."""

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
        return 0, 0.0, 0.0, None
    lo, hi = float(st["lo"].min()), float(st["hi"].max())
    if lo == hi:  # constant column: every rank is that value
        return n, lo, hi, (lambda k: lo)

    hist_memo: dict[tuple, tuple] = {}
    pull_memo: dict[tuple, np.ndarray] = {}

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
        # memoized like the histograms: consecutive ranks (the
        # quantile_cont pattern) almost always straddle the SAME bucket,
        # so the second order statistic reuses the first one's sorted pull
        key = (lo_, hi_, closed_hi)
        if key in pull_memo:
            return pull_memo[key]

        def sel(batch: pa.Table) -> pa.Table:
            v = batch[column].to_numpy(zero_copy_only=False).astype(np.float64)
            m = ~np.isnan(v) & (v >= lo_) & ((v <= hi_) if closed_hi else (v < hi_))
            return pa.table({column: pa.array(v[m])})

        out = ds.map_batches(sel, batch_format="pyarrow").to_pandas()
        pull_memo[key] = out[column].to_numpy()
        return pull_memo[key]

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

    return n, lo, hi, (lambda k: _select(k, lo, hi, 0))


def _events_value_selector(sf_dir: str, column: str, n_buckets: int,
                           max_pull: int):
    """Shared load for the global quantile entries: the pruned value
    column materializes once (object-store-resident, spillable) and every
    selection pass reads it. When the single column is itself too hot for
    the store, drop the ``materialize()`` — each pass then re-reads just
    that column from parquet, trading ~3 pruned scans for zero store
    residency; the algorithm is unchanged."""
    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=[column]
    ).materialize()
    return _counting_selector(ds, column, n_buckets, max_pull)


def _null_quantile_rows(qs, value_col: str) -> pa.Table:
    """Empty/all-NULL input: SQL's quantile_* over no non-NULL rows is
    NULL, not an absent row — emit one (q, NULL) row per target so the
    engine matches the oracle's UNION-of-scalars shape."""
    srt = sorted(float(q) for q in qs)
    return pa.table({"q": pa.array(srt, type=pa.float64()),
                     value_col: pa.array([None] * len(srt),
                                         type=pa.float64())})


def exact_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    column: str = "value", n_buckets: int = 8192,
                    max_pull: int = 262_144):
    """(q, value) EXACT discrete quantiles of ``events.column`` — the
    element at rank ceil(n·q) (DuckDB ``quantile_disc`` convention),
    through the shared :func:`_counting_selector` kernel (no sort, one
    histogram pass for all quantiles)."""
    n, _lo, _hi, select = _events_value_selector(sf_dir, column, n_buckets,
                                                 max_pull)
    if n == 0:
        return _null_quantile_rows(qs, "value")
    rows = [(float(q), select(max(int(np.ceil(n * q)), 1)))
            for q in sorted(qs)]
    return pa.table({"q": pa.array([r[0] for r in rows], type=pa.float64()),
                     "value": pa.array([r[1] for r in rows], type=pa.float64())})


def interp_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                     column: str = "value", n_buckets: int = 8192,
                     max_pull: int = 262_144):
    """(q, value_r) INTERPOLATED quantiles — DuckDB ``quantile_cont``:
    h = q·(n−1) (0-indexed), result = v⌊h⌋·(1−frac) + v⌈h⌉·frac, the
    exact FP formula DuckDB evaluates (verified against quantile_cont —
    the algebraically-equal ``lo + (hi−lo)·frac`` form differs in the
    last ulp and would hash-mismatch). The continuous complement of
    ``exact_quantiles``: same :func:`_counting_selector` kernel, TWO
    order statistics per target (consecutive ranks land in the same
    bucket, so the memoized histogram AND pull make the second nearly
    free), one interpolation on the driver; still no sort anywhere."""
    n, _lo, _hi, select = _events_value_selector(sf_dir, column, n_buckets,
                                                 max_pull)
    if n == 0:
        return _null_quantile_rows(qs, "value_r")
    rows = []
    for q in sorted(float(q) for q in qs):
        h = q * (n - 1)
        f = int(np.floor(h))
        frac = h - f
        v_lo = select(f + 1)
        v = v_lo if frac == 0.0 else (v_lo * (1.0 - frac)
                                      + select(f + 2) * frac)
        rows.append((q, v))
    return pa.table({
        "q": pa.array([r[0] for r in rows], type=pa.float64()),
        "value_r": pa.array(_round_vec(
            np.asarray([r[1] for r in rows], dtype=np.float64))),
    })


def group_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    by: str = "event_type", column: str = "value",
                    n_buckets: int = 8192, max_pull: int = 262_144,
                    ds=None):
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
    3 + pathology. Pass ``ds`` to select over a derived Dataset carrying
    the same (by, column) columns instead of the events table."""
    if ds is None:
        ds = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"), columns=[by, column]
        )
    ds = ds.materialize()

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


def _hash_partition(keys: np.ndarray) -> np.ndarray:
    """Fixed-partition assignment shared by every co-partition operator in
    this module — both sides of a join MUST hash identically, so this is
    the single copy of the formula."""
    return ((keys.astype(np.uint64) * _Q3_MIX)
            % np.uint64(_OKEY_PARTITIONS)).astype(np.int64)


# --- shared two-exchange-chain scaffolding (q5 / q7 / q8 family) ----------
# Every exchange row is (q, side, k, a[, b]): q = fixed partition of k,
# side 0 = the build side of the partition join, side ≥ 1 = probe rows
# (the lineitem stages encode a per-row count as side = 1000 + n). The
# three helpers below are the single copy of the emit / split / probe
# machinery; each query keeps only its own filters, gates and aggregation.


def _exchange_rows(k: np.ndarray, side, a: np.ndarray,
                   b: np.ndarray | None = None) -> pa.Table:
    """Build one exchange-row table keyed by ``_hash_partition(k)``.
    ``side`` is an int (broadcast to every row) or a per-row array."""
    if not isinstance(side, np.ndarray):
        side = np.full(k.size, side, dtype=np.int64)
    cols = {"q": pa.array(_hash_partition(k)), "side": pa.array(side),
            "k": pa.array(k), "a": pa.array(a)}
    if b is not None:
        cols["b"] = pa.array(b)
    return pa.table(cols)


def _exchange_empty(with_b: bool = True) -> pa.Table:
    """The empty exchange-row table (the shared shuffle-row schema)."""
    z = pa.array([], type=pa.int64())
    cols = {"q": z, "side": z, "k": z, "a": z}
    if with_b:
        cols["b"] = z
    return pa.table(cols)


def _split_exchange_group(group: pa.Table):
    """Split one co-partition group into its k-SORTED side-0 build rows
    and its raw probe rows: returns ((k0, a0, b0), (k1, a1, b1, side1)),
    where b* is None when the group carries no ``b`` column."""
    side = group["side"].to_numpy(zero_copy_only=False)
    k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = (group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
         if "b" in group.column_names else None)
    m0 = side == 0
    order = np.argsort(k[m0], kind="stable")
    build = (k[m0][order], a[m0][order],
             None if b is None else b[m0][order])
    probe = (k[~m0], a[~m0], None if b is None else b[~m0], side[~m0])
    return build, probe


def _sorted_probe(sorted_keys: np.ndarray,
                  keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Membership probe of ``keys`` against ``sorted_keys``: returns
    (pos, hit) where hit marks keys present and pos is their index (the
    searchsorted + clip + equality idiom, single copy)."""
    if sorted_keys.size == 0 or keys.size == 0:
        return (np.zeros(keys.size, dtype=np.int64),
                np.zeros(keys.size, dtype=bool))
    pos = np.minimum(np.searchsorted(sorted_keys, keys),
                     sorted_keys.size - 1)
    return pos, sorted_keys[pos] == keys


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
        q = _hash_partition(okey)
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
        q = _hash_partition(uk)
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
        order = np.argsort(okey[o_m], kind="stable")
        ok_sorted = okey[o_m][order]
        od_sorted = odate[o_m][order]
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


Q1_CUTOFF_US = 904_694_400_000_000  # 1998-09-02 epoch-µs
DAY_US = 86_400_000_000


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: the multi-aggregate pricing summary per
    (l_returnflag, l_linestatus) over line items shipped on/before the
    cutoff — sums, averages and a row count in ONE pass.

    Scale shape: every aggregate is a map-side partial combined inside each
    batch (the group key has ≤6 values, so the exchange carries a handful
    of int64 rows per batch, never line items); the final combine is a tiny
    driver groupby. All money/quantity sums are EXACT integer arithmetic
    (cents; cents×hundredths for the discounted price; cents×hundredths²
    for the charge — the q3_shipping_priority convention, reference parity
    for `IndexingServiceImpl`'s batched aggregation pattern), so partial
    summation order can never flip a rounding boundary against the SQL
    oracle; the /10^k and round happen once, on the same doubles DuckDB
    derives from its integer sums."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = ship <= Q1_CUTOFF_US
        if not m.any():
            return pa.table({"f": pa.array([], type=pa.string()),
                             "s": pa.array([], type=pa.string()),
                             "qty_i": pa.array([], type=pa.int64()),
                             "price_i": pa.array([], type=pa.int64()),
                             "disc_price_i": pa.array([], type=pa.int64()),
                             "charge_i": pa.array([], type=pa.int64()),
                             "disc_i": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        flag = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)[m]
        stat = np.asarray(batch["l_linestatus"].to_pylist(), dtype=object)[m]
        qty_i = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)[m] * 100.0).astype(np.int64)
        price_i = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        tax = batch["l_tax"].to_numpy(zero_copy_only=False)[m]
        disc_i = np.rint(disc * 100.0).astype(np.int64)
        one_m_disc_i = np.rint((1.0 - disc) * 100.0).astype(np.int64)
        one_p_tax_i = np.rint((1.0 + tax) * 100.0).astype(np.int64)
        # per-batch int64 partials are exact: charge_i ≤ ~1.25e11/row, so a
        # batch needs >7e7 rows to approach int64 — far above any block size
        df = pd.DataFrame({
            "f": flag,
            "s": stat,
            "qty_i": qty_i,
            "price_i": price_i,
            "disc_price_i": price_i * one_m_disc_i,
            "charge_i": price_i * one_m_disc_i * one_p_tax_i,
            "disc_i": disc_i,
            "n": np.ones(qty_i.size, dtype=np.int64),
        })
        out = df.groupby(["f", "s"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # all-empty blocks drop column names in to_pandas
        f64, i64 = pa.float64(), pa.int64()
        return pa.table({
            "l_returnflag": pa.array([], type=pa.string()),
            "l_linestatus": pa.array([], type=pa.string()),
            "sum_qty": pa.array([], type=f64),
            "sum_base_price": pa.array([], type=f64),
            "sum_disc_price": pa.array([], type=f64),
            "sum_charge": pa.array([], type=f64),
            "avg_qty": pa.array([], type=f64),
            "avg_price": pa.array([], type=f64),
            "avg_disc": pa.array([], type=f64),
            "count_order": pa.array([], type=i64),
        })
    # final combine in PYTHON ints (object dtype): a per-group global
    # charge_i sum can pass int64 at ~7e7 qualifying rows per group, where
    # numpy would wrap silently — arbitrary precision matches the oracle's
    # exact BIGINT/HUGEINT sum at any scale
    for c in ("qty_i", "price_i", "disc_price_i", "charge_i", "disc_i", "n"):
        parts[c] = parts[c].astype(object)
    agg = parts.groupby(["f", "s"], as_index=False).sum().sort_values(["f", "s"])
    n = agg["n"].to_numpy(dtype=np.float64)
    qty = agg["qty_i"].to_numpy(dtype=np.float64) / 100.0
    price = agg["price_i"].to_numpy(dtype=np.float64) / 100.0
    return pa.table({
        "l_returnflag": pa.array(agg["f"].to_numpy(), type=pa.string()),
        "l_linestatus": pa.array(agg["s"].to_numpy(), type=pa.string()),
        "sum_qty": pa.array(_round_vec(qty, 2), type=pa.float64()),
        "sum_base_price": pa.array(_round_vec(price, 2), type=pa.float64()),
        "sum_disc_price": pa.array(
            _round_vec(agg["disc_price_i"].to_numpy(dtype=np.float64) / 10_000.0, 2),
            type=pa.float64()),
        "sum_charge": pa.array(
            _round_vec(agg["charge_i"].to_numpy(dtype=np.float64) / 1_000_000.0, 2),
            type=pa.float64()),
        "avg_qty": pa.array(_round_vec(qty / n, 4), type=pa.float64()),
        "avg_price": pa.array(_round_vec(price / n, 4), type=pa.float64()),
        "avg_disc": pa.array(
            _round_vec(agg["disc_i"].to_numpy(dtype=np.float64) / 100.0 / n, 4),
            type=pa.float64()),
        "count_order": pa.array(agg["n"].to_numpy(dtype=np.int64)),
    })


HLL_B = 8  # register-index bits → m = 256 registers
_HLL_M = 1 << HLL_B


def _sketch_dense(sf_dir: str, column: str, partial, key: str, val: str,
                  agg: str, size: int) -> np.ndarray:
    """Shared sketch-build scaffold (HLL / Count-Min / Bloom): stream
    per-batch partials (each ≤ ``size`` rows regardless of row count),
    merge through ONE ≤``size``-group exchange (``agg`` ∈ max/sum — the
    sketch's merge operator), densify the ≤``size``-row driver result.
    The empty-parts guard matters: Ray's ``to_pandas`` on an all-empty
    Dataset drops column names."""
    getter = getattr(
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=[column])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(key), agg)
    parts = getter(val).to_pandas()
    dense = np.zeros(size, dtype=np.int64)
    if not parts.empty:
        dense[parts[key].to_numpy(dtype=np.int64)] = (
            parts[f"{agg}({val})"].to_numpy(dtype=np.int64))
    return dense


# One shared md5-prefix convention: reuse dedup's hash (the SQL oracles on
# both sides rebuild the SAME bytes), memoized because sketch inputs are
# Zipf-skewed — hot keys recur in nearly every batch.
_hll_hash64 = _memoized_hash64(_simhash_hash64)


def hll_registers(sf_dir: str, column: str = "user_id"):
    """Distributed HyperLogLog sketch BUILD over ``events.column`` —
    the mergeable cardinality sketch (Flajolet et al. 2007): every value
    hashes to (register = top ``HLL_B`` bits, rho = leading-zero count of
    the remaining 56 bits + 1) and each register keeps the max rho. The
    output is the DENSE register table (reg_idx, max_rho; 0 = never hit) —
    exact integers, so the sketch state itself is oracle-checkable; the
    floating-point estimator lives in :func:`hll_estimate` and is
    pytest-bounded against the exact count.

    Scale shape: register partials merge by MAX, so each batch collapses
    to ≤ m = 256 (reg, rho) rows regardless of row count, a ≤256-group
    exchange merges them, and the dense fill happens on the ≤256-row
    driver result. One pass, no distinct-set state anywhere — the whole
    point of the sketch at 100 TB."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        uv = np.unique(v)
        regs = np.zeros(_HLL_M, dtype=np.int64)
        for x in uv.tolist():  # md5 per DISTINCT value in the batch
            h = _hll_hash64(str(x))
            idx = h >> 56
            rem = h & ((1 << 56) - 1)
            rho = 57 - rem.bit_length() if rem else 57
            if rho > regs[idx]:
                regs[idx] = rho
        nz = np.nonzero(regs)[0]
        return pa.table({"reg_idx": pa.array(nz.astype(np.int64)),
                         "max_rho": pa.array(regs[nz])})

    regs = _sketch_dense(sf_dir, column, partial,
                         "reg_idx", "max_rho", "max", _HLL_M)
    return pa.table({"reg_idx": pa.array(np.arange(_HLL_M, dtype=np.int64)),
                     "max_rho": pa.array(regs)})


def hll_estimate(sf_dir: str, column: str = "user_id") -> float:
    """HyperLogLog cardinality estimate from :func:`hll_registers`, with
    the standard small-range (linear counting) and bias corrections —
    deterministic given the md5 hash, pytest-bounded vs the exact count."""
    regs = hll_registers(sf_dir, column)["max_rho"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting
    return float(est)


CM_D = 4   # count-min hash rows
CM_W = 64  # buckets per row


def _salted_bucket(j: int, v, w: int) -> int:
    """Hash-function-j bucket of value v in a width-w table: low 56 bits
    of md5(f"{j}:{v}") mod w — the shared md5-prefix convention
    (:func:`dedup._simhash_hash64`), salted per hash row and memoized.
    One helper serves the Count-Min and Bloom sketches so their SQL
    oracles rebuild identical bytes."""
    h = _hll_hash64(f"{j}:{v}")
    return (h & ((1 << 56) - 1)) % w


def _cm_bucket(j: int, v: int) -> int:
    """Row-j count-min bucket of value v (see :func:`_salted_bucket`)."""
    return _salted_bucket(j, v, CM_W)


def countmin_cells(sf_dir: str, column: str = "user_id"):
    """Distributed Count-Min sketch BUILD over ``events.column`` — the
    mergeable frequency sketch (Cormode & Muthukrishnan 2005): every
    occurrence adds 1 to one bucket per hash row, and a point query reads
    the MIN across rows (never under-counts). Output is the dense cell
    table (row_j, bucket, count) — exact integers, so the sketch state is
    oracle-checkable; the point-query bound lives in
    :func:`countmin_query` and is pytest-verified.

    Scale shape: cell partials merge by SUM, so each batch collapses to
    ≤ d×w = 256 cells regardless of row count, a ≤256-group exchange sums
    them, and the dense fill happens on the 256-row driver result — the
    additive mirror of :func:`hll_registers`' max-merge."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        uv, cnt = np.unique(v, return_counts=True)
        cells = np.zeros((CM_D, CM_W), dtype=np.int64)
        for x, c in zip(uv.tolist(), cnt.tolist()):
            for j in range(CM_D):
                cells[j, _cm_bucket(j, x)] += c
        jj, bb = np.nonzero(cells)
        return pa.table({"cell": pa.array(jj.astype(np.int64) * CM_W + bb),
                         "c": pa.array(cells[jj, bb])})

    dense = _sketch_dense(sf_dir, column, partial,
                          "cell", "c", "sum", CM_D * CM_W)
    idx = np.arange(CM_D * CM_W, dtype=np.int64)
    return pa.table({"row_j": pa.array(idx // CM_W),
                     "bucket": pa.array(idx % CM_W),
                     "count": pa.array(dense)})


def countmin_query(sf_dir: str, values, column: str = "user_id"):
    """Point-query the count-min sketch: min across rows of each value's
    bucket — ≥ the true frequency by construction (pytest-verified)."""
    t = countmin_cells(sf_dir, column)
    dense = t["count"].to_numpy(zero_copy_only=False).reshape(CM_D, CM_W)
    return {
        int(v): int(min(dense[j, _cm_bucket(j, int(v))] for j in range(CM_D)))
        for v in values
    }


BLOOM_M = 512  # filter bits
BLOOM_K = 3    # hash functions


def bloom_bits(sf_dir: str, column: str = "user_id"):
    """Distributed Bloom filter BUILD over ``events.column`` (Bloom 1970)
    — the membership sketch that rounds out the mergeable-sketch family
    (HLL = cardinality, Count-Min = frequency, Bloom = membership; at
    100 TB this is the "have we seen this doc/url/user before" structure
    a curation pipeline broadcasts instead of a distinct-key set). Each
    value sets ``BLOOM_K`` row-salted md5 buckets; partials merge by OR.
    Output is the dense (bit_idx, bit) table — exact integers, so the
    filter state itself is oracle-checkable; the membership probe lives
    in :func:`bloom_contains` (no false negatives, pytest-verified).

    Scale shape: the additive mirror of :func:`hll_registers` — each
    batch collapses to ≤ ``BLOOM_M`` set-bit rows regardless of row
    count, a ≤``BLOOM_M``-group max-merge exchange finishes, and the
    dense fill happens on the ≤512-row driver result."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        uv = np.unique(v)
        bits = np.zeros(BLOOM_M, dtype=bool)
        for x in uv.tolist():  # md5 per DISTINCT value per hash row
            for j in range(BLOOM_K):
                bits[_salted_bucket(j, x, BLOOM_M)] = True
        nz = np.nonzero(bits)[0]
        return pa.table({"bit_idx": pa.array(nz.astype(np.int64)),
                         "b": pa.array(np.ones(nz.size, dtype=np.int64))})

    bits = _sketch_dense(sf_dir, column, partial,
                         "bit_idx", "b", "max", BLOOM_M)
    return pa.table({"bit_idx": pa.array(np.arange(BLOOM_M, dtype=np.int64)),
                     "bit": pa.array(bits)})


def bloom_contains(sf_dir: str, values, column: str = "user_id"):
    """Probe the Bloom filter: value maybe-present iff ALL its buckets are
    set — never a false negative by construction (pytest-verified)."""
    bits = bloom_bits(sf_dir, column)["bit"].to_numpy(zero_copy_only=False)
    return {
        int(v): bool(all(bits[_salted_bucket(j, int(v), BLOOM_M)]
                         for j in range(BLOOM_K)))
        for v in values
    }


KMV_K = 64  # sketch size (bottom-k retained hashes)


def kmv_distinct(sf_dir: str, column: str = "user_id", k: int = KMV_K):
    """Distributed KMV / bottom-k distinct sketch BUILD over
    ``events.column`` (Bar-Yossef et al. 2002; the theta-sketch core):
    keep the ``k`` smallest md5-prefix hash values over distinct inputs.
    Hashes are 16-hex-char strings, which order lexicographically exactly
    as their uint64 values — so the sketch state is the k smallest hex
    strings and the oracle is a plain ``row_number() OVER (ORDER BY h)``.
    Output: (pos 1..k, h), exact; the cardinality estimator lives in
    :func:`kmv_estimate` and is pytest-bounded vs the exact count.

    Scale shape: bottom-k is distributive — each batch ships its local
    bottom-k (≤ k rows regardless of row count) tagged with its top hex
    nibble; a 16-way bucket combine cuts each bucket to its bottom-k in
    parallel (the global bottom-k is a subset of the union of per-bucket
    bottom-ks), and the driver merges ≤ 16·k rows. Every level is bounded
    — no single-task funnel, no distinct-value set anywhere."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        uv = np.unique(v)
        hs = sorted(format(_hll_hash64(str(x)), "016x") for x in uv.tolist())[:k]
        return pa.table({
            "b": pa.array(np.asarray([int(h[0], 16) for h in hs],
                                     dtype=np.int64)),
            "h": pa.array(hs, type=pa.string()),
        })

    def combine(group: pa.Table) -> pa.Table:
        hs = np.unique(np.asarray(group["h"].to_pylist(), dtype=object))
        return pa.table({"h": pa.array(hs[:k].tolist(), type=pa.string())})

    got = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=[column])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("b")
        .map_groups(combine, batch_format="pyarrow")
        .to_pandas()
    )
    # empty-corpus guard: no groups → to_pandas drops column names
    hs = (np.array([], dtype=object) if got.empty
          else np.unique(np.asarray(got["h"].tolist(), dtype=object))[:k])
    return pa.table({
        "pos": pa.array(np.arange(1, hs.size + 1, dtype=np.int64)),
        "h": pa.array(hs.tolist(), type=pa.string()),
    })


def kmv_estimate(sf_dir: str, column: str = "user_id", k: int = KMV_K) -> float:
    """KMV cardinality estimate: exact count when the sketch holds fewer
    than k hashes (it then holds ALL of them), else (k-1)·2^64 / h_k —
    deterministic given the md5 hash, pytest-bounded vs exact."""
    t = kmv_distinct(sf_dir, column, k)
    if t.num_rows < k:
        return float(t.num_rows)
    h_k = int(t["h"].to_pylist()[-1], 16)
    return (k - 1) * float(1 << 64) / float(h_k)


def ndistinct_users(sf_dir: str):
    """(event_type, n_users): EXACT distributed COUNT(DISTINCT user_id) per
    event type — the distinct-aggregate shape none of the other entries
    exercise.

    Scale shape: each batch first collapses to its distinct (user, type)
    pairs (map-side dedup — repeat-heavy streams shrink before the
    exchange), pairs hash-co-partition on user_id into _OKEY_PARTITIONS
    fixed partitions so every surviving duplicate pair meets in exactly one
    partition, each partition dedups vectorized and emits per-type PARTIAL
    counts (≤ n_types rows), and the driver sums a tiny frame. No
    whole-column set ever materializes on one node; partition count is the
    only scale knob."""
    import pandas as pd

    def pairs(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"u": uid, "t": et}).drop_duplicates()
        u = df["u"].to_numpy(dtype=np.int64)
        q = _hash_partition(u)
        return pa.table({"q": pa.array(q), "u": pa.array(u),
                         "t": pa.array(df["t"].to_numpy(), type=pa.string())})

    def count_partition(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({"u": group["u"].to_numpy(zero_copy_only=False),
                           "t": group["t"].to_pylist()}).drop_duplicates()
        out = df.groupby("t", as_index=False).agg(n=("u", "size"))
        return pa.table({"event_type": pa.array(out["t"].to_numpy(), type=pa.string()),
                         "n": pa.array(out["n"].to_numpy(dtype=np.int64))})

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("q")
        .map_groups(count_partition, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:  # all-empty blocks drop column names in to_pandas
        return pa.table({"event_type": pa.array([], type=pa.string()),
                         "n_users": pa.array([], type=pa.int64())})
    agg = parts.groupby("event_type", as_index=False).agg(n_users=("n", "sum")) \
               .sort_values("event_type")
    return pa.table({"event_type": pa.array(agg["event_type"].to_numpy(), type=pa.string()),
                     "n_users": pa.array(agg["n_users"].to_numpy(dtype=np.int64))})


ANTI_CUTOFF_US = 946_684_800_000_000  # 2000-01-01 epoch-µs


def anti_join_customers(sf_dir: str):
    """(n_name, n_customers): customers with NO order on/after the cutoff,
    counted per nation — the hash ANTI-join shape (q3 covers inner,
    broadcast_join covers small-side; nothing else exercises
    absence-of-match at fact scale).

    Scale shape: the orders side collapses to its distinct qualifying
    custkeys per batch (map-side dedup), both sides hash-co-partition on
    custkey into _OKEY_PARTITIONS fixed partitions, each partition takes
    the set difference with one vectorized searchsorted and emits per-nation
    PARTIAL counts; nation names join on the driver against the ≤25-row
    dimension. Neither fact side is ever broadcast or materialized whole."""
    import pandas as pd
    import pyarrow.parquet as pq

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = _hash_partition(ck)
        return pa.table({"q": pa.array(q),
                         "side": pa.array(np.zeros(ck.size, dtype=np.int64)),
                         "ck": pa.array(ck), "nk": pa.array(nk)})

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = np.unique(ck[odate >= ANTI_CUTOFF_US])  # map-side dedup
        q = _hash_partition(ck)
        return pa.table({"q": pa.array(q),
                         "side": pa.array(np.ones(ck.size, dtype=np.int64)),
                         "ck": pa.array(ck),
                         "nk": pa.array(np.zeros(ck.size, dtype=np.int64))})

    def anti_partition(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ck = group["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = group["nk"].to_numpy(zero_copy_only=False).astype(np.int64)
        have = np.unique(ck[side == 1])
        c_ck, c_nk = ck[side == 0], nk[side == 0]
        if have.size:
            pos = np.minimum(np.searchsorted(have, c_ck), have.size - 1)
            miss = have[pos] != c_ck
        else:
            miss = np.ones(c_ck.size, dtype=bool)
        nk_miss = c_nk[miss]
        uk, cnt = np.unique(nk_miss, return_counts=True)
        return pa.table({"nk": pa.array(uk), "n": pa.array(cnt.astype(np.int64))})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    parts = cust.union(orders).groupby("q").map_groups(
        anti_partition, batch_format="pyarrow"
    ).to_pandas()
    if parts.empty:  # all-empty blocks drop column names in to_pandas
        return pa.table({"n_name": pa.array([], type=pa.string()),
                         "n_customers": pa.array([], type=pa.int64())})
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    agg = parts.groupby("nk", as_index=False).agg(n_customers=("n", "sum"))
    agg = agg.merge(nat, left_on="nk", right_on="n_nationkey").sort_values("n_name")
    return pa.table({"n_name": pa.array(agg["n_name"].to_numpy(), type=pa.string()),
                     "n_customers": pa.array(agg["n_customers"].to_numpy(dtype=np.int64))})


CUBE_ALL_TYPE = "ALL"  # margin sentinel for event_type (real types are lowercase)
CUBE_ALL_DAY = -1  # margin sentinel for day_us (real days are positive epoch-µs)


def cube_events(sf_dir: str):
    """(event_type, day_us, n_events, sum_value_r) for ALL FOUR grouping
    sets of CUBE(event_type, day): the finest (type, day) level plus the
    type, day, and grand-total margins. Margins are SENTINEL-keyed
    ('ALL' / -1), not NULL-keyed: NaN never compares equal, so a NULL-keyed
    result can't survive an exact value-hash compare, and sentinel keys keep
    day_us a clean non-nullable int64.

    Scale shape: ONE pass computes the finest level exactly as
    windowed_events does (day key = integer floor of epoch-µs, map-side
    partial combine per batch, small groupby); the three coarser margins
    re-aggregate the PUBLISHED finest cells (types × days rows — driver
    scale by construction) from their rounded sums, the standard OLAP
    cube-materialization contract: every margin equals what a reader of
    the day-level table would sum, so the value surface is closed under
    re-aggregation and the float-summation order can never diverge from
    the oracle's."""
    from ray.data.aggregate import Sum

    fine = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type", "value"])
        .map_batches(lambda b: _bucket_partial(b, DAY_US, "day_us"),
                     batch_format="pyarrow", batch_size=8192)
        .groupby(["day_us", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("v", alias_name="sv"))
        .to_pandas()
    )
    if fine.empty:  # all-empty blocks drop column names in to_pandas
        return pa.table({"event_type": pa.array([], type=pa.string()),
                         "day_us": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64()),
                         "sum_value_r": pa.array([], type=pa.float64())})
    # _round_vec = half-away-from-zero, matching DuckDB round(); np.round's
    # banker's rounding would diverge on exact .5 boundaries at 4 dp
    fine["sum_value_r"] = _round_vec(fine["sv"].to_numpy(dtype=np.float64), 4)
    et, day = [], []
    nev, svr = [], []

    def emit(t, d, n, s):
        et.append(t); day.append(d)
        nev.append(int(n))
        svr.append(float(_round_vec(np.asarray([s], dtype=np.float64), 4)[0]))

    for _, r in fine.iterrows():
        emit(r["event_type"], int(r["day_us"]), r["n_events"], r["sum_value_r"])
    for t, sub in fine.groupby("event_type"):
        emit(t, CUBE_ALL_DAY, sub["n_events"].sum(), sub["sum_value_r"].sum())
    for d, sub in fine.groupby("day_us"):
        emit(CUBE_ALL_TYPE, int(d), sub["n_events"].sum(), sub["sum_value_r"].sum())
    emit(CUBE_ALL_TYPE, CUBE_ALL_DAY,
         fine["n_events"].sum(), fine["sum_value_r"].sum())
    return pa.table({"event_type": pa.array(et, type=pa.string()),
                     "day_us": pa.array(day, type=pa.int64()),
                     "n_events": pa.array(nev, type=pa.int64()),
                     "sum_value_r": pa.array(svr, type=pa.float64())})


Q5_REGION = "ASIA"
Q5_FROM_US = 820_454_400_000_000  # 1996-01-01 epoch-µs
Q5_TO_US = 852_076_800_000_000  # 1997-01-01 epoch-µs


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation from line items where the
    supplier and the ordering customer share a nation inside one region,
    over a one-year order window → (n_name, n_items, revenue_r).

    The join story this entry adds: a CHAIN of two co-partition exchanges
    plus two broadcast dimensions — the multi-way join none of the
    single-exchange entries (q3, anti_join) exercises.

    Stage 1 co-partitions orders (date-filtered) with customer (region-
    filtered) on custkey and emits (orderkey, customer nation) pairs —
    the qualifying-order stream, a small fraction of orders. Stage 2
    co-partitions that stream with lineitem on orderkey; the lineitem side
    resolves each item's supplier nation through a broadcast
    suppkey→nationkey map (supplier is the small dimension; were it
    fact-sized it would chain a third co-partition) and pre-aggregates
    exact integer revenue per (orderkey, supplier nation) INSIDE each
    batch before shuffling. The per-partition zip keeps items whose
    supplier nation equals the order's customer nation and emits per-nation
    partials; nation/region names resolve on the driver against the ≤25-row
    dimension. Revenue is exact cents×hundredths (the q3 convention)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rk = set(reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rk)]
    region_nk = np.sort(nat["n_nationkey"].to_numpy(dtype=np.int64))
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(region_nk)]
    sup_keys = np.sort(sup["s_suppkey"].to_numpy(dtype=np.int64))
    sup_nk = sup.sort_values("s_suppkey")["s_nationkey"].to_numpy(dtype=np.int64)
    sup_ref = ray.put((sup_keys, sup_nk))
    # region_nk is ≤25 int64s — plain closure capture, no object-store trip

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(cn, region_nk)
        return _exchange_rows(ck[m], 0, cn[m])

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (odate >= Q5_FROM_US) & (odate < Q5_TO_US)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return _exchange_rows(ck, 1, ok)

    def join_cust(group: pa.Table) -> pa.Table:
        """custkey-partition join → stage-2 rows keyed by orderkey."""
        (ck_sorted, cn_sorted, _), (ock, ok, _, _) = \
            _split_exchange_group(group)
        pos, hit = _sorted_probe(ck_sorted, ock)
        ok, pos = ok[hit], pos[hit]
        return _exchange_rows(ok, 0, cn_sorted[pos],
                              np.zeros(ok.size, dtype=np.int64))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        pos, m = _sorted_probe(sk, lsk)  # supplier inside the region
        if not m.any():
            return _exchange_empty()
        ok, s_nat = ok[m], sn[pos[m]]
        rev = np.rint(price[m] * 100.0) * np.rint((1.0 - disc[m]) * 100.0)
        # map-side combine per (orderkey, supplier nation)
        df = pd.DataFrame({"ok": ok, "sn": s_nat, "rev": rev, "n": 1})
        g = df.groupby(["ok", "sn"], as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum"))
        # shuffle-row encoding: k = orderkey, a = supplier nation, b = exact
        # integer revenue partial, side = 1000 + row count (n ≥ 1, so this
        # can never collide with the stage-1 side == 0 rows)
        return _exchange_rows(g["ok"].to_numpy(dtype=np.int64),
                              1000 + g["n"].to_numpy(dtype=np.int64),
                              g["sn"].to_numpy(dtype=np.int64),
                              g["rev"].to_numpy(dtype=np.int64))

    def join_order(group: pa.Table) -> pa.Table:
        """orderkey-partition join + same-nation gate → per-nation partials."""
        (ok_sorted, cn_sorted, _), (lk, ln, lrev, lside) = \
            _split_exchange_group(group)
        lcnt = lside - 1000
        empty = pa.table({"nk": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "rev": pa.array([], type=pa.int64())})
        pos, hit = _sorted_probe(ok_sorted, lk)
        if not hit.any():
            return empty
        hit &= cn_sorted[pos] == ln  # same-nation gate
        if not hit.any():
            return empty
        ln, lrev, lcnt = ln[hit], lrev[hit], lcnt[hit]
        uk, inv = np.unique(ln, return_inverse=True)
        return pa.table({
            "nk": pa.array(uk),
            "n": pa.array(np.bincount(inv, weights=lcnt, minlength=uk.size).astype(np.int64)),
            "rev": pa.array(np.bincount(inv, weights=lrev, minlength=uk.size).astype(np.int64)),
        })

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    stage1 = cust.union(orders).groupby("q").map_groups(
        join_cust, batch_format="pyarrow")
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    parts = stage1.union(items).groupby("q").map_groups(
        join_order, batch_format="pyarrow").to_pandas()
    if parts.empty:  # all-empty blocks drop column names in to_pandas
        return pa.table({"n_name": pa.array([], type=pa.string()),
                         "n_items": pa.array([], type=pa.int64()),
                         "revenue_r": pa.array([], type=pa.float64())})
    agg = parts.groupby("nk", as_index=False).agg(n=("n", "sum"),
                                                  rev=("rev", "sum"))
    agg["n_name"] = agg["nk"].map(name_of)
    agg = agg.sort_values("n_name")
    return pa.table({
        "n_name": pa.array(agg["n_name"].to_numpy(), type=pa.string()),
        "n_items": pa.array(agg["n"].to_numpy(dtype=np.int64)),
        "revenue_r": pa.array(
            _round_vec(agg["rev"].to_numpy(dtype=np.float64) / 10_000.0, 2),
            type=pa.float64()),
    })


Q18_MIN_QTY = 250  # sum(l_quantity) threshold; ~p99 of per-order sums


def q18_large_orders(sf_dir: str, min_qty: int = Q18_MIN_QTY, limit: int = 100):
    """TPC-H Q18 shape: large-volume orders — every order whose total line
    quantity exceeds ``min_qty``, joined back to its order row and ordering
    customer → (c_name, c_custkey, o_orderkey, o_orderdate_us,
    o_totalprice, sum_qty), top ``limit`` by (o_totalprice DESC,
    o_orderdate_us ASC, o_orderkey ASC — deterministic tie-break).

    The join story this entry adds: a HAVING SEMI-JOIN — the qualifying
    set is defined by an aggregate over the fact table itself (GROUP BY
    l_orderkey HAVING sum(l_quantity) > t), then joined back to orders and
    customer. None of q3/q5/anti_join gates a join on an aggregate.

    Scale shape: stage 1 co-partitions lineitem (per-batch int64 quantity
    partials per orderkey — quantities are integral by contract, so
    partial-sum order can never flip the HAVING boundary) with orders on
    orderkey; each partition owns complete per-order sums (the groupby key
    IS the partition key), applies the HAVING gate locally, and emits only
    the qualifying ~1% of orders. Stage 2 co-partitions that small stream
    with customer on custkey to attach names (customer is 1/10 of orders —
    fact-sized, so no broadcast) and cuts each partition to its LOCAL
    top-``limit`` under the final order key (the global top-``limit`` is
    contained in the union of per-partition top-``limit``s), so at most
    partitions × ``limit`` rows reach the driver for the final merge —
    never the whole qualifying set."""

    def li_side(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)  # map-side combine
        qsum = np.bincount(inv, weights=qty, minlength=uk.size).astype(np.int64)
        z = np.zeros(uk.size, dtype=np.int64)
        return pa.table({"q": pa.array(_hash_partition(uk)),
                         "side": pa.array(np.ones(uk.size, dtype=np.int64)),
                         "k": pa.array(uk), "a": pa.array(qsum),
                         "b": pa.array(z), "c": pa.array(z)})

    def ord_side(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # 2-dp by contract → exact integer cents (the q3 convention)
        tp = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"q": pa.array(_hash_partition(ok)),
                         "side": pa.array(np.zeros(ok.size, dtype=np.int64)),
                         "k": pa.array(ok), "a": pa.array(ck),
                         "b": pa.array(od), "c": pa.array(tp)})

    def _stage2_empty() -> pa.Table:
        z = pa.array([], type=pa.int64())
        return pa.table({"q": z, "side": z, "k": z, "a": z, "b": z, "c": z,
                         "d": z, "s": pa.array([], type=pa.string())})

    def having_join(group: pa.Table) -> pa.Table:
        """orderkey partition: total qty per order, HAVING gate, join back
        to the order row; re-key survivors by custkey for stage 2."""
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        li = side == 1
        lk, lq = k[li], a[li]
        if lk.size == 0:
            return _stage2_empty()
        uk, inv = np.unique(lk, return_inverse=True)
        qsum = np.bincount(inv, weights=lq, minlength=uk.size).astype(np.int64)
        pass_m = qsum > min_qty
        uk, qsum = uk[pass_m], qsum[pass_m]
        ok, ock, od, otp = k[~li], a[~li], b[~li], c[~li]
        if uk.size == 0 or ok.size == 0:
            return _stage2_empty()
        order = np.argsort(ok, kind="stable")
        ok_sorted = ok[order]
        pos = np.minimum(np.searchsorted(ok_sorted, uk), ok_sorted.size - 1)
        hit = ok_sorted[pos] == uk
        uk, qsum, pos = uk[hit], qsum[hit], pos[hit]
        sel = order[pos]
        ck = ock[sel]
        return pa.table({"q": pa.array(_hash_partition(ck)),
                         "side": pa.array(np.ones(uk.size, dtype=np.int64)),
                         "k": pa.array(ck), "a": pa.array(uk),
                         "b": pa.array(od[sel]), "c": pa.array(otp[sel]),
                         "d": pa.array(qsum),
                         "s": pa.array([""] * uk.size, type=pa.string())})

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(ck.size, dtype=np.int64)
        return pa.table({"q": pa.array(_hash_partition(ck)),
                         "side": pa.array(z), "k": pa.array(ck),
                         "a": pa.array(z), "b": pa.array(z), "c": pa.array(z),
                         "d": pa.array(z),
                         "s": batch["c_name"].cast(pa.string())})

    def name_join(group: pa.Table) -> pa.Table:
        """custkey partition: attach c_name to the qualifying-order rows."""
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({
            "c_name": pa.array([], type=pa.string()),
            "c_custkey": pa.array([], type=pa.int64()),
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_orderdate_us": pa.array([], type=pa.int64()),
            "o_totalprice": pa.array([], type=pa.float64()),
            "sum_qty": pa.array([], type=pa.float64()),
        })
        c_m = side == 0
        o_m = ~c_m
        if not o_m.any() or not c_m.any():
            return empty
        order = np.argsort(k[c_m], kind="stable")
        ck_sorted = k[c_m][order]
        names = group["s"].to_numpy(zero_copy_only=False)[c_m][order]
        ock = k[o_m]
        pos = np.minimum(np.searchsorted(ck_sorted, ock), ck_sorted.size - 1)
        hit = ck_sorted[pos] == ock  # customer table is a key set: all hit
        sel = np.nonzero(o_m)[0][hit]
        okey = group["a"].to_numpy(zero_copy_only=False)[sel].astype(np.int64)
        odate = group["b"].to_numpy(zero_copy_only=False)[sel].astype(np.int64)
        otp = group["c"].to_numpy(zero_copy_only=False)[sel].astype(np.int64)
        qsum = group["d"].to_numpy(zero_copy_only=False)[sel]
        # local top-limit under the FINAL order key: the global top-limit
        # is a subset of the union of per-partition top-limits, so only
        # partitions × limit rows ever reach the driver
        top = np.lexsort((okey, odate, -otp))[:limit]
        ock_h, pos_h = ock[hit][top], pos[hit][top]
        return pa.table({
            "c_name": pa.array(names[pos_h], type=pa.string()),
            "c_custkey": pa.array(ock_h),
            "o_orderkey": pa.array(okey[top]),
            "o_orderdate_us": pa.array(odate[top]),
            "o_totalprice": pa.array(otp[top] / 100.0, type=pa.float64()),
            "sum_qty": pa.array(qsum[top].astype(np.float64),
                                type=pa.float64()),
        })

    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).map_batches(li_side, batch_format="pyarrow", batch_size=8192)
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(ord_side, batch_format="pyarrow", batch_size=8192)
    stage1 = items.union(orders).groupby("q").map_groups(
        having_join, batch_format="pyarrow")
    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    ).map_batches(cust_side, batch_format="pyarrow")
    out = stage1.union(cust).groupby("q").map_groups(
        name_join, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-empty blocks drop column names in to_pandas
        import pandas as pd
        return pd.DataFrame({
            "c_name": pd.Series(dtype="object"),
            "c_custkey": pd.Series(dtype="int64"),
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate_us": pd.Series(dtype="int64"),
            "o_totalprice": pd.Series(dtype="float64"),
            "sum_qty": pd.Series(dtype="float64"),
        })
    out = out.sort_values(
        ["o_totalprice", "o_orderdate_us", "o_orderkey"],
        ascending=[False, True, True], kind="stable",
    ).head(limit).reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# Conditional-aggregate fact-fact join (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

Q12_LO_US = 820_454_400_000_000  # 1996-01-01 epoch-µs
Q12_HI_US = 852_076_800_000_000  # 1997-01-01 epoch-µs
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_lines(sf_dir: str):
    """TPC-H Q12 shape adapted to this schema (the reference columns
    l_shipmode/l_commitdate don't exist here): per ``l_returnflag``, how
    many 1996-shipped line items belong to HIGH-priority orders
    (o_orderpriority in 1-URGENT/2-HIGH) vs lower — the
    CONDITIONAL-AGGREGATE join shape (CASE WHEN inside sum over a join)
    that none of the other join entries exercise. Output:
    (l_returnflag, high_line_count, low_line_count), all exact int64.

    Scale shape: both facts hash-co-partition on o_orderkey through
    :func:`_hash_partition` (the module's single join formula); lineitem
    pre-aggregates per (order, returnflag) counts INSIDE each batch, the
    orders side carries one is-high flag bit per order, and each partition
    emits ≤ flags×2 partial rows — the driver final sums a
    ≤ partitions × 6 frame."""
    import pandas as pd

    def orders_side(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = np.asarray(batch["o_orderpriority"].to_pylist(), dtype=object)
        hi = np.isin(pri, _Q12_HIGH).astype(np.int64)
        return pa.table({
            "q": pa.array(_hash_partition(okey)),
            "side": pa.array(np.zeros(okey.size, dtype=np.int64)),
            "okey": pa.array(okey),
            "flag": pa.array(np.full(okey.size, "", dtype=object), type=pa.string()),
            "n": pa.array(hi),
        })

    def lineitem_side(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        flag = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        m = (ship >= Q12_LO_US) & (ship < Q12_HI_US)
        okey, flag = okey[m], flag[m]
        # map-side combine: one row per distinct (order, returnflag)
        df = (pd.DataFrame({"okey": okey, "flag": flag})
              .groupby(["okey", "flag"], as_index=False).size())
        uk = df["okey"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array(_hash_partition(uk)),
            "side": pa.array(np.ones(uk.size, dtype=np.int64)),
            "okey": pa.array(uk),
            "flag": pa.array(df["flag"].tolist(), type=pa.string()),
            "n": pa.array(df["size"].to_numpy(dtype=np.int64)),
        })

    def join_partition(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        okey = group["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        flag = np.asarray(group["flag"].to_pylist(), dtype=object)
        o_m = side == 0
        order = np.argsort(okey[o_m], kind="stable")
        ok_sorted, hi_sorted = okey[o_m][order], n[o_m][order]
        lk, lf, ln = okey[~o_m], flag[~o_m], n[~o_m]
        empty = pa.table({
            "flag": pa.array([], type=pa.string()),
            "is_high": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        })
        if ok_sorted.size == 0 or lk.size == 0:
            return empty
        pos = np.minimum(np.searchsorted(ok_sorted, lk), ok_sorted.size - 1)
        hit = ok_sorted[pos] == lk
        if not hit.any():
            return empty
        import pandas as pd
        df = pd.DataFrame({
            "flag": lf[hit],
            "is_high": hi_sorted[pos[hit]],
            "n": ln[hit],
        }).groupby(["flag", "is_high"], as_index=False)["n"].sum()
        # explicit schema: from_pandas metadata defeats Ray's schema dedup
        return pa.table({
            "flag": pa.array(df["flag"].tolist(), type=pa.string()),
            "is_high": pa.array(df["is_high"].to_numpy(dtype=np.int64)),
            "n": pa.array(df["n"].to_numpy(dtype=np.int64)),
        })

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(orders_side, batch_format="pyarrow")
    lines = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_returnflag"],
    ).map_batches(lineitem_side, batch_format="pyarrow")
    parts = (orders.union(lines).groupby("q")
             .map_groups(join_partition, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pa.table({
            "l_returnflag": pa.array([], type=pa.string()),
            "high_line_count": pa.array([], type=pa.int64()),
            "low_line_count": pa.array([], type=pa.int64()),
        })
    piv = (parts.groupby(["flag", "is_high"])["n"].sum().unstack(
        fill_value=0).reindex(columns=[0, 1], fill_value=0)
        .sort_index())
    return pa.table({
        "l_returnflag": pa.array(piv.index.tolist(), type=pa.string()),
        "high_line_count": pa.array(piv[1].to_numpy(dtype=np.int64)),
        "low_line_count": pa.array(piv[0].to_numpy(dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# Next-event transition counts (lag/lead window surface)
# ---------------------------------------------------------------------------


def event_transitions(sf_dir: str):
    """(prev_type, next_type, n): corpus-wide next-event transition counts
    — each user's event stream ordered by (ts, event_id), each adjacent
    pair counted once (the Markov-chain / lead() window surface none of
    the other window entries exercise). Output rows are exact int64
    counts over ≤ n_types² type pairs.

    Scale shape: ONE user-hash co-partition exchange; inside each
    partition a single lexsort orders every user's events, one shifted
    compare masks user boundaries (no per-user loop), and pair counts
    collapse to ≤ n_types² partial rows per partition; the driver final
    sums a ≤ partitions × n_types² frame."""
    import pandas as pd

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch, {
            "eid": batch["event_id"].cast(pa.int64()),
            "et": batch["event_type"].cast(pa.string()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
        # Arrow-side dictionary encode: the 50M-row string column never
        # becomes Python objects — only the ≤n_types vocab does. Null
        # types code to -1 so their pairs drop below (the pandas-groupby
        # dropna behavior this kernel replaced; nulls are outside the
        # events contract but must not crash the operator)
        import pyarrow.compute as pc

        enc = group["et"].combine_chunks().dictionary_encode()
        codes = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, codes = u[order], codes[order]
        empty = pa.table({
            "prev_type": pa.array([], type=pa.string()),
            "next_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        })
        if u.size < 2:
            return empty
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        # pack (prev, next) code pairs into one int, count via bincount;
        # pairs touching a null-coded (-1) side drop
        k = vocab.size
        ok = same & (codes[:-1] >= 0) & (codes[1:] >= 0)
        packed = codes[:-1][ok] * k + codes[1:][ok]
        cnt = np.bincount(packed, minlength=k * k)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "prev_type": pa.array(vocab[nz // k].tolist(), type=pa.string()),
            "next_type": pa.array(vocab[nz % k].tolist(), type=pa.string()),
            "n": pa.array(cnt[nz].astype(np.int64)),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(per_partition, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pa.table({
            "prev_type": pa.array([], type=pa.string()),
            "next_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        })
    agg = (parts.groupby(["prev_type", "next_type"], as_index=False)["n"]
           .sum().sort_values(["prev_type", "next_type"]))
    return pa.table({
        "prev_type": pa.array(agg["prev_type"].tolist(), type=pa.string()),
        "next_type": pa.array(agg["next_type"].tolist(), type=pa.string()),
        "n": pa.array(agg["n"].to_numpy(dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: left-outer fact-fact join + two-level aggregation
# ("distribution of group sizes")
# ---------------------------------------------------------------------------

Q13_EXCLUDED_PRIORITY = "1-URGENT"  # orders excluded from the per-customer count


def q13_customer_distribution(sf_dir: str):
    """(c_count, custdist): how many customers placed exactly N qualifying
    orders — TPC-H Q13's customer-distribution shape. Two aggregation
    LEVELS over a LEFT OUTER fact-fact join: orders count per customer
    (customers with no qualifying order must surface with count 0 — the
    null-extension no inner-join entry exercises), then the histogram of
    those counts. Excluded orders (``o_orderpriority = '1-URGENT'``)
    mirror Q13's NOT LIKE comment filter.

    Scale shape: the orders side collapses to per-batch (custkey, n)
    partials map-side, both facts hash-co-partition on custkey through
    the module's single ``_hash_partition`` formula, and each partition
    resolves its customers' complete counts locally (a custkey's rows all
    land in one partition) — the second-level histogram then collapses to
    ≤ distinct-count-values partial rows per partition, so the driver
    final sums a frame bounded by partitions × distinct counts, never by
    customers. Neither fact is broadcast or materialized whole."""
    import pandas as pd

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"q": pa.array(_hash_partition(ck)),
                         "side": pa.array(np.zeros(ck.size, dtype=np.int64)),
                         "ck": pa.array(ck),
                         "n": pa.array(np.zeros(ck.size, dtype=np.int64))})

    def orders_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.fill_null(
            pc.not_equal(batch["o_orderpriority"], Q13_EXCLUDED_PRIORITY),
            False,
        ).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(ck[keep], return_counts=True)  # map-side partial
        return pa.table({"q": pa.array(_hash_partition(uk)),
                         "side": pa.array(np.ones(uk.size, dtype=np.int64)),
                         "ck": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    def hist_partition(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ck = group["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        cust = np.unique(ck[side == 0])
        if cust.size == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"c_count": z, "n": z})
        # sum the orders partials per custkey, left-extended over customers
        counts = np.zeros(cust.size, dtype=np.int64)
        o_ck, o_n = ck[side == 1], n[side == 1]
        pos = np.searchsorted(cust, o_ck)
        ok = (pos < cust.size)
        ok[ok] &= cust[pos[ok]] == o_ck[ok]  # orders of customers outside
        np.add.at(counts, pos[ok], o_n[ok])  # this partition's set drop
        uc, cc = np.unique(counts, return_counts=True)
        return pa.table({"c_count": pa.array(uc),
                         "n": pa.array(cc.astype(np.int64))})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(orders_side, batch_format="pyarrow")
    parts = cust.union(orders).groupby("q").map_groups(
        hist_partition, batch_format="pyarrow"
    ).to_pandas()
    if parts.empty:
        z = pa.array([], type=pa.int64())
        return pa.table({"c_count": z, "custdist": z})
    agg = parts.groupby("c_count", as_index=False).agg(custdist=("n", "sum"))
    agg = agg.sort_values(["custdist", "c_count"], ascending=[False, False])
    return pa.table({
        "c_count": pa.array(agg["c_count"].to_numpy(dtype=np.int64)),
        "custdist": pa.array(agg["custdist"].to_numpy(dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# Exact second-moment aggregates (mean / variance / stddev per group)
# ---------------------------------------------------------------------------

# values quantize onto their 4-dp integer image before any summation, so
# the moment partials are exact integers and summation order can never
# move a result (float Σx² is order-dependent; int64 partials are not).
_MOM_SCALE = 10_000


def _sq_split(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hi², hi·lo, lo²) of a NON-NEGATIVE int64 array split at 2¹⁶ —
    the overflow-proof Σv² partial scheme shared by ``group_moments`` and
    ``group_correlation``: every term < 2¹⁴ bits, so an int64 batch sum
    keeps >17 bits of headroom at 8192 rows for any |v| the 2-dp/4-dp
    integer images can reach."""
    hi = a >> 16
    lo = a & 0xFFFF
    return hi * hi, hi * lo, lo * lo


def _pyint_sum(col) -> int:
    """Exact arbitrary-precision sum of an int64 pandas column (the
    driver-side HUGEINT analogue)."""
    return sum(int(v) for v in col)


def _sq_split_combine(shh, shl, sll) -> int:
    """Reconstruct the exact Σv² from (hi, lo)-split partial columns:
    Σv² = Σhi²·2³² + 2Σhi·lo·2¹⁶ + Σlo², combined with Python ints."""
    return (_pyint_sum(shh) * (1 << 32)
            + 2 * _pyint_sum(shl) * (1 << 16)
            + _pyint_sum(sll))


def group_moments(sf_dir: str):
    """(event_type, n_events, mean_r, var_r, std_r): per-type mean,
    population variance and stddev of ``events.value`` — the second-moment
    aggregate surface (every other aggregate entry stops at count/sum).

    Contract: moments are computed over the 4-dp quantization of value
    (exact at the table's own precision; half-away-from-zero, matching
    SQL ROUND — np.round is banker's and disagrees on exact .5).
    Σv² would overflow int64 inside one batch for |vi| ≥ ~2×10⁹ (three
    8192-row values at the |value| ≤ 2×10⁵ envelope suffice), so each
    |vi| splits at 2¹⁶ into (hi, lo) and the batch carries the three
    partials Σhi², Σhi·lo, Σlo² — every term < 2¹⁴ bits, so an int64
    batch sum has >17 bits of headroom even at 8192 rows. The driver
    combines all partials with PYTHON ints (arbitrary precision, the
    HUGEINT analogue) and reconstructs Σv² = Σhi²·2³² + 2Σhi·lo·2¹⁶ +
    Σlo² exactly, so n·Σv² − (Σv)² is exact at any corpus size.
    mean/var derive by one double division each — the identical IEEE
    operation DuckDB performs on the identical exact integers.

    Scale shape: one streaming pass, ≤ n_types partial rows per batch,
    driver final over batches × n_types tiny rows. No shuffle at all."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = (np.floor(np.abs(v) * _MOM_SCALE + 0.5)
              * np.sign(v)).astype(np.int64)
        s2hh, s2hl, s2ll = _sq_split(np.abs(vi))
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "n": np.ones(vi.size, dtype=np.int64),
            "s1": vi,
            "s2hh": s2hh,
            "s2hl": s2hl,
            "s2ll": s2ll,
        })
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"),
            s2hh=("s2hh", "sum"), s2hl=("s2hl", "sum"), s2ll=("s2ll", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    if parts.empty:
        return pa.table({
            "event_type": pa.array([], type=pa.string()),
            "n_events": pa.array([], type=pa.int64()),
            "mean_r": pa.array([], type=pa.float64()),
            "var_r": pa.array([], type=pa.float64()),
            "std_r": pa.array([], type=pa.float64()),
        })
    types, ns, means, vars_, stds = [], [], [], [], []
    for et in sorted(parts["event_type"].unique().tolist()):
        sub = parts[parts["event_type"] == et]
        # Python ints: exact at any magnitude (the HUGEINT analogue)
        n = int(sub["n"].sum())
        s1 = _pyint_sum(sub["s1"])
        s2 = _sq_split_combine(sub["s2hh"], sub["s2hl"], sub["s2ll"])
        mean = float(s1) / float(n * _MOM_SCALE)
        num = n * s2 - s1 * s1
        den = n * n * _MOM_SCALE * _MOM_SCALE
        var = float(num) / float(den)
        types.append(et)
        ns.append(n)
        means.append(mean)
        vars_.append(var)
        stds.append(float(np.sqrt(var)))
    return pa.table({
        "event_type": pa.array(types, type=pa.string()),
        "n_events": pa.array(np.asarray(ns, dtype=np.int64)),
        "mean_r": pa.array(_round_vec(np.asarray(means, dtype=np.float64))),
        "var_r": pa.array(_round_vec(np.asarray(vars_, dtype=np.float64))),
        "std_r": pa.array(_round_vec(np.asarray(stds, dtype=np.float64))),
    })


# ---------------------------------------------------------------------------
# Robust outlier scrub (median / MAD gate per group)
# ---------------------------------------------------------------------------

MAD_FACTOR = 3.0  # |value - median| > factor · MAD ⇒ outlier


def mad_outliers(sf_dir: str):
    """(event_id, event_type, value): events whose value deviates from the
    per-type MEDIAN by more than ``MAD_FACTOR`` × the median absolute
    deviation — the robust outlier scrub (mean/std gates move with the
    outliers they hunt; median/MAD do not). The data-cleaning counterpart
    of ``group_moments``' parametric view.

    Scale shape: two composed grouped counting selections (the
    :func:`group_quantiles` machinery — no sort, no all-to-all): the
    per-type median first, then the median of |value − median| over the
    derived deviation stream; both medians are REALIZED data values
    (quantile_disc convention), so the final gate compares bit-identical
    doubles and one streaming filter pass finishes. Medians/MADs broadcast
    as a ≤ n_types-entry dict; the events table is never materialized to
    the driver."""
    med_t = group_quantiles(sf_dir, qs=(0.5,)).to_pandas()
    if med_t.empty:
        return pa.table({"event_id": pa.array([], type=pa.int64()),
                         "event_type": pa.array([], type=pa.string()),
                         "value": pa.array([], type=pa.float64())})
    med = dict(zip(med_t["event_type"], med_t["value"]))

    def deviations(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = np.fromiter((med.get(t, np.nan) for t in et.tolist()),
                        dtype=np.float64, count=et.size)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"].cast(pa.string()),
            "value": pa.array(np.abs(v - m)),
            "raw": pa.array(v),
        })

    dev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    ).map_batches(deviations, batch_format="pyarrow").materialize()

    mad_t = group_quantiles(sf_dir, qs=(0.5,), ds=dev.select_columns(
        ["event_type", "value"])).to_pandas()
    gate = {t: MAD_FACTOR * float(v)
            for t, v in zip(mad_t["event_type"], mad_t["value"])}

    def keep(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        d = batch["value"].to_numpy(zero_copy_only=False)
        thr = np.fromiter((gate.get(t, np.inf) for t in et.tolist()),
                          dtype=np.float64, count=et.size)
        out = batch.filter(pa.array(d > thr))
        return pa.table({"event_id": out["event_id"],
                         "event_type": out["event_type"],
                         "value": out["raw"]})

    return dev.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Correlated-aggregate filter (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


def q17_small_quantity(sf_dir: str):
    """(avg_yearly_r, n_small): revenue-per-year of "small-quantity" line
    items — lines whose quantity is below 0.2 × their part's average
    quantity (TPC-H Q17's correlated scalar subquery: the filter threshold
    of each row is an aggregate over that row's own group).

    Exactness: with qi = round(100·l_quantity) (2-dp contract) and per-part
    Σqi = s over n lines, ``qty < 0.2·avg`` ⟺ ``5·qi·n < s`` — the gate is
    a pure INTEGER comparison, so engine and oracle can never disagree on
    a float boundary. Qualifying revenue accumulates in integer cents; the
    one double division (cents/700.0 → avg_yearly) is the same IEEE op the
    SQL performs on the same exact integer.

    Scale shape: the correlated subquery decorrelates into ONE co-partition
    exchange on l_partkey (``_hash_partition``): a partition owns every
    line of its parts, so per-part (s, n) resolve locally and the gate
    applies in place — no second input pass, no broadcast of a fact-sized
    per-part table. Each partition emits ONE partial row; per-partition
    cent sums are split into (hi, lo) 32-bit halves so the partial stays
    exact far past 2⁵³ cents, and the driver combines with Python ints."""

    def prep(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qi = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        cents = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return pa.table({
            "q": pa.array(_hash_partition(pk)),
            "pk": pa.array(pk),
            "qi": pa.array(qi),
            "cents": pa.array(cents),
        })

    def gate_partition(group: pa.Table) -> pa.Table:
        pk = group["pk"].to_numpy(zero_copy_only=False)
        qi = group["qi"].to_numpy(zero_copy_only=False)
        cents = group["cents"].to_numpy(zero_copy_only=False)
        upk, inv = np.unique(pk, return_inverse=True)
        # np.add.at keeps the per-part sums in int64 end-to-end (bincount's
        # float-weights path would silently lose exactness past 2⁵³)
        s = np.zeros(upk.size, dtype=np.int64)
        np.add.at(s, inv, qi)
        n = np.bincount(inv, minlength=upk.size).astype(np.int64)
        # integer gate: qty < 0.2·(s/100)/n  ⟺  5·qi·n < s  (all exact;
        # 5·qi·n ≤ 5·5000·n — overflow needs n > 7×10¹³ lines in ONE part)
        keep = 5 * qi * n[inv] < s[inv]
        kept = cents[keep]
        total = 0
        for lo in range(0, kept.size, 1 << 30):  # chunked exact int sum
            total += int(np.sum(kept[lo:lo + (1 << 30)]))
        return pa.table({
            "n_small": pa.array([int(keep.sum())], type=pa.int64()),
            "hi": pa.array([total >> 32], type=pa.int64()),
            "lo": pa.array([total & 0xFFFFFFFF], type=pa.int64()),
        })

    parts = (
        read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(prep, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(gate_partition, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pa.table({"avg_yearly_r": pa.array([0.0], type=pa.float64()),
                         "n_small": pa.array([0], type=pa.int64())})
    n_small = int(parts["n_small"].sum())
    total = sum((int(h) << 32) + int(x)
                for h, x in zip(parts["hi"], parts["lo"]))
    avg = round_half_away(float(total) / 700.0, 2)  # cents → dollars / 7 yrs
    return pa.table({
        "avg_yearly_r": pa.array([avg], type=pa.float64()),
        "n_small": pa.array([n_small], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# Exact grouped co-moments (covariance / correlation per group)
# ---------------------------------------------------------------------------


def group_correlation(sf_dir: str):
    """(l_returnflag, n_rows, covar_r, corr_r): population covariance and
    Pearson correlation of (l_quantity, l_extendedprice) per return flag —
    the BIVARIATE extension of ``group_moments`` (everything else in the
    registry stops at single-column moments).

    Exactness: x = round(100·l_quantity) ≤ 5000 and y = round(100·
    l_extendedprice) < 2²⁴ are the columns' exact 2-dp integer images.
    Per-batch int64 partials: Σx, Σy, Σxy (≤ 2⁴⁹ per 8192-row batch) and
    Σx² are direct; Σy² would overflow with only ~10× headroom, so y
    splits at 2¹⁶ into (hi, lo) and the batch carries Σhi²/Σhi·lo/Σlo²
    (the ``group_moments`` trick). The driver combines everything with
    Python ints and forms num = n·Σxy − Σx·Σy, dx = n·Σx² − (Σx)²,
    dy = n·Σy² − (Σy)² exactly; covar = num/(n²·10⁴) and corr =
    num/(√dx·√dy) are then single IEEE double expressions mirrored
    token-for-token in the SQL oracle (CAST exact ints to DOUBLE, sqrt,
    multiply, divide — same operations, same order).

    Scale shape: one streaming pass, ≤ n_flags partial rows per batch, no
    shuffle; zero-variance groups report corr_r = 0.0 by convention (the
    SQL CASEs identically)."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        x = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        y = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        syhh, syhl, syll = _sq_split(y)
        df = pd.DataFrame({
            "flag": batch["l_returnflag"].to_numpy(zero_copy_only=False),
            "n": np.ones(x.size, dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
            "syhh": syhh, "syhl": syhl, "syll": syll,
        })
        g = df.groupby("flag", as_index=False).sum()
        cols = {"flag": pa.array(g["flag"].tolist(), type=pa.string())}
        for c in ("n", "sx", "sy", "sxy", "sxx", "syhh", "syhl", "syll"):
            cols[c] = pa.array(g[c].to_numpy(dtype=np.int64))
        return pa.table(cols)

    parts = (
        read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    if parts.empty:
        return pa.table({
            "l_returnflag": pa.array([], type=pa.string()),
            "n_rows": pa.array([], type=pa.int64()),
            "covar_r": pa.array([], type=pa.float64()),
            "corr_r": pa.array([], type=pa.float64()),
        })
    flags, ns, covs, corrs = [], [], [], []
    for fl in sorted(parts["flag"].unique().tolist()):
        sub = parts[parts["flag"] == fl]
        n = int(sub["n"].sum())
        sx = _pyint_sum(sub["sx"])
        sy = _pyint_sum(sub["sy"])
        sxy = _pyint_sum(sub["sxy"])
        sxx = _pyint_sum(sub["sxx"])
        syy = _sq_split_combine(sub["syhh"], sub["syhl"], sub["syll"])
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        cov = float(num) / (float(n) * float(n) * 10000.0)
        corr = (float(num) / (np.sqrt(float(dx)) * np.sqrt(float(dy)))
                if dx > 0 and dy > 0 else 0.0)
        flags.append(fl)
        ns.append(n)
        covs.append(cov)
        corrs.append(corr)
    return pa.table({
        "l_returnflag": pa.array(flags, type=pa.string()),
        "n_rows": pa.array(np.asarray(ns, dtype=np.int64)),
        "covar_r": pa.array(_round_vec(np.asarray(covs, dtype=np.float64))),
        "corr_r": pa.array(_round_vec(np.asarray(corrs, dtype=np.float64))),
    })


# ---------------------------------------------------------------------------
# EXISTS semi-join (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

Q4_LATE_US = 30 * 86_400_000_000  # "late" = shipped >30 days after order


def q4_order_priority(sf_dir: str):
    """(o_orderpriority, order_count): how many orders have AT LEAST ONE
    line item shipped more than 30 days after the order date, per order
    priority — the EXISTS correlated semi-join (TPC-H Q4's shape; the
    registry's ``anti_join_customers`` covers NOT EXISTS, this covers the
    positive direction).

    Scale shape: EXISTS(any line matching) decorrelates into max-reduction:
    the lineitem side pre-reduces to per-order MAX(l_shipdate) inside each
    batch (map-side combine — the exchange carries one row per (batch,
    order), never one per line), both facts co-partition on o_orderkey
    through ``_hash_partition``, and each partition gates its complete
    per-order max against o_orderdate + 30d locally, emitting ≤ n_priorities
    count partials. Timestamps compare as epoch-µs int64 — exact."""
    import pandas as pd

    def orders_side(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # normalize to µs before the int64 view so the 30-day constant is
        # unit-correct regardless of the file's timestamp resolution
        odate = (batch["o_orderdate"].cast(pa.timestamp("us"))
                 .cast(pa.int64()).to_numpy(zero_copy_only=False))
        return pa.table({
            "q": pa.array(_hash_partition(okey)),
            "side": pa.array(np.zeros(okey.size, dtype=np.int64)),
            "okey": pa.array(okey),
            "ts": pa.array(odate),
            "prio": batch["o_orderpriority"].cast(pa.string()),
        })

    def lineitem_side(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = (batch["l_shipdate"].cast(pa.timestamp("us"))
                .cast(pa.int64()).to_numpy(zero_copy_only=False))
        # map-side combine: EXISTS only needs the max ship date per order
        uk, inv = np.unique(okey, return_inverse=True)
        mx = np.full(uk.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ship)
        return pa.table({
            "q": pa.array(_hash_partition(uk)),
            "side": pa.array(np.ones(uk.size, dtype=np.int64)),
            "okey": pa.array(uk),
            "ts": pa.array(mx),
            "prio": pa.array([""] * uk.size, type=pa.string()),
        })

    def gate_partition(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        okey = group["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_m = side == 0
        ok, od = okey[o_m], ts[o_m]
        prio = np.asarray(group["prio"].to_pylist(), dtype=object)[o_m]
        lk, lmx = okey[~o_m], ts[~o_m]
        empty = pa.table({"o_orderpriority": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if ok.size == 0 or lk.size == 0:
            return empty
        # global per-order max over the per-batch partials
        ulk, linv = np.unique(lk, return_inverse=True)
        gmx = np.full(ulk.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(gmx, linv, lmx)
        pos = np.minimum(np.searchsorted(ulk, ok), max(ulk.size - 1, 0))
        hit = (ulk[pos] == ok) & (gmx[pos] > od + Q4_LATE_US)
        if not hit.any():
            return empty
        df = pd.DataFrame({"p": prio[hit]})
        g = df.groupby("p", as_index=False).size()
        return pa.table({
            "o_orderpriority": pa.array(g["p"].tolist(), type=pa.string()),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_side, batch_format="pyarrow", batch_size=8192)
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    parts = (orders.union(items).groupby("q")
             .map_groups(gate_partition, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pa.table({"o_orderpriority": pa.array([], type=pa.string()),
                         "order_count": pa.array([], type=pa.int64())})
    agg = (parts.groupby("o_orderpriority", as_index=False)["n"].sum()
           .sort_values("o_orderpriority"))
    return pa.table({
        "o_orderpriority": pa.array(agg["o_orderpriority"].tolist(),
                                    type=pa.string()),
        "order_count": pa.array(agg["n"].to_numpy(dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# Returned-item revenue ranking (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

Q10_FROM_US = 820_454_400_000_000  # 1996-01-01 epoch-µs
Q10_TO_US = 836_179_200_000_000  # 1996-07-01 epoch-µs
Q10_TOPK = 20


def q10_returned_revenue(sf_dir: str):
    """(c_custkey, c_name, n_name, revenue_r): the TPC-H Q10 shape — the
    top-20 customers by revenue from RETURNED line items on orders placed
    in a six-month window, with name/nation hydrated only for the winners.

    The join story this entry adds: a two-exchange fact-fact-fact chain
    that ends in a GLOBAL top-k — q3 stops at the order grain, q5 at a
    ≤25-row group key; here the second exchange's group key (custkey) is
    fact-sized and only k rows may reach the driver.

    Stage 1 co-partitions date-windowed orders with returned line items on
    o_orderkey (lineitem pre-aggregates exact integer revenue per order
    inside each batch — the exchange ships one row per (batch, order));
    each partition resolves order→customer and collapses to per-customer
    partials BEFORE re-keying. Stage 2 co-partitions those partials on
    custkey: totals are exact there (a customer lives in exactly one
    partition), and because top-k is distributive each partition emits
    only ITS k best by (revenue DESC, custkey ASC), so the driver merges
    ≤ partitions×k rows. Winner names hydrate via a k-key predicate-
    pushdown point read of customer (the knn-hydration pattern) plus the
    ≤25-row nation dimension — never a fact-sized broadcast. Revenue is
    exact cents×hundredths end-to-end (the q3 convention); the final
    ORDER BY uses the exact integer, never the rounded double."""
    import pandas as pd
    import pyarrow.parquet as pq

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = (batch["o_orderdate"].cast(pa.timestamp("us"))
                 .cast(pa.int64()).to_numpy(zero_copy_only=False))
        m = (odate >= Q10_FROM_US) & (odate < Q10_TO_US)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return pa.table({"q": pa.array(_hash_partition(ok)),
                         "side": pa.array(np.zeros(ok.size, dtype=np.int64)),
                         "k": pa.array(ok), "a": pa.array(ck)})

    def lineitem_side(batch: pa.Table) -> pa.Table:
        flag = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        m = flag == "R"
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        cents = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)[m]
        hund = np.rint((1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
                       * 100.0).astype(np.int64)[m]
        rev = cents * hund
        uk, inv = np.unique(ok, return_inverse=True)  # map-side combine
        s = np.zeros(uk.size, dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"q": pa.array(_hash_partition(uk)),
                         "side": pa.array(np.ones(uk.size, dtype=np.int64)),
                         "k": pa.array(uk), "a": pa.array(s)})

    def join_orders(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_m = side == 0
        ok, ck = k[o_m], a[o_m]
        lk, lrev = k[~o_m], a[~o_m]
        empty = pa.table({"q2": pa.array([], type=pa.int64()),
                          "ck": pa.array([], type=pa.int64()),
                          "rev": pa.array([], type=pa.int64())})
        if ok.size == 0 or lk.size == 0:
            return empty
        # complete per-order revenue over the per-batch partials
        ulk, linv = np.unique(lk, return_inverse=True)
        rs = np.zeros(ulk.size, dtype=np.int64)
        np.add.at(rs, linv, lrev)
        pos = np.minimum(np.searchsorted(ulk, ok), max(ulk.size - 1, 0))
        hit = ulk[pos] == ok
        if not hit.any():
            return empty
        ck, orev = ck[hit], rs[pos[hit]]
        # collapse to per-customer partials before the second exchange
        uck, cinv = np.unique(ck, return_inverse=True)
        crev = np.zeros(uck.size, dtype=np.int64)
        np.add.at(crev, cinv, orev)
        return pa.table({"q2": pa.array(_hash_partition(uck)),
                         "ck": pa.array(uck), "rev": pa.array(crev)})

    def local_topk(group: pa.Table) -> pa.Table:
        ck = group["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = group["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        uck, cinv = np.unique(ck, return_inverse=True)
        tot = np.zeros(uck.size, dtype=np.int64)
        np.add.at(tot, cinv, rev)
        # top-k is distributive: the global top-k is a subset of the union
        # of per-partition top-ks (custkey is partition-exclusive here)
        order = np.lexsort((uck, -tot))[:Q10_TOPK]
        return pa.table({"ck": pa.array(uck[order]),
                         "rev": pa.array(tot[order])})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow", batch_size=8192)
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    parts = (orders.union(items).groupby("q")
             .map_groups(join_orders, batch_format="pyarrow")
             .groupby("q2")
             .map_groups(local_topk, batch_format="pyarrow")
             .to_pandas())
    empty = pa.table({"c_custkey": pa.array([], type=pa.int64()),
                      "c_name": pa.array([], type=pa.string()),
                      "n_name": pa.array([], type=pa.string()),
                      "revenue_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    top = (parts.sort_values(["rev", "ck"], ascending=[False, True])
           .head(Q10_TOPK))
    keys = [int(v) for v in top["ck"]]
    # k-key predicate-pushdown point read — the winners only, never the
    # customer fact scanned to the driver
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(cust["c_custkey"], cust["c_name"]))
    nk_of = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nname_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    return pa.table({
        "c_custkey": pa.array(keys, type=pa.int64()),
        "c_name": pa.array([name_of[k] for k in keys], type=pa.string()),
        "n_name": pa.array([nname_of[nk_of[k]] for k in keys],
                           type=pa.string()),
        "revenue_r": pa.array(
            _round_vec(top["rev"].to_numpy(dtype=np.float64) / 10000.0, 2)),
    })


# ---------------------------------------------------------------------------
# Ordered-collect and mode aggregates (per-user string_agg / mode())
# ---------------------------------------------------------------------------


def user_event_paths(sf_dir: str):
    """(user_id, n_events, path): each user's event-type sequence in time
    order, joined with ',' — the ordered-collect aggregate surface
    (string_agg(... ORDER BY) / array_agg): sequence mining, session-path
    features, and the "conversation as one string" reshape all reduce to
    it; no other entry materializes an ORDERED per-group collection.

    Scale shape: ONE user-hash co-partition (a user's events meet in
    exactly one partition, so the collected order is total there); inside
    each partition a single lexsort by (user, ts, event_id) orders every
    user at once and ONE Arrow binary_join over a boundary-offset list
    array builds every path in C — no per-user Python dispatch (the
    high-cardinality-group disease). Output is one row per user; each
    path is bounded by that user's own event count — the operator's
    inherent output grain, never corpus-sized state on any node. Null
    event types drop map-side, BEFORE the exchange (string_agg
    semantics; guaranteed-to-drop rows never ship)."""
    import pyarrow.compute as pc

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        return _user_part_table(batch, {
            "eid": batch["event_id"].cast(pa.int64()),
            "et": batch["event_type"].cast(pa.string()),
        })

    def collect(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if u.size == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "path": pa.array([], type=pa.string())})
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u = u[order]
        et = group["et"].combine_chunks().take(pa.array(order))
        # user boundaries in the sorted frame → list offsets → ONE
        # vectorized join (int64 offsets: a partition may exceed 2³¹ rows)
        bounds = np.flatnonzero(u[1:] != u[:-1]) + 1
        offsets = np.concatenate(([0], bounds, [u.size])).astype(np.int64)
        paths = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets), et), ",")
        return pa.table({
            "user_id": pa.array(u[offsets[:-1]]),
            "n_events": pa.array(np.diff(offsets)),
            "path": paths.cast(pa.string()),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(collect, batch_format="pyarrow")
    )


def mode_event_type(sf_dir: str):
    """(user_id, mode_type, n_mode): each user's most frequent event type,
    ties to the lexicographically smallest — the MODE aggregate (an
    aggregate OF an aggregate per fact-sized group key: counts resolve
    first, then an argmax over them; group_topk_docs ranks existing rows
    by an existing column, this must build the ranked quantity itself).

    Scale shape: per-batch (user, type) count partials collapse map-side
    (the exchange carries at most rows-per-batch distinct pairs), ONE
    user-hash co-partition completes the counts, and a sort-once
    drop_duplicates picks each user's argmax with the deterministic
    tiebreak; one output row per user."""
    import pandas as pd

    def pair_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            "et": batch["event_type"].to_pandas(),
        })
        df = df[df["et"].notna()]
        g = df.groupby(["u", "et"], as_index=False).size()
        return pa.table({
            "q": pa.array((g["u"].to_numpy(dtype=np.int64) % _USER_PARTITIONS)),
            "u": pa.array(g["u"].to_numpy(dtype=np.int64)),
            "et": pa.array(g["et"].tolist(), type=pa.string()),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    def argmax(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": group["u"].to_numpy(zero_copy_only=False).astype(np.int64),
            "et": group["et"].to_pylist(),
            "n": group["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby(["u", "et"], as_index=False)["n"].sum()
        g = (g.sort_values(["u", "n", "et"],
                           ascending=[True, False, True], kind="stable")
             .drop_duplicates("u"))
        return pa.table({
            "user_id": pa.array(g["u"].to_numpy(dtype=np.int64)),
            "mode_type": pa.array(g["et"].tolist(), type=pa.string()),
            "n_mode": pa.array(g["n"].to_numpy(dtype=np.int64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
        .map_batches(pair_partials, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(argmax, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Grouped distinct-count over a join with an anti-filter (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

Q16_SIZES = (1, 9, 19, 29, 49)
Q16_EXCL_BRAND = "Brand#13"


def q16_supplier_variety(sf_dir: str):
    """(p_brand, p_size, supplier_cnt): how many DISTINCT suppliers ship
    each qualifying (brand, size) part family — TPC-H Q16's shape: a
    grouped COUNT(DISTINCT) whose distinct key only exists AFTER a
    fact-fact join, with a complaint-supplier anti-filter (here: negative
    account balance, the deterministic stand-in for Q16's name-LIKE
    complaint scan). ``ndistinct_users`` counts distinct over one table;
    this one must join first — the pair (brand, supplier) is born in the
    exchange.

    Scale shape: the complaint set is supplier-dimension-sized and
    filtered tiny, so it broadcasts once via ``ray.put`` and both fact
    sides stay streams. Exchange 1 co-partitions filtered parts with
    map-side-deduped (partkey, suppkey) pairs on partkey — a partition
    owns every line of its parts, so the join resolves locally and emits
    (brand, size, suppkey) triples deduped again in-partition. Exchange 2
    co-partitions the triples on suppkey so every surviving duplicate
    pair meets in exactly one partition (the ndistinct discipline), final
    dedup + per-(brand, size) partial counts there; the driver sums a
    ≤ partitions × brands × sizes frame. Each exchange carries distinct
    pairs, never raw line items."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_acctbal"]).to_pandas()
    excl = np.sort(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"]
                   .to_numpy(dtype=np.int64))
    excl_ref = ray.put(excl)
    sizes = np.asarray(Q16_SIZES, dtype=np.int64)

    def part_side(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        br = np.asarray(batch["p_brand"].to_pylist(), dtype=object)
        m = np.isin(sz, sizes) & (br != Q16_EXCL_BRAND)
        pk, sz, br = pk[m], sz[m], br[m]
        return pa.table({"q": pa.array(_hash_partition(pk)),
                         "side": pa.array(np.zeros(pk.size, dtype=np.int64)),
                         "k": pa.array(pk), "a": pa.array(sz),
                         "brand": pa.array(br.tolist(), type=pa.string())})

    def lineitem_side(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = ray.get(excl_ref)
        if ex.size:
            pos = np.minimum(np.searchsorted(ex, sk), ex.size - 1)
            keep = ex[pos] != sk
            pk, sk = pk[keep], sk[keep]
        pairs = np.unique(np.stack([pk, sk], axis=1), axis=0)  # map-side dedup
        pk, sk = pairs[:, 0], pairs[:, 1]
        return pa.table({"q": pa.array(_hash_partition(pk)),
                         "side": pa.array(np.ones(pk.size, dtype=np.int64)),
                         "k": pa.array(pk), "a": pa.array(sk),
                         "brand": pa.array([""] * pk.size, type=pa.string())})

    def join_parts(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        p_m = side == 0
        ppk, psz = k[p_m], a[p_m]
        pbr = np.asarray(group["brand"].to_pylist(), dtype=object)[p_m]
        lpk, lsk = k[~p_m], a[~p_m]
        empty = pa.table({"q2": pa.array([], type=pa.int64()),
                          "brand": pa.array([], type=pa.string()),
                          "size": pa.array([], type=pa.int64()),
                          "sk": pa.array([], type=pa.int64())})
        if ppk.size == 0 or lpk.size == 0:
            return empty
        order = np.argsort(ppk)
        ppk, psz, pbr = ppk[order], psz[order], pbr[order]
        pos = np.minimum(np.searchsorted(ppk, lpk), ppk.size - 1)
        hit = ppk[pos] == lpk
        if not hit.any():
            return empty
        df = pd.DataFrame({
            "brand": pbr[pos[hit]], "size": psz[pos[hit]], "sk": lsk[hit],
        }).drop_duplicates()  # same (brand,size,sk) via several partkeys
        return pa.table({
            "q2": pa.array(_hash_partition(df["sk"].to_numpy(dtype=np.int64))),
            "brand": pa.array(df["brand"].tolist(), type=pa.string()),
            "size": pa.array(df["size"].to_numpy(dtype=np.int64)),
            "sk": pa.array(df["sk"].to_numpy(dtype=np.int64)),
        })

    def count_distinct(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "brand": group["brand"].to_pylist(),
            "size": group["size"].to_numpy(zero_copy_only=False),
            "sk": group["sk"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()  # triples from different partkey partitions
        g = df.groupby(["brand", "size"], as_index=False).agg(n=("sk", "count"))
        return pa.table({
            "brand": pa.array(g["brand"].tolist(), type=pa.string()),
            "size": pa.array(g["size"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
        })

    parts = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    ).map_batches(part_side, batch_format="pyarrow", batch_size=8192)
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    agg = (parts.union(items).groupby("q")
           .map_groups(join_parts, batch_format="pyarrow")
           .groupby("q2")
           .map_groups(count_distinct, batch_format="pyarrow")
           .to_pandas())
    if agg.empty:
        return pa.table({"p_brand": pa.array([], type=pa.string()),
                         "p_size": pa.array([], type=pa.int64()),
                         "supplier_cnt": pa.array([], type=pa.int64())})
    g = (agg.groupby(["brand", "size"], as_index=False)["n"].sum()
         .sort_values(["brand", "size"]))
    return pa.table({
        "p_brand": pa.array(g["brand"].tolist(), type=pa.string()),
        "p_size": pa.array(g["size"].to_numpy(dtype=np.int64)),
        "supplier_cnt": pa.array(g["n"].to_numpy(dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# Calendar densification (gap-filled time series)
# ---------------------------------------------------------------------------


def hourly_gap_fill(sf_dir: str):
    """(event_type, hour_us, n_events): hourly event counts per type with
    EVERY hour of the global [min, max] range present — absent (type,
    hour) combinations surface as explicit zero rows. The dimension-
    densification surface (SQL's generate_series scaffold + LEFT JOIN +
    COALESCE): monitoring, rate-limiting and drift detection all need the
    zeros to exist, and no other entry manufactures rows that have no
    input-row witness.

    Scale shape: the measured side is the shared ``_bucket_partial``
    map-side combine (≤ types × hours-per-batch rows per batch — raw
    events never cross the exchange), tiny groupby finish; the scaffold
    is CALENDAR-sized — hours × types, bounded by wall-clock time and the
    type vocabulary, never by corpus row count — so the driver
    materializes it directly and fills gaps with one vectorized grid
    write. At 100 TB the dense frame for a decade of hours × 1000 types
    is ~10⁸ rows — if the scaffold itself ever needed to be distributed,
    the same closed form (hour = lo + i // n_types, type =
    vocab[i % n_types]) generates any shard of it independently."""
    from ray.data.aggregate import Sum

    HOUR_US = WINDOW_US  # 1 hour in µs — the module's bucket constant

    counted = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type"])
        .map_batches(lambda b: _bucket_partial(b, HOUR_US, "hour_us",
                                               with_value=False),
                     batch_format="pyarrow", batch_size=8192)
        .groupby(["hour_us", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "hour_us": pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64())})
    if counted.empty:  # an all-empty-partial dataset has NO columns at all
        return empty
    # nulls already dropped map-side; re-guard on the FILTERED frame (an
    # all-null corpus must return empty rows, matching the oracle)
    counted = counted[counted["event_type"].notna()]
    if counted.empty:
        return empty
    hours = np.arange(int(counted["hour_us"].min()),
                      int(counted["hour_us"].max()) + HOUR_US, HOUR_US,
                      dtype=np.int64)
    types = np.asarray(sorted(counted["event_type"].unique()), dtype=object)
    # dense scaffold in (type, hour) order, gaps filled via one merge
    grid_t = np.repeat(np.arange(types.size), hours.size)
    grid_h = np.tile(hours, types.size)
    n = np.zeros(grid_t.size, dtype=np.int64)
    t_idx = {t: i for i, t in enumerate(types)}
    obs_t = counted["event_type"].map(t_idx).to_numpy(dtype=np.int64)
    obs_h = counted["hour_us"].to_numpy(dtype=np.int64)
    pos = obs_t * hours.size + (obs_h - hours[0]) // HOUR_US
    n[pos] = counted["n"].to_numpy(dtype=np.int64)
    return pa.table({
        "event_type": pa.array(types[grid_t].tolist(), type=pa.string()),
        "hour_us": pa.array(grid_h),
        "n_events": pa.array(n),
    })


# ---------------------------------------------------------------------------
# Global scalar-subquery gate + anti-join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


Q22_CUTOFF_US = 946_684_800_000_000  # 2000-01-01 epoch-µs


def q22_global_balance(sf_dir: str):
    """(c_nationkey, n_cust, total_bal_r): per nation, how many customers
    hold an above-average positive balance yet have placed NO order since
    2000-01-01 (every customer in this corpus has SOME order, so the
    classic never-ordered predicate would be vacuous; the dormancy cutoff
    keeps Q22's anti-join live), and their combined balance — TPC-H
    Q22's shape: a GLOBAL scalar subquery (the corpus-wide average) gates
    a fact stream, then an EXISTS-free anti-join against another fact.
    The scalar-broadcast surface no other entry has: the threshold is one
    aggregate over everything, not a per-group value.

    Exactness: with ci = round(100·c_acctbal) (2-dp contract), positive
    balances sum to Python-int (s, n) via (hi, lo)-split partials, and
    ``bal > avg`` is the pure-integer gate ``ci·n > s`` — no division, no
    float boundary. The two ints broadcast by closure (they ARE the
    decorrelated scalar subquery).

    Scale shape: pass 1 streams customer once (≤1 partial row per batch,
    no shuffle) to resolve (s, n); pass 2 co-partitions the gated
    customers with per-batch-distinct order custkeys on custkey — the
    anti-join resolves per partition via one searchsorted set-diff and
    collapses to ≤ nations partial rows; the driver sums a tiny frame."""
    import pandas as pd

    def bal_partial(batch: pa.Table) -> pa.Table:
        ci = np.rint(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        pos = ci[ci > 0]
        t = int(pos.sum())
        return pa.table({
            "n": pa.array([pos.size], type=pa.int64()),
            "hi": pa.array([t >> 32], type=pa.int64()),
            "lo": pa.array([t & 0xFFFFFFFF], type=pa.int64()),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    empty = pa.table({"c_nationkey": pa.array([], type=pa.int64()),
                      "n_cust": pa.array([], type=pa.int64()),
                      "total_bal_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    n_pos = int(parts["n"].sum())
    s_pos = sum((int(h) << 32) + int(x)
                for h, x in zip(parts["hi"], parts["lo"]))
    if n_pos == 0:
        return empty

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = np.rint(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        # the decorrelated global gate: bal > avg ⟺ ci·n > s (Python-int
        # threshold via object dtype would be slow; ci·n fits int64 far
        # past any real corpus — document: ci < 2²¹, so n may reach 2⁴²)
        keep = ci * n_pos > s_pos
        ck, nk, ci = ck[keep], nk[keep], ci[keep]
        return pa.table({"q": pa.array(_hash_partition(ck)),
                         "side": pa.array(np.zeros(ck.size, dtype=np.int64)),
                         "k": pa.array(ck), "a": pa.array(nk),
                         "b": pa.array(ci)})

    def orders_side(batch: pa.Table) -> pa.Table:
        od = (batch["o_orderdate"].cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy(zero_copy_only=False))
        ck = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False)
                       .astype(np.int64)[od >= Q22_CUTOFF_US])
        z = np.zeros(ck.size, dtype=np.int64)
        return pa.table({"q": pa.array(_hash_partition(ck)),
                         "side": pa.array(np.ones(ck.size, dtype=np.int64)),
                         "k": pa.array(ck), "a": pa.array(z),
                         "b": pa.array(z)})

    def anti(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_m = side == 0
        ck, nk = k[c_m], group["a"].to_numpy(zero_copy_only=False)[c_m]
        ci = group["b"].to_numpy(zero_copy_only=False)[c_m]
        ok = np.unique(k[~c_m])
        if ck.size == 0:
            return pa.table({"nk": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        if ok.size:
            pos = np.minimum(np.searchsorted(ok, ck), ok.size - 1)
            keep = ok[pos] != ck
            ck, nk, ci = ck[keep], nk[keep], ci[keep]
        g = (pd.DataFrame({"nk": nk, "n": 1, "cents": ci})
             .groupby("nk", as_index=False).sum())
        return pa.table({
            "nk": pa.array(g["nk"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "cents": pa.array(g["cents"].to_numpy(dtype=np.int64)),
        })

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(cust_side, batch_format="pyarrow", batch_size=8192)
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow", batch_size=8192)
    agg = (cust.union(orders).groupby("q")
           .map_groups(anti, batch_format="pyarrow").to_pandas())
    if agg.empty:
        return empty
    g = agg.groupby("nk", as_index=False).sum().sort_values("nk")
    return pa.table({
        "c_nationkey": pa.array(g["nk"].to_numpy(dtype=np.int64)),
        "n_cust": pa.array(g["n"].to_numpy(dtype=np.int64)),
        "total_bal_r": pa.array(_round_vec(
            g["cents"].to_numpy(dtype=np.float64) / 100.0, 2)),
    })


# ---------------------------------------------------------------------------
# TPC-H scan/broadcast family: Q6 / Q14 / Q15 / Q19
# ---------------------------------------------------------------------------

Q6_FROM_US = 820_454_400_000_000  # 1996-01-01 epoch-µs
Q6_TO_US = 852_076_800_000_000  # 1997-01-01 epoch-µs


def _scalar_partial_row(n: int, *totals: int) -> pa.Table:
    """One (hi, lo)-split partial row per batch for the single-row scan
    aggregates (q6/q14/q19): each exact integer total is carried as two
    int64 halves so the DRIVER combine stays exact past 2⁶³ (the q17
    convention), and the per-batch row count rides along."""
    cols = {"n": pa.array([n], type=pa.int64())}
    for i, t in enumerate(totals):
        cols[f"hi{i}"] = pa.array([t >> 32], type=pa.int64())
        cols[f"lo{i}"] = pa.array([t & 0xFFFFFFFF], type=pa.int64())
    return pa.table(cols)


def _combine_scalar_partials(parts, k: int) -> tuple[int, list[int]]:
    """Driver-side exact combine of ``_scalar_partial_row`` frames."""
    n = int(parts["n"].sum())
    totals = [sum((int(h) << 32) + int(x)
                  for h, x in zip(parts[f"hi{i}"], parts[f"lo{i}"]))
              for i in range(k)]
    return n, totals


def q6_forecast_revenue(sf_dir: str):
    """(n_items, revenue_r): TPC-H Q6 — the pure scan aggregate. Revenue
    delta from line items in one shipdate year with discount in a narrow
    band and small quantity; revenue = Σ extendedprice·discount.

    Exactness: the discount-band gate compares round(100·l_discount) —
    the column's exact 2-dp integer image — against integer bounds, so the
    BETWEEN boundary can never float-flip; revenue accumulates as exact
    cents×hundredths (price_i·disc_i ≤ 10⁹ per row, int64-safe per batch)
    and rides (hi, lo)-split partials to a Python-int driver combine.

    Scale shape: embarrassingly parallel — one column-pruned pass, one
    ≤1-row partial per batch, NO exchange at all (the only TPC-H query
    with that property; every other q* here needs at least one groupby).
    Mirrors the reference's single-pass batched aggregation pattern
    (IndexingServiceImpl.java:148-151's parse-then-aggregate loop)."""

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        disc_i = np.rint(batch["l_discount"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        m = ((ship >= Q6_FROM_US) & (ship < Q6_TO_US)
             & (disc_i >= 5) & (disc_i <= 7) & (qty < 24.0))
        if not m.any():
            return _scalar_partial_row(0, 0)
        price_i = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        rev = int(np.sum(price_i * disc_i[m]))
        return _scalar_partial_row(int(m.sum()), rev)

    parts = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    if parts.empty:
        n, rev = 0, 0
    else:
        n, (rev,) = _combine_scalar_partials(parts, 1)
    return pa.table({
        "n_items": pa.array([n], type=pa.int64()),
        "revenue_r": pa.array([round_half_away(rev / 10_000.0, 2)],
                              type=pa.float64()),
    })


Q14_FROM_US = 809_913_600_000_000  # 1995-09-01 epoch-µs
Q14_TO_US = 812_505_600_000_000  # 1995-10-01 epoch-µs


def q14_promo_revenue(sf_dir: str):
    """(n_items, promo_pct_r): TPC-H Q14 — promotion effect: the share of
    one shipping month's discounted revenue that came from PROMO-type
    parts, as a percentage.

    Exactness: both the promo and total revenue accumulate as exact
    cents×hundredths integers through (hi, lo)-split partials; the single
    percentage division happens ONCE on the driver as
    float(100·promo)/float(total) — the identical IEEE expression the SQL
    oracle evaluates on the same two exact integers
    (CAST(100*p AS DOUBLE)/CAST(t AS DOUBLE)), so the 6-dp round can't
    disagree.

    Scale shape: part is the small dimension → ONE broadcast of the sorted
    partkey array + promo-flag bitmap via ``ray.put`` (read once per task,
    never re-shipped per batch); the lineitem pass is a single
    column-pruned scan with a searchsorted membership+flag lookup per
    batch and no exchange — rows whose partkey is absent from part are
    dropped, mirroring the SQL inner join."""
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_promo = np.asarray(
        [t.startswith("PROMO") for t in part["p_type"].to_pylist()],
        dtype=bool)
    order = np.argsort(pk, kind="stable")
    part_ref = ray.put((pk[order], is_promo[order]))

    def partial(batch: pa.Table) -> pa.Table:
        pks, promo = ray.get(part_ref)
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (ship >= Q14_FROM_US) & (ship < Q14_TO_US)
        if not m.any() or pks.size == 0:
            return _scalar_partial_row(0, 0, 0)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        pos = np.minimum(np.searchsorted(pks, lpk), pks.size - 1)
        hit = pks[pos] == lpk  # inner join: drop partless line items
        if not hit.any():
            return _scalar_partial_row(0, 0, 0)
        price_i = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m][hit] * 100.0).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m][hit]
        rev = price_i * np.rint((1.0 - disc) * 100.0).astype(np.int64)
        promo_m = promo[pos[hit]]
        return _scalar_partial_row(
            int(hit.sum()), int(np.sum(rev[promo_m])), int(np.sum(rev)))

    parts = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    if parts.empty:
        n, promo_rev, total_rev = 0, 0, 0
    else:
        n, (promo_rev, total_rev) = _combine_scalar_partials(parts, 2)
    pct = (round_half_away(float(100 * promo_rev) / float(total_rev), 6)
           if total_rev else 0.0)
    return pa.table({
        "n_items": pa.array([n], type=pa.int64()),
        "promo_pct_r": pa.array([pct], type=pa.float64()),
    })


# Adapted Q19 branches: (brand, max p_size, qty lo, qty hi) — the reference
# predicate's container/shipmode legs don't exist in this schema, so the
# disjunction is re-expressed over the columns that do (p_brand, p_size,
# l_quantity), keeping the SHAPE: three brand-specific (size, quantity)
# windows OR-ed together across the part join.
Q19_BRANCHES = (("Brand#12", 5, 1, 11),
                ("Brand#23", 10, 10, 20),
                ("Brand#5", 15, 20, 30))


def q19_discounted_revenue(sf_dir: str):
    """(n_items, revenue_r): TPC-H Q19 shape — discounted revenue from
    line items matching a DISJUNCTION of brand-specific (part size,
    quantity) windows; the classic OR-of-conjunctions join predicate that
    defeats naive join pushdown.

    Exactness: quantity gates compare round(100·l_quantity) against
    integer bounds (the 2-dp contract), p_size is int — every branch
    predicate is pure-integer; revenue rides exact (hi, lo) partials.

    Scale shape: identical to q14 — part broadcast once (sorted partkeys +
    int8 brand code + int32 size), single column-pruned lineitem scan,
    per-batch vectorized 3-branch mask, no exchange."""
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brands = np.asarray(part["p_brand"].to_pylist(), dtype=object)
    # brand code: index into Q19_BRANCHES, -1 = no branch (never matches)
    code = np.full(pk.size, -1, dtype=np.int8)
    for i, (b, _, _, _) in enumerate(Q19_BRANCHES):
        code[brands == b] = i
    size = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int32)
    order = np.argsort(pk, kind="stable")
    part_ref = ray.put((pk[order], code[order], size[order]))

    def partial(batch: pa.Table) -> pa.Table:
        pks, codes, sizes = ray.get(part_ref)
        if pks.size == 0:
            return _scalar_partial_row(0, 0)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pks, lpk), pks.size - 1)
        hit = pks[pos] == lpk
        qi = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        c, s = codes[pos], sizes[pos]
        keep = np.zeros(lpk.size, dtype=bool)
        for i, (_, max_size, qlo, qhi) in enumerate(Q19_BRANCHES):
            keep |= ((c == i) & (s >= 1) & (s <= max_size)
                     & (qi >= 100 * qlo) & (qi <= 100 * qhi))
        keep &= hit
        if not keep.any():
            return _scalar_partial_row(0, 0)
        price_i = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep] * 100.0).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = int(np.sum(price_i
                         * np.rint((1.0 - disc) * 100.0).astype(np.int64)))
        return _scalar_partial_row(int(keep.sum()), rev)

    parts = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    if parts.empty:
        n, rev = 0, 0
    else:
        n, (rev,) = _combine_scalar_partials(parts, 1)
    return pa.table({
        "n_items": pa.array([n], type=pa.int64()),
        "revenue_r": pa.array([round_half_away(rev / 10_000.0, 2)],
                              type=pa.float64()),
    })


Q15_FROM_US = 820_454_400_000_000  # 1996-01-01 epoch-µs
Q15_TO_US = 828_316_800_000_000  # 1996-04-01 epoch-µs


def q15_top_supplier(sf_dir: str):
    """(s_suppkey, s_name, total_revenue_r): TPC-H Q15 — the supplier(s)
    with the MAXIMUM revenue over one shipping quarter (the revenue-view +
    max-subquery query; ties all surface, ordered by s_suppkey).

    Exactness: per-supplier revenue accumulates as exact cents×hundredths
    integers (per-batch int64 combine per suppkey, Python-int driver
    merge), so the max comparison and every tie are decided on exact
    integers — never on a rounded double (the rounding happens once, on
    the winners' published column).

    Scale shape: the map side combines per suppkey INSIDE each batch, so
    the exchange carries ≤ |suppliers-in-batch| rows; supplier names
    resolve by a driver-side point read of the two needed columns. At
    fact-sized supplier cardinality the per-batch partial keys this
    exchange exactly like lemma_df's salted groupby — no all-pairs, no
    full-table sort anywhere."""
    import pandas as pd
    import pyarrow.parquet as pq

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (ship >= Q15_FROM_US) & (ship < Q15_TO_US)
        empty = pa.table({"sk": pa.array([], type=pa.int64()),
                          "hi": pa.array([], type=pa.int64()),
                          "lo": pa.array([], type=pa.int64())})
        if not m.any():
            return empty
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        price_i = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        rev = price_i * np.rint((1.0 - disc) * 100.0).astype(np.int64)
        usk, inv = np.unique(sk, return_inverse=True)
        tot = np.zeros(usk.size, dtype=np.int64)
        np.add.at(tot, inv, rev)  # int64-exact (bincount would go float)
        return pa.table({"sk": pa.array(usk),
                         "hi": pa.array(tot >> np.int64(32)),
                         "lo": pa.array(tot & np.int64(0xFFFFFFFF))})

    parts = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    empty = pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                      "s_name": pa.array([], type=pa.string()),
                      "total_revenue_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    parts["t"] = [(int(h) << 32) + int(x)
                  for h, x in zip(parts["hi"], parts["lo"])]
    tot = parts.groupby("sk")["t"].apply(lambda s: sum(int(v) for v in s))
    best = max(tot)  # Python ints: exact at any scale
    winners = sorted(int(k) for k, v in tot.items() if v == best)
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"]).to_pandas()
    name_of = dict(zip(sup["s_suppkey"], sup["s_name"]))
    # inner join to supplier: a max-revenue suppkey with no supplier row
    # drops entirely (the oracle's JOIN supplier), it does NOT surface
    # with a NULL name — note the max itself is still taken over ALL
    # suppkeys, exactly like the revenue-view subquery
    winners = [k for k in winners if k in name_of]
    return pa.table({
        "s_suppkey": pa.array(winners, type=pa.int64()),
        "s_name": pa.array([name_of[k] for k in winners],
                           type=pa.string()),
        "total_revenue_r": pa.array(
            [round_half_away(tot[k] / 10_000.0, 2) for k in winners],
            type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# TPC-H two-exchange chain family: Q7 / Q8
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM_US = 820_454_400_000_000  # 1996-01-01 epoch-µs
Q7_Y97_US = 852_076_800_000_000  # 1997-01-01 epoch-µs (year boundary)
Q7_TO_US = 883_612_800_000_000  # 1998-01-01 epoch-µs


def q7_volume_shipping(sf_dir: str):
    """(supp_nation, cust_nation, l_year, n_items, revenue_r): TPC-H Q7 —
    trade volume between two nations, split by direction and ship year,
    over a two-year shipdate window.

    The join story this entry adds on top of q5's chain: an ASYMMETRIC
    nation-pair gate — the (supplier nation, customer nation) tuple must
    be one of the two ORDERED pairs, so the partition join carries BOTH
    sides' nation through the exchange and the gate decides direction,
    where q5's gate collapses to same-nation equality.

    Scale shape: stage 1 co-partitions orders with pair-filtered customer
    on custkey (the customer filter drops ~23/25 of customers BEFORE the
    exchange); stage 2 co-partitions the qualifying-order stream with
    lineitem on orderkey — the lineitem side is shipdate-windowed,
    supplier-nation-filtered through one broadcast suppkey→nationkey map,
    and pre-aggregated per (orderkey, supp nation, year) INSIDE each batch
    (year is a pure integer threshold on epoch-µs — no datetime per row).
    Nation names resolve on the driver against the ≤25-row dimension.
    Revenue is exact cents×hundredths end-to-end (q5 convention)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    pair_nk = nat.loc[nat["n_name"].isin([Q7_NATION_A, Q7_NATION_B]),
                      "n_nationkey"].to_numpy(dtype=np.int64)
    pair_nk = np.sort(pair_nk)
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(pair_nk)]
    sup_keys = np.sort(sup["s_suppkey"].to_numpy(dtype=np.int64))
    sup_nk = sup.sort_values("s_suppkey")["s_nationkey"].to_numpy(dtype=np.int64)
    sup_ref = ray.put((sup_keys, sup_nk))

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(cn, pair_nk)
        return _exchange_rows(ck[m], 0, cn[m])

    def orders_side(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _exchange_rows(ck, 1, ok)

    def join_cust(group: pa.Table) -> pa.Table:
        """custkey-partition join → (orderkey, cust nation) keyed by ok."""
        (ck_sorted, cn_sorted, _), (ock, ok, _, _) = \
            _split_exchange_group(group)
        pos, hit = _sorted_probe(ck_sorted, ock)
        ok, pos = ok[hit], pos[hit]
        return _exchange_rows(ok, 0, cn_sorted[pos],
                              np.zeros(ok.size, dtype=np.int64))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (ship >= Q7_FROM_US) & (ship < Q7_TO_US)
        if not m.any():
            return _exchange_empty()
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        pos, hm = _sorted_probe(sk, lsk)  # supplier in the nation pair
        if not hm.any():
            return _exchange_empty()
        year = (ship[m][hm] >= Q7_Y97_US).astype(np.int64)  # 0=1996, 1=1997
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m][hm]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m][hm]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        df = pd.DataFrame({"ok": ok[hm], "sy": sn[pos[hm]] * 2 + year,
                           "rev": rev, "n": 1})
        g = df.groupby(["ok", "sy"], as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum"))
        # k = orderkey, a = supp_nation*2 + (year-1996), b = revenue
        # partial, side = 1000 + row count (≥ 1001, never collides with 0)
        return _exchange_rows(g["ok"].to_numpy(dtype=np.int64),
                              1000 + g["n"].to_numpy(dtype=np.int64),
                              g["sy"].to_numpy(dtype=np.int64),
                              g["rev"].to_numpy(dtype=np.int64))

    def join_order(group: pa.Table) -> pa.Table:
        """orderkey-partition join + ordered-pair gate → per-(sn, cn, yr)
        partials."""
        (ok_sorted, cn_sorted, _), (lk, lsy, lrev, lside) = \
            _split_exchange_group(group)
        lcnt = lside - 1000
        empty = pa.table({"sn": pa.array([], type=pa.int64()),
                          "cn": pa.array([], type=pa.int64()),
                          "yr": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "rev": pa.array([], type=pa.int64())})
        pos, hit = _sorted_probe(ok_sorted, lk)
        if not hit.any():
            return empty
        sn, yr = lsy[hit] // 2, lsy[hit] % 2
        cn = cn_sorted[pos[hit]]
        cross = sn != cn  # both ∈ pair ⇒ ordered-pair gate = direction
        if not cross.any():
            return empty
        sn, cn, yr = sn[cross], cn[cross], yr[cross]
        rev, cnt = lrev[hit][cross], lcnt[hit][cross]
        key = (sn * 100_000 + cn) * 2 + yr
        uk, inv = np.unique(key, return_inverse=True)
        n = np.zeros(uk.size, dtype=np.int64)
        r = np.zeros(uk.size, dtype=np.int64)
        np.add.at(n, inv, cnt)
        np.add.at(r, inv, rev)
        return pa.table({"sn": pa.array(uk // 2 // 100_000),
                         "cn": pa.array(uk // 2 % 100_000),
                         "yr": pa.array(1996 + uk % 2),
                         "n": pa.array(n), "rev": pa.array(r)})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(orders_side, batch_format="pyarrow")
    stage1 = cust.union(orders).groupby("q").map_groups(
        join_cust, batch_format="pyarrow")
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    parts = stage1.union(items).groupby("q").map_groups(
        join_order, batch_format="pyarrow").to_pandas()
    empty = pa.table({"supp_nation": pa.array([], type=pa.string()),
                      "cust_nation": pa.array([], type=pa.string()),
                      "l_year": pa.array([], type=pa.int64()),
                      "n_items": pa.array([], type=pa.int64()),
                      "revenue_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    for c in ("n", "rev"):
        parts[c] = parts[c].astype(object)  # exact past int64 at scale
    agg = parts.groupby(["sn", "cn", "yr"], as_index=False).sum()
    agg["supp_nation"] = agg["sn"].map(name_of)
    agg["cust_nation"] = agg["cn"].map(name_of)
    agg = agg.sort_values(["supp_nation", "cust_nation", "yr"])
    return pa.table({
        "supp_nation": pa.array(agg["supp_nation"].to_numpy(), type=pa.string()),
        "cust_nation": pa.array(agg["cust_nation"].to_numpy(), type=pa.string()),
        "l_year": pa.array(agg["yr"].to_numpy(dtype=np.int64)),
        "n_items": pa.array(agg["n"].to_numpy(dtype=np.int64)),
        "revenue_r": pa.array(_round_vec(
            agg["rev"].to_numpy(dtype=np.float64) / 10_000.0, 2)),
    })


Q8_REGION = "AMERICA"
Q8_NATION = "NATION_6"  # target supplier nation (inside Q8_REGION here,
#                         but the semantics don't require that)
Q8_PTYPE = "ECONOMY"
Q8_FROM_US = 820_454_400_000_000  # 1996-01-01 epoch-µs (o_orderdate)
Q8_Y97_US = 852_076_800_000_000  # 1997-01-01 epoch-µs (year boundary)
Q8_TO_US = 883_612_800_000_000  # 1998-01-01 epoch-µs


def q8_market_share(sf_dir: str):
    """(o_year, n_items, mkt_share_r): TPC-H Q8 — national market share:
    the fraction of one region's customers' spend on one part type that
    was supplied by one target nation, per ORDER year.

    The join story this entry adds: a CONDITIONAL-AGGREGATE ratio across a
    five-table chain — the grouped division Σ(rev · [supp = target]) /
    Σ(rev), where the numerator's gate travels with the fact rows as a
    flag bit, not as a separate query.

    Exactness: numerator and denominator accumulate as exact
    cents×hundredths integers per (year, flag); the one double division
    per year happens on the driver as float(num)/float(den) — the same
    IEEE expression the SQL evaluates on the same exact integers — and
    rounds once at 6 dp.

    Scale shape: two broadcasts (type-filtered partkeys; suppkey→is-target
    flags) + the q5/q7 two-exchange chain: orders (date-windowed, year
    attached as an integer threshold bit) co-partition with region-filtered
    customer on custkey; lineitem (part-filtered before anything else —
    the most selective gate runs first) pre-aggregates per (orderkey,
    year?, flag) inside each batch and co-partitions with the qualifying
    orders on orderkey. The final exchange output is ≤ 4 rows per
    partition (year × flag)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rk = set(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"])
    region_nk = np.sort(nat.loc[nat["n_regionkey"].isin(rk),
                                "n_nationkey"].to_numpy(dtype=np.int64))
    target_nk = set(nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"])
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    ptype = np.asarray(part["p_type"].to_pylist(), dtype=object)
    pkeys = np.sort(part["p_partkey"].to_numpy(
        zero_copy_only=False)[ptype == Q8_PTYPE].astype(np.int64))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(dtype=np.int64)
    sflag = sup["s_nationkey"].isin(target_nk).to_numpy(dtype=bool)
    dims_ref = ray.put((pkeys, skeys, sflag))

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ck[np.isin(cn, region_nk)]
        z = np.zeros(ck.size, dtype=np.int64)
        # same 5-column shuffle-row schema as orders_side: a ragged union
        # would null-fill "b" and force a NaN-laden cast downstream
        return _exchange_rows(ck, 0, z, z)

    def orders_side(batch: pa.Table) -> pa.Table:
        odate = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (odate >= Q8_FROM_US) & (odate < Q8_TO_US)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        yr = (odate[m] >= Q8_Y97_US).astype(np.int64)  # 0=1996, 1=1997
        return _exchange_rows(ck, 1, ok, yr)

    def join_cust(group: pa.Table) -> pa.Table:
        """custkey-partition semi-join → (orderkey, order year) stream."""
        (ck_sorted, _, _), (ock, ok, yr, _) = _split_exchange_group(group)
        pos, hit = _sorted_probe(ck_sorted, ock)
        ok, yr = ok[hit], yr[hit]
        return _exchange_rows(ok, 0, yr, np.zeros(ok.size, dtype=np.int64))

    def lineitem_side(batch: pa.Table) -> pa.Table:
        pks, sks, sfl = ray.get(dims_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos, m = _sorted_probe(pks, lpk)  # most selective gate first: type
        if not m.any():
            return _exchange_empty()
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        spos, shit = _sorted_probe(sks, lsk)  # inner join to supplier
        if not shit.any():
            return _exchange_empty()
        ok = ok[shit]
        flag = sfl[spos[shit]].astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m][shit]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m][shit]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * np.rint((1.0 - disc) * 100.0).astype(np.int64))
        df = pd.DataFrame({"ok": ok, "fl": flag, "rev": rev, "n": 1})
        g = df.groupby(["ok", "fl"], as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum"))
        # k = orderkey, a = target flag, b = revenue partial,
        # side = 1000 + row count
        return _exchange_rows(g["ok"].to_numpy(dtype=np.int64),
                              1000 + g["n"].to_numpy(dtype=np.int64),
                              g["fl"].to_numpy(dtype=np.int64),
                              g["rev"].to_numpy(dtype=np.int64))

    def join_order(group: pa.Table) -> pa.Table:
        """orderkey-partition join → per-(year, flag) partials."""
        (ok_sorted, yr_sorted, _), (lk, lfl, lrev, lside) = \
            _split_exchange_group(group)
        lcnt = lside - 1000
        empty = pa.table({"yr": pa.array([], type=pa.int64()),
                          "fl": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "rev": pa.array([], type=pa.int64())})
        pos, hit = _sorted_probe(ok_sorted, lk)
        if not hit.any():
            return empty
        key = yr_sorted[pos[hit]] * 2 + lfl[hit]
        uk, inv = np.unique(key, return_inverse=True)
        n = np.zeros(uk.size, dtype=np.int64)
        r = np.zeros(uk.size, dtype=np.int64)
        np.add.at(n, inv, lcnt[hit])
        np.add.at(r, inv, lrev[hit])
        return pa.table({"yr": pa.array(1996 + uk // 2),
                         "fl": pa.array(uk % 2),
                         "n": pa.array(n), "rev": pa.array(r)})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_side, batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    stage1 = cust.union(orders).groupby("q").map_groups(
        join_cust, batch_format="pyarrow")
    items = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow", batch_size=8192)
    parts = stage1.union(items).groupby("q").map_groups(
        join_order, batch_format="pyarrow").to_pandas()
    empty = pa.table({"o_year": pa.array([], type=pa.int64()),
                      "n_items": pa.array([], type=pa.int64()),
                      "mkt_share_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    for c in ("n", "rev"):
        parts[c] = parts[c].astype(object)  # exact past int64 at scale
    agg = parts.groupby(["yr", "fl"], as_index=False).sum()
    years, n_items, shares = [], [], []
    for yr, sub in agg.groupby("yr"):
        den = sum(int(v) for v in sub["rev"])
        num = sum(int(v) for v in sub.loc[sub["fl"] == 1, "rev"])
        years.append(int(yr))
        n_items.append(sum(int(v) for v in sub["n"]))
        shares.append(round_half_away(float(num) / float(den), 6)
                      if den else 0.0)
    return pa.table({
        "o_year": pa.array(years, type=pa.int64()),
        "n_items": pa.array(n_items, type=pa.int64()),
        "mkt_share_r": pa.array(shares, type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# PIVOT: long → wide conditional aggregation
# ---------------------------------------------------------------------------

PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_events(sf_dir: str):
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view,
    sum_value_r): the PIVOT surface — one wide row per user with a count
    column per event type plus the user's total value — the long→wide
    conditional aggregation every feature-engineering pipeline runs before
    model training (the classic ``sum(CASE WHEN type = t THEN 1 END)``
    fan-out; no other entry materializes per-key columns from row values).

    Exactness: counts are int64 end-to-end; the value sum accumulates the
    column's exact 4-dp integer image (round(10⁴·value), the group_moments
    convention) per partial, so partial-summation order can never flip the
    published rounding.

    Scale shape: user_id is a fact-sized key, so the pivot rides the
    shared ``_USER_PARTITIONS`` hash co-partition: per-batch combine per
    (user, type code) BEFORE the exchange (≤ users×5 rows per batch on
    the wire), then each partition owns all rows of its users and emits
    finished wide rows — the output never funnels through the driver
    (returned as a streaming Dataset). The type vocabulary is FIXED by
    contract (PIVOT_TYPES); an unexpected type fails loudly rather than
    silently widening the schema — pivot semantics require a declared
    column set, exactly like SQL's.

    Cites the reference's statistics assembly (StatisticsServiceImpl
    builds a per-site wide row from long lemma/page counts) as the
    behavioural analogue.
    """
    import pandas as pd

    t_code = {t: i for i, t in enumerate(PIVOT_TYPES)}

    def pair_partials(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_pylist()
        vi = np.rint(batch["value"].to_numpy(zero_copy_only=False)
                     * 10_000.0).astype(np.int64)
        # (hi, lo) split BEFORE any summation (the q15/group_moments
        # convention): per-row |hi| < 2^31 and lo < 2^32, so per-batch
        # per-group sums stay far from the int64 ceiling even when the
        # raw 4-dp images are near it — a plain vi sum would wrap
        # silently on one hot user
        code = np.asarray([t_code[t] for t in et], dtype=np.int64)
        df = pd.DataFrame({"u": u, "c": code, "n": 1,
                           "vh": vi >> np.int64(32),
                           "vl": vi & np.int64(0xFFFFFFFF)})
        g = df.groupby(["u", "c"], as_index=False).agg(
            n=("n", "sum"), vh=("vh", "sum"), vl=("vl", "sum"))
        return pa.table({
            "q": pa.array((g["u"].to_numpy(dtype=np.int64)
                           % _USER_PARTITIONS)),
            "u": pa.array(g["u"].to_numpy(dtype=np.int64)),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "vh": pa.array(g["vh"].to_numpy(dtype=np.int64)),
            "vl": pa.array(g["vl"].to_numpy(dtype=np.int64)),
        })

    def widen(group: pa.Table) -> pa.Table:
        u = group["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        vh = group["vh"].to_numpy(zero_copy_only=False).astype(np.int64)
        vl = group["vl"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        counts = np.zeros((uu.size, len(PIVOT_TYPES)), dtype=np.int64)
        np.add.at(counts, (inv, c), n)
        hi = np.zeros(uu.size, dtype=np.int64)
        lo = np.zeros(uu.size, dtype=np.int64)
        np.add.at(hi, inv, vh)
        np.add.at(lo, inv, vl)
        # reconstruct hi·2³² + lo in float64: exact whenever the user
        # total is < 2^53 (and never garbage beyond — the bare int64
        # path wrapped); the publish division mirrors the oracle's
        # HUGEINT-sum / 10000.0 double op
        val = hi.astype(np.float64) * 4294967296.0 + lo.astype(np.float64)
        cols = {"user_id": pa.array(uu)}
        for i, t in enumerate(PIVOT_TYPES):
            cols[f"n_{t}"] = pa.array(counts[:, i])
        cols["sum_value_r"] = pa.array(_round_vec(val / 10_000.0, 4))
        return pa.table(cols)

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type", "value"])
        .map_batches(pair_partials, batch_format="pyarrow", batch_size=8192)
        .groupby("q")
        .map_groups(widen, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Semi-structured (JSON) column extraction
# ---------------------------------------------------------------------------


def json_extract_stats(sf_dir: str):
    """(event_type, n_valid, sum_k, avg_k_r): aggregate over a value
    EXTRACTED from the semi-structured ``props`` JSON column — the
    schema-on-read surface (every other entry consumes typed columns;
    real event streams carry a JSON properties bag exactly like this).

    Semantics mirror SQL's ``TRY_CAST(json_extract_string(props, '$.k')
    AS BIGINT)``: a row contributes iff ``props`` parses as JSON AND has
    a top-level integer ``k`` — malformed JSON, missing key, float, bool,
    string and null values all drop (JSON ``true`` is a bool, not an int,
    on both sides; floats fail the BIGINT cast).

    Exactness: per-batch (count, sum) partials per event type accumulate
    as PYTHON ints in a plain dict (a pandas int column would coerce the
    int/None mix to float64 and silently lose precision past 2^53; the
    sum column ships as a decimal string so no int64 ceiling exists
    anywhere in the partial path). The extraction loop is per-row
    ``json.loads`` — correct-by-construction JSON semantics; at 100 TB
    this stage would swap in a vectorized simdjson-style extractor behind
    the same contract, the documented multimodal-decoder pattern. The
    ≤|types|-group exchange combines exactly and the one avg division is
    the mirrored IEEE double op. Duplicate top-level keys resolve
    FIRST-wins via ``object_pairs_hook`` — DuckDB's ``json_extract``
    returns the first occurrence, while bare ``json.loads`` keeps the
    last."""
    import json as _json

    def _first_wins(pairs):
        d = {}
        for kk, vv in pairs:
            if kk not in d:
                d[kk] = vv
        return d

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        acc: dict[str, list[int]] = {}
        for t, p in zip(et, batch["props"].to_pylist()):
            if p is None:
                continue
            try:
                v = _json.loads(p, object_pairs_hook=_first_wins)
            except (ValueError, TypeError):
                continue
            kv = v.get("k") if isinstance(v, dict) else None
            # JSON integer only (bool is an int subclass; floats and
            # numeric strings are NOT integers — the oracle's json_type
            # gate), within int64 like the BIGINT cast
            if (isinstance(kv, int) and not isinstance(kv, bool)
                    and -(1 << 63) <= kv < (1 << 63)):
                a = acc.setdefault(t, [0, 0])
                a[0] += 1
                a[1] += kv
        keys = sorted(acc)
        return pa.table({"et": pa.array(keys, type=pa.string()),
                         "n": pa.array([acc[k][0] for k in keys],
                                       type=pa.int64()),
                         "s": pa.array([str(acc[k][1]) for k in keys],
                                       type=pa.string())})

    parts = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    if parts.empty:
        return pa.table({"event_type": pa.array([], type=pa.string()),
                         "n_valid": pa.array([], type=pa.int64()),
                         "sum_k": pa.array([], type=pa.int64()),
                         "avg_k_r": pa.array([], type=pa.float64())})
    parts["n"] = parts["n"].astype(object)  # exact past int64 at scale
    parts["s"] = [int(v) for v in parts["s"]]  # decimal string → exact int
    agg = parts.groupby("et", as_index=False).sum().sort_values("et")
    n = agg["n"].to_numpy(dtype=np.int64)
    s = [int(v) for v in agg["s"]]
    return pa.table({
        "event_type": pa.array(agg["et"].tolist(), type=pa.string()),
        "n_valid": pa.array(n),
        "sum_k": pa.array(s, type=pa.int64()),
        "avg_k_r": pa.array([round_half_away(float(sv) / int(nv), 4)
                             for sv, nv in zip(s, n)], type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# Skyline (Pareto-dominance) query — the preference/dominance operator family
# ---------------------------------------------------------------------------


def _skyline_mask(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean mask over the input rows: True iff (price, date) is
    Pareto-optimal under MINIMIZE price / MAXIMIZE date — no other row
    has price <= AND date >= with at least one strict. Identical pairs
    never dominate each other, so exact duplicates all survive.

    Vectorized 2-D kernel: sort by (price asc, date desc); a row survives
    iff its date equals its equal-price run's max (nothing same-priced is
    strictly later) AND strictly exceeds the running max date over all
    strictly-cheaper runs (nothing cheaper is at-or-later)."""
    n = price.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-date, price))
    p, d = price[order], date[order]
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = p[1:] != p[:-1]
    run_id = np.cumsum(new_run) - 1
    run_max = d[new_run]  # date-desc within a run → first is the run max
    cheaper = np.empty(run_max.size, dtype=np.int64)
    cheaper[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(run_max[:-1], out=cheaper[1:])
    keep_sorted = (d == run_max[run_id]) & (d > cheaper[run_id])
    keep = np.zeros(n, dtype=bool)
    keep[order[keep_sorted]] = True
    return keep


def skyline_orders(sf_dir: str):
    """(o_orderpriority, o_orderkey, price_cents, o_orderdate_us): per
    priority class, every Pareto-optimal order under MINIMIZE totalprice /
    MAXIMIZE orderdate — the skyline / dominance operator (the preference-
    query family: no single score, the answer is the non-dominated SET;
    reference analogue is O1/O2's ranking surface generalized to partial
    orders, SURVEY §2.7).

    Exactness: prices quantize to integer cents map-side (the corpus
    carries 2-dp values, so ``rint(p*100)`` is bijective with the stored
    doubles) and dates to epoch-µs int64, so dominance comparisons are
    pure int64 on both engine and oracle — the SQL side mirrors with a
    NOT EXISTS dominance anti-join over the same casts.

    Scale shape — the algebraic-combiner pattern: skyline(A ∪ B) ⊆
    skyline(A) ∪ skyline(B), so each batch reduces to its LOCAL skyline
    map-side (a 2-D skyline of m rows is expected O(log m) — the exchange
    carries candidates, never the fact table), then ONE ≤|priorities|-group
    exchange re-runs the same kernel per priority for the global answer.
    At 100 TB the local pass bounds the shuffle to per-block candidate
    sets; a skew-heavy priority would salt into sub-groups and re-merge
    (the same kernel is idempotent across any merge tree)."""
    import pandas as pd

    def local_skyline(batch: pa.Table) -> pa.Table:
        pri = batch["o_orderpriority"].to_pandas()
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        date = batch["o_orderdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        pri_np = pri.to_numpy()
        keep = np.zeros(key.size, dtype=bool)
        for v in pd.unique(pri_np):
            ii = np.flatnonzero(pri_np == v)
            keep[ii[_skyline_mask(cents[ii], date[ii])]] = True
        return pa.table({
            "o_orderpriority": pa.array(pri[keep].tolist(), type=pa.string()),
            "o_orderkey": pa.array(key[keep]),
            "price_cents": pa.array(cents[keep]),
            "o_orderdate_us": pa.array(date[keep]),
        })

    def merge_skyline(group: pa.Table) -> pa.Table:
        cents = group["price_cents"].to_numpy(zero_copy_only=False)
        date = group["o_orderdate_us"].to_numpy(zero_copy_only=False)
        keep = _skyline_mask(cents.astype(np.int64), date.astype(np.int64))
        out = group.filter(pa.array(keep)).select(
            ["o_orderpriority", "o_orderkey", "price_cents",
             "o_orderdate_us"])
        return out.sort_by([("o_orderkey", "ascending")])

    return (
        read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderdate",
                     "o_orderpriority"])
        .map_batches(local_skyline, batch_format="pyarrow", batch_size=8192)
        .groupby("o_orderpriority")
        .map_groups(merge_skyline, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# One-pass table profiling — per-column nulls / exact distinct / min-max
# ---------------------------------------------------------------------------

# the corpus lineitem schema the oracle mirrors column-by-column; the
# engine itself derives kinds from the file's Arrow schema at runtime
PROFILE_INT_IMAGE = ("int", "timestamp")  # kinds that carry min_i/max_i


def _profile_kind(typ: pa.DataType) -> str:
    if pa.types.is_integer(typ):
        return "int"
    if pa.types.is_timestamp(typ):
        return "timestamp"
    if pa.types.is_floating(typ):
        return "float"
    return "str"


def table_profile(sf_dir: str, table: str = "lineitem"):
    """(column_name, n_rows, n_null, n_distinct, min_s, max_s): the data-
    profiling surface — per column of the fact table, row/null counts,
    EXACT distinct cardinality, and the min/max int64 image as decimal
    text for integer and timestamp columns ('' for doubles/strings: no
    cross-engine float/collation formatting exists that both sides render
    identically, and text keeps the output column NULL-free for every
    comparison layer).

    Exactness: distinct counting shuffles each value's injective
    canonical string (ints/epoch-µs as decimal text, strings as
    themselves, doubles as repr with -0.0 normalized and NaN deduped to
    one value, matching SQL DISTINCT's total order — bijective with the
    stored IEEE doubles), so the count is exact, not sketched;
    ``ndistinct_users`` is the single-column sketch-vs-exact pair, this
    is the whole-table exact pass.

    Scale shape: ONE read of the table feeds both surfaces — per-batch
    per-column stats partials (counts + min/max, ≤|cols| rows per batch)
    collect driver-side like the q6 scalar-partial family, while
    per-batch-DISTINCT (col, value) rows make one value-hash exchange
    whose partitions count their disjoint value sets locally (a value's
    copies all share its hash), summing to the exact global distinct.
    The exchange carries per-batch unique values, never the raw table."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq_mod.read_schema(path)
    cols = list(schema.names)
    kinds = {c: _profile_kind(schema.field(c).type) for c in cols}

    def canon(col: str, arr: pa.ChunkedArray | pa.Array) -> list[str]:
        """Injective canonical strings of the UNIQUE non-null values."""
        k = kinds[col]
        if k == "str":
            return [v for v in arr.unique().to_pylist() if v is not None]
        if k == "float":
            u = arr.drop_null().unique().to_numpy(zero_copy_only=False)
            has_nan = bool(np.isnan(u).any())
            u = u[~np.isnan(u)] + 0.0  # -0.0 → 0.0 (SQL DISTINCT equality)
            out = [repr(float(v)) for v in u]
            if has_nan:
                out.append("nan")  # SQL DISTINCT: NaN is ONE value
            return out
        img = arr.cast(pa.timestamp("us")).cast(pa.int64()) \
            if k == "timestamp" else arr
        u = img.unique().drop_null().to_numpy(zero_copy_only=False)
        return [str(int(v)) for v in u]

    def partials(batch: pa.Table) -> pa.Table:
        q_out, col_out, side_out, v_out = [], [], [], []
        n_out, nn_out, mn_out, mx_out = [], [], [], []
        for c in cols:
            arr = batch[c]
            nn = arr.null_count
            k = kinds[c]
            mn = mx = None
            if k in PROFILE_INT_IMAGE and batch.num_rows > nn:
                img = arr.cast(pa.timestamp("us")).cast(pa.int64()) \
                    if k == "timestamp" else arr
                mm = pc.min_max(img)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                mn, mx = int(mn), int(mx)
            col_out.append(c)
            side_out.append(1)
            q_out.append(0)
            v_out.append("")
            n_out.append(batch.num_rows)
            nn_out.append(nn)
            mn_out.append(mn)
            mx_out.append(mx)
            vals = canon(c, arr)
            if vals:
                # deterministic cross-worker partitioning (Python's hash()
                # is seed-randomized per process): md5-based 64-bit hash
                # of the (col, value) pair — a value's copies co-locate
                q_out.extend(
                    _simhash_hash64(f"{c}\x00{v}") % _OKEY_PARTITIONS
                    for v in vals)
                col_out.extend([c] * len(vals))
                side_out.extend([0] * len(vals))
                v_out.extend(vals)
                n_out.extend([0] * len(vals))
                nn_out.extend([0] * len(vals))
                mn_out.extend([None] * len(vals))
                mx_out.extend([None] * len(vals))
        return pa.table({
            "q": pa.array(q_out, type=pa.int64()),
            "col": pa.array(col_out, type=pa.string()),
            "side": pa.array(side_out, type=pa.int64()),
            "v": pa.array(v_out, type=pa.string()),
            "n": pa.array(n_out, type=pa.int64()),
            "nn": pa.array(nn_out, type=pa.int64()),
            "mn": pa.array(mn_out, type=pa.int64()),
            "mx": pa.array(mx_out, type=pa.int64()),
        })

    def finish_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        d = df[df["side"] == 0].groupby("col")["v"].nunique()
        s = df[df["side"] == 1].groupby("col").agg(
            n=("n", "sum"), nn=("nn", "sum"), mn=("mn", "min"),
            mx=("mx", "max"))
        out_col = list(d.index) + list(s.index)
        return pa.table({
            "col": pa.array(out_col, type=pa.string()),
            "side": pa.array([0] * len(d) + [1] * len(s), type=pa.int64()),
            "n": pa.array([int(v) for v in d] + [int(v) for v in s["n"]],
                          type=pa.int64()),
            "nn": pa.array([0] * len(d) + [int(v) for v in s["nn"]],
                           type=pa.int64()),
            "mn": pa.array([None] * len(d) + [
                None if pd.isna(v) else int(v) for v in s["mn"]],
                type=pa.int64()),
            "mx": pa.array([None] * len(d) + [
                None if pd.isna(v) else int(v) for v in s["mx"]],
                type=pa.int64()),
        })

    parts = (read_parquet_clean(path)
             .map_batches(partials, batch_format="pyarrow", batch_size=8192)
             .groupby("q")
             .map_groups(finish_partition, batch_format="pyarrow")
             ).to_pandas()
    rows = []
    for c in sorted(cols):
        p = parts[parts["col"] == c]
        st = p[p["side"] == 1]
        dv = p[p["side"] == 0]
        mn = st["mn"].dropna()
        mx = st["mx"].dropna()
        # min/max ship as decimal text ('' = not applicable / all-null):
        # VARCHAR keeps the column NULL-free so every comparison layer
        # (driver value hash, UNION'd frames) sees one concrete dtype
        rows.append({
            "column_name": c,
            "n_rows": int(st["n"].sum()),
            "n_null": int(st["nn"].sum()),
            "n_distinct": int(dv["n"].sum()),
            "min_s": str(int(mn.min())) if len(mn) else "",
            "max_s": str(int(mx.max())) if len(mx) else "",
        })
    return pd.DataFrame(rows, columns=["column_name", "n_rows", "n_null",
                                       "n_distinct", "min_s", "max_s"])


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 / Q11 / Q20 / Q21 shapes — the partsupp-dependent family,
# re-expressed over the columns this schema has (no partsupp table, no
# commit/receipt dates; each docstring states its deterministic stand-in)
# ---------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "ECONOMY"
Q2_MAX_SIZE = 10


def _region_suppliers(sf_dir: str, region: str):
    """Driver-side dimension chain supplier ⋈ nation ⋈ region for ONE
    region: a pandas frame (s_suppkey, s_name, s_acctbal, n_name).
    Dimension-sized by definition (supplier × 25 nations × 5 regions),
    so it is the broadcast side of every query in this family — never
    part of an exchange."""
    import pyarrow.parquet as pq

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet")).to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nat = nat.merge(reg[reg["r_name"] == region], left_on="n_regionkey",
                    right_on="r_regionkey")
    return sup.merge(nat[["n_nationkey", "n_name"]], left_on="s_nationkey",
                     right_on="n_nationkey")[
        ["s_suppkey", "s_name", "s_acctbal", "n_name"]]


def _q2_exchange_empty() -> "pa.Table":
    z = pa.array([], type=pa.int64())
    return pa.table({"q": z, "pk": z, "sk": z, "c": z})


def q2_min_cost_supplier(sf_dir: str):
    """(s_acctbal_r, s_name, n_name, p_partkey, p_type, s_suppkey,
    min_cost_r): TPC-H Q2's shape — for each qualifying part (fixed
    type, size cap) the EUROPE-region supplier(s) whose cost for that
    part equals the part's MINIMUM cost among region suppliers; top 100
    by (balance DESC, n_name, s_name, p_partkey, s_suppkey). The
    CORRELATED-MIN-SUBQUERY surface no other q* entry has: the aggregate
    gating each row is computed per part across the OTHER rows of the
    same join (Q2's ps_supplycost = (SELECT min(ps_supplycost) ...)).

    Stand-in: this schema has no partsupp, so cost(part, supplier) :=
    MIN cents(l_extendedprice) over their joint line items —
    deterministic and integer-exact, keeping the correlated structure
    (the min ranges over region suppliers of the SAME part).

    Exactness: costs are exact cent integers end-to-end (min of
    round(100·price) — the 2-dp contract); balances ORDER by their exact
    cent image; the published floats round once on the driver.

    Scale shape: supplier ⋈ nation ⋈ region is dimension-sized and the
    type+size gate cuts part to a tiny qualifying set — both broadcast
    sorted via one ``ray.put``. ONE lineitem pass min-combines per
    (part, supplier) INSIDE each batch, so the single exchange
    (partkey-hash co-partition, the module's shared formula) carries
    ≤ distinct-pairs-per-batch rows; each partition owns every cost row
    of its parts, resolves the correlated min locally and emits only
    the achievers. The driver sees ≤ |qualifying parts| × ties rows and
    finishes names / order / limit against the dimension frame."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    es = _region_suppliers(sf_dir, Q2_REGION)
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type", "p_size"])
    pk_all = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ptype = np.asarray(part["p_type"].to_pylist(), dtype=object)
    psize = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    qp = np.sort(pk_all[(ptype == Q2_TYPE) & (psize <= Q2_MAX_SIZE)])
    sks = np.sort(es["s_suppkey"].to_numpy(dtype=np.int64))
    sets_ref = ray.put((qp, sks))

    def pair_min(batch: pa.Table) -> pa.Table:
        qpk, rsk = ray.get(sets_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, hit_p = _sorted_probe(qpk, lpk)
        _, hit_s = _sorted_probe(rsk, lsk)
        m = hit_p & hit_s
        if not m.any():
            return _q2_exchange_empty()
        cents = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        pairs, inv = np.unique(np.stack([lpk[m], lsk[m]], axis=1), axis=0,
                               return_inverse=True)
        cmin = np.full(pairs.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(cmin, inv, cents)  # map-side min combine per pair
        pk, sk = pairs[:, 0].copy(), pairs[:, 1].copy()
        return pa.table({"q": pa.array(_hash_partition(pk)),
                         "pk": pa.array(pk), "sk": pa.array(sk),
                         "c": pa.array(cmin)})

    def correlated_min(group: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "pk": group["pk"].to_numpy(zero_copy_only=False),
            "sk": group["sk"].to_numpy(zero_copy_only=False),
            "c": group["c"].to_numpy(zero_copy_only=False),
        }).groupby(["pk", "sk"], as_index=False)["c"].min())
        if df.empty:
            return pa.table({"pk": pa.array([], type=pa.int64()),
                             "sk": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        mn = df.groupby("pk")["c"].transform("min")
        win = df[df["c"] == mn]  # the correlated min's achievers
        return pa.table({
            "pk": pa.array(win["pk"].to_numpy(dtype=np.int64)),
            "sk": pa.array(win["sk"].to_numpy(dtype=np.int64)),
            "c": pa.array(win["c"].to_numpy(dtype=np.int64)),
        })

    won = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(pair_min, batch_format="pyarrow", batch_size=8192)
     .groupby("q").map_groups(correlated_min, batch_format="pyarrow")
     .to_pandas())
    empty = pa.table({
        "s_acctbal_r": pa.array([], type=pa.float64()),
        "s_name": pa.array([], type=pa.string()),
        "n_name": pa.array([], type=pa.string()),
        "p_partkey": pa.array([], type=pa.int64()),
        "p_type": pa.array([], type=pa.string()),
        "s_suppkey": pa.array([], type=pa.int64()),
        "min_cost_r": pa.array([], type=pa.float64()),
    })
    if won.empty:
        return empty
    j = won.merge(es, left_on="sk", right_on="s_suppkey")
    if j.empty:
        return empty
    j = j.assign(bal_c=np.rint(j["s_acctbal"].to_numpy() * 100.0)
                 .astype(np.int64))
    j = j.sort_values(["bal_c", "n_name", "s_name", "pk", "sk"],
                      ascending=[False, True, True, True, True]).head(100)
    return pa.table({
        "s_acctbal_r": pa.array(
            [round_half_away(c / 100.0, 2) for c in j["bal_c"]],
            type=pa.float64()),
        "s_name": pa.array(j["s_name"].tolist(), type=pa.string()),
        "n_name": pa.array(j["n_name"].tolist(), type=pa.string()),
        "p_partkey": pa.array(j["pk"].to_numpy(dtype=np.int64)),
        "p_type": pa.array([Q2_TYPE] * len(j), type=pa.string()),
        "s_suppkey": pa.array(j["sk"].to_numpy(dtype=np.int64)),
        "min_cost_r": pa.array(
            [round_half_away(c / 100.0, 2) for c in j["c"]],
            type=pa.float64()),
    })


Q21_NUMWAIT_LIMIT = 100


def q21_waiting_suppliers(sf_dir: str):
    """(s_suppkey, s_name, numwait): TPC-H Q21's shape — for FINISHED
    orders ('F' status), count per supplier the orders where that
    supplier was the ONLY one at fault among at least two suppliers;
    top 100 by (numwait DESC, s_name). The PER-GROUP EXISTENTIAL
    SELF-JOIN surface: both Q21 subqueries — EXISTS (another supplier on
    the same order) and NOT EXISTS (another AT-FAULT supplier on the
    same order) — are predicates over OTHER rows of the same fact table,
    not over a second table (q22's anti-join) or an aggregate (q2's min).

    Stand-in: this schema has no commit/receipt dates, so "at fault" :=
    shipped a returned line (l_returnflag = 'R') — deterministic, keeps
    both existential quantifiers live (multi-supplier orders where
    exactly one supplier has a returned line).

    Scale shape: lineitem dedups (orderkey, suppkey) pairs with an
    OR-combined fault flag INSIDE each batch, so the orderkey exchange
    carries distinct pairs, never raw line items; the 'F' order filter
    rides the same exchange as side-0 rows (orders cannot broadcast —
    fact-sized). Each partition owns every pair of its orders: it
    re-dedups across batches, applies both quantifiers locally
    (n_suppliers ≥ 2, n_fault = 1) and emits per-supplier partial
    counts; a supplier-keyed groupby sums ≤ partitions × suppliers
    partials and the driver finishes names / order / limit against the
    broadcastable supplier dimension.

    Reference parity: the top-k order + deterministic tie-break follows
    the engine's O2 discipline (query.py _topk_order; the reference's
    relevance-desc, name-asc rule in SearchServiceImpl.java)."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    def li_pairs(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        fail = pc.equal(batch["l_returnflag"], "R").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pairs, inv = np.unique(np.stack([ok, sk], axis=1), axis=0,
                               return_inverse=True)
        fmax = np.zeros(pairs.shape[0], dtype=np.int64)
        np.maximum.at(fmax, inv, fail)  # OR-combine the fault flag
        return _exchange_rows(pairs[:, 0].copy(), 1, pairs[:, 1].copy(), fmax)

    def order_flags(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.equal(batch["o_orderstatus"], "F").to_numpy(
            zero_copy_only=False)
        ok = ok[m]
        z = np.zeros(ok.size, dtype=np.int64)
        return _exchange_rows(ok, 0, z, z)

    def lone_fault(group: pa.Table) -> pa.Table:
        (bk, _, _), (ok, sk, fail, _) = _split_exchange_group(group)
        empty = pa.table({"sk": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if bk.size == 0 or ok.size == 0:
            return empty
        _, hit = _sorted_probe(bk, ok)  # keep pairs of 'F' orders only
        if not hit.any():
            return empty
        df = (pd.DataFrame({"ok": ok[hit], "sk": sk[hit], "f": fail[hit]})
              .groupby(["ok", "sk"], as_index=False)["f"].max())
        per = df.groupby("ok").agg(nsupp=("sk", "size"), nfail=("f", "sum"))
        live = per[(per["nsupp"] >= 2) & (per["nfail"] == 1)].index
        culprit = df[(df["f"] == 1) & df["ok"].isin(live)]
        if culprit.empty:
            return empty
        g = culprit.groupby("sk", as_index=False).agg(n=("ok", "count"))
        return pa.table({"sk": pa.array(g["sk"].to_numpy(dtype=np.int64)),
                         "n": pa.array(g["n"].to_numpy(dtype=np.int64))})

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    ).map_batches(li_pairs, batch_format="pyarrow", batch_size=8192)
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"],
    ).map_batches(order_flags, batch_format="pyarrow", batch_size=8192)
    counts = (li.union(orders).groupby("q")
              .map_groups(lone_fault, batch_format="pyarrow")
              .groupby("sk").aggregate(Sum("n", alias_name="numwait"))
              .to_pandas())
    empty = pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                      "s_name": pa.array([], type=pa.string()),
                      "numwait": pa.array([], type=pa.int64())})
    if counts.empty:
        return empty
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"]).to_pandas()
    j = counts.merge(sup, left_on="sk", right_on="s_suppkey")  # inner join
    if j.empty:
        return empty
    j = (j.sort_values(["numwait", "s_name"], ascending=[False, True])
         .head(Q21_NUMWAIT_LIMIT))
    return pa.table({
        "s_suppkey": pa.array(j["s_suppkey"].to_numpy(dtype=np.int64)),
        "s_name": pa.array(j["s_name"].tolist(), type=pa.string()),
        "numwait": pa.array(j["numwait"].to_numpy(dtype=np.int64)),
    })


Q20_PREFIX = "red"
Q20_FROM_US = 852_076_800_000_000  # 1997-01-01 epoch-µs
Q20_TO_US = 883_612_800_000_000  # 1998-01-01 epoch-µs


def q20_dominant_supplier(sf_dir: str):
    """(s_suppkey, s_name, n_parts): TPC-H Q20's shape — suppliers who
    shipped MORE THAN HALF of some name-prefixed part's total 1997
    quantity, with how many parts each dominates; ordered by s_suppkey.
    The CORRELATED FRACTION-OF-GROUP threshold surface: Q20's
    ps_availqty > 0.5 · (SELECT sum(l_quantity) ... same part, same
    window) compares a row-level quantity against a fraction of its own
    group's aggregate — q2's correlated MIN selects an extreme row;
    this gate passes any row clearing a SHARE of the group total.

    Stand-in: no partsupp/availqty in this schema, so the gated quantity
    is the supplier's own shipped total for that part — "dominant
    supplier" (qty(part, supplier) · 2 > qty(part)), same correlated
    structure, pure-integer gate on exact centi-quantity sums.

    Scale shape: the prefix gate cuts part to a broadcast sorted set
    (one ``ray.put``); one windowed lineitem pass sum-combines
    centi-quantities per (part, supplier) INSIDE each batch; the single
    partkey co-partition owns every pair row of its parts, so the group
    total, the ·2 gate and the per-supplier distinct-part count all
    resolve locally; a supplier-keyed groupby sums ≤ partitions ×
    suppliers partials and the driver finishes names against the
    supplier dimension."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    pk_all = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    names = part["p_name"].to_pylist()
    qp = np.sort(pk_all[[n.startswith(Q20_PREFIX) for n in names]])
    qp_ref = ray.put(qp)

    def pair_qty(batch: pa.Table) -> pa.Table:
        qpk = ray.get(qp_ref)
        ship = batch["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, hit = _sorted_probe(qpk, lpk)
        m = hit & (ship >= Q20_FROM_US) & (ship < Q20_TO_US)
        if not m.any():
            return _q2_exchange_empty()
        lsk = batch["l_suppkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[m]
        qc = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        pairs, inv = np.unique(np.stack([lpk[m], lsk], axis=1), axis=0,
                               return_inverse=True)
        qsum = np.zeros(pairs.shape[0], dtype=np.int64)
        np.add.at(qsum, inv, qc)  # map-side sum combine per pair
        return pa.table({"q": pa.array(_hash_partition(pairs[:, 0].copy())),
                         "pk": pa.array(pairs[:, 0].copy()),
                         "sk": pa.array(pairs[:, 1].copy()),
                         "c": pa.array(qsum)})

    def share_gate(group: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "pk": group["pk"].to_numpy(zero_copy_only=False),
            "sk": group["sk"].to_numpy(zero_copy_only=False),
            "c": group["c"].to_numpy(zero_copy_only=False),
        }).groupby(["pk", "sk"], as_index=False)["c"].sum())
        empty = pa.table({"sk": pa.array([], type=pa.int64()),
                          "np": pa.array([], type=pa.int64())})
        if df.empty:
            return empty
        tot = df.groupby("pk")["c"].transform("sum")
        dom = df[df["c"] * 2 > tot]  # strictly more than half
        if dom.empty:
            return empty
        g = dom.groupby("sk", as_index=False).agg(np=("pk", "count"))
        return pa.table({"sk": pa.array(g["sk"].to_numpy(dtype=np.int64)),
                         "np": pa.array(g["np"].to_numpy(dtype=np.int64))})

    counts = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(pair_qty, batch_format="pyarrow", batch_size=8192)
     .groupby("q").map_groups(share_gate, batch_format="pyarrow")
     .groupby("sk").aggregate(Sum("np", alias_name="n_parts"))
     .to_pandas())
    empty = pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                      "s_name": pa.array([], type=pa.string()),
                      "n_parts": pa.array([], type=pa.int64())})
    if counts.empty:
        return empty
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"]).to_pandas()
    j = counts.merge(sup, left_on="sk", right_on="s_suppkey")  # inner join
    if j.empty:
        return empty
    j = j.sort_values("s_suppkey")
    return pa.table({
        "s_suppkey": pa.array(j["s_suppkey"].to_numpy(dtype=np.int64)),
        "s_name": pa.array(j["s_name"].tolist(), type=pa.string()),
        "n_parts": pa.array(j["n_parts"].to_numpy(dtype=np.int64)),
    })


Q9_WORD = "gear"


def q9_product_profit(sf_dir: str):
    """(n_name, o_year, n_items, profit_r): TPC-H Q9's shape — profit
    from line items of name-matched parts ('%gear%'), grouped by the
    SUPPLIER's nation and the ship YEAR, ordered (n_name, o_year DESC).
    The surface this adds over q5/q7/q8: a CONTAINS (infix LIKE) part
    gate — not equality, not prefix — and a calendar-year group key
    extracted per row rather than a fixed window constant (q7 splits one
    two-year window by a single boundary; here every year in the corpus
    is a live group).

    Stand-in: no partsupp → no supplycost subtrahend, so profit :=
    Σ price·(1−disc), Q9's revenue term, exact cents×hundredths.

    Exactness: revenue rides exact int64 per-batch partials (the q5
    convention) split (hi, lo) through the tiny distributed groupby and
    recombines as Python ints on the driver — per-(nation, year) totals
    never touch floats until the single published rounding.

    Scale shape: the part gate and the supplier→nationkey map broadcast
    once via ``ray.put`` (the q14 discipline); ONE windowless lineitem
    pass groups (nationkey, year) INSIDE each batch — year is a
    vectorized datetime64 floor, no Python datetime per row — so the
    exchange carries ≤ nations × corpus-years rows per batch into a
    ≤ nations × years groupby; nation names resolve on the driver."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    pk_all = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    names = part["p_name"].to_pylist()
    qp = np.sort(pk_all[[Q9_WORD in n for n in names]])
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nk = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sk, kind="stable")
    maps_ref = ray.put((qp, sk[order], nk[order]))

    def partial(batch: pa.Table) -> pa.Table:
        qpk, sks, nks = ray.get(maps_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, hit_p = _sorted_probe(qpk, lpk)
        pos_s, hit_s = _sorted_probe(sks, lsk)
        m = hit_p & hit_s  # inner joins: partless / supplierless rows drop
        empty = pa.table({"nk": pa.array([], type=pa.int64()),
                          "y": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "hi": pa.array([], type=pa.int64()),
                          "lo": pa.array([], type=pa.int64())})
        if not m.any():
            return empty
        ship = batch["l_shipdate"].cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)[m]
        yr = (ship.astype("datetime64[us]").astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        price_i = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        rev = price_i * np.rint((1.0 - disc) * 100.0).astype(np.int64)
        g = (pd.DataFrame({"nk": nks[pos_s[m]], "y": yr, "n": 1, "t": rev})
             .groupby(["nk", "y"], as_index=False)
             .agg(n=("n", "sum"), t=("t", "sum")))
        t = g["t"].to_numpy(dtype=np.int64)
        return pa.table({
            "nk": pa.array(g["nk"].to_numpy(dtype=np.int64)),
            "y": pa.array(g["y"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "hi": pa.array(t >> np.int64(32)),
            "lo": pa.array(t & np.int64(0xFFFFFFFF)),
        })

    agg = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192)
     .groupby(["nk", "y"])
     .aggregate(Sum("n", alias_name="n"), Sum("hi", alias_name="hi"),
                Sum("lo", alias_name="lo"))
     .to_pandas())
    empty = pa.table({"n_name": pa.array([], type=pa.string()),
                      "o_year": pa.array([], type=pa.int64()),
                      "n_items": pa.array([], type=pa.int64()),
                      "profit_r": pa.array([], type=pa.float64())})
    if agg.empty:
        return empty
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    j = agg.merge(nat, left_on="nk", right_on="n_nationkey")  # inner join
    if j.empty:
        return empty
    profit = [(int(h) << 32) + int(x) for h, x in zip(j["hi"], j["lo"])]
    j = (j.assign(profit=profit)
         .sort_values(["n_name", "y"], ascending=[True, False]))
    return pa.table({
        "n_name": pa.array(j["n_name"].tolist(), type=pa.string()),
        "o_year": pa.array(j["y"].to_numpy(dtype=np.int64)),
        "n_items": pa.array(j["n"].to_numpy(dtype=np.int64)),
        "profit_r": pa.array(
            [round_half_away(p / 10_000.0, 2) for p in j["profit"]],
            type=pa.float64()),
    })


Q11_REGION = "EUROPE"
# keep parts worth > 3/2 of the MEAN part value: TPC-H scales Q11's
# fixed fraction by 1/SF precisely because any constant fraction empties
# as the part count grows — gating on a multiple of the mean keeps the
# HAVING live at every corpus size with no scale knob
Q11_MULT_NUM, Q11_MULT_DEN = 3, 2


def q11_important_parts(sf_dir: str):
    """(p_partkey, value_r): TPC-H Q11's shape — per-part shipped value
    through one region's suppliers, keeping parts worth MORE than 1.5×
    the mean per-part value (HAVING sum(...) > fraction · SELECT
    sum(...), with the fraction tied to the group count so it stays
    live at any scale — Q11 itself scales its constant by 1/SF);
    ordered value DESC, partkey ASC. The surface q22 doesn't cover:
    the global-scalar gate applies to a HIGH-CARDINALITY grouped
    aggregate (part-dimension-sized), so the intermediate must stay
    distributed — materialized once as a Dataset and consumed twice
    (total, then gate) — never funneled through the driver.

    Stand-in: no partsupp → value := Σ cents(price)·hundredths(1−disc)
    over the region suppliers' line items (Q11's value term with
    shipped-revenue standing in for supplycost·availqty).

    Exactness: per-part values ride exact int64 (hi, lo) partials; the
    gate v·2n > 3·total rewrites to the equivalent integer form
    v > (3·total) ÷ (2n) (floor) — for integers v·D > T ⟺ v > T//D —
    with total and n combined as Python ints on the driver, so no float
    boundary and no HUGEINT overflow at any corpus size (a per-part
    value is bounded by real-world revenue; the TOTAL is not, hence
    the floor-threshold rewrite instead of multiplying v).

    Scale shape: the region suppkey set broadcasts once; one lineitem
    pass sum-combines per partkey INSIDE each batch; a partkey groupby
    yields the part-sized aggregate, materialized (it is the query's
    smallest complete representation, dimension-sized relative to the
    fact input). Pass A streams it into ≤1-row scalar partials for the
    total; pass B filters it by the broadcast threshold — only the
    HAVING survivors reach the driver."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    es = _region_suppliers(sf_dir, Q11_REGION)
    sks = np.sort(es["s_suppkey"].to_numpy(dtype=np.int64))
    sks_ref = ray.put(sks)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        rsk = ray.get(sks_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, hit = _sorted_probe(rsk, lsk)
        empty = pa.table({"pk": pa.array([], type=pa.int64()),
                          "hi": pa.array([], type=pa.int64()),
                          "lo": pa.array([], type=pa.int64())})
        if not hit.any():
            return empty
        lpk = batch["l_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)[hit]
        price_i = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[hit] * 100.0).astype(np.int64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
        rev = price_i * np.rint((1.0 - disc) * 100.0).astype(np.int64)
        g = (pd.DataFrame({"pk": lpk, "t": rev})
             .groupby("pk", as_index=False)["t"].sum())
        t = g["t"].to_numpy(dtype=np.int64)
        return pa.table({"pk": pa.array(g["pk"].to_numpy(dtype=np.int64)),
                         "hi": pa.array(t >> np.int64(32)),
                         "lo": pa.array(t & np.int64(0xFFFFFFFF))})

    values = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=8192)
     .groupby("pk")
     .aggregate(Sum("hi", alias_name="hi"), Sum("lo", alias_name="lo"))
     .materialize())  # part-sized; consumed twice below

    def total_partial(batch: pa.Table) -> pa.Table:
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        t = (int(hi.sum()) << 32) + int(lo.sum())  # Python ints: no overflow
        return _scalar_partial_row(len(batch), t)

    parts = values.map_batches(total_partial, batch_format="pyarrow",
                               batch_size=8192).to_pandas()
    empty = pa.table({"p_partkey": pa.array([], type=pa.int64()),
                      "value_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    n_parts_cnt, (total,) = _combine_scalar_partials(parts, 1)
    if n_parts_cnt == 0:
        return empty
    # v·2n > 3·total ⟺ v > (3·total) // (2n) for integers; clamp keeps
    # the broadcast threshold in int64 even when the TOTAL exceeds it
    thr = min((Q11_MULT_NUM * total) // (Q11_MULT_DEN * n_parts_cnt),
              np.iinfo(np.int64).max - 1)

    def gate(batch: pa.Table) -> pa.Table:
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        v = (hi << np.int64(32)) + lo
        keep = v > thr
        return pa.table({
            "pk": pa.array(batch["pk"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
            "v": pa.array(v[keep]),
        })

    win = values.map_batches(gate, batch_format="pyarrow",
                             batch_size=8192).to_pandas()
    if win.empty:
        return empty
    win = win.sort_values(["v", "pk"], ascending=[False, True])
    return pa.table({
        "p_partkey": pa.array(win["pk"].to_numpy(dtype=np.int64)),
        "value_r": pa.array(
            [round_half_away(int(v) / 10_000.0, 2) for v in win["v"]],
            type=pa.float64()),
    })


HIST_NBINS = 64


def value_histogram(sf_dir: str, nbins: int = HIST_NBINS):
    """(bin, lo_edge_r, hi_edge_r, n_events): equi-width histogram of the
    event value stream over its observed [min, max] range, EVERY bin
    present (empty bins are explicit zero rows) — the numeric-binning
    complement of ``hourly_gap_fill``'s calendar scaffold: there the
    grid is wall-clock, here it derives from a FIRST aggregation pass
    over the same fact stream (the two-pass statistic-then-transform
    pattern).

    Determinism: both engines bucket by the identical double expression
    floor((v − lo) / (hi − lo) · nbins) clamped to the last bin (the
    v = hi row), where lo/hi are the exact min/max doubles — min/max
    are order-independent, so there is NO float drift anywhere in the
    bin assignment; edges publish as lo + i·(hi − lo)/nbins rounded
    4 dp via the same expression on both sides. NaN and null values
    drop before both passes.

    Scale shape: pass 1 reduces each batch to a ≤1-row (min, max)
    partial — no shuffle; pass 2 bincounts each batch (≤ nbins partial
    rows per batch) into a ≤ nbins-group Sum; the driver merges the
    fixed nbins scaffold. Degenerate hi = lo collapses to one bin."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def minmax_partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"mn": pa.array([], type=pa.float64()),
                             "mx": pa.array([], type=pa.float64())})
        return pa.table({"mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["value"])
    mm = (src.map_batches(minmax_partial, batch_format="pyarrow",
                          batch_size=8192).to_pandas())
    empty = pa.table({"bin": pa.array([], type=pa.int64()),
                      "lo_edge_r": pa.array([], type=pa.float64()),
                      "hi_edge_r": pa.array([], type=pa.float64()),
                      "n_events": pa.array([], type=pa.int64())})
    if mm.empty:
        return empty
    lo, hi = float(mm["mn"].min()), float(mm["mx"].max())
    width = hi - lo

    def bin_partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"bin": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        if width == 0.0:
            b = np.zeros(v.size, dtype=np.int64)
        else:
            b = np.minimum(np.floor((v - lo) / width * nbins),
                           nbins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=nbins)
        live = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(live.astype(np.int64)),
                         "n": pa.array(counts[live].astype(np.int64))})

    counted = (src.map_batches(bin_partial, batch_format="pyarrow",
                               batch_size=8192)
               .groupby("bin").aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    grid = np.arange(nbins, dtype=np.int64)
    n = np.zeros(nbins, dtype=np.int64)
    if not counted.empty:
        n[counted["bin"].to_numpy(dtype=np.int64)] = (
            counted["n"].to_numpy(dtype=np.int64))
    edges = lo + grid * width / nbins
    upper = lo + (grid + 1) * width / nbins
    return pa.table({
        "bin": pa.array(grid),
        "lo_edge_r": pa.array(_round_vec(edges, 4)),
        "hi_edge_r": pa.array(_round_vec(upper, 4)),
        "n_events": pa.array(n),
    })


def peak_concurrency(sf_dir: str):
    """(hour_us, peak): for EVERY hour of the observed range, the peak
    number of concurrently-open sessions (gap-based sessions, the
    sessionize_events definition; a session is active on its closed
    [start, end] interval) — the capacity-planning sweep-line query.
    The surface no other entry has: a GLOBAL ordered accumulation (the
    running open-session level) computed WITHOUT a global sort — the
    distributed-prefix pattern over time-range partitions (the
    pack_sequences discipline applied to a timeline instead of a byte
    budget).

    Decomposition: boundary deltas (+1 at start, −1 at end+1µs) are
    hour-partitioned; same-timestamp deltas SUM first, so tie order
    cannot exist. Each hour partition computes two numbers from its
    sorted breakpoints — the hour's total delta and its max running
    prefix (both pure int64) — and the driver prefix-sums the
    hour-level totals into carries: peak(h) = max(carry, carry +
    max_prefix), or carry alone for breakpoint-free scaffold hours.
    Per-hour summaries are CALENDAR-BOUNDED (the hourly_gap_fill
    argument), so the driver frame never scales with the corpus.

    Exactness: all-integer end-to-end — no float exists anywhere."""
    import pandas as pd

    def add_part(batch: pa.Table) -> pa.Table:
        # shared user-hash projection; normalize ts to µs FIRST so a
        # ns-unit parquet can't scale the session gap (the skyline fix)
        batch = batch.set_column(
            batch.schema.get_field_index("ts"), "ts",
            batch["ts"].cast(pa.timestamp("us")))
        return _user_part_table(batch, {})

    def session_deltas(group: pa.Table) -> pa.Table:
        # inline session-bounds kernel (sessionize_events' r3-frozen
        # kernel stays untouched per the rotation note above)
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_sess = np.empty(uid.size, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = ((uid[1:] != uid[:-1])
                        | ((ts[1:] - ts[:-1]) > SESSION_GAP_US))
        starts = np.nonzero(new_sess)[0]
        ends = np.concatenate((starts[1:], [uid.size]))
        open_ts = ts[starts]
        close_ts = ts[ends - 1] + 1  # −1 lands 1 µs AFTER the closed end
        bts = np.concatenate([open_ts, close_ts])
        d = np.concatenate([np.ones(open_ts.size, dtype=np.int64),
                            np.full(close_ts.size, -1, dtype=np.int64)])
        return pa.table({
            "hour_us": pa.array((bts // WINDOW_US) * WINDOW_US),
            "ts_us": pa.array(bts), "d": pa.array(d),
        })

    def hour_summary(group: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "h": group["hour_us"].to_numpy(zero_copy_only=False),
            "ts": group["ts_us"].to_numpy(zero_copy_only=False),
            "d": group["d"].to_numpy(zero_copy_only=False),
        }).groupby(["h", "ts"], as_index=False)["d"].sum()  # tie combine
           .sort_values(["h", "ts"], kind="stable"))
        rows = []
        for h, sub in df.groupby("h"):
            run = np.cumsum(sub["d"].to_numpy(dtype=np.int64))
            rows.append((int(h), int(run[-1]), int(run.max())))
        out = pd.DataFrame(rows, columns=["hour_us", "td", "mx"])
        return pa.Table.from_pandas(out, preserve_index=False)

    summaries = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(session_deltas, batch_format="pyarrow")
        .groupby("hour_us").map_groups(hour_summary, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table({"hour_us": pa.array([], type=pa.int64()),
                      "peak": pa.array([], type=pa.int64())})
    if summaries.empty:
        return empty
    summaries = summaries.sort_values("hour_us")
    hours = np.arange(int(summaries["hour_us"].min()),
                      int(summaries["hour_us"].max()) + WINDOW_US,
                      WINDOW_US, dtype=np.int64)
    td = np.zeros(hours.size, dtype=np.int64)
    mx = np.full(hours.size, np.iinfo(np.int64).min, dtype=np.int64)
    pos = (summaries["hour_us"].to_numpy(dtype=np.int64)
           - hours[0]) // WINDOW_US
    td[pos] = summaries["td"].to_numpy(dtype=np.int64)
    mx[pos] = summaries["mx"].to_numpy(dtype=np.int64)
    carry = np.concatenate([[0], np.cumsum(td)[:-1]])
    peak = np.maximum(carry, carry + np.where(
        mx == np.iinfo(np.int64).min, 0, mx))
    return pa.table({"hour_us": pa.array(hours),
                     "peak": pa.array(peak.astype(np.int64))})


WINSOR_LO_Q, WINSOR_HI_Q = 0.05, 0.95


def winsorized_stats(sf_dir: str):
    """(event_type, n_events, wins_mean_r, wins_std_r): per event type,
    mean and population stddev AFTER winsorizing values to the group's
    exact [p05, p95] discrete quantiles — the robust-moments pass a
    metrics pipeline runs when raw means are outlier-dominated. The
    surface this adds: an ORDER-STATISTIC-derived transform re-applied
    to the SAME fact stream (interp/group_quantiles END at the
    quantile; here the quantile becomes a broadcast parameter of a
    second full pass — statistic-then-transform where the statistic
    itself needs the counting-selector kernel, not a trivial min/max
    like value_histogram's).

    Exactness: clip bounds are the exact per-group quantile_disc values
    (the shared :func:`group_quantiles` kernel — no sort, counting
    selection), so both engines clip against identical doubles;
    clipped moments ride per-batch Welford partials and a driver Chan
    fold (the embedding_dim_stats discipline), with the 4-dp round
    absorbing fold-order drift.

    Scale shape: pass 1 is group_quantiles' one histogram pass serving
    every group; pass 2 broadcasts the ≤ groups × 2 bound frame by
    closure and reduces each batch to ≤ groups-in-batch partial rows —
    no shuffle in either pass beyond the selector's bounded pulls."""
    import pandas as pd

    bounds = group_quantiles(sf_dir, qs=(WINSOR_LO_Q, WINSOR_HI_Q))
    if hasattr(bounds, "to_pandas"):
        bounds = bounds.to_pandas()
    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "n_events": pa.array([], type=pa.int64()),
                      "wins_mean_r": pa.array([], type=pa.float64()),
                      "wins_std_r": pa.array([], type=pa.float64())})
    if bounds.empty:
        return empty
    lo_of = dict(zip(bounds.loc[bounds["q"] == WINSOR_LO_Q, "event_type"],
                     bounds.loc[bounds["q"] == WINSOR_LO_Q, "value"]))
    hi_of = dict(zip(bounds.loc[bounds["q"] == WINSOR_HI_Q, "event_type"],
                     bounds.loc[bounds["q"] == WINSOR_HI_Q, "value"]))

    def moment_partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        g = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        keep = ~np.isnan(v) & np.asarray([x is not None for x in g])
        empty_p = pa.table({"event_type": pa.array([], type=pa.string()),
                            "n": pa.array([], type=pa.int64()),
                            "mean": pa.array([], type=pa.float64()),
                            "m2": pa.array([], type=pa.float64())})
        if not keep.any():
            return empty_p
        v, g = v[keep], g[keep]
        codes, uniques = pd.factorize(g)
        lo = np.asarray([lo_of.get(u, -np.inf) for u in uniques])[codes]
        hi = np.asarray([hi_of.get(u, np.inf) for u in uniques])[codes]
        v = np.clip(v, lo, hi)
        n = np.bincount(codes)
        sums = np.bincount(codes, weights=v)
        mean = sums / n
        m2 = np.bincount(codes, weights=(v - mean[codes]) ** 2)
        return pa.table({
            "event_type": pa.array(list(uniques), type=pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "mean": pa.array(mean), "m2": pa.array(m2),
        })

    parts = (read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_type", "value"])
             .map_batches(moment_partial, batch_format="pyarrow",
                          batch_size=8192)
             .to_pandas())
    if parts.empty:
        return empty
    rows = []
    for et in sorted(parts["event_type"].unique()):
        sub = parts[parts["event_type"] == et]
        n_a, mean_a, m2_a = 0.0, 0.0, 0.0
        for n_b, mean_b, m2_b in zip(sub["n"], sub["mean"], sub["m2"]):
            if n_a == 0.0:
                n_a, mean_a, m2_a = float(n_b), float(mean_b), float(m2_b)
                continue
            # Chan's parallel-variance merge (the dim_stats discipline)
            d = mean_b - mean_a
            tot = n_a + n_b
            m2_a += m2_b + d * d * n_a * n_b / tot
            mean_a += d * n_b / tot
            n_a = tot
        rows.append((et, int(n_a), round_half_away(mean_a, 4),
                     round_half_away(float(np.sqrt(m2_a / n_a)), 4)))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], type=pa.string()),
        "n_events": pa.array([r[1] for r in rows], type=pa.int64()),
        "wins_mean_r": pa.array([r[2] for r in rows], type=pa.float64()),
        "wins_std_r": pa.array([r[3] for r in rows], type=pa.float64()),
    })


# FK edges: (name, fact table, fact key, dim table, dim key); the two
# FACT-SIZED right sides (orders, customer) go through the co-partition
# path below, the true dimensions broadcast
_FK_BROADCAST_EDGES = (
    ("customer.c_nationkey->nation", "customer.parquet", "c_nationkey",
     "nation.parquet", "n_nationkey"),
    ("lineitem.l_partkey->part", "lineitem.parquet", "l_partkey",
     "part.parquet", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem.parquet", "l_suppkey",
     "supplier.parquet", "s_suppkey"),
    ("nation.n_regionkey->region", "nation.parquet", "n_regionkey",
     "region.parquet", "r_regionkey"),
    ("supplier.s_nationkey->nation", "supplier.parquet", "s_nationkey",
     "nation.parquet", "n_nationkey"),
)
_FK_EXCHANGE_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem.parquet", "l_orderkey",
     "orders.parquet", "o_orderkey"),
    ("orders.o_custkey->customer", "orders.parquet", "o_custkey",
     "customer.parquet", "c_custkey"),
)


def fk_audit(sf_dir: str):
    """(fk_edge, n_rows, n_orphans): for every foreign-key edge of the
    star schema, how many referencing rows exist and how many are
    ORPHANS (no matching key on the referenced side) — the referential-
    integrity audit a pipeline runs before trusting joins. The
    data-quality surface ``table_profile`` (single-table) doesn't have:
    cross-TABLE consistency, with the join strategy chosen per edge the
    way the query operators choose theirs.

    Scale shape, per edge class: TRUE DIMENSIONS (part, supplier,
    nation, region) broadcast one sorted key array via ``ray.put`` and
    the fact side reduces to ≤1-row (n, orphans) scalar partials per
    batch — no shuffle; FACT-SIZED right sides (orders, customer)
    co-partition instead: per-batch-DISTINCT referencing keys with
    multiplicities ride the shared exchange against per-batch-distinct
    referenced keys, each partition set-differences locally and emits
    one partial row. Output is ≤ |edges| rows — driver-scale by
    definition. All counting is exact int64."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    rows = []
    for name, fact, fkey, dim, dkey in _FK_BROADCAST_EDGES:
        keys = np.sort(pq.read_table(
            os.path.join(sf_dir, dim), columns=[dkey]
        )[dkey].to_numpy(zero_copy_only=False).astype(np.int64))
        keys_ref = ray.put(keys)

        def probe(batch: pa.Table, _fkey=fkey, _ref=keys_ref) -> pa.Table:
            ks = ray.get(_ref)
            v = batch[_fkey].to_numpy(zero_copy_only=False).astype(np.int64)
            _, hit = _sorted_probe(ks, v)
            return _scalar_partial_row(v.size, int((~hit).sum()))

        parts = (read_parquet_clean(os.path.join(sf_dir, fact),
                                    columns=[fkey])
                 .map_batches(probe, batch_format="pyarrow",
                              batch_size=8192).to_pandas())
        n, orph = ((0, 0) if parts.empty
                   else (lambda r: (r[0], r[1][0]))(
                       _combine_scalar_partials(parts, 1)))
        rows.append((name, n, orph))

    for name, fact, fkey, dim, dkey in _FK_EXCHANGE_EDGES:
        def fact_side(batch: pa.Table, _fkey=fkey) -> pa.Table:
            v = batch[_fkey].to_numpy(zero_copy_only=False).astype(np.int64)
            uk, counts = np.unique(v, return_counts=True)
            return _exchange_rows(uk, 1, counts.astype(np.int64))

        def dim_side(batch: pa.Table, _dkey=dkey) -> pa.Table:
            v = np.unique(batch[_dkey].to_numpy(
                zero_copy_only=False).astype(np.int64))
            return _exchange_rows(v, 0, np.zeros(v.size, dtype=np.int64))

        def orphan_partial(group: pa.Table) -> pa.Table:
            (bk, _, _), (k, cnt, _, _) = _split_exchange_group(group)
            if k.size == 0:
                return _scalar_partial_row(0, 0)
            bk = np.unique(bk)  # distinct across the dim side's batches
            _, hit = _sorted_probe(bk, k)
            return _scalar_partial_row(int(cnt.sum()),
                                       int(cnt[~hit].sum()))

        facts = read_parquet_clean(
            os.path.join(sf_dir, fact), columns=[fkey]
        ).map_batches(fact_side, batch_format="pyarrow", batch_size=8192)
        dims = read_parquet_clean(
            os.path.join(sf_dir, dim), columns=[dkey]
        ).map_batches(dim_side, batch_format="pyarrow", batch_size=8192)
        parts = (facts.union(dims).groupby("q")
                 .map_groups(orphan_partial, batch_format="pyarrow")
                 .to_pandas())
        n, orph = ((0, 0) if parts.empty
                   else (lambda r: (r[0], r[1][0]))(
                       _combine_scalar_partials(parts, 1)))
        rows.append((name, n, orph))

    rows.sort()
    return pa.table({
        "fk_edge": pa.array([r[0] for r in rows], type=pa.string()),
        "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def user_entropy(sf_dir: str):
    """(user_id, n_events, entropy_r): Shannon entropy (bits, 4 dp) of
    each user's event-type distribution plus their event count — the
    information-theoretic behavioral profile (a uniform user scores
    log2(#types), a single-type user scores 0). The surface no other
    entry has: a grouped NONLINEAR aggregate over a nested distribution
    (group → sub-group histogram → scalar), where group_moments et al.
    aggregate flat values.

    Determinism: entropy evaluates as (ln(n) − Σ c·ln(c) / n) / ln(2)
    with np.log mirroring DuckDB ``ln`` (the bigram_pmi double-identical
    ln contract); the Σ runs over ≤ |event_type| terms (a groupable
    cardinality), so 4-dp rounding absorbs association drift. Null
    event types drop on both sides (SQL GROUP BY drops nothing, but the
    count(type) semantics below skip nulls via an explicit filter).

    Scale shape: per-batch (user, type, n) partials combine map-side,
    one Sum exchange on the composite key, then a second user-hash
    exchange computes each user's entropy partition-locally — no
    driver-side per-user loop, no global sort."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def type_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "n": 1,
        }).dropna(subset=["event_type"])
        g = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def entropy_kernel(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": group["user_id"].to_numpy(zero_copy_only=False),
            "n": group["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = []
        for uid, sub in df.groupby("user_id"):
            # ascending-count order makes the Σ c·ln(c) float association
            # deterministic across exchanges (ties contribute identical
            # terms, so order among them cannot matter)
            c = np.sort(sub["n"].to_numpy(dtype=np.float64))
            n = c.sum()
            h = (np.log(n) - float((c * np.log(c)).sum()) / n) / np.log(2.0)
            out.append((int(uid), int(n), round_half_away(float(h), 4)))
        return pa.table({
            "user_id": pa.array([r[0] for r in out], type=pa.int64()),
            "n_events": pa.array([r[1] for r in out], type=pa.int64()),
            "entropy_r": pa.array([r[2] for r in out], type=pa.float64()),
        })

    counted = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
        .map_batches(type_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("user_id").map_groups(entropy_kernel, batch_format="pyarrow")
    )
    out = counted.to_pandas()
    if out.empty:
        return pa.table({"user_id": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64()),
                         "entropy_r": pa.array([], type=pa.float64())})
    out = out.sort_values("user_id")
    return pa.Table.from_pandas(out, preserve_index=False)


HH_THRESHOLD_DEN = 125   # heavy = count·DEN > total (> 0.8% of the stream)
HH_SKETCH_CAP = 512      # Misra-Gries capacity; error ≤ n/(CAP+1) per pass


def heavy_hitters(sf_dir: str, den: int = HH_THRESHOLD_DEN,
                  cap: int = HH_SKETCH_CAP):
    """(user_id, n_events): every user whose event count strictly exceeds
    n_total/den, with their EXACT count — the heavy-hitter query through
    the sketch-candidates-then-exact-verify discipline (the scalable
    2-pass answer to "top sources by volume" that the sketch family
    (countmin/hll/kmv) estimates but never confirms).

    Pass 1 runs a Misra-Gries summary per batch (capacity ``cap``: keep
    each batch's value counts, subtract the (cap+1)-th largest, drop
    non-positives — the standard mergeable truncation, ≤ cap rows out
    per batch), then one combiner Sum exchange. Summed MG estimates
    undercount by at most Σ_batches n_b/(cap+1) = n/(cap+1), so every
    user with true count > n/den (den < cap+1) survives with estimate
    > n/den − n/(cap+1) — the candidate gate below. Pass 2 broadcasts
    the candidate id set (≤ den·… small by the gate) and exact-counts
    ONLY candidate rows; the final integer test count·den > n needs no
    floats. Output is exact and deterministic — sketch error cannot
    reach it.

    Scale shape: pass-1 emission is ≤ cap rows/batch regardless of user
    cardinality; pass 2 is a broadcast-filtered Sum over ≤ |candidates|
    groups. No full per-user groupby ever happens."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    if not 1 < den <= cap:
        raise ValueError("need 1 < den <= cap for the candidate guarantee")

    def mg_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        vals, counts = np.unique(uid, return_counts=True)
        n_b = int(counts.sum())
        first = vals[:1]
        if vals.size > cap:
            # subtract the (cap+1)-th largest count, keep positives
            kth = np.partition(counts, -(cap + 1))[-(cap + 1)]
            keep = counts > kth
            vals, counts = vals[keep], counts[keep] - kth
        if vals.size == 0 and n_b:
            # all counts tied above cap: truncation emptied the summary,
            # but the batch TOTAL must still ride (est=0 is inert)
            vals, counts = first, np.zeros(1, dtype=np.int64)
        # the batch's TOTAL row count rides the first kept row so the
        # same Sum exchange carries n_total (no second pass, no driver
        # accumulation across batches)
        return pa.table({"user_id": pa.array(vals.astype(np.int64)),
                         "est": pa.array(counts.astype(np.int64)),
                         "n_row": pa.array(
                             ([n_b] + [0] * (vals.size - 1)) if vals.size
                             else [], type=pa.int64())})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id"])
    sk = (src.map_batches(mg_partial, batch_format="pyarrow",
                          batch_size=8192)
          .groupby("user_id")
          .aggregate(Sum("est", alias_name="est"),
                     Sum("n_row", alias_name="n_row"))
          .to_pandas())
    empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64())})
    if sk.empty:
        return empty
    n_total = int(sk["n_row"].sum())
    # candidate gate: true > n/den ⇒ est > n/den − n/(cap+1); integer form
    # est·den·(cap+1) > n·(cap+1) − n·den  (strict, no float division)
    lhs = sk["est"].to_numpy(dtype=np.int64) * den * (cap + 1)
    cand = np.sort(sk["user_id"].to_numpy(dtype=np.int64)[
        lhs > n_total * (cap + 1) - n_total * den])
    if cand.size == 0:
        return empty
    cand_ref = ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(c, uid).clip(0, c.size - 1)
        hit = c[pos] == uid
        vals, counts = np.unique(uid[hit], return_counts=True)
        return pa.table({"user_id": pa.array(vals),
                         "n": pa.array(counts.astype(np.int64))})

    exact = (src.map_batches(exact_partial, batch_format="pyarrow",
                             batch_size=8192)
             .groupby("user_id").aggregate(Sum("n", alias_name="n_events"))
             .to_pandas())
    exact = exact[exact["n_events"].to_numpy(dtype=np.int64) * den > n_total]
    exact = exact.sort_values("user_id")
    return pa.table({
        "user_id": pa.array(exact["user_id"].to_numpy(dtype=np.int64)),
        "n_events": pa.array(exact["n_events"].to_numpy(dtype=np.int64)),
    })


NTILE_N = 10


def ntile_orders(sf_dir: str, ntiles: int = NTILE_N,
                 n_buckets: int = 8192, max_pull: int = 262_144):
    """(decile, n_orders, sum_price_r, min_price, max_price): the orders
    table split into ``ntiles`` NTILE buckets under the total order
    (o_totalprice, o_orderkey), each bucket aggregated — the ranked-
    bucketing window surface (NTILE) computed WITHOUT a global sort.

    NTILE semantics (SQL standard / DuckDB): bucket i of n rows holds
    n//t + (1 if i ≤ n%t) consecutive rows of the total order. The
    engine needs only the t−1 BOUNDARY rows: each boundary rank resolves
    through the shared :func:`_counting_selector` kernel on the cents
    column (exact k-th order statistic, no sort), then ties AT the
    boundary cents value break by o_orderkey via one filtered pull of
    just that value's rows (expected tiny). Every row then assigns its
    decile by a searchsorted against the 9 broadcast (cents, orderkey)
    composite boundaries — unique because orderkey is — and per-decile
    aggregates combine map-side into a ≤ t-group Sum exchange.

    Exactness: prices are TPC-H cents-exact doubles; both sides compare
    on CAST(round(price·100) AS BIGINT) so the order and the sums are
    pure int64 (sum publishes /100 rounded 2 dp; min/max re-publish the
    exact cents /100.0 — one exact division each)."""
    from ray.data.aggregate import Sum

    src = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"])

    def cents_view(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.floor(np.abs(p) * 100.0 + 0.5)
                 * np.sign(p)).astype(np.int64)  # half-away, exact int64
        return pa.table({
            "okey": batch["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    ds = src.map_batches(cents_view, batch_format="pyarrow",
                         batch_size=8192).materialize()
    empty = pa.table({"decile": pa.array([], type=pa.int64()),
                      "n_orders": pa.array([], type=pa.int64()),
                      "sum_price_r": pa.array([], type=pa.float64()),
                      "min_price": pa.array([], type=pa.float64()),
                      "max_price": pa.array([], type=pa.float64())})
    n, _lo, _hi, select = _counting_selector(ds, "cents", n_buckets,
                                             max_pull)
    if n == 0:
        return empty
    sizes = np.full(ntiles, n // ntiles, dtype=np.int64)
    sizes[: n % ntiles] += 1
    bounds_rank = np.cumsum(sizes)[:-1]  # ranks of the last row per decile
    bounds_rank = bounds_rank[bounds_rank > 0]

    # cents ≤ ~2^40 ≪ 2^53, so the selector's float64 view is exact; the
    # selector memoizes its histogram, so t−1 ranks cost ONE counting pass
    c_stars = np.asarray([int(select(int(r))) for r in bounds_rank],
                         dtype=np.int64)
    uniq_c = np.unique(c_stars)

    def tie_partial(batch: pa.Table) -> pa.Table:
        # ONE pass serves every boundary: per-boundary below-counts ride
        # as (-1-i, count) rows; boundary-value ties emit their okeys
        c = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        below = np.asarray([(c < cs).sum() for cs in uniq_c],
                           dtype=np.int64)
        pos = np.searchsorted(uniq_c, c).clip(0, uniq_c.size - 1)
        hit = uniq_c[pos] == c
        return pa.table({
            "which": pa.array(np.concatenate(
                [-1 - np.arange(uniq_c.size, dtype=np.int64), pos[hit]])),
            "val": pa.array(np.concatenate([below, k[hit]])),
        })

    tie = ds.map_batches(tie_partial, batch_format="pyarrow",
                         batch_size=8192).to_pandas()
    which = tie["which"].to_numpy(dtype=np.int64)
    val = tie["val"].to_numpy(dtype=np.int64)
    below_by_c = {int(uniq_c[i]): int(val[which == -1 - i].sum())
                  for i in range(uniq_c.size)}
    keys_by_c = {int(uniq_c[i]): np.sort(val[which == i])
                 for i in range(uniq_c.size)}
    b_cents = c_stars
    b_okey = np.asarray(
        [int(keys_by_c[int(cs)][int(r) - below_by_c[int(cs)] - 1])
         for cs, r in zip(c_stars, bounds_rank)], dtype=np.int64)

    def assign_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        c = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # decile = 1 + #boundaries strictly below under the composite
        # (cents, okey) order — t−1 vectorized comparisons per batch
        # (boundaries are sorted so this IS a composite searchsorted;
        # the loop is over ntiles−1 ≈ 9 terms, not rows)
        d = np.ones(c.size, dtype=np.int64)
        for bc, bk in zip(b_cents, b_okey):
            d += (c > bc) | ((c == bc) & (k > bk))
        g = pd.DataFrame({"decile": d, "n": 1, "s": c,
                          "mn": c, "mx": c}).groupby(
            "decile", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
            mx=("mx", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min
    agg = (ds.map_batches(assign_partial, batch_format="pyarrow",
                          batch_size=8192)
           .groupby("decile")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Sum("s", alias_name="s"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx"))
           .to_pandas().sort_values("decile"))
    s_cents = agg["s"].to_numpy(dtype=np.float64)
    return pa.table({
        "decile": pa.array(agg["decile"].to_numpy(dtype=np.int64)),
        "n_orders": pa.array(agg["n_orders"].to_numpy(dtype=np.int64)),
        "sum_price_r": pa.array(_round_vec(s_cents / 100.0, 2)),
        "min_price": pa.array(agg["mn"].to_numpy(dtype=np.float64) / 100.0),
        "max_price": pa.array(agg["mx"].to_numpy(dtype=np.float64) / 100.0),
    })


DAY_US = 86_400_000_000


def first_seen_curve(sf_dir: str):
    """(day_us, new_users, cum_users): per calendar day, how many users
    appear for the FIRST time and the cumulative distinct-user count —
    the acquisition curve. The surface no other entry has: a GLOBAL
    cumulative DISTINCT over time, which naively needs a running set but
    factors exactly into (per-user min-day) → (per-day first-seen
    counts) → (calendar-bounded prefix sum on the driver).

    Scale shape: per-batch (user, min day) partials combine map-side,
    one user-hash Min exchange, a second ≤|days|-group Sum, then the
    driver prefix-sums a calendar-bounded day frame (the peak_concurrency
    argument: the frame never scales with the corpus). Pure int64."""
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    def day_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        d = (ts // DAY_US) * DAY_US
        g = pd.DataFrame({"user_id": batch["user_id"]
                          .to_numpy(zero_copy_only=False),
                          "d": d}).groupby("user_id", as_index=False).min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def count_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["d"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"d": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    firsts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(day_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("user_id").aggregate(Min("d", alias_name="d"))
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("d").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if firsts.empty:
        return pa.table({"day_us": pa.array([], type=pa.int64()),
                         "new_users": pa.array([], type=pa.int64()),
                         "cum_users": pa.array([], type=pa.int64())})
    firsts = firsts.sort_values("d")
    days = np.arange(int(firsts["d"].min()),
                     int(firsts["d"].max()) + DAY_US, DAY_US,
                     dtype=np.int64)
    new = np.zeros(days.size, dtype=np.int64)
    new[(firsts["d"].to_numpy(dtype=np.int64) - days[0]) // DAY_US] = (
        firsts["n"].to_numpy(dtype=np.int64))
    return pa.table({"day_us": pa.array(days),
                     "new_users": pa.array(new),
                     "cum_users": pa.array(np.cumsum(new))})


def _weighted_selector(ds, vcol: str, wcol: str, n_buckets: int,
                       max_pull: int):
    """Weighted analogue of :func:`_counting_selector`: returns
    (W, select) where ``select(k)`` is the smallest value whose
    cumulative WEIGHT (int64, ties included) reaches k — the weighted
    order statistic. Same shape: one (W, lo, hi) pass, one
    weight-histogram pass, one straddling-bucket pull; integer weights
    keep every cumulative exact."""

    def stats(batch: pa.Table) -> pa.Table:
        v = batch[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
        if v.size == 0:
            return pa.table({"w": pa.array([0], type=pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"w": pa.array([int(w.sum())], type=pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    st = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    W = int(st["w"].sum())
    if W == 0:
        return 0, None
    lo, hi = float(st["lo"].min()), float(st["hi"].max())
    if lo == hi:
        return W, (lambda k: lo)
    edges = np.linspace(lo, hi, n_buckets + 1)

    def whist(batch: pa.Table) -> pa.Table:
        v = batch[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
        c, _ = np.histogram(v, bins=edges, weights=w.astype(np.float64))
        return pa.table({"b": pa.array(np.arange(n_buckets, dtype=np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    h = ds.map_batches(whist, batch_format="pyarrow").to_pandas()
    counts = np.zeros(n_buckets, dtype=np.int64)
    np.add.at(counts, h["b"].to_numpy(), h["c"].to_numpy())
    cum = np.cumsum(counts)

    def _select(k: int) -> float:
        b = int(np.searchsorted(cum, k))
        b_lo, b_hi = float(edges[b]), float(edges[b + 1])
        closed = b == n_buckets - 1

        def pull(batch: pa.Table) -> pa.Table:
            v = batch[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
            w = batch[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
            m = (v >= b_lo) & ((v <= b_hi) if closed else (v < b_hi))
            return pa.table({vcol: pa.array(v[m]), wcol: pa.array(w[m])})

        t = ds.map_batches(pull, batch_format="pyarrow").to_pandas()
        v = t[vcol].to_numpy()
        w = t[wcol].to_numpy(dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        below = int(cum[b] - counts[b])
        idx = int(np.searchsorted(np.cumsum(w) + below, k))
        return float(v[idx])

    return W, _select


def weighted_median(sf_dir: str, n_buckets: int = 8192,
                    max_pull: int = 262_144):
    """(median_price, total_weight): the quantity-weighted LOWER median
    of lineitem extended price — the smallest price whose cumulative
    quantity weight reaches half the total (2·cumw(v) ≥ W, the
    quantile_disc convention generalized to weights). The weighted
    order statistic the plain quantile family can't express; computed
    by :func:`_weighted_selector` (weight-histogram counting, no sort).

    Exactness: prices select on exact cents (int64-in-float64), weights
    are integer quantities, the target rank ⌈W/2⌉ is pure int."""

    def cents_view(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cents": pa.array((np.floor(np.abs(p) * 100.0 + 0.5)
                               * np.sign(p)).astype(np.int64)),
            "w": pa.array(np.rint(np.asarray(q, dtype=np.float64))
                          .astype(np.int64)),  # CAST(double AS BIGINT)
        })

    ds = (read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_extendedprice", "l_quantity"])
          .map_batches(cents_view, batch_format="pyarrow",
                       batch_size=8192).materialize())
    W, select = _weighted_selector(ds, "cents", "w", n_buckets, max_pull)
    if W == 0:
        return pa.table({"median_price": pa.array([], type=pa.float64()),
                         "total_weight": pa.array([], type=pa.int64())})
    k = (W + 1) // 2  # smallest v with 2·cumw(v) ≥ W
    c = select(k)
    return pa.table({"median_price": pa.array([c / 100.0]),
                     "total_weight": pa.array([W], type=pa.int64())})


def chi2_events(sf_dir: str):
    """(chi2_r, dof, n): Pearson chi-square independence statistic of
    the event_type × day-of-week contingency table — the categorical-
    association test (is activity mix stable across weekdays?). The
    statistical-test surface no other entry has.

    Shape: one map-side (type, dow, n) partial pass, one Sum exchange
    over the |types|·7 cell space (bounded by definition), then the
    statistic evaluates on the driver over the SORTED cell list — the
    Σ (obs−exp)²/exp association is deterministic, and exp =
    row·col/N divides exact int64 products. Null types drop both sides."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cell_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        # epoch 1970-01-01 is a Thursday = ISO dow 4 (1=Mon..7=Sun)
        dow = ((ts // DAY_US) + 3) % 7 + 1
        g = (pd.DataFrame({
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False),
            "dow": dow, "n": 1,
        }).dropna(subset=["event_type"])
            .groupby(["event_type", "dow"], as_index=False)["n"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type"])
        .map_batches(cell_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["event_type", "dow"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if cells.empty:
        return pa.table({"chi2_r": pa.array([], type=pa.float64()),
                         "dof": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    cells = cells.sort_values(["event_type", "dow"])
    n_cell = cells["n"].to_numpy(dtype=np.int64)
    N = int(n_cell.sum())
    row = cells.groupby("event_type")["n"].sum()
    col = cells.groupby("dow")["n"].sum()
    r = row.loc[cells["event_type"]].to_numpy(dtype=np.int64)
    c = col.loc[cells["dow"]].to_numpy(dtype=np.int64)
    # cells absent from the table contribute exp (obs=0): add their exp
    # via the margin identity Σ_all exp = N ⇒ Σ_absent exp = N − Σ_present
    exp = (r * c).astype(np.float64) / N
    chi2 = float((((n_cell - exp) ** 2) / exp).sum()) + (N - float(exp.sum()))
    dof = (row.size - 1) * (col.size - 1)
    return pa.table({
        "chi2_r": pa.array([round_half_away(chi2, 4)]),
        "dof": pa.array([int(dof)], type=pa.int64()),
        "n": pa.array([N], type=pa.int64()),
    })


def activity_islands(sf_dir: str):
    """(user_id, n_islands, longest_days, active_days): per user, the
    maximal runs of CONSECUTIVE active calendar days — islands count,
    longest streak, total distinct active days. The gaps-and-islands
    surface (SQL's row_number-difference idiom) no other entry has.

    Scale shape: per-batch distinct (user, day) partials, one composite
    Sum exchange collapses duplicates, then a user-hash exchange where
    each user's SORTED distinct days (tiny per user) yield runs from one
    np.diff — partition-local, no window function, no global sort. Pure
    int64 throughout."""
    import pandas as pd
    from ray.data.aggregate import Count

    def day_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        g = (pd.DataFrame({"user_id": batch["user_id"]
                           .to_numpy(zero_copy_only=False),
                           "day": ts // DAY_US})
             .drop_duplicates())
        return pa.Table.from_pandas(g, preserve_index=False)

    def islands_kernel(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": group["user_id"].to_numpy(zero_copy_only=False),
            "day": group["day"].to_numpy(zero_copy_only=False),
        })
        out = []
        for uid, sub in df.groupby("user_id"):
            days = np.sort(sub["day"].to_numpy(dtype=np.int64))
            breaks = np.diff(days) > 1
            lens = np.diff(np.concatenate(
                ([0], np.flatnonzero(breaks) + 1, [days.size])))
            out.append((int(uid), int(lens.size), int(lens.max()),
                        int(days.size)))
        return pa.table({
            "user_id": pa.array([r[0] for r in out], type=pa.int64()),
            "n_islands": pa.array([r[1] for r in out], type=pa.int64()),
            "longest_days": pa.array([r[2] for r in out], type=pa.int64()),
            "active_days": pa.array([r[3] for r in out], type=pa.int64()),
        })

    out = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(day_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_c"))
        .groupby("user_id").map_groups(islands_kernel,
                                       batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pa.table({"user_id": pa.array([], type=pa.int64()),
                         "n_islands": pa.array([], type=pa.int64()),
                         "longest_days": pa.array([], type=pa.int64()),
                         "active_days": pa.array([], type=pa.int64())})
    return pa.Table.from_pandas(out.sort_values("user_id"),
                                preserve_index=False)


ROLLUP_ALL_YEAR = -1
ROLLUP_ALL_PRIO = "ALL"


def rollup_revenue(sf_dir: str):
    """(o_year, o_orderpriority, n_orders, revenue_r) for the THREE
    grouping sets of ROLLUP(year, priority): finest (year, priority),
    the per-year margin, and the grand total — the hierarchical-margin
    complement of cube_events' full CUBE. Margins are sentinel-keyed
    (-1 / 'ALL') for the same NaN-hash reason.

    Exactness beats the cube's rounding contract here: revenue
    aggregates as exact int64 cents at every level (margins re-sum the
    finest cells' INTEGER cents, associativity is exact), with ONE
    /100.0 publish per row. One map-side partial pass, a ≤|years·prios|
    Sum exchange, margins on the driver over bounded cells."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cell_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["o_orderdate"].cast(pa.timestamp("us"))
              .to_numpy(zero_copy_only=False))
        yr = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.floor(np.abs(p) * 100.0 + 0.5)
                 * np.sign(p)).astype(np.int64)
        g = (pd.DataFrame({
            "o_year": yr,
            "o_orderpriority": batch["o_orderpriority"]
            .to_numpy(zero_copy_only=False),
            "n": 1, "cents": cents,
        }).groupby(["o_year", "o_orderpriority"], as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (
        read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderdate", "o_orderpriority",
                                    "o_totalprice"])
        .map_batches(cell_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["o_year", "o_orderpriority"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="c"))
        .to_pandas()
    )
    if fine.empty:
        return pa.table({"o_year": pa.array([], type=pa.int64()),
                         "o_orderpriority": pa.array([], type=pa.string()),
                         "n_orders": pa.array([], type=pa.int64()),
                         "revenue_r": pa.array([], type=pa.float64())})
    rows = []
    for _, r in fine.iterrows():
        rows.append((int(r["o_year"]), r["o_orderpriority"],
                     int(r["n"]), int(r["c"])))
    for y, sub in fine.groupby("o_year"):
        rows.append((int(y), ROLLUP_ALL_PRIO,
                     int(sub["n"].sum()), int(sub["c"].sum())))
    rows.append((ROLLUP_ALL_YEAR, ROLLUP_ALL_PRIO,
                 int(fine["n"].sum()), int(fine["c"].sum())))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "o_year": pa.array([r[0] for r in rows], type=pa.int64()),
        "o_orderpriority": pa.array([r[1] for r in rows],
                                    type=pa.string()),
        "n_orders": pa.array([r[2] for r in rows], type=pa.int64()),
        "revenue_r": pa.array(
            _round_vec(np.asarray([r[3] for r in rows],
                                  dtype=np.float64) / 100.0, 2)),
    })


UNPIVOT_STATS = ("n_events", "sum_value_r", "min_value_r", "max_value_r")


def unpivot_type_stats(sf_dir: str):
    """(event_type, stat, value): the per-type aggregate row MELTED into
    long form — the UNPIVOT surface (pivot_events goes long→wide; this
    closes the other direction). One distributed aggregate pass (count,
    sum, min, max per type — map-side partials, ≤|types| exchange), then
    the bounded wide table unpivots on the driver: stat names become a
    column, every value publishes as double (the SQL UNPIVOT common-type
    rule), sums rounded 4 dp, NaN-free (null values drop)."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch["event_type"]
                           .to_numpy(zero_copy_only=False), "v": v})
        df = df.dropna(subset=["event_type"])
        df = df[~df["v"].isna()]
        g = df.groupby("event_type", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), mn=("v", "min"),
            mx=("v", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    wide = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
    )
    if wide.empty:
        return pa.table({"event_type": pa.array([], type=pa.string()),
                         "stat": pa.array([], type=pa.string()),
                         "value": pa.array([], type=pa.float64())})
    wide = wide.sort_values("event_type")
    et, stat, val = [], [], []
    for _, r in wide.iterrows():
        cols = {
            "n_events": float(r["n"]),
            "sum_value_r": float(_round_vec(
                np.asarray([r["s"]], dtype=np.float64), 4)[0]),
            "min_value_r": float(_round_vec(
                np.asarray([r["mn"]], dtype=np.float64), 4)[0]),
            "max_value_r": float(_round_vec(
                np.asarray([r["mx"]], dtype=np.float64), 4)[0]),
        }
        for s in UNPIVOT_STATS:
            et.append(r["event_type"]); stat.append(s); val.append(cols[s])
    return pa.table({"event_type": pa.array(et, type=pa.string()),
                     "stat": pa.array(stat, type=pa.string()),
                     "value": pa.array(val, type=pa.float64())})


WEEK_US = 7 * DAY_US


def wow_growth(sf_dir: str):
    """(week_us, n_events, pct_change_r): weekly event volume over the
    calendar-complete week frame plus week-over-week percent change —
    the LAG-on-aggregate surface (windowed_events buckets, this DIFFS
    adjacent buckets). Weeks are ISO date_trunc('week') Mondays over the
    calendar-complete grid (gap weeks count zero, so the week after a
    gap shows −1.0's successor correctly); rows where the change is
    undefined — the first week, or a zero-count previous week — are
    DROPPED on both sides (NULL-free output: the driver's value compare
    treats NaN ≠ NaN).

    Scale shape: map-side weekly count partials, one ≤|weeks| Sum
    exchange, then the LAG runs on the driver over the calendar-bounded
    frame (the peak_concurrency argument). Counts are int64; the single
    division is the identical double expression both sides, 4 dp."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def week_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        day = ts // DAY_US
        wk = (day - (day + 3) % 7) * DAY_US  # Monday: epoch day 0 is Thu
        vals, counts = np.unique(wk, return_counts=True)
        return pa.table({"week_us": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    weekly = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts"])
        .map_batches(week_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("week_us").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if weekly.empty:
        return pa.table({"week_us": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64()),
                         "pct_change_r": pa.array([], type=pa.float64())})
    weekly = weekly.sort_values("week_us")
    weeks = np.arange(int(weekly["week_us"].min()),
                      int(weekly["week_us"].max()) + WEEK_US, WEEK_US,
                      dtype=np.int64)
    n = np.zeros(weeks.size, dtype=np.int64)
    n[(weekly["week_us"].to_numpy(dtype=np.int64) - weeks[0]) // WEEK_US] = (
        weekly["n"].to_numpy(dtype=np.int64))
    prev = n[:-1]
    ok = prev > 0
    pct = _round_vec((n[1:][ok] - prev[ok]).astype(np.float64)
                     / prev[ok].astype(np.float64), 4)
    return pa.table({
        "week_us": pa.array(weeks[1:][ok]),
        "n_events": pa.array(n[1:][ok]),
        "pct_change_r": pa.array(pct, type=pa.float64()),
    })


def events_autocorr(sf_dir: str):
    """(n_days, autocorr_r): lag-1 Pearson autocorrelation of the daily
    event-count series (calendar-complete, zero-filled) — the
    time-series-diagnostics surface: is today's volume predictive of
    tomorrow's? Every Σ term (Σx, Σy, Σxy, Σx², Σy² over the D−1
    adjacent-day pairs) is EXACT int64 — the only float is the one
    final textbook expression, identical on both sides, 4 dp.

    Scale shape: one map-side day-count partial pass, a ≤|days| Sum
    exchange, then the lag products evaluate on the driver over the
    calendar-bounded day frame. Fewer than two days → NULL (SQL corr
    of a single pair's degenerate variance is NULL too)."""
    from ray.data.aggregate import Sum

    def day_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        vals, counts = np.unique((ts // DAY_US) * DAY_US,
                                 return_counts=True)
        return pa.table({"d": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts"])
        .map_batches(day_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if daily.empty:
        return pa.table({"n_days": pa.array([], type=pa.int64()),
                         "autocorr_r": pa.array([], type=pa.float64())})
    daily = daily.sort_values("d")
    days = np.arange(int(daily["d"].min()),
                     int(daily["d"].max()) + DAY_US, DAY_US,
                     dtype=np.int64)
    cnt = np.zeros(days.size, dtype=np.int64)
    cnt[(daily["d"].to_numpy(dtype=np.int64) - days[0]) // DAY_US] = (
        daily["n"].to_numpy(dtype=np.int64))
    if days.size < 2:
        return pa.table({"n_days": pa.array([int(days.size)],
                                            type=pa.int64()),
                         "autocorr_r": pa.array([None],
                                                type=pa.float64())})
    x, y = cnt[:-1], cnt[1:]
    m = int(x.size)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    den2 = (m * sxx - sx * sx) * (m * syy - sy * sy)
    if den2 <= 0:
        r = None
    else:
        r = round_half_away(
            float(m * sxy - sx * sy) / float(np.sqrt(float(den2))), 4)
    return pa.table({"n_days": pa.array([int(days.size)], type=pa.int64()),
                     "autocorr_r": pa.array([r], type=pa.float64())})


def type_overlap(sf_dir: str):
    """(type_a, type_b, n_common, overlap_r): for every unordered pair
    of event types, the number of users active in BOTH and the overlap
    coefficient |A∩B| / min(|A|,|B|) — the set-similarity matrix over a
    groupable key (the user-set analogue of source_overlap's doc-level
    comparison). Pairs with no common user are absent (both sides).

    Scale shape: distinct (user, type) via a combiner exchange, then a
    user-hash exchange where each user emits its C(t,2) local type
    pairs (t ≤ |types|, bounded) — pair counts Sum-combine map-side;
    marginals ride the same distinct stream. The join of pair counts
    against two marginals happens on the driver over the ≤C(|types|,2)
    frame. Integers everywhere; one 4-dp division per row."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    def ut_partial(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False),
        }).dropna(subset=["event_type"]).drop_duplicates())
        return pa.Table.from_pandas(g, preserve_index=False)

    def pair_kernel(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": group["user_id"].to_numpy(zero_copy_only=False),
            "event_type": group["event_type"]
            .to_numpy(zero_copy_only=False),
        })
        a_out, b_out = [], []
        for _, sub in df.groupby("user_id"):
            ts = sorted(sub["event_type"].tolist())
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    a_out.append(ts[i]); b_out.append(ts[j])
        g = (pd.DataFrame({"type_a": a_out, "type_b": b_out, "n": 1})
             .groupby(["type_a", "type_b"], as_index=False)["n"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    distinct = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
        .map_batches(ut_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["user_id", "event_type"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"]).materialize()
    )
    marg = (distinct.groupby("event_type")
            .aggregate(Count(alias_name="nu")).to_pandas())
    pairs = (distinct.groupby("user_id")
             .map_groups(pair_kernel, batch_format="pyarrow")
             .groupby(["type_a", "type_b"])
             .aggregate(Sum("n", alias_name="n_common"))
             .to_pandas())
    if pairs.empty:
        return pa.table({"type_a": pa.array([], type=pa.string()),
                         "type_b": pa.array([], type=pa.string()),
                         "n_common": pa.array([], type=pa.int64()),
                         "overlap_r": pa.array([], type=pa.float64())})
    nu = marg.set_index("event_type")["nu"]
    pairs = pairs.sort_values(["type_a", "type_b"])
    na = nu.loc[pairs["type_a"]].to_numpy(dtype=np.int64)
    nb = nu.loc[pairs["type_b"]].to_numpy(dtype=np.int64)
    nc = pairs["n_common"].to_numpy(dtype=np.int64)
    return pa.table({
        "type_a": pa.array(pairs["type_a"], type=pa.string()),
        "type_b": pa.array(pairs["type_b"], type=pa.string()),
        "n_common": pa.array(nc),
        "overlap_r": pa.array(_round_vec(
            nc.astype(np.float64) / np.minimum(na, nb), 4)),
    })


def regr_value_trend(sf_dir: str):
    """(event_type, n_events, slope_r, intercept_r): per-type simple
    linear regression of value against time (epoch-day x) — the
    REGR_SLOPE/REGR_INTERCEPT aggregate family (``group_correlation``
    stops at covariance/correlation; this fits the actual line).

    Exactness: x = epoch_us // DAY_US (≤ ~2¹⁵ for any plausible date)
    and y = round(100·value) are exact integer images; per-batch int64
    partials Σx, Σy, Σxy, Σx² are all ≤ 2⁴⁶ at batch 8192. The driver
    combines with Python ints and forms num_s = n·Σxy − ΣxΣy,
    num_i = Σy·Σx² − Σx·Σxy, den = n·Σx² − (Σx)² exactly (the SQL side
    runs the identical products in HUGEINT); slope and intercept are
    then ONE mirrored double expression each (cast, divide, /100 for
    the cents image, 4 dp). Groups whose x has zero variance (all
    events on one day) are dropped on both sides — the fit is
    undefined there.

    Scale shape: one streaming pass, ≤ n_types partial rows per batch,
    no exchange at all (the group_correlation discipline); null ts or
    value rows drop map-side, mirrored by the SQL WHERE."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "ts": ts.to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna(subset=["event_type", "ts", "value"])
        x = (df["ts"].to_numpy(dtype=np.int64) // DAY_US)
        v = df["value"].to_numpy(dtype=np.float64) * 100.0
        # half-AWAY-from-zero image (DuckDB round), not np.rint's
        # half-to-even — they diverge on exact .5 cent boundaries
        y = np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)
        p = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": np.ones(x.size, dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
        }).groupby("event_type", as_index=False).sum()
        cols = {"event_type": pa.array(p["event_type"].tolist(),
                                       type=pa.string())}
        for c in ("n", "sx", "sy", "sxy", "sxx"):
            cols[c] = pa.array(p[c].to_numpy(dtype=np.int64))
        return pa.table(cols)

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type", "value"])
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    et, ns, slopes, icepts = [], [], [], []
    if not parts.empty:
        for t in sorted(parts["event_type"].unique().tolist()):
            sub = parts[parts["event_type"] == t]
            n = int(sub["n"].sum())
            sx = _pyint_sum(sub["sx"])
            sy = _pyint_sum(sub["sy"])
            sxy = _pyint_sum(sub["sxy"])
            sxx = _pyint_sum(sub["sxx"])
            den = n * sxx - sx * sx
            if den <= 0:
                continue
            et.append(t)
            ns.append(n)
            slopes.append(round_half_away(
                float(n * sxy - sx * sy) / float(den) / 100.0, 4))
            icepts.append(round_half_away(
                float(sy * sxx - sx * sxy) / float(den) / 100.0, 4))
    return pa.table({
        "event_type": pa.array(et, type=pa.string()),
        "n_events": pa.array(np.asarray(ns, dtype=np.int64)),
        "slope_r": pa.array(slopes, type=pa.float64()),
        "intercept_r": pa.array(icepts, type=pa.float64()),
    })


def daily_reconcile(sf_dir: str):
    """(day_us, n_orders, n_ship_lines, status): FULL OUTER JOIN of the
    daily order-placement count against the daily lineitem-shipment
    count — the two-source reconciliation surface (which days have
    orders but no shipments, and vice versa). Missing sides publish 0
    (COALESCE) and the row is tagged 'orders_only' / 'ship_only' /
    'both' — the one registry entry exercising FULL OUTER semantics
    (every join so far is inner, semi, anti, asof, range or broadcast).

    Scale shape: each side is a map-side day-count partial pass plus
    one ≤|days| Sum exchange; the outer merge itself runs on the
    driver over the two calendar-bounded day frames (thousands of
    rows for decades of data — the hourly_gap_fill argument). Counts
    are exact int64 end-to-end; no floats anywhere."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def day_counts(table: str, col: str) -> pd.DataFrame:
        def partial(batch: pa.Table) -> pa.Table:
            ts = (batch[col].cast(pa.timestamp("us")).cast(pa.int64())
                  .to_numpy(zero_copy_only=False))
            vals, counts = np.unique((ts // DAY_US) * DAY_US,
                                     return_counts=True)
            return pa.table({"day_us": pa.array(vals.astype(np.int64)),
                             "n": pa.array(counts.astype(np.int64))})

        df = (
            read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[col])
            .map_batches(partial, batch_format="pyarrow", batch_size=8192)
            .groupby("day_us").aggregate(Sum("n", alias_name="n"))
            .to_pandas()
        )
        if "day_us" not in df.columns:  # empty input → column-less frame
            df = pd.DataFrame({"day_us": pd.Series(dtype=np.int64),
                               "n": pd.Series(dtype=np.int64)})
        return df

    a = day_counts("orders", "o_orderdate")
    b = day_counts("lineitem", "l_shipdate")
    m = a.merge(b, on="day_us", how="outer", suffixes=("_o", "_s"),
                indicator=True).sort_values("day_us")
    status = m["_merge"].map({"left_only": "orders_only",
                              "right_only": "ship_only",
                              "both": "both"})
    return pa.table({
        "day_us": pa.array(m["day_us"].to_numpy(dtype=np.int64)),
        "n_orders": pa.array(m["n_o"].fillna(0).to_numpy(dtype=np.int64)),
        "n_ship_lines": pa.array(m["n_s"].fillna(0)
                                 .to_numpy(dtype=np.int64)),
        "status": pa.array(status.tolist(), type=pa.string()),
    })


def gini_activity(sf_dir: str):
    """(n_users, n_events, gini_r): Gini coefficient of the per-user
    event-count distribution — the concentration/inequality statistic
    (how unevenly is activity spread across users?). Uses the exact
    rank-weighted form G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    ascending-sorted counts; equal counts occupy a contiguous rank run,
    so the sum is permutation-invariant and needs no tiebreak. Every
    term is an exact integer on both sides; ONE final mirrored double
    division, 4 dp.

    Scale shape: per-user counts via a user-key combiner exchange, then
    a count-of-counts histogram exchange whose key space is bounded by
    the maximum per-user count (small, data-independent of user
    cardinality) — the rank-weighted sum evaluates on the driver in
    closed form per histogram run (v·(f·s + f·(f−1)/2)), never
    materializing a per-user vector. Null users drop on both sides."""
    from ray.data.aggregate import Sum

    def user_partial(batch: pa.Table) -> pa.Table:
        u = (batch["user_id"].combine_chunks().drop_null()
             .to_numpy(zero_copy_only=False).astype(np.int64))
        vals, counts = np.unique(u, return_counts=True)
        return pa.table({"user_id": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        vals, counts = np.unique(n, return_counts=True)
        return pa.table({"cnt": pa.array(vals.astype(np.int64)),
                         "freq": pa.array(counts.astype(np.int64))})

    hist = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id"])
        .map_batches(user_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("user_id").aggregate(Sum("n", alias_name="n"))
        .map_batches(hist_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("cnt").aggregate(Sum("freq", alias_name="freq"))
        .to_pandas()
    )
    if hist.empty:
        return pa.table({"n_users": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64()),
                         "gini_r": pa.array([], type=pa.float64())})
    hist = hist.sort_values("cnt")
    nn, tot, iw, s = 0, 0, 0, 1
    for v, f in zip(hist["cnt"].tolist(), hist["freq"].tolist()):
        v, f = int(v), int(f)
        iw += v * (f * s + f * (f - 1) // 2)
        nn += f
        tot += v * f
        s += f
    g = round_half_away(
        float(2 * iw - (nn + 1) * tot) / float(nn * tot), 4)
    return pa.table({"n_users": pa.array([nn], type=pa.int64()),
                     "n_events": pa.array([tot], type=pa.int64()),
                     "gini_r": pa.array([g], type=pa.float64())})


def _cents_i64(vals: "np.ndarray") -> "np.ndarray":
    """Quantize a float64 value column to integer cents with DuckDB's
    round() tie rule (half AWAY from zero — np.rint's half-to-even
    diverges on exact .5 cent boundaries)."""
    v = vals.astype(np.float64) * 100.0
    return np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)


def mannwhitney_value(sf_dir: str):
    """(event_type, n_type, u2, z_r): Mann–Whitney U rank-sum test of
    each event type's value distribution against ALL OTHER types
    (one-vs-rest) — the nonparametric two-sample-test surface (chi2 is
    the categorical independence test; this is the ordinal location
    test). Publishes 2·U as an EXACT integer (u2 — average ranks over
    ties are half-integers, doubling restores exactness) and the
    tie-corrected normal-approximation z-score, 4 dp.

    Every rank quantity is closed-form over the cent-value histogram:
    a value v tying c_v rows after s_v smaller rows has average rank
    s_v + (c_v+1)/2, so 2·R_t = Σ_v k_tv·(2s_v + c_v + 1) and
    2·U_t = 2·R_t − n_t(n_t+1); the tie term T = Σ(c³−c) rides the
    same histogram. The ONLY float is the final z expression,
    token-identical on both sides; var = 0 (all values tied) and
    empty-rest groups publish NULL via an exact-integer guard.

    Scale shape: one map-side (cent, type) count partial pass, one
    composite Sum exchange, then the driver folds the histogram frame
    — bounded by the quantized value DOMAIN × |types|, independent of
    row count — with Python-int accumulators (no int64 overflow at any
    corpus size). No sort, no per-row ranks."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cent_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        g = (pd.DataFrame({"v": _cents_i64(df["value"].to_numpy()),
                           "event_type": df["event_type"].to_numpy()})
             .groupby(["v", "event_type"], as_index=False).size())
        return pa.table({
            "v": pa.array(g["v"].to_numpy(dtype=np.int64)),
            "event_type": pa.array(g["event_type"].tolist(),
                                   type=pa.string()),
            "k": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    j = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(cent_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["v", "event_type"]).aggregate(Sum("k", alias_name="k"))
        .to_pandas()
    )
    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "n_type": pa.array([], type=pa.int64()),
                      "u2": pa.array([], type=pa.int64()),
                      "z_r": pa.array([], type=pa.float64())})
    if j.empty:
        return empty
    j = j.sort_values("v")
    per_v = j.groupby("v", sort=True)["k"].sum()
    c = {int(v): int(k) for v, k in per_v.items()}
    s, run = {}, 0
    for v in per_v.index:          # exclusive cumulative (rows below v)
        s[int(v)] = run
        run += c[int(v)]
    N = run
    T = sum(cv * cv * cv - cv for cv in c.values())
    stats: dict[str, list[int]] = {}
    for v, et, k in zip(j["v"].tolist(), j["event_type"].tolist(),
                        j["k"].tolist()):
        v, k = int(v), int(k)
        st = stats.setdefault(et, [0, 0])
        st[0] += k                              # n_t
        st[1] += k * (2 * s[v] + c[v] + 1)      # 2·R_t
    types, n1s, u2s, zs = [], [], [], []
    for et in sorted(stats):
        n1, r2 = stats[et]
        n2 = N - n1
        u2 = r2 - n1 * (n1 + 1)
        if n1 * n2 > 0 and (N + 1) * N * (N - 1) - T > 0:
            var = (float(n1 * n2)
                   * (float(N + 1) - float(T) / float(N * (N - 1)))
                   / 12.0)
            z = round_half_away(
                float(u2 - n1 * n2) / (2.0 * float(np.sqrt(var))), 4)
        else:
            z = None
        types.append(et)
        n1s.append(n1)
        u2s.append(u2)
        zs.append(z)
    return pa.table({"event_type": pa.array(types, type=pa.string()),
                     "n_type": pa.array(n1s, type=pa.int64()),
                     "u2": pa.array(u2s, type=pa.int64()),
                     "z_r": pa.array(zs, type=pa.float64())})


def sliding_distinct_users(sf_dir: str):
    """(day_us, n_active_7d): for every day of the calendar-complete
    event range, how many DISTINCT users had ≥1 event in the trailing
    7-day window [d−6, d] — the sliding COUNT(DISTINCT) surface.
    Distinct-over-a-window is NOT decomposable into per-day partials
    (a user active twice in the window must count once), which is what
    separates this from sliding_window_events' Sum/Count frames.

    Scale shape: distinct (user, day) via a combiner + composite
    exchange, then a user co-partition merges each user's sorted
    active days into coverage intervals [d, d+6] and emits ±1 DELTAS
    at interval ends (≤2 per merged interval — never one row per
    covered day); a ≤|days|+6 Sum exchange and a calendar-bounded
    driver prefix sum finish, exactly the peak_concurrency sweep-line
    discipline. A separate ≤1-row-per-batch (min, max) pass pins the
    grid. Pure int64 end-to-end."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    WIN = 7  # trailing window, days

    def day_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
        }).dropna()
        g = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "day": df["ts"].to_numpy(dtype=np.int64) // DAY_US,
        }).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    def delta_kernel(group: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": group["user_id"].to_numpy(zero_copy_only=False),
            "day": group["day"].to_numpy(zero_copy_only=False),
        })
        days_out, deltas = [], []
        for _, sub in df.groupby("user_id"):
            days = np.sort(sub["day"].to_numpy(dtype=np.int64))
            # merge overlapping [d, d+WIN-1] coverage intervals
            start = prev_end = None
            for d in days.tolist():
                if start is None:
                    start, prev_end = d, d + WIN - 1
                elif d <= prev_end + 1:
                    prev_end = d + WIN - 1
                else:
                    days_out += [start, prev_end + 1]
                    deltas += [1, -1]
                    start, prev_end = d, d + WIN - 1
            if start is not None:
                days_out += [start, prev_end + 1]
                deltas += [1, -1]
        return pa.table({
            "day": pa.array(days_out, type=pa.int64()),
            "delta": pa.array(deltas, type=pa.int64()),
        })

    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])

    def bounds_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .drop_null().to_numpy(zero_copy_only=False))
        if ts.size == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64())})
        d = ts // DAY_US
        return pa.table({"lo": pa.array([int(d.min())], type=pa.int64()),
                         "hi": pa.array([int(d.max())], type=pa.int64())})

    b = ds.map_batches(bounds_partial, batch_format="pyarrow",
                       batch_size=8192).to_pandas()
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "n_active_7d": pa.array([], type=pa.int64())})
    if b.empty:
        return empty
    lo, hi = int(b["lo"].min()), int(b["hi"].max())

    deltas = (
        ds.map_batches(day_partial, batch_format="pyarrow",
                       batch_size=8192)
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_c"))
        .groupby("user_id").map_groups(delta_kernel,
                                       batch_format="pyarrow")
        .groupby("day").aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()
    )
    if deltas.empty:
        return empty
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    acc = np.zeros(grid.size, dtype=np.int64)
    dd = deltas["day"].to_numpy(dtype=np.int64) - lo
    dv = deltas["delta"].to_numpy(dtype=np.int64)
    keep = (dd >= 0) & (dd < grid.size)   # interval tails past hi drop
    np.add.at(acc, dd[keep], dv[keep])
    level = np.cumsum(acc)
    return pa.table({"day_us": pa.array(grid * DAY_US),
                     "n_active_7d": pa.array(level)})


def ema_daily_value(sf_dir: str):
    """(day_us, daily_value, ema_r): exponential moving average
    (α = 0.2) of the daily total event value over the
    calendar-complete, zero-filled day series — the ordered
    linear-recurrence / exponential-smoothing surface (every other
    window entry is frame-decomposable; EMA's state threads through
    EVERY prior row). ema_1 = x_1, ema_d = 0.2·x_d + 0.8·ema_{d−1};
    the oracle is the identical recurrence as a recursive CTE, so
    both sides execute the same IEEE multiply/add sequence on the
    same doubles (x = exact summed cents / 100.0) — bit-identical
    before the final 4-dp publish round.

    Scale shape: per-day cent sums are a map-side partial pass plus
    one ≤|days| Sum exchange; the recurrence itself runs on the
    driver over the CALENDAR-BOUNDED frame (thousands of rows for
    decades of data) — inherently sequential state over a bounded
    series is driver-scan-shaped by design; were the series
    unbounded, the affine maps e→0.8e+0.2x compose per partition for
    a two-pass distributed prefix, documented not needed here."""
    from ray.data.aggregate import Sum

    def cent_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        d = (df["ts"].to_numpy(dtype=np.int64) // DAY_US) * DAY_US
        cents = _cents_i64(df["value"].to_numpy())
        g = pd.DataFrame({"d": d, "cents": cents}).groupby(
            "d", as_index=False)["cents"].sum()
        return pa.table({"d": pa.array(g["d"].to_numpy(dtype=np.int64)),
                         "cents": pa.array(g["cents"]
                                           .to_numpy(dtype=np.int64))})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(cent_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("d").aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    if daily.empty:
        return pa.table({"day_us": pa.array([], type=pa.int64()),
                         "daily_value": pa.array([], type=pa.float64()),
                         "ema_r": pa.array([], type=pa.float64())})
    daily = daily.sort_values("d")
    days = np.arange(int(daily["d"].min()),
                     int(daily["d"].max()) + DAY_US, DAY_US,
                     dtype=np.int64)
    cents = np.zeros(days.size, dtype=np.int64)
    cents[(daily["d"].to_numpy(dtype=np.int64) - days[0]) // DAY_US] = (
        daily["cents"].to_numpy(dtype=np.int64))
    x = [float(cv) / 100.0 for cv in cents.tolist()]
    emas, ema = [], None
    for xi in x:
        ema = xi if ema is None else 0.2 * xi + 0.8 * ema
        emas.append(round_half_away(ema, 4))
    return pa.table({"day_us": pa.array(days),
                     "daily_value": pa.array(x, type=pa.float64()),
                     "ema_r": pa.array(emas, type=pa.float64())})


def spearman_corr(sf_dir: str):
    """(n_events, rho_r): Spearman rank correlation between event
    VALUE and HOUR-OF-DAY — the rank-correlation surface (is spend
    ordinally associated with time of day?). ρ = Pearson over
    average ranks; both rank vectors double to exact integers
    (2·rank(v) = 2s_v + c_v + 1 from the cumulative histogram), and
    ρ is invariant to that ×2 (the scale factor cancels through
    numerator and √denominator as exact powers of two). All six Σ
    terms fold from the JOINT (cent, hour) histogram — Σ f(x)g(y) =
    Σ_{v,h} k_vh·f(v)·g(h) — as Python ints; the ONLY float is the
    final textbook expression, token-identical on both sides, 4 dp;
    zero-variance sides publish NULL via exact-integer guards.

    Scale shape: one map-side (cent, hour) count partial pass, one
    composite Sum exchange, driver fold over a frame bounded by the
    quantized value domain × 24 — independent of row count. No sort,
    no per-row ranks, no second pass."""
    import pandas as pd
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def joint_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        g = pd.DataFrame({
            "v": _cents_i64(df["value"].to_numpy()),
            "h": (df["ts"].to_numpy(dtype=np.int64) // HOUR_US) % 24,
        }).groupby(["v", "h"], as_index=False).size()
        return pa.table({
            "v": pa.array(g["v"].to_numpy(dtype=np.int64)),
            "h": pa.array(g["h"].to_numpy(dtype=np.int64)),
            "k": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    j = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(joint_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["v", "h"]).aggregate(Sum("k", alias_name="k"))
        .to_pandas()
    )
    if j.empty:
        return pa.table({"n_events": pa.array([], type=pa.int64()),
                         "rho_r": pa.array([], type=pa.float64())})

    def doubled_ranks(col: str) -> dict[int, int]:
        per = j.groupby(col, sort=True)["k"].sum()
        out, run = {}, 0
        for key, cnt in per.items():
            out[int(key)] = 2 * run + int(cnt) + 1
            run += int(cnt)
        return out

    rx, ry = doubled_ranks("v"), doubled_ranks("h")
    n = sx = sy = sxy = sxx = syy = 0
    for v, h, k in zip(j["v"].tolist(), j["h"].tolist(),
                       j["k"].tolist()):
        k, a, b = int(k), rx[int(v)], ry[int(h)]
        n += k
        sx += k * a
        sy += k * b
        sxy += k * a * b
        sxx += k * a * a
        syy += k * b * b
    f1 = n * sxx - sx * sx
    f2 = n * syy - sy * sy
    if f1 <= 0 or f2 <= 0:
        rho = None
    else:
        rho = round_half_away(
            float(n * sxy - sx * sy)
            / float(np.sqrt(float(f1) * float(f2))), 4)
    return pa.table({"n_events": pa.array([n], type=pa.int64()),
                     "rho_r": pa.array([rho], type=pa.float64())})


def ks_test_value(sf_dir: str):
    """(event_type, n_type, d_num, d_r): two-sample Kolmogorov–Smirnov
    statistic of each event type's value distribution vs ALL OTHER
    types — the ECDF-extremum test surface (mannwhitney_value asks
    "is one sample shifted?"; KS asks "do the distributions differ
    ANYWHERE?"). D = max_v |F_t(v) − F_rest(v)|; the maximum occurs at
    histogram support points, and each candidate is EXACT:
    d_num(v) = |cum_t(v)·n₂ − (cum(v) − cum_t(v))·n₁| with
    D = d_num / (n₁·n₂). d_num publishes as an exact integer; the
    division is the ONLY float, 4 dp; an empty rest side publishes
    NULL via the integer guard.

    Scale shape: the same single (cent, type) histogram exchange as
    mannwhitney_value; the driver walks the domain-bounded frame once
    per type (|domain| × |types| candidates, independent of row
    count) with Python-int accumulators."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cent_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        g = (pd.DataFrame({"v": _cents_i64(df["value"].to_numpy()),
                           "event_type": df["event_type"].to_numpy()})
             .groupby(["v", "event_type"], as_index=False).size())
        return pa.table({
            "v": pa.array(g["v"].to_numpy(dtype=np.int64)),
            "event_type": pa.array(g["event_type"].tolist(),
                                   type=pa.string()),
            "k": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    j = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(cent_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["v", "event_type"]).aggregate(Sum("k", alias_name="k"))
        .to_pandas()
    )
    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "n_type": pa.array([], type=pa.int64()),
                      "d_num": pa.array([], type=pa.int64()),
                      "d_r": pa.array([], type=pa.float64())})
    if j.empty:
        return empty
    support = sorted(int(v) for v in j["v"].unique())
    call = {v: 0 for v in support}
    per_type: dict[str, dict[int, int]] = {}
    for v, et, k in zip(j["v"].tolist(), j["event_type"].tolist(),
                        j["k"].tolist()):
        v, k = int(v), int(k)
        call[v] += k
        per_type.setdefault(et, {})[v] = k
    N = sum(call.values())
    types, n1s, dnums, drs = [], [], [], []
    for et in sorted(per_type):
        hist = per_type[et]
        n1 = sum(hist.values())
        n2 = N - n1
        cum = cumt = best = 0
        for v in support:
            cum += call[v]
            cumt += hist.get(v, 0)
            cand = abs(cumt * n2 - (cum - cumt) * n1)
            if cand > best:
                best = cand
        types.append(et)
        n1s.append(n1)
        dnums.append(best)
        drs.append(round_half_away(float(best) / float(n1 * n2), 4)
                   if n1 * n2 > 0 else None)
    return pa.table({"event_type": pa.array(types, type=pa.string()),
                     "n_type": pa.array(n1s, type=pa.int64()),
                     "d_num": pa.array(dnums, type=pa.int64()),
                     "d_r": pa.array(drs, type=pa.float64())})


def cross_corr_types(sf_dir: str):
    """(lag, n_pairs, xcorr_r): lead-lag Pearson cross-correlation
    between the daily 'click' count series and the daily 'purchase'
    count series at lags −3…+3 days — the LEAD-LAG diagnostics
    surface extending events_autocorr's single-series lag-1 to two
    series and a lag sweep (do clicks today predict purchases in L
    days?). Both series are zero-filled over the JOINT calendar range;
    at lag L the D−|L| aligned pairs (x_d, y_{d+L}) contribute five
    EXACT int64 Σ terms; the textbook expression is the only float,
    token-identical on both sides, 4 dp; degenerate variance (either
    side constant over the window) publishes NULL.

    Scale shape: one map-side (day, type) count partial pass over the
    two gated types, a ≤|days|·2 Sum exchange, then 7 lag evaluations
    over the calendar-bounded frame on the driver."""
    import pandas as pd
    from ray.data.aggregate import Sum

    X_TYPE, Y_TYPE = "click", "purchase"
    MAX_LAG = 3

    def day_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["event_type"].isin([X_TYPE, Y_TYPE])]
        g = (pd.DataFrame({
            "d": (df["ts"].to_numpy(dtype=np.int64) // DAY_US) * DAY_US,
            "event_type": df["event_type"].to_numpy()})
            .groupby(["d", "event_type"], as_index=False).size())
        return pa.table({
            "d": pa.array(g["d"].to_numpy(dtype=np.int64)),
            "event_type": pa.array(g["event_type"].tolist(),
                                   type=pa.string()),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "ts"])
        .map_batches(day_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["d", "event_type"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    empty = pa.table({"lag": pa.array([], type=pa.int64()),
                      "n_pairs": pa.array([], type=pa.int64()),
                      "xcorr_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    days = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    x = np.zeros(days.size, dtype=np.int64)
    y = np.zeros(days.size, dtype=np.int64)
    for d, et, n in zip(daily["d"].tolist(),
                        daily["event_type"].tolist(),
                        daily["n"].tolist()):
        i = (int(d) - lo) // DAY_US
        if et == X_TYPE:
            x[i] = int(n)
        else:
            y[i] = int(n)
    lags, npairs, rs = [], [], []
    for L in range(-MAX_LAG, MAX_LAG + 1):
        if L >= 0:
            a, b = x[:days.size - L] if L else x, y[L:]
        else:
            a, b = x[-L:], y[:days.size + L]
        lags.append(L)
        m = int(a.size)
        npairs.append(m)
        if m == 0:
            rs.append(None)
            continue
        sx, sy = int(a.sum()), int(b.sum())
        sxy = int((a * b).sum())
        sxx, syy = int((a * a).sum()), int((b * b).sum())
        den2 = (m * sxx - sx * sx) * (m * syy - sy * sy)
        rs.append(round_half_away(
            float(m * sxy - sx * sy) / float(np.sqrt(float(den2))), 4)
            if den2 > 0 else None)
    return pa.table({"lag": pa.array(lags, type=pa.int64()),
                     "n_pairs": pa.array(npairs, type=pa.int64()),
                     "xcorr_r": pa.array(rs, type=pa.float64())})


def cusum_changepoint(sf_dir: str):
    """(n_days, change_day_us, peak_num, peak_r): CUSUM changepoint
    detection over the zero-filled daily event-count series — the
    structural-break surface (when did the level shift?). The CUSUM
    at day index i (1-based) is C_i = cum_i − i·S/D; scaling by D
    keeps it EXACT: peak_num = max_i |D·cum_i − i·S| (an exact
    integer), the changepoint is the EARLIEST day attaining it, and
    peak_r = peak_num / D is the one float (the actual max |C_i|),
    4 dp. Single-day series: C_1 = 0 by construction (peak 0).

    Scale shape: one map-side day-count partial pass, a ≤|days| Sum
    exchange, one calendar-bounded driver scan — the argmax is
    order-independent integer comparison with the earliest-day
    tiebreak, so no global sort anywhere."""
    from ray.data.aggregate import Sum

    def day_partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .drop_null().to_numpy(zero_copy_only=False))
        vals, counts = np.unique((ts // DAY_US) * DAY_US,
                                 return_counts=True)
        return pa.table({"d": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts"])
        .map_batches(day_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("d").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if daily.empty:
        return pa.table({"n_days": pa.array([], type=pa.int64()),
                         "change_day_us": pa.array([], type=pa.int64()),
                         "peak_num": pa.array([], type=pa.int64()),
                         "peak_r": pa.array([], type=pa.float64())})
    daily = daily.sort_values("d")
    days = np.arange(int(daily["d"].min()),
                     int(daily["d"].max()) + DAY_US, DAY_US,
                     dtype=np.int64)
    cnt = np.zeros(days.size, dtype=np.int64)
    cnt[(daily["d"].to_numpy(dtype=np.int64) - days[0]) // DAY_US] = (
        daily["n"].to_numpy(dtype=np.int64))
    D = int(days.size)
    S = int(cnt.sum())
    cum = best = 0
    best_day = int(days[0])
    for i, n in enumerate(cnt.tolist(), start=1):
        cum += int(n)
        cand = abs(D * cum - i * S)
        if cand > best:
            best = cand
            best_day = int(days[i - 1])
    return pa.table({
        "n_days": pa.array([D], type=pa.int64()),
        "change_day_us": pa.array([best_day], type=pa.int64()),
        "peak_num": pa.array([best], type=pa.int64()),
        "peak_r": pa.array([round_half_away(float(best) / float(D), 4)],
                           type=pa.float64()),
    })


def benford_values(sf_dir: str):
    """(digit, n, pct_r, benford_r): first-significant-digit
    distribution of the (positive) cent-quantized values against
    Benford's law — the forensic data-quality audit surface. The
    leading digit extracts by pure integer division (d //= 10 until
    d < 10, vectorized); counts are exact; pct_r = n/N and
    benford_r = log10(1 + 1/digit) are the two mirrored floats, 4 dp.
    Zero and negative cents drop on both sides (no leading digit).

    Scale shape: per-batch digit counts → one ≤9-key Sum exchange;
    the Benford expectation evaluates per digit from identical small
    doubles on both sides."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def digit_partial(batch: pa.Table) -> pa.Table:
        v = pd.Series(batch["value"].to_numpy(
            zero_copy_only=False)).dropna().to_numpy()
        cents = _cents_i64(v)
        cents = cents[cents > 0]
        while cents.size and int(cents.max()) >= 10:
            big = cents >= 10
            cents = np.where(big, cents // 10, cents)
        vals, counts = np.unique(cents, return_counts=True)
        return pa.table({"digit": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    g = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["value"])
        .map_batches(digit_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("digit").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if g.empty:
        return pa.table({"digit": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64()),
                         "pct_r": pa.array([], type=pa.float64()),
                         "benford_r": pa.array([], type=pa.float64())})
    g = g.sort_values("digit")
    N = int(g["n"].sum())
    digits = [int(d) for d in g["digit"].tolist()]
    ns = [int(n) for n in g["n"].tolist()]
    return pa.table({
        "digit": pa.array(digits, type=pa.int64()),
        "n": pa.array(ns, type=pa.int64()),
        "pct_r": pa.array([round_half_away(float(n) / float(N), 4)
                           for n in ns], type=pa.float64()),
        "benford_r": pa.array(
            [round_half_away(math.log10(1.0 + 1.0 / float(d)), 4)
             for d in digits], type=pa.float64()),
    })


def error_bursts(sf_dir: str):
    """(run_len, n_runs): distribution of MAXIMAL consecutive-'error'
    run lengths across every user's (ts, event_id)-ordered event
    stream — the sequence-pattern / run-length-encoding surface
    (activity_islands runs over calendar DAYS; this runs over ordered
    EVENTS, the MATCH_RECOGNIZE-lite shape reliability pipelines ask
    for: how often do errors come in bursts of k?). Exact int64
    counts over ≤ max-run-length rows.

    Scale shape: ONE user-hash co-partition exchange (the
    event_transitions machinery); inside each partition a single
    lexsort orders every user's events and TWO shifted masks find run
    starts/ends vectorized (no per-user loop); each partition emits a
    ≤max-run-length histogram partial and the driver sums the tiny
    frame. Users never split across partitions, so runs can't split
    either."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch, {
            "eid": batch["event_id"].cast(pa.int64()),
            "et": batch["event_type"].cast(pa.string()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        is_err = pc.fill_null(
            pc.equal(group["et"].combine_chunks(), "error"),
            False).to_numpy(zero_copy_only=False)
        empty = pa.table({"run_len": pa.array([], type=pa.int64()),
                          "n_runs": pa.array([], type=pa.int64())})
        if u.size == 0 or not is_err.any():
            return empty
        order = np.lexsort((eid, ts, u))
        u, is_err = u[order], is_err[order]
        same_prev = np.concatenate(([False], u[1:] == u[:-1]))
        prev_err = np.concatenate(([False], is_err[:-1]))
        start = is_err & ~(prev_err & same_prev)
        same_next = np.concatenate((u[1:] == u[:-1], [False]))
        next_err = np.concatenate((is_err[1:], [False]))
        end = is_err & ~(next_err & same_next)
        lens = np.flatnonzero(end) - np.flatnonzero(start) + 1
        cnt = np.bincount(lens)
        nz = np.nonzero(cnt)[0]
        return pa.table({"run_len": pa.array(nz.astype(np.int64)),
                         "n_runs": pa.array(cnt[nz].astype(np.int64))})

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_id",
                                    "event_type"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pa.table({"run_len": pa.array([], type=pa.int64()),
                         "n_runs": pa.array([], type=pa.int64())})
    agg = (parts.groupby("run_len", as_index=False)["n_runs"].sum()
           .sort_values("run_len"))
    return pa.table({
        "run_len": pa.array(agg["run_len"].to_numpy(dtype=np.int64)),
        "n_runs": pa.array(agg["n_runs"].to_numpy(dtype=np.int64)),
    })


def theilsen_trend(sf_dir: str):
    """(n_days, n_pairs, slope_r): Theil–Sen robust trend of daily
    total event value — the MEDIAN of all pairwise slopes over the
    zero-filled daily series (the robust-regression complement of
    regr_value_trend's least squares: one wild day cannot move it).
    Each slope is the identical IEEE expression on both sides
    (Δcents as double / Δdays as double / 100.0); the median follows
    DuckDB's quantile_cont interpolation v_lo·(1−frac) + v_hi·frac
    (the interp_quantiles-verified form), 4 dp.

    Scale shape: one map-side day-count partial pass + a ≤|days| Sum
    exchange; the O(D²) pair enumeration runs on the driver over the
    CALENDAR-bounded series (D days → D(D−1)/2 slopes; ~60M doubles
    for 30 YEARS of data — bounded by time, not corpus size)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cent_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        d = (df["ts"].to_numpy(dtype=np.int64) // DAY_US) * DAY_US
        g = pd.DataFrame({"d": d, "cents": _cents_i64(
            df["value"].to_numpy())}).groupby(
            "d", as_index=False)["cents"].sum()
        return pa.table({"d": pa.array(g["d"].to_numpy(dtype=np.int64)),
                         "cents": pa.array(g["cents"]
                                           .to_numpy(dtype=np.int64))})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(cent_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("d").aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    if daily.empty:
        return pa.table({"n_days": pa.array([], type=pa.int64()),
                         "n_pairs": pa.array([], type=pa.int64()),
                         "slope_r": pa.array([], type=pa.float64())})
    daily = daily.sort_values("d")
    days = np.arange(int(daily["d"].min()),
                     int(daily["d"].max()) + DAY_US, DAY_US,
                     dtype=np.int64)
    cents = np.zeros(days.size, dtype=np.int64)
    cents[(daily["d"].to_numpy(dtype=np.int64) - days[0]) // DAY_US] = (
        daily["cents"].to_numpy(dtype=np.int64))
    D = int(days.size)
    if D < 2:
        return pa.table({"n_days": pa.array([D], type=pa.int64()),
                         "n_pairs": pa.array([0], type=pa.int64()),
                         "slope_r": pa.array([None], type=pa.float64())})
    ia, ib = np.triu_indices(D, k=1)
    slopes = ((cents[ib] - cents[ia]).astype(np.float64)
              / (ib - ia).astype(np.float64) / 100.0)
    slopes.sort()
    m = slopes.size
    h = 0.5 * (m - 1)
    f = int(np.floor(h))
    frac = h - f
    med = (slopes[f] if frac == 0.0
           else slopes[f] * (1.0 - frac) + slopes[f + 1] * frac)
    return pa.table({
        "n_days": pa.array([D], type=pa.int64()),
        "n_pairs": pa.array([m], type=pa.int64()),
        "slope_r": pa.array([round_half_away(float(med), 4)],
                            type=pa.float64()),
    })


def division_users(sf_dir: str):
    """(user_id, n_types): RELATIONAL DIVISION — users active in
    EVERY event type present in the corpus (the universal-quantifier
    / FOR-ALL surface: q21 asks "exists another"; division asks
    "covers ALL of a data-derived divisor set"). The divisor is the
    global distinct-type set, computed once from the same distinct
    stream.

    Scale shape: distinct (user, type) via a combiner exchange, a
    per-user distinct-count exchange (≤|types| addends per user), and
    a broadcast scalar |types| compared locally — the quotient
    filter never joins user-cardinality rows against anything.
    Exact integers throughout."""
    import pandas as pd
    from ray.data.aggregate import Count

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
        }).dropna().drop_duplicates()
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy(dtype=np.int64)),
            "event_type": pa.array(df["event_type"].tolist(),
                                   type=pa.string()),
        })

    pairs = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
        .map_batches(pair_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    if pairs.empty:
        return pa.table({"user_id": pa.array([], type=pa.int64()),
                         "n_types": pa.array([], type=pa.int64())})
    k = pairs["event_type"].nunique()
    per_user = pairs.groupby("user_id").size()
    win = per_user[per_user == k].sort_index()
    return pa.table({
        "user_id": pa.array(win.index.to_numpy(dtype=np.int64)),
        "n_types": pa.array(np.full(win.size, k, dtype=np.int64)),
    })


def user_gap_quantiles(sf_dir: str):
    """(n_gaps, p50_gap_s, p90_gap_s): exact discrete quantiles of the
    inter-arrival gap (whole seconds, floor) between each user's
    consecutive events in (ts, event_id) order — the inter-arrival /
    cadence-analysis surface (bot-vs-human timing forensics;
    sessionize CONSUMES gaps, nothing publishes their distribution).
    quantile_disc convention: rank ceil(n·q), 1-indexed — both
    quantiles are exact integers, so every output cell hash-compares
    exactly (no floats anywhere).

    Scale shape: the user-hash co-partition + lexsort + shifted-mask
    pass (event_transitions machinery) reduces each partition to a
    distinct-gap histogram partial; one ≤|distinct gaps| Sum exchange
    and a driver counting-selection walk — no global sort, gaps never
    leave their partition row-by-row."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch, {
            "eid": batch["event_id"].cast(pa.int64()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        empty = pa.table({"gap_s": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if u.size < 2:
            return empty
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same] // 1_000_000
        if gaps.size == 0:
            return empty
        vals, counts = np.unique(gaps, return_counts=True)
        return pa.table({"gap_s": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    hist = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_id"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("gap_s").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:
        return pa.table({"n_gaps": pa.array([0], type=pa.int64()),
                         "p50_gap_s": pa.array([None], type=pa.int64()),
                         "p90_gap_s": pa.array([None], type=pa.int64())})
    hist = hist.sort_values("gap_s")
    gs = hist["gap_s"].to_numpy(dtype=np.int64)
    ns = hist["n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(ns)
    n = int(cum[-1])

    def disc(q: float) -> int:
        rank = int(np.ceil(n * q)) or 1
        return int(gs[np.searchsorted(cum, rank)])

    return pa.table({"n_gaps": pa.array([n], type=pa.int64()),
                     "p50_gap_s": pa.array([disc(0.5)], type=pa.int64()),
                     "p90_gap_s": pa.array([disc(0.9)],
                                           type=pa.int64())})


def latest_events(sf_dir: str):
    """(user_id, event_type, ts_us, event_id, value): the LAST event
    per (user, type) under (ts, event_id) order — the last-write-wins
    compaction / CDC-snapshot surface (dedup_turns keeps the FIRST
    occurrence of identical content; this keeps the NEWEST row per
    logical key, the upsert-log → current-state materialization every
    changelog consumer runs). Values pass through untouched, so every
    output cell is bit-identical to the input row the oracle picks.

    Scale shape: each batch first compacts to ≤ one row per (user,
    type) present (a map-side argmax combiner — the exchange carries
    key-cardinality rows, not event rows), then ONE user-hash
    co-partition exchange and a per-partition vectorized final argmax
    (one lexsort + group-boundary mask, no per-key Python). Output
    stays a distributed Dataset sized by live keys."""
    import pandas as pd

    def _last_per_key(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "event_type", "ts_us",
                             "event_id"], kind="mergesort")
        return df.drop_duplicates(subset=["user_id", "event_type"],
                                  keep="last")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna(subset=["user_id", "event_type", "ts_us"])
        if df.empty:
            return pa.table({
                "q": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "ts_us": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.float64()),
            })
        g = _last_per_key(df)
        u = g["user_id"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            "user_id": pa.array(u),
            "event_type": pa.array(g["event_type"].tolist(),
                                   type=pa.string()),
            "ts_us": pa.array(g["ts_us"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(g["event_id"].to_numpy(dtype=np.int64)),
            "value": pa.array(g["value"].to_numpy(dtype=np.float64)),
        })

    def final(group: pa.Table) -> pa.Table:
        g = _last_per_key(group.to_pandas())
        return pa.table({
            "user_id": pa.array(g["user_id"].to_numpy(dtype=np.int64)),
            "event_type": pa.array(g["event_type"].tolist(),
                                   type=pa.string()),
            "ts_us": pa.array(g["ts_us"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(g["event_id"].to_numpy(dtype=np.int64)),
            "value": pa.array(g["value"].to_numpy(dtype=np.float64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type", "ts",
                                    "event_id", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(final, batch_format="pyarrow")
    )


def welch_ttest(sf_dir: str):
    """(n_purchase, n_click, mean_purchase_r, mean_click_r, t_r, df_r):
    Welch's unequal-variance t statistic between 'purchase' and
    'click' event values, with the Welch–Satterthwaite effective
    degrees of freedom — the PARAMETRIC two-sample-test surface
    (mannwhitney_value is the rank test; ks_test_value the
    distribution test; this is the classic mean-difference test).

    Exactness contract (the group_moments scheme): values quantize to
    4-dp integers, Σv and Σv² accumulate exactly (``_sq_split``
    int64-safe partials, Python-int driver combine), and sample
    variance (n·Σv² − (Σv)²) / (n·(n−1)·SCALE²) is ONE double
    division of exact integers. t and df then follow the identical
    IEEE expression sequence on both sides (se = var/n double ops),
    4-dp publish. Degenerate inputs (n < 2 either side, zero pooled
    se) publish NULL t/df via exact-integer guards.

    Scale shape: one streaming pass, ≤ 2 partial rows per batch, no
    shuffle at all — driver folds batches × 2 tiny rows."""
    import pandas as pd

    TYPES = ("purchase", "click")

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "v": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["et"].isin(TYPES)]
        if df.empty:
            return pa.table({
                "et": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s1": pa.array([], type=pa.int64()),
                "s2hh": pa.array([], type=pa.int64()),
                "s2hl": pa.array([], type=pa.int64()),
                "s2ll": pa.array([], type=pa.int64()),
            })
        v = df["v"].to_numpy(dtype=np.float64)
        vi = (np.floor(np.abs(v) * _MOM_SCALE + 0.5)
              * np.sign(v)).astype(np.int64)
        s2hh, s2hl, s2ll = _sq_split(np.abs(vi))
        g = pd.DataFrame({
            "et": df["et"].to_numpy(),
            "n": np.ones(vi.size, dtype=np.int64),
            "s1": vi, "s2hh": s2hh, "s2hl": s2hl, "s2ll": s2ll,
        }).groupby("et", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )

    def _stats(et: str):
        sub = parts[parts["et"] == et] if not parts.empty else parts
        if parts.empty or sub.empty:
            return 0, 0, 0
        n = int(sub["n"].sum())
        s1 = _pyint_sum(sub["s1"])
        s2 = _sq_split_combine(sub["s2hh"], sub["s2hl"], sub["s2ll"])
        return n, s1, s2

    n1, s11, s21 = _stats(TYPES[0])
    n2, s12, s22 = _stats(TYPES[1])

    def _mean(n: int, s1: int):
        return float(s1) / float(n * _MOM_SCALE) if n else None

    def _var(n: int, s1: int, s2: int):
        if n < 2:
            return None
        return (float(n * s2 - s1 * s1)
                / (float(n * (n - 1)) * float(_MOM_SCALE * _MOM_SCALE)))

    m1, m2 = _mean(n1, s11), _mean(n2, s12)
    v1, v2 = _var(n1, s11, s21), _var(n2, s12, s22)
    t = df = None
    if v1 is not None and v2 is not None:
        se1, se2 = v1 / float(n1), v2 / float(n2)
        s = se1 + se2
        # exact-integer zero-variance guard: both n·Σv² == (Σv)²
        if n1 * s21 - s11 * s11 == 0 and n2 * s22 - s12 * s12 == 0:
            s = 0.0
        if s > 0.0:
            t = (m1 - m2) / float(np.sqrt(s))
            df = (s * s) / (se1 * se1 / float(n1 - 1)
                            + se2 * se2 / float(n2 - 1))

    def _opt(x):
        return pa.array([None if x is None else round_half_away(x, 4)],
                        type=pa.float64())

    return pa.table({
        "n_purchase": pa.array([n1], type=pa.int64()),
        "n_click": pa.array([n2], type=pa.int64()),
        "mean_purchase_r": _opt(m1),
        "mean_click_r": _opt(m2),
        "t_r": _opt(t),
        "df_r": _opt(df),
    })


BASKET_MIN_SUPPORT = 2
BASKET_TOPK = 20
_PAIR_PARTITIONS = 64


def _order_part_pairs(sf_dir: str):
    """Shared co-occurrence pair stream for the market-basket family
    (basket_lift, triangle_count): distinct (order, part) dedups
    map-side, co-locates by hash(order), each order's bounded basket
    enumerates its pairs vectorized, counts combine map-side per
    partition — returns a Dataset of PARTIAL (pa, pb, nab) rows keyed
    by the pair hash ``qq`` (a groupby("qq") finishes the global
    combine; every copy of a pair lands in one qq partition)."""
    import pandas as pd

    P = _PAIR_PARTITIONS

    def op_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "pk": batch["l_partkey"].to_numpy(zero_copy_only=False),
        }).dropna().drop_duplicates()
        ok = df["ok"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "pk": pa.array(df["pk"].to_numpy(dtype=np.int64)),
        })

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates(subset=["ok", "pk"])
        df = df.sort_values(["ok", "pk"], kind="mergesort")
        ok = df["ok"].to_numpy(dtype=np.int64)
        pk = df["pk"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], ok[1:] != ok[:-1])))
        ends = np.concatenate((starts[1:], [ok.size]))
        pa_l, pb_l = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if e - s < 2:
                continue
            seg = pk[s:e]
            ia, ib = np.triu_indices(seg.size, k=1)
            pa_l.append(seg[ia])
            pb_l.append(seg[ib])
        if not pa_l:
            return pa.table({"pa": pa.array([], type=pa.int64()),
                             "pb": pa.array([], type=pa.int64()),
                             "nab": pa.array([], type=pa.int64()),
                             "qq": pa.array([], type=pa.int64())})
        a = np.concatenate(pa_l)
        b = np.concatenate(pb_l)
        g = pd.DataFrame({"pa": a, "pb": b}).groupby(
            ["pa", "pb"], as_index=False).size()
        av = g["pa"].to_numpy(dtype=np.int64)
        bv = g["pb"].to_numpy(dtype=np.int64)
        return pa.table({
            "pa": pa.array(av), "pb": pa.array(bv),
            "nab": pa.array(g["size"].to_numpy(dtype=np.int64)),
            "qq": pa.array(((av * 1_000_003 + bv) % P).astype(np.int64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_orderkey", "l_partkey"])
        .map_batches(op_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("q").map_groups(pairs_in_partition,
                                 batch_format="pyarrow")
        .materialize()
    )


def basket_lift(sf_dir: str):
    """(part_a, part_b, n_ab, n_a, n_b, lift_r): the top-20
    association rules over parts co-occurring in the same order —
    market-basket lift = P(a∧b)/(P(a)·P(b)) = n_ab·N/(n_a·n_b), pairs
    with support ≥ BASKET_MIN_SUPPORT, ranked (lift_r desc, a, b) —
    the frequent-itemset / recommendation surface
    (supplier_affinity counts raw co-occurrence; lift NORMALIZES by
    item popularity, the actual association-rule metric). lift is ONE
    double division of exact int64 products, identical both sides,
    4-dp publish.

    Scale shape: baskets are bounded (parts per order ≤ the order's
    line count), so pair enumeration is linear in lineitems; distinct
    (order, part) dedups map-side, co-locates by hash(order), pairs
    combine map-side per partition, then ONE pair-hash Sum exchange.
    Item counts ride the same distinct stream through a ≤|parts|
    exchange and broadcast as one int64 array (parts ≪ lineitems; at
    a scale where the part dimension itself outgrows broadcast this
    becomes a pair-hash join on part_a/part_b). Per-partition top-k
    under the final total order collects ≤ partitions × k rows."""
    import pandas as pd
    from ray.data.aggregate import Sum

    bp = _order_part_pairs(sf_dir)

    # item counts + N from the same distinct stream (separate pass —
    # the distinct (ok, pk) rows are consumed by the pair stage above)
    def item_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "pk": batch["l_partkey"].to_numpy(zero_copy_only=False),
        }).dropna().drop_duplicates()
        return pa.table({
            "ok": pa.array(df["ok"].to_numpy(dtype=np.int64)),
            "pk": pa.array(df["pk"].to_numpy(dtype=np.int64)),
            "_c": pa.array(np.ones(len(df), dtype=np.int64)),
        })

    items = (
        read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_orderkey", "l_partkey"])
        .map_batches(item_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["ok", "pk"]).aggregate(Sum("_c", alias_name="_c"))
        .to_pandas()
    )
    empty = pa.table({
        "part_a": pa.array([], type=pa.int64()),
        "part_b": pa.array([], type=pa.int64()),
        "n_ab": pa.array([], type=pa.int64()),
        "n_a": pa.array([], type=pa.int64()),
        "n_b": pa.array([], type=pa.int64()),
        "lift_r": pa.array([], type=pa.float64()),
    })
    if items.empty:
        return empty
    n_orders = int(items["ok"].nunique())
    pc = items.groupby("pk").size()
    pk_keys = pc.index.to_numpy(dtype=np.int64)
    pk_cnt = pc.to_numpy(dtype=np.int64)

    def topk_in_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas().groupby(
            ["pa", "pb"], as_index=False)["nab"].sum()
        df = df[df["nab"] >= BASKET_MIN_SUPPORT]
        if df.empty:
            return empty
        a = df["pa"].to_numpy(dtype=np.int64)
        b = df["pb"].to_numpy(dtype=np.int64)
        nab = df["nab"].to_numpy(dtype=np.int64)
        na = pk_cnt[np.searchsorted(pk_keys, a)]
        nb = pk_cnt[np.searchsorted(pk_keys, b)]
        lift = _round_vec((nab * n_orders).astype(np.float64)
                          / (na * nb).astype(np.float64))
        order = np.lexsort((b, a, -lift))[:BASKET_TOPK]
        return pa.table({
            "part_a": pa.array(a[order]), "part_b": pa.array(b[order]),
            "n_ab": pa.array(nab[order]), "n_a": pa.array(na[order]),
            "n_b": pa.array(nb[order]),
            "lift_r": pa.array(lift[order], type=pa.float64()),
        })

    cand = bp.groupby("qq").map_groups(
        topk_in_partition, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return empty
    cand = cand.sort_values(
        ["lift_r", "part_a", "part_b"],
        ascending=[False, True, True]).head(BASKET_TOPK)
    return pa.Table.from_pandas(cand, preserve_index=False).cast(
        empty.schema)


ROLL_MED_WINDOW = 7


def rolling_median_value(sf_dir: str):
    """(day_us, n_win, med_r): trailing 7-day MEDIAN of daily total
    event value over the zero-filled calendar grid — the moving
    ORDER-STATISTIC window surface (sliding_window_events moves sums;
    ema_daily_value smooths; a moving median is the robust trend line
    dashboards actually draw). Daily values are exact summed cents /
    100.0; each window median follows the verified quantile_cont
    interpolation h = q·(n−1), v⌊h⌋·(1−frac) + v⌈h⌉·frac (DuckDB's
    windowed median is quantile_cont(0.5)), 4-dp publish.

    Scale shape: the ema_daily_value machinery — map-side per-day
    cent partials, ONE ≤|days| Sum exchange, then the rolling pass on
    the driver over the CALENDAR-BOUNDED frame (7-element partial
    sort per day; thousands of rows for decades)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cent_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ts": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        d = (df["ts"].to_numpy(dtype=np.int64) // DAY_US) * DAY_US
        cents = _cents_i64(df["value"].to_numpy())
        g = pd.DataFrame({"d": d, "cents": cents}).groupby(
            "d", as_index=False)["cents"].sum()
        return pa.table({"d": pa.array(g["d"].to_numpy(dtype=np.int64)),
                         "cents": pa.array(g["cents"]
                                           .to_numpy(dtype=np.int64))})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(cent_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("d").aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    if daily.empty:
        return pa.table({"day_us": pa.array([], type=pa.int64()),
                         "n_win": pa.array([], type=pa.int64()),
                         "med_r": pa.array([], type=pa.float64())})
    daily = daily.sort_values("d")
    days = np.arange(int(daily["d"].min()),
                     int(daily["d"].max()) + DAY_US, DAY_US,
                     dtype=np.int64)
    cents = np.zeros(days.size, dtype=np.int64)
    cents[(daily["d"].to_numpy(dtype=np.int64) - days[0]) // DAY_US] = (
        daily["cents"].to_numpy(dtype=np.int64))
    x = cents.astype(np.float64) / 100.0
    n_win = np.minimum(np.arange(days.size) + 1, ROLL_MED_WINDOW)
    meds = np.empty(days.size, dtype=np.float64)
    for i in range(days.size):
        w = np.sort(x[max(0, i - ROLL_MED_WINDOW + 1):i + 1])
        h = 0.5 * (w.size - 1)
        f = int(np.floor(h))
        frac = h - f
        meds[i] = (w[f] if frac == 0.0
                   else w[f] * (1.0 - frac) + w[f + 1] * frac)
    return pa.table({
        "day_us": pa.array(days),
        "n_win": pa.array(n_win.astype(np.int64)),
        "med_r": pa.array(_round_vec(meds), type=pa.float64()),
    })


TRI_MIN_SUPPORT = 2


def triangle_count(sf_dir: str):
    """(n_nodes, n_edges, n_wedges, n_triangles, gcc_r): triangle
    census of the part co-purchase graph (undirected edges = part
    pairs co-ordered in ≥ TRI_MIN_SUPPORT orders) plus the global
    clustering coefficient 3·triangles/wedges — the triadic-closure /
    motif-counting surface (pagerank walks, kcore peels, CC labels;
    none counts closed triples). Exact integers end-to-end; gcc is
    ONE double division, 4-dp.

    Scale shape: edges come from the shared :func:`_order_part_pairs`
    combine. Triangles use the DEGREE-ORIENTED node-iterator: orient
    every edge from its lower (degree, id) endpoint, co-partition
    out-edges by hash(source), enumerate each source's out-neighbor
    pairs (out-degree ≤ O(√m) by orientation, so wedge volume is
    O(m^1.5) worst-case, not Σdeg²), then ONE pair-hash exchange
    where wedges meet the edge set and a vectorized merge counts the
    closures — each triangle closes exactly once, at its minimum-
    order vertex. Degrees broadcast as one sorted int64 array
    (bounded by the part dimension, the basket_lift convention)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = _PAIR_PARTITIONS

    def combine_edges(group: pa.Table) -> pa.Table:
        df = group.to_pandas().groupby(
            ["pa", "pb"], as_index=False)["nab"].sum()
        df = df[df["nab"] >= TRI_MIN_SUPPORT]
        return pa.table({
            "a": pa.array(df["pa"].to_numpy(dtype=np.int64)),
            "b": pa.array(df["pb"].to_numpy(dtype=np.int64)),
        })

    edges = (_order_part_pairs(sf_dir)
             .groupby("qq").map_groups(combine_edges,
                                       batch_format="pyarrow")
             .materialize())

    def degree_partial(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        v, c = np.unique(np.concatenate((a, b)), return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64)),
                         "deg": pa.array(c.astype(np.int64))})

    deg = (edges.map_batches(degree_partial, batch_format="pyarrow")
           .groupby("v").aggregate(Sum("deg", alias_name="deg"))
           .to_pandas())
    if deg.empty:
        return pa.table({
            "n_nodes": pa.array([0], type=pa.int64()),
            "n_edges": pa.array([0], type=pa.int64()),
            "n_wedges": pa.array([0], type=pa.int64()),
            "n_triangles": pa.array([0], type=pa.int64()),
            "gcc_r": pa.array([None], type=pa.float64()),
        })
    deg = deg.sort_values("v")
    vk = deg["v"].to_numpy(dtype=np.int64)
    dk = deg["deg"].to_numpy(dtype=np.int64)
    n_nodes = int(vk.size)
    n_wedges = int((dk * (dk - 1) // 2).sum())

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = dk[np.searchsorted(vk, a)]
        db = dk[np.searchsorted(vk, b)]
        # a < b already; a leads unless its (deg, id) order is higher
        swap = (db < da) | ((db == da) & (b < a))
        src = np.where(swap, b, a)
        dst = np.where(swap, a, b)
        return pa.table({
            "qs": pa.array((src % P).astype(np.int64)),
            "src": pa.array(src), "dst": pa.array(dst),
            "n_edges": pa.array(np.ones(src.size, dtype=np.int64)),
        })

    def wedges_in_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["src", "dst"],
                                           kind="mergesort")
        src = df["src"].to_numpy(dtype=np.int64)
        dst = df["dst"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], src[1:] != src[:-1])))
        ends = np.concatenate((starts[1:], [src.size]))
        xs, ys = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if e - s < 2:
                continue
            seg = dst[s:e]
            ia, ib = np.triu_indices(seg.size, k=1)
            xs.append(seg[ia])
            ys.append(seg[ib])
        if not xs:
            return pa.table({"x": pa.array([], type=pa.int64()),
                             "y": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64()),
                             "is_edge": pa.array([], type=pa.int64()),
                             "qq": pa.array([], type=pa.int64())})
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        g = pd.DataFrame({"x": lo, "y": hi}).groupby(
            ["x", "y"], as_index=False).size()
        xv = g["x"].to_numpy(dtype=np.int64)
        yv = g["y"].to_numpy(dtype=np.int64)
        return pa.table({
            "x": pa.array(xv), "y": pa.array(yv),
            "w": pa.array(g["size"].to_numpy(dtype=np.int64)),
            "is_edge": pa.array(np.zeros(xv.size, dtype=np.int64)),
            "qq": pa.array(((xv * 1_000_003 + yv) % P)
                           .astype(np.int64)),
        })

    def edge_probe(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "x": pa.array(a), "y": pa.array(b),
            "w": pa.array(np.zeros(a.size, dtype=np.int64)),
            "is_edge": pa.array(np.ones(a.size, dtype=np.int64)),
            "qq": pa.array(((a * 1_000_003 + b) % P).astype(np.int64)),
        })

    oriented = edges.map_batches(orient, batch_format="pyarrow")
    n_edges = int(oriented.sum("n_edges") or 0)
    wedges = (oriented
              .groupby("qs").map_groups(wedges_in_partition,
                                        batch_format="pyarrow"))
    probes = edges.map_batches(edge_probe, batch_format="pyarrow")

    def close_in_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        g = df.groupby(["x", "y"], as_index=False).agg(
            w=("w", "sum"), is_edge=("is_edge", "max"))
        tri = int(g.loc[g["is_edge"] == 1, "w"].sum())
        return pa.table({"tri": pa.array([tri], type=pa.int64())})

    tri_parts = (wedges.union(probes)
                 .groupby("qq").map_groups(close_in_partition,
                                           batch_format="pyarrow")
                 .to_pandas())
    n_tri = int(tri_parts["tri"].sum()) if not tri_parts.empty else 0
    gcc = (round_half_away(3.0 * float(n_tri) / float(n_wedges), 4)
           if n_wedges > 0 else None)
    return pa.table({
        "n_nodes": pa.array([n_nodes], type=pa.int64()),
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_wedges": pa.array([n_wedges], type=pa.int64()),
        "n_triangles": pa.array([n_tri], type=pa.int64()),
        "gcc_r": pa.array([gcc], type=pa.float64()),
    })


def anova_f(sf_dir: str):
    """(k_groups, n_total, f_r, eta2_r): one-way ANOVA of event value
    across ALL event types — the K-SAMPLE parametric test surface
    (welch_ttest compares two fixed types; this tests all k at once)
    plus the η² effect size SSB/SST.

    Exactness contract: per-type (n, Σv, Σv²) accumulate exactly over
    4-dp quantized values (the welch/group_moments scheme). The one
    order-sensitive float reduction — B = Σ_t (Σv_t)²/n_t — folds
    SEQUENTIALLY in event_type ASC order on both sides (engine:
    Python loop; oracle: recursive CTE, the ema_daily_value
    convention), so every IEEE add happens in the same sequence.
    SSB = B − S1²/N, SSW = S2 − B (scale cancels in F and η²), one
    double division each, 4-dp publish; k < 2, N ≤ k or SSW ≤ 0
    publish NULL F via the same expressions both sides.

    Scale shape: one streaming pass, ≤ k partial rows per batch, no
    shuffle at all."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "v": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({
                "et": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "s1": pa.array([], type=pa.int64()),
                "s2hh": pa.array([], type=pa.int64()),
                "s2hl": pa.array([], type=pa.int64()),
                "s2ll": pa.array([], type=pa.int64()),
            })
        v = df["v"].to_numpy(dtype=np.float64)
        vi = (np.floor(np.abs(v) * _MOM_SCALE + 0.5)
              * np.sign(v)).astype(np.int64)
        s2hh, s2hl, s2ll = _sq_split(np.abs(vi))
        g = pd.DataFrame({
            "et": df["et"].to_numpy(),
            "n": np.ones(vi.size, dtype=np.int64),
            "s1": vi, "s2hh": s2hh, "s2hl": s2hl, "s2ll": s2ll,
        }).groupby("et", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "value"])
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    if parts.empty:
        return pa.table({
            "k_groups": pa.array([0], type=pa.int64()),
            "n_total": pa.array([0], type=pa.int64()),
            "f_r": pa.array([None], type=pa.float64()),
            "eta2_r": pa.array([None], type=pa.float64()),
        })
    N = 0
    S1 = 0
    S2 = 0
    B = 0.0
    k = 0
    for et in sorted(parts["et"].unique().tolist()):
        sub = parts[parts["et"] == et]
        n = int(sub["n"].sum())
        s1 = _pyint_sum(sub["s1"])
        s2 = _sq_split_combine(sub["s2hh"], sub["s2hl"], sub["s2ll"])
        # the sequential fold — same IEEE add order as the oracle CTE
        B = B + float(s1 * s1) / float(n)
        N += n
        S1 += s1
        S2 += s2
        k += 1
    f = eta2 = None
    if k >= 2 and N > k:
        ssb = B - float(S1 * S1) / float(N)
        ssw = float(S2) - B
        sst = float(S2) - float(S1 * S1) / float(N)
        if ssw > 0.0:
            f = (ssb / float(k - 1)) / (ssw / float(N - k))
        if sst > 0.0:
            eta2 = ssb / sst

    def _opt(x):
        return pa.array([None if x is None else round_half_away(x, 4)],
                        type=pa.float64())

    return pa.table({
        "k_groups": pa.array([k], type=pa.int64()),
        "n_total": pa.array([N], type=pa.int64()),
        "f_r": _opt(f),
        "eta2_r": _opt(eta2),
    })


def conversion_lag(sf_dir: str):
    """(n_viewers, n_converted, p50_lag_s, p90_lag_s): per-user time
    from FIRST 'view' to the first 'purchase' AT OR AFTER it, exact
    discrete quantiles in whole seconds — the funnel-TIMING surface
    (funnel_depth counts who converts; this measures how long
    conversion takes, the product-analytics latency question).
    quantile_disc convention (rank ceil(n·q), 1-indexed) — all-integer
    output.

    Scale shape: ONE user-hash co-partition exchange; per partition a
    vectorized pandas pass finds each user's first view and first
    qualifying purchase, emits a distinct-lag histogram partial plus a
    viewer-count sentinel row (lag −1); one ≤|distinct lags| Sum
    exchange and a driver counting-selection walk."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        df = df[df["et"].isin(("view", "purchase"))]
        empty = pa.table({"lag_s": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if df.empty:
            return empty
        v = (df[df["et"] == "view"].groupby("user_id")["ts_us"].min())
        if v.empty:
            return empty
        p = df[df["et"] == "purchase"][["user_id", "ts_us"]].copy()
        p["vt"] = p["user_id"].map(v)
        p = p[p["vt"].notna() & (p["ts_us"] >= p["vt"])]
        first_p = p.groupby("user_id")["ts_us"].min()
        lag = (first_p - v.reindex(first_p.index)) // 1_000_000
        vals, counts = np.unique(lag.to_numpy(dtype=np.int64),
                                 return_counts=True)
        return pa.table({
            "lag_s": pa.array(np.concatenate(
                ([-1], vals)).astype(np.int64)),
            "n": pa.array(np.concatenate(
                ([v.size], counts)).astype(np.int64)),
        })

    hist = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("lag_s").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:
        return pa.table({
            "n_viewers": pa.array([0], type=pa.int64()),
            "n_converted": pa.array([0], type=pa.int64()),
            "p50_lag_s": pa.array([None], type=pa.int64()),
            "p90_lag_s": pa.array([None], type=pa.int64()),
        })
    hist = hist.sort_values("lag_s")
    n_viewers = int(hist.loc[hist["lag_s"] == -1, "n"].sum())
    hist = hist[hist["lag_s"] >= 0]
    if hist.empty:
        return pa.table({
            "n_viewers": pa.array([n_viewers], type=pa.int64()),
            "n_converted": pa.array([0], type=pa.int64()),
            "p50_lag_s": pa.array([None], type=pa.int64()),
            "p90_lag_s": pa.array([None], type=pa.int64()),
        })
    gs = hist["lag_s"].to_numpy(dtype=np.int64)
    ns = hist["n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(ns)
    n = int(cum[-1])

    def disc(q: float) -> int:
        rank = int(np.ceil(n * q)) or 1
        return int(gs[np.searchsorted(cum, rank)])

    return pa.table({
        "n_viewers": pa.array([n_viewers], type=pa.int64()),
        "n_converted": pa.array([n], type=pa.int64()),
        "p50_lag_s": pa.array([disc(0.5)], type=pa.int64()),
        "p90_lag_s": pa.array([disc(0.9)], type=pa.int64()),
    })


def daily_churn(sf_dir: str):
    """(day_us, active, retained, new_users, churned): the day-grain
    lifecycle ledger — per calendar day, distinct active users, how
    many of them were ALSO active the previous calendar day
    (retained), the complement (new_users = active − retained), and
    how many of the previous day's actives went silent (churned,
    attributed to the day they FAILED to show). ``retention_cohorts``
    answers the cohort-week question; this is the daily product-health
    dashboard (DAU churn), a different grain and a different join
    (adjacent-day self-join, not first-week anchor).

    Scale shape: ONE user-hash co-partition exchange; each partition
    dedups (user, day) and answers prev-day / next-day membership with
    two vectorized searchsorted passes over the user-sorted day array
    (a user's whole history lives in one partition, so adjacency never
    crosses partitions); partials collapse to ≤|distinct days| rows per
    partition before a tiny day-keyed Sum exchange. Days that only
    CHURN (everyone quit) still appear — the churn partial creates the
    day row, mirroring the oracle's FULL OUTER JOIN."""
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch.drop_null(), {})

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                          "a": pa.array([], type=pa.int64()),
                          "r": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = ts - (ts % DAY_US)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])))
        uid, day = uid[keep], day[keep]
        prev_same = np.concatenate(([False], uid[1:] == uid[:-1]))
        retained = prev_same & (np.concatenate(([0], day[:-1]))
                                == day - DAY_US)
        next_same = np.concatenate((uid[:-1] == uid[1:], [False]))
        cont = next_same & (np.concatenate((day[1:], [0])) == day + DAY_US)
        churn_day = day[~cont] + DAY_US
        ud = np.unique(np.concatenate((day, churn_day)))
        act = np.zeros(ud.size, dtype=np.int64)
        np.add.at(act, np.searchsorted(ud, day), 1)
        ret = np.zeros(ud.size, dtype=np.int64)
        np.add.at(ret, np.searchsorted(ud, day[retained]), 1)
        chn = np.zeros(ud.size, dtype=np.int64)
        np.add.at(chn, np.searchsorted(ud, churn_day), 1)
        return pa.table({"day_us": pa.array(ud), "a": pa.array(act),
                         "r": pa.array(ret), "c": pa.array(chn)})

    def publish(batch: pa.Table) -> pa.Table:
        a = batch["sum_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["sum_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["sum_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "day_us": batch["day_us"],
            "active": pa.array(a),
            "retained": pa.array(r),
            "new_users": pa.array(a - r),
            "churned": pa.array(c),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("day_us")
        .aggregate(Sum("a", alias_name="sum_a"),
                   Sum("r", alias_name="sum_r"),
                   Sum("c", alias_name="sum_c"))
        .map_batches(publish, batch_format="pyarrow")
    )


def kaplan_meier(sf_dir: str):
    """(lag_s, n_risk, d_events, surv_r): the Kaplan–Meier survival
    curve of view→purchase conversion — time-to-event in whole seconds
    from each user's FIRST 'view' to their first purchase at/after it,
    with never-converting viewers RIGHT-CENSORED at the corpus end
    (global max event timestamp). One row per distinct event time t:
    at-risk count n_t, events d_t, and the product-limit estimate
    S(t) = Π_{s≤t}(1 − d_s/n_s). ``conversion_lag`` reports two naive
    quantiles over converters only; KM is the censoring-correct
    estimator (the survival-analysis surface: churn modeling, time-to-
    label). The float product folds in lag ASC order on both sides —
    identical doubles multiplied in an identical sequence (the
    ema_daily_value sequencing convention), 4-dp publish.

    Scale shape: a ≤1-row-per-batch global-max pass, then ONE user-hash
    co-partition exchange; each partition reduces to a distinct-lag
    (d, c) histogram partial, a ≤|distinct seconds| Sum exchange, and a
    driver suffix-sum + cumprod over the bounded-by-time-domain
    histogram (the conversion_lag counting discipline)."""
    from ray.data.aggregate import Sum

    def max_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].drop_null().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if ts.size == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(ts.max())], type=pa.int64())})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_type"])
    mm = (src.map_batches(max_partial, batch_format="pyarrow",
                          batch_size=8192).to_pandas())
    empty = pa.table({"lag_s": pa.array([], type=pa.int64()),
                      "n_risk": pa.array([], type=pa.int64()),
                      "d_events": pa.array([], type=pa.int64()),
                      "surv_r": pa.array([], type=pa.float64())})
    if mm.empty:
        return empty
    gmax = int(mm["m"].max())

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = group.to_pandas()
        df = df[df["et"].isin(("view", "purchase"))]
        empty_p = pa.table({"t_s": pa.array([], type=pa.int64()),
                            "d": pa.array([], type=pa.int64()),
                            "c": pa.array([], type=pa.int64())})
        if df.empty:
            return empty_p
        v = df[df["et"] == "view"].groupby("user_id")["ts_us"].min()
        if v.empty:
            return empty_p
        p = df[df["et"] == "purchase"][["user_id", "ts_us"]].copy()
        p["vt"] = p["user_id"].map(v)
        p = p[p["vt"].notna() & (p["ts_us"] >= p["vt"])]
        first_p = p.groupby("user_id")["ts_us"].min()
        t_ev = ((first_p - v.reindex(first_p.index)) // 1_000_000) \
            .to_numpy(dtype=np.int64)
        cens = v[~v.index.isin(first_p.index)]
        t_cs = ((gmax - cens) // 1_000_000).to_numpy(dtype=np.int64)
        ut = np.unique(np.concatenate((t_ev, t_cs)))
        d = np.zeros(ut.size, dtype=np.int64)
        np.add.at(d, np.searchsorted(ut, t_ev), 1)
        c = d.copy()
        np.add.at(c, np.searchsorted(ut, t_cs), 1)
        return pa.table({"t_s": pa.array(ut), "d": pa.array(d),
                         "c": pa.array(c)})

    hist = (
        src.map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("t_s")
        .aggregate(Sum("d", alias_name="d"), Sum("c", alias_name="c"))
        .to_pandas()
    )
    if hist.empty:
        return empty
    hist = hist.sort_values("t_s")
    t = hist["t_s"].to_numpy(dtype=np.int64)
    d = hist["d"].to_numpy(dtype=np.int64)
    c = hist["c"].to_numpy(dtype=np.int64)
    n_risk = int(c.sum()) - np.cumsum(c) + c
    ev = d > 0
    if not ev.any():
        return empty
    surv = np.cumprod(1.0 - d[ev].astype(np.float64)
                      / n_risk[ev].astype(np.float64))
    return pa.table({
        "lag_s": pa.array(t[ev]),
        "n_risk": pa.array(n_risk[ev]),
        "d_events": pa.array(d[ev]),
        "surv_r": pa.array(_round_vec(surv, 4)),
    })


PSI_NBINS = 10


def psi_drift(sf_dir: str):
    """(n_first, n_second, n_bins_used, psi_r): population stability
    index of the event value distribution between the first and second
    halves of the observed time range — THE production drift monitor
    (did the feature distribution move between two windows?).
    PSI = Σ_bins (p₂−p₁)·ln(p₂/p₁) over PSI_NBINS equi-width bins
    spanning the GLOBAL [min, max] (the value_histogram bin expression
    verbatim), restricted to bins populated on BOTH sides (the
    standard zero-bin guard, count disclosed via n_bins_used). The
    half split is 2·ts ≥ min_ts + max_ts — pure int64 arithmetic, no
    division convention to drift. The ≤PSI_NBINS-term float fold runs
    in bin ASC order on both sides (recursive-CTE sequencing), libm
    ln on identical doubles, 4-dp publish.

    Scale shape: a ≤1-row-per-batch (min,max)×(value,ts) pass, then a
    per-batch 2×PSI_NBINS bincount partial into a ≤2·PSI_NBINS-group
    Sum — no row-level shuffle anywhere; driver folds ≤PSI_NBINS
    terms."""
    import math
    from ray.data.aggregate import Sum

    def stats_partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64()),
                             "mnt": pa.array([], type=pa.int64()),
                             "mxt": pa.array([], type=pa.int64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())]),
                         "mnt": pa.array([int(ts.min())],
                                         type=pa.int64()),
                         "mxt": pa.array([int(ts.max())],
                                         type=pa.int64())})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["value", "ts"])
    mm = (src.map_batches(stats_partial, batch_format="pyarrow",
                          batch_size=8192).to_pandas())

    def publish(n1: int, n2: int, used: int, psi) -> pa.Table:
        return pa.table({
            "n_first": pa.array([n1], type=pa.int64()),
            "n_second": pa.array([n2], type=pa.int64()),
            "n_bins_used": pa.array([used], type=pa.int64()),
            "psi_r": pa.array([psi], type=pa.float64()),
        })

    if mm.empty:
        return publish(0, 0, 0, None)
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    mnt, mxt = int(mm["mnt"].min()), int(mm["mxt"].max())
    width = hi - lo

    def bin_partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"hb": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        if width == 0.0:
            b = np.zeros(v.size, dtype=np.int64)
        else:
            b = np.minimum(np.floor((v - lo) / width * PSI_NBINS),
                           PSI_NBINS - 1).astype(np.int64)
        h = (2 * ts >= mnt + mxt).astype(np.int64)
        hb = h * PSI_NBINS + b
        counts = np.bincount(hb, minlength=2 * PSI_NBINS)
        live = np.flatnonzero(counts)
        return pa.table({"hb": pa.array(live.astype(np.int64)),
                         "n": pa.array(counts[live].astype(np.int64))})

    counted = (src.map_batches(bin_partial, batch_format="pyarrow",
                               batch_size=8192)
               .groupby("hb").aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    n = np.zeros(2 * PSI_NBINS, dtype=np.int64)
    if not counted.empty:
        n[counted["hb"].to_numpy(dtype=np.int64)] = (
            counted["n"].to_numpy(dtype=np.int64))
    n1b, n2b = n[:PSI_NBINS], n[PSI_NBINS:]
    n1, n2 = int(n1b.sum()), int(n2b.sum())
    used = 0
    s = None
    for i in range(PSI_NBINS):
        if n1b[i] > 0 and n2b[i] > 0:
            used += 1
            p1 = float(n1b[i]) / float(n1)
            p2 = float(n2b[i]) / float(n2)
            term = (p2 - p1) * math.log(p2 / p1)
            s = term if s is None else s + term
    psi = None if s is None else float(round_half_away(s, 4))
    return publish(n1, n2, used, psi)


TRIPLE_MIN_SUPPORT = 2
TRIPLE_BASKET_CAP = 128


def frequent_triples(sf_dir: str):
    """(p1, p2, p3, support): frequent 3-itemsets over order baskets —
    every ordered triple p1<p2<p3 of distinct parts co-occurring in at
    least TRIPLE_MIN_SUPPORT distinct orders. ``basket_lift`` mines
    pairs; 3-itemsets are the next apriori level (bundle discovery),
    a combinatorially different enumeration, NOT derivable from the
    pair stream.

    Scale shape: distinct (order, part) dedups map-side and
    co-locates by hash(order); each order's bounded basket enumerates
    its C(b,3) triples through a memoized combination-index gather
    (no per-triple Python), partials combine per partition, then ONE
    triple-hash exchange finishes the count and applies the support
    gate — the _order_part_pairs discipline one arity up. Baskets
    above TRIPLE_BASKET_CAP parts (C(cap,3) ≈ 341k triples) are
    skipped by design and disclosed here: TPC-H-shape baskets are
    bounded by the order's line count (≤13 observed), so the cap is
    unreachable on contract inputs; a corpus where single baskets
    exceed it needs apriori pair-pruning first."""
    import itertools

    import pandas as pd

    P = _PAIR_PARTITIONS

    def op_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "pk": batch["l_partkey"].to_numpy(zero_copy_only=False),
        }).dropna().drop_duplicates()
        ok = df["ok"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "pk": pa.array(df["pk"].to_numpy(dtype=np.int64)),
        })

    comb_cache: dict[int, np.ndarray] = {}

    def combs(m: int) -> np.ndarray:
        got = comb_cache.get(m)
        if got is None:
            got = np.array(list(itertools.combinations(range(m), 3)),
                           dtype=np.int64)
            comb_cache[m] = got
        return got

    empty_partial = pa.table({
        "p1": pa.array([], type=pa.int64()),
        "p2": pa.array([], type=pa.int64()),
        "p3": pa.array([], type=pa.int64()),
        "n": pa.array([], type=pa.int64()),
        "qq": pa.array([], type=pa.int64()),
    })

    def triples_in_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates(subset=["ok", "pk"])
        df = df.sort_values(["ok", "pk"], kind="mergesort")
        ok = df["ok"].to_numpy(dtype=np.int64)
        pk = df["pk"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], ok[1:] != ok[:-1])))
        ends = np.concatenate((starts[1:], [ok.size]))
        outs = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            b = e - s
            if b < 3 or b > TRIPLE_BASKET_CAP:
                continue
            outs.append(pk[s:e][combs(b)])
        if not outs:
            return empty_partial
        tr = np.concatenate(outs)
        g = pd.DataFrame({"p1": tr[:, 0], "p2": tr[:, 1],
                          "p3": tr[:, 2]}).groupby(
            ["p1", "p2", "p3"], as_index=False).size()
        a = g["p1"].to_numpy(dtype=np.int64)
        b2 = g["p2"].to_numpy(dtype=np.int64)
        c = g["p3"].to_numpy(dtype=np.int64)
        return pa.table({
            "p1": pa.array(a), "p2": pa.array(b2), "p3": pa.array(c),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
            "qq": pa.array(
                (((a * 1_000_003 + b2) * 1_000_003 + c) % P)
                .astype(np.int64)),
        })

    def combine(group: pa.Table) -> pa.Table:
        df = group.to_pandas().groupby(
            ["p1", "p2", "p3"], as_index=False)["n"].sum()
        df = df[df["n"] >= TRIPLE_MIN_SUPPORT]
        return pa.table({
            "p1": pa.array(df["p1"].to_numpy(dtype=np.int64)),
            "p2": pa.array(df["p2"].to_numpy(dtype=np.int64)),
            "p3": pa.array(df["p3"].to_numpy(dtype=np.int64)),
            "support": pa.array(df["n"].to_numpy(dtype=np.int64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_orderkey", "l_partkey"])
        .map_batches(op_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("q").map_groups(triples_in_partition,
                                 batch_format="pyarrow")
        .groupby("qq").map_groups(combine, batch_format="pyarrow")
    )


def state_durations(sf_dir: str):
    """(event_type, n_segments, total_us, avg_us_r): time-in-state —
    each event opens a "state" that lasts until the SAME user's next
    event (lead(ts) − ts under the (ts, event_id) total order); the
    user's final event closes nothing and is excluded, exactly like
    ``lead``'s trailing NULL. Aggregated per event_type: segment
    count, total dwell µs (exact int64), and the mean dwell
    (one double division, 4-dp publish). ``sessionize_events`` cuts
    on a gap threshold; this is the SCD-style duration ledger every
    event-sourced system needs (how long do users sit in each state?).

    Scale shape: ONE user-hash co-partition exchange; adjacency is
    per-user so the lead diff resolves locally in one lexsorted
    vectorized pass; partials collapse to ≤|types| rows per partition
    before a tiny type-keyed Sum exchange."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
            "eid": batch["event_id"].cast(pa.int64()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "tot": pa.array([], type=pa.int64())})
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size < 2:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(group["et"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        same = uid[:-1] == uid[1:]
        dur = (ts[1:] - ts[:-1])[same]
        if dur.size == 0:
            return empty
        g = pd.DataFrame({"et": et[:-1][same], "dur": dur}).groupby(
            "et", as_index=False).agg(n=("dur", "size"),
                                      tot=("dur", "sum"))
        return pa.table({
            "event_type": pa.array(g["et"].tolist(), type=pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "tot": pa.array(g["tot"].to_numpy(dtype=np.int64)),
        })

    def publish(batch: pa.Table) -> pa.Table:
        n = batch["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = batch["sum_tot"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        avg = _round_vec(tot.astype(np.float64) / n.astype(np.float64), 4)
        return pa.table({
            "event_type": batch["event_type"],
            "n_segments": pa.array(n),
            "total_us": pa.array(tot),
            "avg_us_r": pa.array(avg),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_type",
                                    "event_id"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="sum_n"),
                   Sum("tot", alias_name="sum_tot"))
        .map_batches(publish, batch_format="pyarrow")
    )


def event_trigrams(sf_dir: str):
    """(t1, t2, t3, n): third-order sequence mining — counts of every
    consecutive event-type TRIPLE inside a user's stream under the
    (ts, event_id) total order (``event_transitions`` is the bigram
    Markov surface; trigrams expose second-order structure a
    transition matrix cannot, e.g. view→click→purchase vs
    click→view→purchase). Output cardinality is ≤|types|³ — bounded
    by the type vocabulary, not the corpus.

    Scale shape: ONE user-hash co-partition exchange; triples form
    locally (two vectorized shifts, a same-user mask), collapse to
    ≤|types|³ partial rows per partition, then a tiny key-hash
    map_groups finishes the count."""
    import pandas as pd

    SEP = "\x1f"

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
            "eid": batch["event_id"].cast(pa.int64()),
        })

    empty = pa.table({"t1": pa.array([], type=pa.string()),
                      "t2": pa.array([], type=pa.string()),
                      "t3": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64()),
                      "k": pa.array([], type=pa.string())})

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size < 3:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(group["et"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        ok = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        if not ok.any():
            return empty
        g = pd.DataFrame({
            "t1": et[:-2][ok], "t2": et[1:-1][ok], "t3": et[2:][ok],
        }).groupby(["t1", "t2", "t3"], as_index=False).size()
        return pa.table({
            "t1": pa.array(g["t1"].tolist(), type=pa.string()),
            "t2": pa.array(g["t2"].tolist(), type=pa.string()),
            "t3": pa.array(g["t3"].tolist(), type=pa.string()),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
            "k": pa.array((g["t1"] + SEP + g["t2"] + SEP
                           + g["t3"]).tolist(), type=pa.string()),
        })

    def combine(group: pa.Table) -> pa.Table:
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "t1": group["t1"].slice(0, 1),
            "t2": group["t2"].slice(0, 1),
            "t3": group["t3"].slice(0, 1),
            "n": pa.array([int(n.sum())], type=pa.int64()),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_type",
                                    "event_id"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("k").map_groups(combine, batch_format="pyarrow")
    )


def type_corr_matrix(sf_dir: str):
    """(type_a, type_b, n_days, r_r): the Pearson correlation matrix
    of DAILY REVENUE between every pair of event types over the
    shared day grid (missing (day, type) cells are true zeros) —
    ``cross_corr_types`` studies ONE anointed pair at many lags; this
    is the all-pairs lag-0 covariance structure (which metrics move
    together?). Every moment (Σx, Σx², Σxy) is an EXACT integer over
    2-dp cents — Python bigints engine-side, HUGEINT oracle-side —
    so no float accumulation order exists anywhere; r is one double
    expression num/√(d1·d2) on identical ints, 4-dp publish,
    NULL for a constant series (zero variance).

    Scale shape: per-batch (type, day) cents partials collapse into a
    ≤|types|·|days| Sum exchange (calendar-bounded, like
    retention_cohorts); the driver crosses the tiny daily matrix —
    pairs × days work, both factors bounded by schema and calendar,
    not corpus."""
    import itertools
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        ok = ~np.isnan(v)
        v, ts, et = v[ok], ts[ok].astype(np.int64), et[ok]
        if v.size == 0:
            return pa.table({"et": pa.array([], type=pa.string()),
                             "d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        g = pd.DataFrame({"et": et, "d": day, "c": cents}).groupby(
            ["et", "d"], as_index=False)["c"].sum()
        return pa.table({
            "et": pa.array(g["et"].tolist(), type=pa.string()),
            "d": pa.array(g["d"].to_numpy(dtype=np.int64)),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
        })

    def combine_type(group: pa.Table) -> pa.Table:
        g = group.to_pandas().groupby(
            ["et", "d"], as_index=False)["c"].sum()
        return pa.table({
            "et": pa.array(g["et"].tolist(), type=pa.string()),
            "d": pa.array(g["d"].to_numpy(dtype=np.int64)),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
        })

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "ts", "value"])
        .map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("et")
        .map_groups(combine_type, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table({"type_a": pa.array([], type=pa.string()),
                      "type_b": pa.array([], type=pa.string()),
                      "n_days": pa.array([], type=pa.int64()),
                      "r_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    grid = daily.pivot_table(index="d", columns="et", values="c",
                             aggfunc="sum", fill_value=0).sort_index()
    types = sorted(grid.columns)
    n = len(grid)
    series = {t: [int(x) for x in grid[t].to_numpy()] for t in types}
    rows = []
    for a, b in itertools.combinations(types, 2):
        xs, ys = series[a], series[b]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        r = None
        if d1 > 0 and d2 > 0:
            r = float(round_half_away(
                float(num) / math.sqrt(float(d1) * float(d2)), 4))
        rows.append((a, b, r))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], type=pa.string()),
        "type_b": pa.array([r[1] for r in rows], type=pa.string()),
        "n_days": pa.array([n] * len(rows), type=pa.int64()),
        "r_r": pa.array([r[2] for r in rows], type=pa.float64()),
    })


WEEK_US_LTV = 7 * 86_400_000_000


def cohort_ltv(sf_dir: str):
    """(cohort_day_us, week_offset, n_buyers, revenue_r,
    cum_revenue_r): cohort lifetime value — users cohorted by the DAY
    of their first 'signup' (the retention_cohorts anchor), purchase
    revenue bucketed into week offsets from that day, and the running
    cumulative per cohort over a GAPLESS offset scaffold reaching the
    corpus end (zero-revenue weeks are explicit rows, so the curve is
    directly plottable). ``retention_cohorts`` counts who came back;
    LTV sums what they PAID — the unit-economics surface. Revenue
    accumulates as exact int64 cents (2-dp contract), one /100.0
    publish; no float order anywhere.

    Scale shape: a ≤1-row-per-batch global-max pass, ONE user-hash
    co-partition exchange (anchor + offsets + per-cell distinct-buyer
    dedup all resolve locally), ≤cohorts×weeks partials to the
    driver, which fills the calendar-bounded scaffold and cumsums
    ints."""
    import pandas as pd

    def max_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].drop_null().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if ts.size == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(ts.max())], type=pa.int64())})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_type",
                                      "value"])
    mm = (src.map_batches(max_partial, batch_format="pyarrow",
                          batch_size=8192).to_pandas())
    empty = pa.table({
        "cohort_day_us": pa.array([], type=pa.int64()),
        "week_offset": pa.array([], type=pa.int64()),
        "n_buyers": pa.array([], type=pa.int64()),
        "revenue_r": pa.array([], type=pa.float64()),
        "cum_revenue_r": pa.array([], type=pa.float64()),
    })
    if mm.empty:
        return empty
    gmax_day = int(mm["m"].max()) // DAY_US * DAY_US

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(batch["user_id"]),
                       pc.is_valid(batch["ts"]))
        batch = batch.filter(keep)
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
            "value": batch["value"],
        })

    def cells(group: pa.Table) -> pa.Table:
        empty_p = pa.table({"cd": pa.array([], type=pa.int64()),
                            "wo": pa.array([], type=pa.int64()),
                            "cents": pa.array([], type=pa.int64()),
                            "buyers": pa.array([], type=pa.int64())})
        df = group.to_pandas()
        if df.empty:
            return empty_p
        sign = df[df["et"] == "signup"]
        if sign.empty:
            return empty_p
        cd = (sign.groupby("user_id")["ts_us"].min()
              // DAY_US * DAY_US)
        p = df[(df["et"] == "purchase") & df["value"].notna()].copy()
        p["cd"] = p["user_id"].map(cd)
        p = p[p["cd"].notna()]
        if p.empty:
            return empty_p
        day = p["ts_us"].to_numpy(dtype=np.int64) // DAY_US * DAY_US
        p["cd"] = p["cd"].astype(np.int64)
        p = p[day >= p["cd"].to_numpy()]
        if p.empty:
            return empty_p
        day = p["ts_us"].to_numpy(dtype=np.int64) // DAY_US * DAY_US
        p["wo"] = (day - p["cd"].to_numpy()) // WEEK_US_LTV
        p["cents"] = np.rint(
            p["value"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        g = p.groupby(["cd", "wo"], as_index=False).agg(
            cents=("cents", "sum"), buyers=("user_id", "nunique"))
        return pa.table({
            "cd": pa.array(g["cd"].to_numpy(dtype=np.int64)),
            "wo": pa.array(g["wo"].to_numpy(dtype=np.int64)),
            "cents": pa.array(g["cents"].to_numpy(dtype=np.int64)),
            "buyers": pa.array(g["buyers"].to_numpy(dtype=np.int64)),
        })

    parts = (
        src.map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(cells, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return empty
    agg = parts.groupby(["cd", "wo"], as_index=False).sum()
    out = {"cd": [], "wo": [], "buyers": [], "rev": [], "cum": []}
    for cd, sub in agg.groupby("cd"):
        max_wo = (gmax_day - int(cd)) // WEEK_US_LTV
        cell = {int(w): (int(c), int(b)) for w, c, b in
                zip(sub["wo"], sub["cents"], sub["buyers"])}
        run = 0
        for wo in range(max_wo + 1):
            cents, buyers = cell.get(wo, (0, 0))
            run += cents
            out["cd"].append(int(cd))
            out["wo"].append(wo)
            out["buyers"].append(buyers)
            out["rev"].append(cents / 100.0)
            out["cum"].append(run / 100.0)
    return pa.table({
        "cohort_day_us": pa.array(out["cd"], type=pa.int64()),
        "week_offset": pa.array(out["wo"], type=pa.int64()),
        "n_buyers": pa.array(out["buyers"], type=pa.int64()),
        "revenue_r": pa.array(out["rev"], type=pa.float64()),
        "cum_revenue_r": pa.array(out["cum"], type=pa.float64()),
    })


def ship_lag_quantiles(sf_dir: str):
    """(n_orders, avg_lag_d_r, p50_lag_d, p90_lag_d, p99_lag_d):
    order-to-first-shipment latency — per order, whole days from
    o_orderdate to the EARLIEST l_shipdate of its lines (floor
    division, so a pre-dated shipment yields a negative lag rather
    than silently clamping), then the exact discrete p50/p90/p99 and
    the mean over all shipped orders — the fulfilment-SLA surface and
    the one entry joining the two FACT tables on orderkey to feed a
    quantile (conversion_lag's counting discipline applied to a
    fact-fact co-partition join instead of a single stream).

    Scale shape: both fact streams tag q = hash(orderkey) and UNION
    into ONE co-partition exchange (no broadcast — both sides are
    fact-sized); each partition resolves min-ship per order and the
    order-date lookup locally (an order's lines and its header share
    the partition by construction), emits a distinct-lag histogram
    partial, and a ≤|distinct days| Sum exchange plus a driver
    counting-selection walk finish — no global sort, no row-level
    driver pull. quantile_disc convention: rank ceil(n·q),
    1-indexed."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = _PAIR_PARTITIONS

    def tag_orders(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["o_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "side": pa.array(np.zeros(ok.size, dtype=np.int64)),
        })

    def tag_lines(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["l_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["l_shipdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "side": pa.array(np.ones(ok.size, dtype=np.int64)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        empty = pa.table({"lag_d": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        o = df[df["side"] == 0]
        li = df[df["side"] == 1]
        if o.empty or li.empty:
            return empty
        first_ship = li.groupby("ok")["t_us"].min()
        od = o.set_index("ok")["t_us"]
        common = first_ship.index.intersection(od.index)
        if common.empty:
            return empty
        lag = ((first_ship.loc[common].to_numpy(dtype=np.int64)
                - od.loc[common].to_numpy(dtype=np.int64))
               // DAY_US)
        vals, counts = np.unique(lag, return_counts=True)
        return pa.table({"lag_d": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"]
    ).map_batches(tag_orders, batch_format="pyarrow", batch_size=8192)
    lines = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"]
    ).map_batches(tag_lines, batch_format="pyarrow", batch_size=8192)
    hist = (
        orders.union(lines)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("lag_d").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:
        return pa.table({
            "n_orders": pa.array([0], type=pa.int64()),
            "avg_lag_d_r": pa.array([None], type=pa.float64()),
            "p50_lag_d": pa.array([None], type=pa.int64()),
            "p90_lag_d": pa.array([None], type=pa.int64()),
            "p99_lag_d": pa.array([None], type=pa.int64()),
        })
    hist = hist.sort_values("lag_d")
    gs = hist["lag_d"].to_numpy(dtype=np.int64)
    ns = hist["n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(ns)
    n = int(cum[-1])
    tot = int(np.sum(gs * ns))

    def disc(q: float) -> int:
        rank = int(np.ceil(n * q)) or 1
        return int(gs[np.searchsorted(cum, rank)])

    return pa.table({
        "n_orders": pa.array([n], type=pa.int64()),
        "avg_lag_d_r": pa.array(
            [float(round_half_away(float(tot) / float(n), 4))],
            type=pa.float64()),
        "p50_lag_d": pa.array([disc(0.5)], type=pa.int64()),
        "p90_lag_d": pa.array([disc(0.9)], type=pa.int64()),
        "p99_lag_d": pa.array([disc(0.99)], type=pa.int64()),
    })


def same_day_orders(sf_dir: str):
    """(o_custkey, order_day_us, n_orders, total_cents, min_orderkey):
    customers who placed MORE THAN ONE order on the same calendar day,
    with the day's order count, exact total cents, and the smallest
    orderkey — the duplicate-submission / fraud-signal audit
    (``fk_audit`` checks referential integrity; this checks a
    BUSINESS-rule anomaly on a composite natural key). All-integer
    output: no rounding surface at all.

    Scale shape: per-batch (cust, day) partials (count, cents-sum,
    min-key) combine map-side, co-locate by composite-key hash, and a
    per-bucket vectorized combine applies the >1 gate — output is
    bounded by the anomaly rate, not the table."""
    import pandas as pd

    P = _PAIR_PARTITIONS

    empty_p = pa.table({"ck": pa.array([], type=pa.int64()),
                        "d": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                        "cents": pa.array([], type=pa.int64()),
                        "mok": pa.array([], type=pa.int64()),
                        "kq": pa.array([], type=pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        if batch.num_rows == 0:
            return empty_p
        ck = batch["o_custkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = batch["o_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.rint(p * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        g = pd.DataFrame({"ck": ck, "d": day, "cents": cents,
                          "ok": ok}).groupby(
            ["ck", "d"], as_index=False).agg(
            n=("ok", "size"), cents=("cents", "sum"),
            mok=("ok", "min"))
        ckv = g["ck"].to_numpy(dtype=np.int64)
        dv = g["d"].to_numpy(dtype=np.int64)
        return pa.table({
            "ck": pa.array(ckv), "d": pa.array(dv),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "cents": pa.array(g["cents"].to_numpy(dtype=np.int64)),
            "mok": pa.array(g["mok"].to_numpy(dtype=np.int64)),
            "kq": pa.array(((ckv * 1_000_003 + dv) % P)
                           .astype(np.int64)),
        })

    def combine(group: pa.Table) -> pa.Table:
        g = group.to_pandas().groupby(["ck", "d"], as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"), mok=("mok", "min"))
        g = g[g["n"] > 1]
        return pa.table({
            "o_custkey": pa.array(g["ck"].to_numpy(dtype=np.int64)),
            "order_day_us": pa.array(g["d"].to_numpy(dtype=np.int64)),
            "n_orders": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "total_cents": pa.array(g["cents"].to_numpy(dtype=np.int64)),
            "min_orderkey": pa.array(g["mok"].to_numpy(dtype=np.int64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey",
                                    "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("kq").map_groups(combine, batch_format="pyarrow")
    )


HOUR_US = 3_600_000_000


def linear_interp_hourly(sf_dir: str):
    """(hour_us, revenue_r, interp): hourly purchase revenue over the
    observed hour range with GAP HOURS LINEARLY INTERPOLATED between
    their nearest observed neighbors — the imputation surface
    (``hourly_gap_fill`` scaffolds zeros; real monitoring pipelines
    impute, and interpolation needs the prev/next NON-NULL neighbor,
    i.e. IGNORE NULLS window semantics, which no other entry
    exercises). Endpoints are observed by construction (the grid spans
    min..max observed hours) so every gap is interior — no
    extrapolation branch exists. Observed rows publish exact
    cents/100.0; interpolated rows publish
    (pc + (nc−pc)·(h−pd)/(nd−pd))/100.0 — every operand an exact
    int64 cast to double in the SAME expression shape as the oracle,
    4-dp publish, interp flag 0/1.

    Scale shape: per-batch cents partials into a ≤|hours|-group Sum
    (calendar-bounded); the driver fills the scaffold and walks
    prev/next with two searchsorted passes."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = (et == "purchase") & ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        hour = ts // HOUR_US * HOUR_US
        uh, inv = np.unique(hour, return_inverse=True)
        csum = np.zeros(uh.size, dtype=np.int64)
        np.add.at(csum, inv, cents)
        return pa.table({"h": pa.array(uh), "c": pa.array(csum)})

    counted = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("h").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"hour_us": pa.array([], type=pa.int64()),
                      "revenue_r": pa.array([], type=pa.float64()),
                      "interp": pa.array([], type=pa.int64())})
    if counted.empty:
        return empty
    counted = counted.sort_values("h")
    oh = counted["h"].to_numpy(dtype=np.int64)
    oc = counted["c"].to_numpy(dtype=np.int64)
    grid = np.arange(oh[0], oh[-1] + HOUR_US, HOUR_US, dtype=np.int64)
    pos = np.searchsorted(oh, grid)
    observed = (pos < oh.size) & (oh[np.minimum(pos, oh.size - 1)]
                                  == grid)
    # prev observed index per grid row (searchsorted right − 1), next
    # observed index (searchsorted left); interior gaps have both
    prev_i = np.searchsorted(oh, grid, side="right") - 1
    next_i = np.searchsorted(oh, grid, side="left")
    rev = np.empty(grid.size, dtype=np.float64)
    rev[observed] = _round_vec(
        oc[pos[observed]].astype(np.float64) / 100.0, 4)
    gap = ~observed
    if gap.any():
        pc = oc[prev_i[gap]].astype(np.float64)
        nc = oc[next_i[gap]].astype(np.float64)
        pd_ = oh[prev_i[gap]].astype(np.float64)
        nd = oh[next_i[gap]].astype(np.float64)
        h = grid[gap].astype(np.float64)
        rev[gap] = _round_vec(
            (pc + (nc - pc) * ((h - pd_) / (nd - pd_))) / 100.0, 4)
    return pa.table({
        "hour_us": pa.array(grid),
        "revenue_r": pa.array(rev),
        "interp": pa.array(gap.astype(np.int64)),
    })


def brand_return_rate(sf_dir: str):
    """(p_brand, n_lines, n_returned, return_rate_r): lineitem return
    rate (l_returnflag = 'R') per part BRAND — the fact-dim broadcast
    join feeding a ratio (``broadcast_join_orders`` proves the
    two-hop dim broadcast; this is the merchandising-quality KPI on
    the part dimension, inner-join semantics: lines whose partkey is
    absent from part drop on both sides). Counts are exact ints; the
    rate is one double division, 4-dp publish.

    Scale shape: the part dim loads ONCE driver-side into two sorted
    arrays captured by the batch closure (broadcast, not shuffled —
    parts ≪ lineitems); each batch resolves brands via searchsorted
    and collapses to ≤|brands| partial rows before a tiny brand-keyed
    Sum exchange."""
    import pyarrow.parquet as _pq
    from ray.data.aggregate import Sum

    dim = _pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    pk = dim["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    br = np.asarray(dim["p_brand"].to_pylist(), dtype=object)
    order = np.argsort(pk)
    pk, br = pk[order], br[order]

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        batch = batch.drop_null()
        lp = batch["l_partkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rf = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        empty = pa.table({"p_brand": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "nr": pa.array([], type=pa.int64())})
        if lp.size == 0 or pk.size == 0:
            return empty
        pos = np.minimum(np.searchsorted(pk, lp), pk.size - 1)
        hit = pk[pos] == lp
        if not hit.any():
            return empty
        g = pd.DataFrame({
            "b": br[pos[hit]],
            "r": (rf[hit] == "R").astype(np.int64),
        }).groupby("b", as_index=False).agg(n=("r", "size"),
                                            nr=("r", "sum"))
        return pa.table({
            "p_brand": pa.array(g["b"].tolist(), type=pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "nr": pa.array(g["nr"].to_numpy(dtype=np.int64)),
        })

    def publish(batch: pa.Table) -> pa.Table:
        n = batch["sum_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nr = batch["sum_nr"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "p_brand": batch["p_brand"],
            "n_lines": pa.array(n),
            "n_returned": pa.array(nr),
            "return_rate_r": pa.array(_round_vec(
                nr.astype(np.float64) / n.astype(np.float64), 4)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_partkey", "l_returnflag"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("p_brand")
        .aggregate(Sum("n", alias_name="sum_n"),
                   Sum("nr", alias_name="sum_nr"))
        .map_batches(publish, batch_format="pyarrow")
    )


RFM_NTILES = 5


def _ntile_boundaries(ds, mcol: str, kcol: str, ntiles: int,
                      n_buckets: int, max_pull: int):
    """NTILE boundary rows of ``ds`` under the composite total order
    (``mcol`` ASC, ``kcol`` ASC) WITHOUT a global sort — the
    ntile_orders kernel factored out so one materialized dataset can
    be bucketed along several metrics: ``_counting_selector`` resolves
    the t−1 boundary RANKS to metric values (one histogram pass,
    memoized), then ONE tie pass pulls just the boundary-valued keys
    to break ties exactly. Returns (n, m_stars, k_stars) — assign a
    row's bucket as 1 + #boundaries strictly below it."""
    n, _lo, _hi, select = _counting_selector(ds, mcol, n_buckets,
                                             max_pull)
    if n == 0:
        return 0, None, None
    sizes = np.full(ntiles, n // ntiles, dtype=np.int64)
    sizes[: n % ntiles] += 1
    bounds_rank = np.cumsum(sizes)[:-1]
    bounds_rank = bounds_rank[bounds_rank > 0]
    m_stars = np.asarray([int(select(int(r))) for r in bounds_rank],
                         dtype=np.int64)
    uniq_m = np.unique(m_stars)

    def tie_partial(batch: pa.Table) -> pa.Table:
        m = batch[mcol].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch[kcol].to_numpy(zero_copy_only=False).astype(np.int64)
        below = np.asarray([(m < ms).sum() for ms in uniq_m],
                           dtype=np.int64)
        pos = np.searchsorted(uniq_m, m).clip(0, uniq_m.size - 1)
        hit = uniq_m[pos] == m
        return pa.table({
            "which": pa.array(np.concatenate(
                [-1 - np.arange(uniq_m.size, dtype=np.int64),
                 pos[hit]])),
            "val": pa.array(np.concatenate([below, k[hit]])),
        })

    tie = ds.map_batches(tie_partial, batch_format="pyarrow",
                         batch_size=8192).to_pandas()
    which = tie["which"].to_numpy(dtype=np.int64)
    val = tie["val"].to_numpy(dtype=np.int64)
    below_by_m = {int(uniq_m[i]): int(val[which == -1 - i].sum())
                  for i in range(uniq_m.size)}
    keys_by_m = {int(uniq_m[i]): np.sort(val[which == i])
                 for i in range(uniq_m.size)}
    k_stars = np.asarray(
        [int(keys_by_m[int(ms)][int(r) - below_by_m[int(ms)] - 1])
         for ms, r in zip(m_stars, bounds_rank)], dtype=np.int64)
    return n, m_stars, k_stars


def rfm_segments(sf_dir: str, ntiles: int = RFM_NTILES,
                 n_buckets: int = 8192, max_pull: int = 262_144):
    """(c_custkey, rec_d, n_orders, total_cents, r_score, f_score,
    m_score, rfm): the classic RFM customer segmentation — per
    customer, Recency (whole days from their LAST order day to the
    corpus-max order day), Frequency (order count) and Monetary
    (exact total cents), each bucketed into ``ntiles`` GLOBAL NTILE
    scores, plus the composite segment code r·100 + f·10 + m.
    Orientations are the business convention (score 1 = best):
    recency ASC, frequency DESC, monetary DESC, every tie broken by
    custkey ASC so both sides realize the identical total order.
    The one entry that ranks a derived PER-ENTITY aggregate along
    THREE metrics at once — ntile_orders buckets raw fact rows on one
    column; RFM buckets a groupby result on three.

    Scale shape: a ≤1-row-per-batch corpus-max pass, ONE custkey
    co-partition exchange builds the per-customer metric table
    (customers ≪ orders), then per metric the factored
    :func:`_ntile_boundaries` kernel (histogram + one tie pass, no
    global sort) broadcasts t−1 composite boundaries; score
    assignment is 3·(t−1) vectorized comparisons per batch. DESC
    metrics ride the kernel negated — same ASC machinery."""
    import pandas as pd

    P = _PAIR_PARTITIONS

    def max_partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].drop_null().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if ts.size == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(ts.max())], type=pa.int64())})

    src = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    mm = src.map_batches(max_partial, batch_format="pyarrow",
                         batch_size=8192).to_pandas()
    empty = pa.table({
        "c_custkey": pa.array([], type=pa.int64()),
        "rec_d": pa.array([], type=pa.int64()),
        "n_orders": pa.array([], type=pa.int64()),
        "total_cents": pa.array([], type=pa.int64()),
        "r_score": pa.array([], type=pa.int64()),
        "f_score": pa.array([], type=pa.int64()),
        "m_score": pa.array([], type=pa.int64()),
        "rfm": pa.array([], type=pa.int64()),
    })
    if mm.empty:
        return empty
    gmax_day = int(mm["m"].max()) // DAY_US * DAY_US

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ck = batch["o_custkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ck % P).astype(np.int64)),
            "ck": pa.array(ck),
            "last_day": pa.array(ts // DAY_US * DAY_US),
            "cents": pa.array(np.rint(p * 100.0).astype(np.int64)),
        })

    def metrics(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        if df.empty:
            return pa.table({"ck": pa.array([], type=pa.int64()),
                             "rec_d": pa.array([], type=pa.int64()),
                             "fneg": pa.array([], type=pa.int64()),
                             "mneg": pa.array([], type=pa.int64())})
        g = df.groupby("ck", as_index=False).agg(
            last=("last_day", "max"), n=("cents", "size"),
            cents=("cents", "sum"))
        return pa.table({
            "ck": pa.array(g["ck"].to_numpy(dtype=np.int64)),
            "rec_d": pa.array(
                (gmax_day - g["last"].to_numpy(dtype=np.int64))
                // DAY_US),
            "fneg": pa.array(-g["n"].to_numpy(dtype=np.int64)),
            "mneg": pa.array(-g["cents"].to_numpy(dtype=np.int64)),
        })

    ds = (src.map_batches(tag, batch_format="pyarrow", batch_size=8192)
          .groupby("q").map_groups(metrics, batch_format="pyarrow")
          .materialize())

    bounds = {}
    for col in ("rec_d", "fneg", "mneg"):
        n, ms, ks = _ntile_boundaries(ds, col, "ck", ntiles,
                                      n_buckets, max_pull)
        if n == 0:
            return empty
        bounds[col] = (ms, ks)

    def assign(batch: pa.Table) -> pa.Table:
        ck = batch["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = {}
        for col in ("rec_d", "fneg", "mneg"):
            m = batch[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            s = np.ones(m.size, dtype=np.int64)
            for bm, bk in zip(*bounds[col]):
                s += (m > bm) | ((m == bm) & (ck > bk))
            scores[col] = s
        r, f, mo = scores["rec_d"], scores["fneg"], scores["mneg"]
        return pa.table({
            "c_custkey": pa.array(ck),
            "rec_d": batch["rec_d"],
            "n_orders": pa.array(
                -batch["fneg"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "total_cents": pa.array(
                -batch["mneg"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "r_score": pa.array(r), "f_score": pa.array(f),
            "m_score": pa.array(mo),
            "rfm": pa.array(r * 100 + f * 10 + mo),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=8192)


def nation_balance_mad(sf_dir: str):
    """(n_name, n_suppliers, med_bal_r, mad_r, n_outliers): per-nation
    ROBUST dispersion of supplier account balances — exact median
    (quantile_cont convention: mean of the two middles on even n),
    median absolute deviation around it, and the count of |x − med| >
    3·MAD outliers. ``mad_outliers`` runs the global MAD over events;
    this is the GROUPED robust-statistics surface over a dimension
    table joined to its nation name (the fraud/anomaly screen per
    region). Balances are 2-dp cents → the median lattice is exact
    quarters of a cent, representable doubles everywhere; publishes
    /100.0, 4-dp.

    Scale shape: one groupby(nationkey) map_groups — groups are
    bounded by the nation dimension's fan-in (suppliers per nation,
    dimension-sized, not fact-sized); the 25-row nation name table
    broadcasts as a closure dict. Per group two numpy median passes
    and one vectorized comparison."""
    import pyarrow.parquet as _pq

    dim = _pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                         columns=["n_nationkey", "n_name"])
    names = dict(zip(dim["n_nationkey"].to_pylist(),
                     dim["n_name"].to_pylist()))

    def clean(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return pa.table({
            "nk": batch["s_nationkey"].cast(pa.int64()),
            "c": pa.array(np.rint(
                batch["s_acctbal"].to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64)),
        })

    empty = pa.table({"n_name": pa.array([], type=pa.string()),
                      "n_suppliers": pa.array([], type=pa.int64()),
                      "med_bal_r": pa.array([], type=pa.float64()),
                      "mad_r": pa.array([], type=pa.float64()),
                      "n_outliers": pa.array([], type=pa.int64())})

    def per_nation(group: pa.Table) -> pa.Table:
        nk = int(group["nk"][0].as_py())
        name = names.get(nk)
        if name is None:
            return empty
        c = np.sort(group["c"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))

        def med(a: np.ndarray) -> float:
            m = a.size // 2
            if a.size % 2:
                return float(a[m])
            return (float(a[m - 1]) + float(a[m])) / 2.0

        m0 = med(c)
        dev = np.sort(np.abs(c.astype(np.float64) - m0))
        mad = med(dev)
        nout = int((np.abs(c.astype(np.float64) - m0)
                    > 3.0 * mad).sum())
        return pa.table({
            "n_name": pa.array([name], type=pa.string()),
            "n_suppliers": pa.array([c.size], type=pa.int64()),
            "med_bal_r": pa.array(
                [float(round_half_away(m0 / 100.0, 4))]),
            "mad_r": pa.array(
                [float(round_half_away(mad / 100.0, 4))]),
            "n_outliers": pa.array([nout], type=pa.int64()),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "supplier.parquet"),
                           columns=["s_nationkey", "s_acctbal"])
        .map_batches(clean, batch_format="pyarrow", batch_size=8192)
        .groupby("nk").map_groups(per_nation, batch_format="pyarrow")
    )


def brand_price_regr(sf_dir: str):
    """(p_brand, n_parts, slope_r, intercept_r, r2_r): per-brand OLS
    of retail price (cents) on part size — the GROUPED regression
    surface (``regr_value_trend`` fits ONE global line; real
    price-architecture analysis fits one per brand and compares).
    Every moment (n, Σx, Σx², Σy, Σy², Σxy) is an EXACT integer —
    engine partials ship Σy²/Σxy as decimal strings and fold as
    Python bigints (the json_extract_stats discipline: cents² sums
    pass int64 at any corpus size), oracle uses HUGEINT — so slope,
    intercept and r² are single double expressions over identical
    integers, 4-dp publish; slope/intercept NULL for a size-constant
    brand, r² additionally NULL for a price-constant one.

    Scale shape: per-batch ≤|brands| moment partials, driver fold
    over a brand-bounded frame (25 groups) — no shuffle at all."""
    import math

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        empty = pa.table({"b": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "sx": pa.array([], type=pa.string()),
                          "sxx": pa.array([], type=pa.string()),
                          "sy": pa.array([], type=pa.string()),
                          "syy": pa.array([], type=pa.string()),
                          "sxy": pa.array([], type=pa.string())})
        if batch.num_rows == 0:
            return empty
        br = np.asarray(batch["p_brand"].to_pylist(), dtype=object)
        x = batch["p_size"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        y = np.rint(batch["p_retailprice"]
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        g = pd.DataFrame({
            "b": br, "n": 1, "sx": x, "sxx": x * x, "sy": y,
            "syy": y * y, "sxy": x * y,
        }).groupby("b", as_index=False).sum()
        return pa.table({
            "b": pa.array(g["b"].tolist(), type=pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "sx": pa.array([str(v) for v in g["sx"]],
                           type=pa.string()),
            "sxx": pa.array([str(v) for v in g["sxx"]],
                            type=pa.string()),
            "sy": pa.array([str(v) for v in g["sy"]],
                           type=pa.string()),
            "syy": pa.array([str(v) for v in g["syy"]],
                            type=pa.string()),
            "sxy": pa.array([str(v) for v in g["sxy"]],
                            type=pa.string()),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_brand", "p_size",
                                    "p_retailprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    empty = pa.table({"p_brand": pa.array([], type=pa.string()),
                      "n_parts": pa.array([], type=pa.int64()),
                      "slope_r": pa.array([], type=pa.float64()),
                      "intercept_r": pa.array([], type=pa.float64()),
                      "r2_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    acc: dict[str, list[int]] = {}
    for row in parts.itertuples():
        a = acc.setdefault(row.b, [0, 0, 0, 0, 0, 0])
        a[0] += int(row.n)
        a[1] += int(row.sx)
        a[2] += int(row.sxx)
        a[3] += int(row.sy)
        a[4] += int(row.syy)
        a[5] += int(row.sxy)
    out = {"b": [], "n": [], "sl": [], "ic": [], "r2": []}
    for b in sorted(acc):
        n, sx, sxx, sy, syy, sxy = acc[b]
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        sl = ic = r2 = None
        if d1 > 0:
            slope = float(num) / float(d1)
            sl = float(round_half_away(slope, 4))
            ic = float(round_half_away(
                float(sy) / float(n) - slope * (float(sx) / float(n)),
                4))
            if d2 > 0:
                r = float(num) / math.sqrt(float(d1) * float(d2))
                r2 = float(round_half_away(r * r, 4))
        out["b"].append(b)
        out["n"].append(n)
        out["sl"].append(sl)
        out["ic"].append(ic)
        out["r2"].append(r2)
    return pa.table({
        "p_brand": pa.array(out["b"], type=pa.string()),
        "n_parts": pa.array(out["n"], type=pa.int64()),
        "slope_r": pa.array(out["sl"], type=pa.float64()),
        "intercept_r": pa.array(out["ic"], type=pa.float64()),
        "r2_r": pa.array(out["r2"], type=pa.float64()),
    })


WEEK_ANCHOR_US = 7 * 86_400_000_000


def weekly_active_histogram(sf_dir: str):
    """(n_active_weeks, n_users): the engagement-depth distribution —
    how many users were active in exactly k distinct (epoch-anchored)
    calendar weeks. ``sliding_distinct_users`` counts users per
    window; this inverts the lens to the DISTRIBUTION of a per-entity
    aggregate (the histogram-of-a-groupby shape, the standard
    engagement-tiering input). Pure int64 everywhere.

    Scale shape: ONE user-hash co-partition exchange; distinct weeks
    per user resolve locally (a user's events share the partition),
    partials collapse to ≤|weeks| histogram rows per partition, then
    a tiny Sum exchange."""
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch.drop_null(), {})

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"n_active_weeks": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        uid = uid.astype(np.int64)
        wk = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) // WEEK_ANCHOR_US
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        keep = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])))
        uid = uid[keep]
        _, per_user = np.unique(uid, return_counts=True)
        ks, n = np.unique(per_user, return_counts=True)
        return pa.table({
            "n_active_weeks": pa.array(ks.astype(np.int64)),
            "n": pa.array(n.astype(np.int64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("n_active_weeks")
        .aggregate(Sum("n", alias_name="n_users"))
    )


def cents_tail_bias(sf_dir: str):
    """(n_values, share_00_r, share_50_r, top_tail, top_tail_n):
    round-number bias audit over the event value stream — the share
    of values ending in .00 and .50 (of |cents| mod 100) plus the
    most common tail (ties → smallest tail). Psychological-pricing /
    fabricated-data screens read exactly this (``benford_values``
    audits LEADING digits; tails are the complementary trailing-digit
    fingerprint). abs-before-mod keeps numpy's floor-mod and SQL's
    truncated % identical on any sign. Two double divisions, 4-dp.

    Scale shape: per-batch 100-bin bincount partials into a ≤100-group
    Sum — no row-level shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].drop_null().to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"tail": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        tails = np.abs(np.rint(v * 100.0).astype(np.int64)) % 100
        counts = np.bincount(tails, minlength=100)
        live = np.flatnonzero(counts)
        return pa.table({"tail": pa.array(live.astype(np.int64)),
                         "n": pa.array(counts[live].astype(np.int64))})

    hist = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("tail").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:
        return pa.table({
            "n_values": pa.array([0], type=pa.int64()),
            "share_00_r": pa.array([None], type=pa.float64()),
            "share_50_r": pa.array([None], type=pa.float64()),
            "top_tail": pa.array([None], type=pa.int64()),
            "top_tail_n": pa.array([None], type=pa.int64()),
        })
    hist = hist.sort_values("tail")
    tails = hist["tail"].to_numpy(dtype=np.int64)
    ns = hist["n"].to_numpy(dtype=np.int64)
    total = int(ns.sum())

    def share(t: int) -> float:
        i = np.searchsorted(tails, t)
        c = int(ns[i]) if i < tails.size and tails[i] == t else 0
        return float(round_half_away(float(c) / float(total), 4))

    top_i = int(np.argmax(ns))  # first max → smallest tail on ties
    return pa.table({
        "n_values": pa.array([total], type=pa.int64()),
        "share_00_r": pa.array([share(0)], type=pa.float64()),
        "share_50_r": pa.array([share(50)], type=pa.float64()),
        "top_tail": pa.array([int(tails[top_i])], type=pa.int64()),
        "top_tail_n": pa.array([int(ns[top_i])], type=pa.int64()),
    })


def label_centroid_dists(sf_dir: str):
    """(label_a, label_b, n_a, n_b, dist_r): Euclidean distances
    between per-label embedding CENTROIDS — the class-separation
    diagnostic (are labels geometrically distinct before training?).
    ``embedding_cluster`` groups by geometry; this audits the GIVEN
    labels against geometry. Per-dim means fold float64 sums (the
    embedding_dim_stats precedent: 4-dp publish absorbs sub-ulp
    merge-order drift, as that entry's hash-green history proves);
    the 64-term distance sum runs in dim order on both sides.

    Scale shape: per-batch (label × dim) sum partials — bounded by
    |labels|·dims, not rows — fold driver-side; pair distances are
    |labels|² work on a tiny matrix."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(batch["embedding"]),
                       pc.is_valid(batch["label"]))
        batch = batch.filter(keep)
        empty = pa.table({"label": pa.array([], type=pa.int64()),
                          "dim": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        lab = batch["label"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = np.asarray(batch["embedding"].to_pylist(),
                       dtype=np.float64)
        ul, inv = np.unique(lab, return_inverse=True)
        dims = m.shape[1]
        sums = np.zeros((ul.size, dims), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=ul.size)
        return pa.table({
            "label": pa.array(np.repeat(ul, dims)),
            "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64),
                                    ul.size)),
            "n": pa.array(np.repeat(counts, dims).astype(np.int64)),
            "s": pa.array(sums.ravel()),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    empty = pa.table({"label_a": pa.array([], type=pa.int64()),
                      "label_b": pa.array([], type=pa.int64()),
                      "n_a": pa.array([], type=pa.int64()),
                      "n_b": pa.array([], type=pa.int64()),
                      "dist_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    agg = parts.groupby(["label", "dim"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"))
    import itertools
    import math

    labels = sorted(agg["label"].unique())
    mus = {}
    ns = {}
    for lb in labels:
        sub = agg[agg["label"] == lb].sort_values("dim")
        # n repeats per dim — each batch contributes the same count to
        # every dim, so any dim's sum is the label's vector count
        ns[lb] = int(sub["n"].iloc[0])
        mus[lb] = sub["s"].to_numpy() / sub["n"].to_numpy()
    rows = []
    for a, b in itertools.combinations(labels, 2):
        d = mus[a] - mus[b]
        rows.append((int(a), int(b), ns[a], ns[b],
                     float(round_half_away(
                         math.sqrt(float(np.sum(d * d))), 4))))
    return pa.table({
        "label_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "label_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_a": pa.array([r[2] for r in rows], type=pa.int64()),
        "n_b": pa.array([r[3] for r in rows], type=pa.int64()),
        "dist_r": pa.array([r[4] for r in rows], type=pa.float64()),
    })


def seasonal_dow_index(sf_dir: str):
    """(dow, n_days, revenue_r, index_r): day-of-week seasonality of
    event revenue — per weekday (0 = Monday, pure epoch arithmetic
    (days + 3) % 7, no locale/timezone surface), the count of
    distinct calendar days observed, total revenue, and the
    seasonality INDEX = (dow daily average) / (overall daily
    average); 1.0 means a flat week. ``wow_growth`` compares
    week-over-week LEVELS; this extracts the repeating weekly SHAPE —
    the first step of any seasonal decomposition. Cents are exact
    ints; the index is one double expression, 4-dp.

    Scale shape: per-batch (day, cents) partials into a
    calendar-bounded day Sum; the driver folds ≤7 rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"dow": pa.array([], type=pa.int64()),
                      "n_days": pa.array([], type=pa.int64()),
                      "revenue_r": pa.array([], type=pa.float64()),
                      "index_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    d = daily["d"].to_numpy(dtype=np.int64)
    c = daily["c"].to_numpy(dtype=np.int64)
    dow = (d // DAY_US + 3) % 7
    tot_c, tot_d = int(c.sum()), int(d.size)
    out = {"dow": [], "nd": [], "rev": [], "idx": []}
    for w in sorted(set(dow.tolist())):
        m = dow == w
        cw, nw = int(c[m].sum()), int(m.sum())
        out["dow"].append(int(w))
        out["nd"].append(nw)
        out["rev"].append(cw / 100.0)
        out["idx"].append(float(round_half_away(
            (float(cw) / float(nw)) / (float(tot_c) / float(tot_d)),
            4)))
    return pa.table({
        "dow": pa.array(out["dow"], type=pa.int64()),
        "n_days": pa.array(out["nd"], type=pa.int64()),
        "revenue_r": pa.array(out["rev"], type=pa.float64()),
        "index_r": pa.array(out["idx"], type=pa.float64()),
    })


GAP_BUCKETS = 1024


def max_event_gap(sf_dir: str):
    """(gap_us, start_us, end_us): the LONGEST silence in the global
    event stream — the maximum gap between consecutive event
    timestamps corpus-wide, with its endpoints (ties → earliest
    start). The outage/liveness question, and the one entry needing
    GLOBAL adjacency without a global sort: timestamps range-bucket
    into GAP_BUCKETS fixed time slices, each slice resolves its
    internal max gap locally, and the driver stitches the ≤buckets
    BOUNDARY gaps (slice max → next slice min) — the peak_concurrency
    timeline-partition discipline applied to order statistics of
    differences. Empty or single-event corpora return 0 rows (the
    oracle's lead() emits nothing).

    Scale shape: one (min, max) pass, one range-partition exchange of
    bare int64 timestamps, per-slice vectorized diff, driver folds
    ≤GAP_BUCKETS summaries."""
    def stats(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].drop_null().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if ts.size == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"lo": pa.array([int(ts.min())], type=pa.int64()),
                         "hi": pa.array([int(ts.max())], type=pa.int64()),
                         "n": pa.array([int(ts.size)], type=pa.int64())})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["ts"])
    st = src.map_batches(stats, batch_format="pyarrow",
                         batch_size=8192).to_pandas()
    empty = pa.table({"gap_us": pa.array([], type=pa.int64()),
                      "start_us": pa.array([], type=pa.int64()),
                      "end_us": pa.array([], type=pa.int64())})
    if st.empty or int(st["n"].sum()) < 2:
        return empty
    lo, hi = int(st["lo"].min()), int(st["hi"].max())
    span = max(hi - lo, 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].drop_null().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = ((ts - lo) * GAP_BUCKETS // (span + 1)).astype(np.int64)
        return pa.table({"b": pa.array(b), "u": pa.array(ts)})

    def per_bucket(group: pa.Table) -> pa.Table:
        b = int(group["b"][0].as_py())
        u = np.sort(group["u"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        if u.size >= 2:
            d = np.diff(u)
            i = int(np.argmax(d))  # first max → earliest start
            g, s = int(d[i]), int(u[i])
        else:
            g, s = -1, -1
        return pa.table({
            "b": pa.array([b], type=pa.int64()),
            "mn": pa.array([int(u[0])], type=pa.int64()),
            "mx": pa.array([int(u[-1])], type=pa.int64()),
            "g": pa.array([g], type=pa.int64()),
            "s": pa.array([s], type=pa.int64()),
        })

    summ = (src.map_batches(bucketize, batch_format="pyarrow",
                            batch_size=8192)
            .groupby("b").map_groups(per_bucket, batch_format="pyarrow")
            .to_pandas().sort_values("b"))
    best_g, best_s = -1, -1
    prev_mx = None
    for row in summ.itertuples():
        if prev_mx is not None:
            bg = int(row.mn) - prev_mx
            if bg > best_g:
                best_g, best_s = bg, prev_mx
        if row.g > best_g:
            best_g, best_s = int(row.g), int(row.s)
        prev_mx = int(row.mx)
    return pa.table({
        "gap_us": pa.array([best_g], type=pa.int64()),
        "start_us": pa.array([best_s], type=pa.int64()),
        "end_us": pa.array([best_s + best_g], type=pa.int64()),
    })


def user_lifespan_quantiles(sf_dir: str):
    """(n_users, n_single, p50_span_s, p90_span_s, max_span_s): the
    user-lifetime distribution — per user, whole seconds between
    their FIRST and LAST event (0 for a one-event user, separately
    counted via n_single), then exact discrete quantiles over ALL
    users. ``user_gap_quantiles`` measures the rhythm WITHIN a
    lifetime; this measures the lifetime itself (the churn-horizon
    input). quantile_disc convention, all-integer output.

    Scale shape: ONE user-hash co-partition exchange, per-user
    (min, max) resolves locally, partials collapse to a distinct-span
    histogram (plus a −1 sentinel carrying the single-event count),
    then a ≤|distinct seconds| Sum exchange and a driver counting
    walk."""
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        return _user_part_table(batch.drop_null(), {})

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"span_s": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, ts = uid[order], ts[order]
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1])))
        ends = np.concatenate((starts[1:], [uid.size]))
        mins = np.minimum.reduceat(ts, starts)
        maxs = np.maximum.reduceat(ts, starts)
        span = (maxs - mins) // 1_000_000
        n_single = int((ends - starts == 1).sum())
        vals, counts = np.unique(span, return_counts=True)
        return pa.table({
            "span_s": pa.array(np.concatenate(
                ([-1], vals)).astype(np.int64)),
            "n": pa.array(np.concatenate(
                ([n_single], counts)).astype(np.int64)),
        })

    hist = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("span_s").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:
        return pa.table({
            "n_users": pa.array([0], type=pa.int64()),
            "n_single": pa.array([0], type=pa.int64()),
            "p50_span_s": pa.array([None], type=pa.int64()),
            "p90_span_s": pa.array([None], type=pa.int64()),
            "max_span_s": pa.array([None], type=pa.int64()),
        })
    hist = hist.sort_values("span_s")
    n_single = int(hist.loc[hist["span_s"] == -1, "n"].sum())
    hist = hist[hist["span_s"] >= 0]
    gs = hist["span_s"].to_numpy(dtype=np.int64)
    ns = hist["n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(ns)
    n = int(cum[-1])

    def disc(q: float) -> int:
        rank = int(np.ceil(n * q)) or 1
        return int(gs[np.searchsorted(cum, rank)])

    return pa.table({
        "n_users": pa.array([n], type=pa.int64()),
        "n_single": pa.array([n_single], type=pa.int64()),
        "p50_span_s": pa.array([disc(0.5)], type=pa.int64()),
        "p90_span_s": pa.array([disc(0.9)], type=pa.int64()),
        "max_span_s": pa.array([int(gs[-1])], type=pa.int64()),
    })


def session_funnel(sf_dir: str):
    """(n_sessions, n_with_view, n_converted, conv_rate_r): WITHIN-
    SESSION conversion — sessions are the gap-based
    ``sessionize_events`` definition (30-min splits); a session
    converts iff it contains a 'purchase' at-or-after its FIRST
    'view'. ``funnel_depth`` and ``conversion_lag`` measure the
    user-lifetime funnel; bounding the funnel to a session is the
    stricter product metric (did THIS visit convert?). The rate is
    one double division, 4-dp.

    Scale shape: ONE user-hash co-partition exchange; session
    assignment, the first-view anchor and the purchase-at-or-after
    probe all resolve locally in one sorted vectorized pass; each
    partition emits a 3-int partial."""
    import pandas as pd

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"ns": pa.array([], type=pa.int64()),
                          "nv": pa.array([], type=pa.int64()),
                          "nc": pa.array([], type=pa.int64())})
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = np.asarray(group["et"].to_pylist(), dtype=object)
        order = np.lexsort((ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        new_sess = np.empty(uid.size, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (uid[1:] != uid[:-1]) | \
            ((ts[1:] - ts[:-1]) > SESSION_GAP_US)
        sess = np.cumsum(new_sess) - 1
        df = pd.DataFrame({"s": sess, "ts": ts, "et": et})
        vt = df[df["et"] == "view"].groupby("s")["ts"].min()
        n_sessions = int(sess[-1]) + 1
        n_with_view = int(vt.size)
        p = df[df["et"] == "purchase"].copy()
        p["vt"] = p["s"].map(vt)
        conv = p[p["vt"].notna() & (p["ts"] >= p["vt"])]["s"].nunique()
        return pa.table({
            "ns": pa.array([n_sessions], type=pa.int64()),
            "nv": pa.array([n_with_view], type=pa.int64()),
            "nc": pa.array([int(conv)], type=pa.int64()),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .to_pandas()
    )
    ns = int(parts["ns"].sum()) if not parts.empty else 0
    nv = int(parts["nv"].sum()) if not parts.empty else 0
    nc = int(parts["nc"].sum()) if not parts.empty else 0
    rate = None if nv == 0 else float(round_half_away(
        float(nc) / float(nv), 4))
    return pa.table({
        "n_sessions": pa.array([ns], type=pa.int64()),
        "n_with_view": pa.array([nv], type=pa.int64()),
        "n_converted": pa.array([nc], type=pa.int64()),
        "conv_rate_r": pa.array([rate], type=pa.float64()),
    })


def hive_partition_roundtrip(sf_dir: str):
    """(event_type, n_rows): Hive-style partitioned parquet write +
    PARTITION-PRUNED read-back — events write once via
    ``Dataset.write_parquet(partition_cols=["event_type"])`` into a
    fresh scratch dir, then each ``event_type=<v>`` directory is read
    back ALONE (the reader touches only that partition's files — the
    layout a resumable 100-TB pipeline needs: one directory per key,
    skippable on restart) and counted distributedly. The roundtrip
    must reproduce the source group-by exactly — that equality IS the
    checked contract. ``csv_roundtrip``/``jsonl_roundtrip`` prove
    formats; this proves the PARTITIONED layout and the pruned read
    path.

    Scale shape: one streamed write (no driver materialization), one
    column-pruned count per partition; scratch lives under /tmp and a
    fresh directory per call keeps reruns idempotent."""
    import tempfile

    from ray.data.aggregate import Count

    out = tempfile.mkdtemp(prefix="hive_rt_", dir="/tmp")

    def clean(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"].cast(pa.string()),
        })

    src = (read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=["event_id", "event_type"])
           .map_batches(clean, batch_format="pyarrow",
                        batch_size=8192))
    src.write_parquet(out, partition_cols=["event_type"])
    import ray.data as rd

    types = sorted(d.split("=", 1)[1] for d in os.listdir(out)
                   if d.startswith("event_type="))
    rows = {"event_type": [], "n_rows": []}
    for t in types:
        n = rd.read_parquet(os.path.join(out, f"event_type={t}")) \
            .count()
        rows["event_type"].append(t)
        rows["n_rows"].append(int(n))
    return pa.table({
        "event_type": pa.array(rows["event_type"], type=pa.string()),
        "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
    })


def order_priority_sla(sf_dir: str):
    """(o_orderpriority, n_orders, p50_lag_d, p90_lag_d): the
    fulfilment SLA split by PRIORITY CLASS — order→first-shipment lag
    days (the ship_lag_quantiles definition) with exact discrete
    p50/p90 PER o_orderpriority. The ops question the global entry
    can't answer: do urgent orders actually ship faster? The grouped-
    quantile-over-a-join shape: ``group_quantiles`` buckets a raw
    column, this buckets a JOIN-derived measure.

    Scale shape: the same orderkey co-partition union; partials are
    (priority, lag, n) histogram rows — bounded by classes × calendar
    days — folded driver-side per class with the counting-selection
    walk. quantile_disc convention."""
    import pandas as pd

    P = _PAIR_PARTITIONS

    def tag_orders(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["o_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "pr": batch["o_orderpriority"].cast(pa.string()),
            "side": pa.array(np.zeros(ok.size, dtype=np.int64)),
        })

    def tag_lines(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["l_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["l_shipdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "pr": pa.array([""] * ok.size, type=pa.string()),
            "side": pa.array(np.ones(ok.size, dtype=np.int64)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        empty = pa.table({"pr": pa.array([], type=pa.string()),
                          "lag_d": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        o = df[df["side"] == 0]
        li = df[df["side"] == 1]
        if o.empty or li.empty:
            return empty
        first_ship = li.groupby("ok")["t_us"].min()
        o = o[o["ok"].isin(first_ship.index)].copy()
        if o.empty:
            return empty
        o["lag_d"] = (first_ship.loc[o["ok"]].to_numpy(dtype=np.int64)
                      - o["t_us"].to_numpy(dtype=np.int64)) // DAY_US
        g = o.groupby(["pr", "lag_d"], as_index=False).size()
        return pa.table({
            "pr": pa.array(g["pr"].tolist(), type=pa.string()),
            "lag_d": pa.array(g["lag_d"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(tag_orders, batch_format="pyarrow", batch_size=8192)
    lines = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"]
    ).map_batches(tag_lines, batch_format="pyarrow", batch_size=8192)
    parts = (
        orders.union(lines)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table({"o_orderpriority": pa.array([], type=pa.string()),
                      "n_orders": pa.array([], type=pa.int64()),
                      "p50_lag_d": pa.array([], type=pa.int64()),
                      "p90_lag_d": pa.array([], type=pa.int64())})
    if parts.empty:
        return empty
    hist = parts.groupby(["pr", "lag_d"], as_index=False)["n"].sum()
    out = {"pr": [], "n": [], "p50": [], "p90": []}
    for pr, sub in hist.groupby("pr"):
        sub = sub.sort_values("lag_d")
        gs = sub["lag_d"].to_numpy(dtype=np.int64)
        ns = sub["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(ns)
        n = int(cum[-1])
        out["pr"].append(pr)
        out["n"].append(n)
        out["p50"].append(int(gs[np.searchsorted(
            cum, int(np.ceil(n * 0.5)) or 1)]))
        out["p90"].append(int(gs[np.searchsorted(
            cum, int(np.ceil(n * 0.9)) or 1)]))
    return pa.table({
        "o_orderpriority": pa.array(out["pr"], type=pa.string()),
        "n_orders": pa.array(out["n"], type=pa.int64()),
        "p50_lag_d": pa.array(out["p50"], type=pa.int64()),
        "p90_lag_d": pa.array(out["p90"], type=pa.int64()),
    })


PURITY_K = 5


def knn_label_purity(sf_dir: str):
    """(label, n_vecs, matches, purity_r): label-noise diagnostic —
    for every vector, how many of its PURITY_K cosine nearest
    neighbors (self excluded; round-4dp sims, vec_id tiebreak — the
    knn_cosine total order) share its label; aggregated per label as
    matches / (n·K). Low purity flags mislabeled or boundary classes
    BEFORE training. ``label_centroid_dists`` audits class geometry
    at the centroid grain; purity audits it at the NEIGHBORHOOD
    grain.

    Scale shape: the corpus matrix broadcasts once (closure capture,
    the knn_cosine discipline) and every batch row scans it
    vectorized (one b×N matmul per batch, argpartition prune, exact
    composite sort only over the pruned candidates); partials
    collapse to ≤|labels| rows. At a corpus where N outgrows the
    broadcast this becomes the LSH-bucketed variant
    (``embedding_neardup``'s path) under the same contract."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "label", "embedding"])
    mask = pa.compute.and_(pa.compute.is_valid(t["embedding"]),
                           pa.compute.is_valid(t["label"]))
    t = t.filter(mask)
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    # sort the broadcast corpus by vec_id so a candidate's ARRAY INDEX
    # is its id-rank — the composite sort key below then breaks sim
    # ties by vec_id ASC without ever comparing raw (possibly huge)
    # ids
    order0 = np.argsort(ids, kind="stable")
    ids, labels, m = ids[order0], labels[order0], m[order0]
    empty = pa.table({"label": pa.array([], type=pa.int64()),
                      "n_vecs": pa.array([], type=pa.int64()),
                      "matches": pa.array([], type=pa.int64()),
                      "purity_r": pa.array([], type=pa.float64())})
    if ids.size < 2:
        return empty
    norms = np.sqrt((m * m).sum(axis=1))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keep = pa.compute.and_(
            pa.compute.is_valid(batch["embedding"]),
            pa.compute.is_valid(batch["label"]))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "mt": pa.array([], type=pa.int64())})
        bids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        blab = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bm = np.asarray(batch["embedding"].to_pylist(),
                        dtype=np.float64)
        bn = np.sqrt((bm * bm).sum(axis=1))
        sims = (bm @ m.T) / (bn[:, None] * norms[None, :])
        kk = min(PURITY_K, ids.size - 1)
        # raw-sim argpartition prunes each row to kk+65 candidates
        # (the repo's knn margin convention — knn_cosine prunes on raw
        # sims before rounding), then ONLY the pruned set rounds and
        # sorts under the exact composite key (−sim·1e4 << 33) +
        # id-rank: 4-dp sims are exact multiples of 1e-4 in [−1, 1],
        # and the corpus is vec_id-sorted so the column index IS the
        # tiebreak; self rows get +inf-equivalent keys
        take = min(ids.size, kk + 65)
        part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        ps = np.take_along_axis(sims, part, axis=1)
        s_scaled = np.rint(
            _round_vec(ps.ravel()).reshape(ps.shape) * 1e4
        ).astype(np.int64)
        key = ((-s_scaled) << 33) + part
        key[ids[part] == bids[:, None]] = np.iinfo(np.int64).max
        osort = np.argsort(key, axis=1, kind="stable")[:, :kk]
        top = np.take_along_axis(part, osort, axis=1)
        mt = (labels[top] == blab[:, None]).sum(axis=1) \
            .astype(np.int64)
        g = pd.DataFrame({"label": blab, "n": 1, "mt": mt}).groupby(
            "label", as_index=False).sum()
        return pa.table({
            "label": pa.array(g["label"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "mt": pa.array(g["mt"].to_numpy(dtype=np.int64)),
        })

    from ray.data.aggregate import Sum

    agg = (
        read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("mt", alias_name="mt"))
        .to_pandas().sort_values("label")
    )
    if agg.empty:
        return empty
    n = agg["n"].to_numpy(dtype=np.int64)
    mt = agg["mt"].to_numpy(dtype=np.int64)
    return pa.table({
        "label": pa.array(agg["label"].to_numpy(dtype=np.int64)),
        "n_vecs": pa.array(n),
        "matches": pa.array(mt),
        "purity_r": pa.array(_round_vec(
            mt.astype(np.float64)
            / (n * PURITY_K).astype(np.float64), 4)),
    })


def revenue_concentration(sf_dir: str, n_buckets: int = 8192,
                          max_pull: int = 262_144):
    """(n_customers, total_r, top1_share_r, top10_share_r): revenue
    Pareto concentration — the share of total order revenue owned by
    the top ceil(1%·n) and top ceil(10%·n) customers under the exact
    (spend DESC, custkey ASC) total order. ``gini_activity``
    compresses inequality to one coefficient; the top-k% share is the
    operational KPI executives actually quote. Spend is exact cents;
    each share is one double division of exact ints, 4-dp.

    Scale shape: ONE custkey co-partition builds per-customer cents;
    the counting-selector resolves each boundary RANK to a (cents,
    custkey) composite (histogram pass + one boundary-tie pull, no
    global sort), then one vectorized pass sums cents strictly above
    the boundary plus the boundary row itself — prefix SUM by
    selection, the _ntile_boundaries discipline pointed at an
    aggregate instead of a bucket id."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = _PAIR_PARTITIONS

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ck = batch["o_custkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ck % P).astype(np.int64)),
            "ck": pa.array(ck),
            "cents": pa.array(np.rint(p * 100.0).astype(np.int64)),
        })

    def per_customer(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        if df.empty:
            return pa.table({"ck": pa.array([], type=pa.int64()),
                             "mneg": pa.array([], type=pa.int64())})
        g = df.groupby("ck", as_index=False)["cents"].sum()
        return pa.table({
            "ck": pa.array(g["ck"].to_numpy(dtype=np.int64)),
            # negate so the selector's ASC order IS spend DESC; ck
            # tiebreak stays ASC on both sides
            "mneg": pa.array(-g["cents"].to_numpy(dtype=np.int64)),
        })

    ds = (
        read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_custkey", "o_totalprice"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_customer, batch_format="pyarrow")
        .materialize()
    )
    empty = pa.table({
        "n_customers": pa.array([0], type=pa.int64()),
        "total_r": pa.array([None], type=pa.float64()),
        "top1_share_r": pa.array([None], type=pa.float64()),
        "top10_share_r": pa.array([None], type=pa.float64()),
    })
    n, _lo, _hi, select = _counting_selector(ds, "mneg", n_buckets,
                                             max_pull)
    if n == 0:
        return empty

    def total_partial(batch: pa.Table) -> pa.Table:
        m = batch["mneg"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"s": pa.array([int((-m).sum())],
                                       type=pa.int64())})

    total = int(ds.map_batches(total_partial, batch_format="pyarrow",
                               batch_size=8192).to_pandas()["s"].sum())

    def top_share(p: float) -> float:
        k = int(np.ceil(n * p)) or 1
        mstar = int(select(k))  # k-th smallest mneg = k-th biggest spend
        # boundary custkey: ties at mstar resolve by ck ASC; pull them
        def tie_partial(batch: pa.Table) -> pa.Table:
            m = batch["mneg"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ck = batch["ck"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            below = int((m < mstar).sum())
            hit = m == mstar
            above_sum = int((-m[m < mstar]).sum())
            return pa.table({
                "below": pa.array([below], type=pa.int64()),
                "above_sum": pa.array([above_sum], type=pa.int64()),
                "ties": pa.array([int(hit.sum())], type=pa.int64()),
            })

        tp = ds.map_batches(tie_partial, batch_format="pyarrow",
                            batch_size=8192).to_pandas()
        below = int(tp["below"].sum())
        above_sum = int(tp["above_sum"].sum())
        n_tie_take = k - below  # boundary-valued customers included
        top_sum = above_sum + n_tie_take * (-mstar)
        return float(round_half_away(float(top_sum) / float(total), 4))

    return pa.table({
        "n_customers": pa.array([n], type=pa.int64()),
        "total_r": pa.array([total / 100.0], type=pa.float64()),
        "top1_share_r": pa.array([top_share(0.01)], type=pa.float64()),
        "top10_share_r": pa.array([top_share(0.10)],
                                  type=pa.float64()),
    })


def daily_value_bands(sf_dir: str):
    """(day_us, n_events, p10_r, p50_r, p90_r): per-day exact discrete
    quantile BANDS of the event value stream — the percentile-ribbon
    time series every monitoring dashboard draws.
    ``group_quantiles`` buckets by type; bands bucket by DAY and feed
    plots. Values quantize to exact cents; quantile_disc convention
    (rank ceil(n·q)); publishes cents/100.0.

    Scale shape: per-batch (day, cent) histogram partials into one
    Sum exchange bounded by days × distinct cents (the value DOMAIN,
    not the corpus); the driver walks each day's histogram."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        g = pd.DataFrame({
            "d": ts // DAY_US * DAY_US,
            "c": np.rint(v * 100.0).astype(np.int64),
        }).groupby(["d", "c"], as_index=False).size()
        return pa.table({
            "d": pa.array(g["d"].to_numpy(dtype=np.int64)),
            "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    hist = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d")
        .map_groups(lambda g: pa.Table.from_pandas(
            g.to_pandas().groupby(["d", "c"], as_index=False)["n"]
            .sum(), preserve_index=False), batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64()),
                      "p10_r": pa.array([], type=pa.float64()),
                      "p50_r": pa.array([], type=pa.float64()),
                      "p90_r": pa.array([], type=pa.float64())})
    if hist.empty:
        return empty
    out = {"d": [], "n": [], "p10": [], "p50": [], "p90": []}
    for d, sub in hist.groupby("d"):
        sub = sub.sort_values("c")
        cs = sub["c"].to_numpy(dtype=np.int64)
        ns = sub["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(ns)
        n = int(cum[-1])

        def disc(q: float) -> float:
            rank = int(np.ceil(n * q)) or 1
            return int(cs[np.searchsorted(cum, rank)]) / 100.0

        out["d"].append(int(d))
        out["n"].append(n)
        out["p10"].append(disc(0.1))
        out["p50"].append(disc(0.5))
        out["p90"].append(disc(0.9))
    return pa.table({
        "day_us": pa.array(out["d"], type=pa.int64()),
        "n_events": pa.array(out["n"], type=pa.int64()),
        "p10_r": pa.array(out["p10"], type=pa.float64()),
        "p50_r": pa.array(out["p50"], type=pa.float64()),
        "p90_r": pa.array(out["p90"], type=pa.float64()),
    })


def multi_format_union(sf_dir: str):
    """(event_type, n_rows): heterogeneous-SOURCE union — events split
    three ways by event_id mod 3, written as parquet, CSV and JSONL
    respectively into a scratch dir, then read back through three
    different readers, UNIONed into one Dataset and counted. The
    federated-ingest surface (one pipeline over mixed-format
    landings); the roundtrip must reproduce the source group-by
    exactly. ``csv_roundtrip``/``jsonl_roundtrip`` prove each format
    alone; this proves the union plan over all three.

    Scale shape: three streamed writes, three streamed reads, one
    union (no barrier beyond the final ≤|types| aggregate)."""
    import tempfile

    import ray.data as rd
    from ray.data.aggregate import Count

    out = tempfile.mkdtemp(prefix="multifmt_", dir="/tmp")

    def clean(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "event_type": batch["event_type"].cast(pa.string()),
        })

    src = (read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=["event_id", "event_type"])
           .map_batches(clean, batch_format="pyarrow",
                        batch_size=8192))

    def part(i: int):
        def keep(batch: pa.Table, i=i) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(eid % 3 == i))

        return src.map_batches(keep, batch_format="pyarrow",
                               batch_size=8192)

    os.makedirs(f"{out}/pq")
    os.makedirs(f"{out}/csv")
    os.makedirs(f"{out}/jsonl")
    part(0).write_parquet(f"{out}/pq")
    part(1).write_csv(f"{out}/csv")
    part(2).write_json(f"{out}/jsonl")

    def renorm(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"].cast(pa.string()),
        })

    u = (rd.read_parquet(f"{out}/pq")
         .map_batches(renorm, batch_format="pyarrow")
         .union(rd.read_csv(f"{out}/csv")
                .map_batches(renorm, batch_format="pyarrow"))
         .union(rd.read_json(f"{out}/jsonl")
                .map_batches(renorm, batch_format="pyarrow")))
    agg = u.groupby("event_type").count().to_pandas() \
        .sort_values("event_type")
    ncol = [c for c in agg.columns if c != "event_type"][0]
    return pa.table({
        "event_type": pa.array(agg["event_type"].tolist(),
                               type=pa.string()),
        "n_rows": pa.array(agg[ncol].to_numpy(dtype=np.int64)),
    })


BOLL_WINDOW = 7
BOLL_K = 2


def bollinger_bands(sf_dir: str):
    """(day_us, revenue_r, mean_r, upper_r, lower_r): Bollinger
    envelope over daily revenue — trailing-BOLL_WINDOW rolling mean ±
    BOLL_K·sample-std on the zero-filled day grid.
    ``rolling_median_value`` gives the robust center; Bollinger adds
    the rolling SECOND moment, the volatility channel every anomaly
    dashboard overlays. Window sums (Σc, Σc²) are exact ints (cents²
    fits: the window is ≤7 calendar days); mean and std are single
    double expressions over those ints — std = √((wΣc²−(Σc)²)/
    (w·(w−1))) — identical on both sides, 4-dp publish. Early days
    use the ACTUAL frame length w_i = min(i+1, 7) (ROWS 6 PRECEDING
    semantics); on the 1-row frame sample std is undefined and the
    bands collapse to the mean (σ ≔ 0, NULL-free output). Σc² folds as Python objects engine-side and HUGEINT
    oracle-side — cents² clears int64 only because the window is
    bounded, so neither side trusts it.

    Scale shape: daily cents via one calendar-bounded Sum; the
    driver's rolling pass is over the day frame (the
    rolling_median_value discipline)."""
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "revenue_r": pa.array([], type=pa.float64()),
                      "mean_r": pa.array([], type=pa.float64()),
                      "upper_r": pa.array([], type=pa.float64()),
                      "lower_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    out = {"d": [], "rev": [], "mean": [], "up": [], "lo": []}
    for i in range(grid.size):
        w = min(i + 1, BOLL_WINDOW)
        win = c[i - w + 1:i + 1]
        s1 = int(win.sum())
        s2 = int((win.astype(object) * win.astype(object)).sum())
        mean = float(s1) / float(w)
        out["d"].append(int(grid[i]))
        out["rev"].append(int(c[i]) / 100.0)
        out["mean"].append(float(round_half_away(mean / 100.0, 4)))
        if w == 1:
            # sample std undefined on a 1-row frame: bands collapse to
            # the mean (σ ≔ 0) so the output stays NULL-free (the
            # driver's value compare treats NaN ≠ NaN)
            out["up"].append(float(round_half_away(mean / 100.0, 4)))
            out["lo"].append(float(round_half_away(mean / 100.0, 4)))
        else:
            var = (float(w) * float(s2) - float(s1) * float(s1)) \
                / (float(w) * float(w - 1))
            sd = math.sqrt(var) if var > 0.0 else 0.0
            out["up"].append(float(round_half_away(
                (mean + BOLL_K * sd) / 100.0, 4)))
            out["lo"].append(float(round_half_away(
                (mean - BOLL_K * sd) / 100.0, 4)))
    return pa.table({
        "day_us": pa.array(out["d"], type=pa.int64()),
        "revenue_r": pa.array(out["rev"], type=pa.float64()),
        "mean_r": pa.array(out["mean"], type=pa.float64()),
        "upper_r": pa.array(out["up"], type=pa.float64()),
        "lower_r": pa.array(out["lo"], type=pa.float64()),
    })


def basket_size_dist(sf_dir: str):
    """(n_parts, n_orders): the basket-size distribution — how many
    orders contain exactly k DISTINCT parts. The degree histogram of
    the order→part bipartite graph, the sanity input every
    market-basket analysis (basket_lift, frequent_triples) should be
    read against — and the profiling answer to "is pair/triple
    enumeration bounded?". Pure int64.

    Scale shape: distinct (order, part) dedups map-side, ONE
    order-hash co-partition finishes the per-order distinct count
    locally, partials collapse to ≤|max basket| histogram rows per
    partition, tiny Sum exchange."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = _PAIR_PARTITIONS

    def op_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ok": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "pk": batch["l_partkey"].to_numpy(zero_copy_only=False),
        }).dropna().drop_duplicates()
        ok = df["ok"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "pk": pa.array(df["pk"].to_numpy(dtype=np.int64)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates(subset=["ok", "pk"])
        if df.empty:
            return pa.table({"n_parts": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        sizes = df.groupby("ok")["pk"].size().to_numpy()
        ks, n = np.unique(sizes, return_counts=True)
        return pa.table({
            "n_parts": pa.array(ks.astype(np.int64)),
            "n": pa.array(n.astype(np.int64)),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_orderkey", "l_partkey"])
        .map_batches(op_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("n_parts")
        .aggregate(Sum("n", alias_name="n_orders"))
    )


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def holt_trend(sf_dir: str):
    """(day_us, x_r, level_r, trend_r): Holt double exponential
    smoothing over the zero-filled daily revenue series — the COUPLED
    two-variable linear recurrence (level ℓ_t = α·x_t + (1−α)·(ℓ_{t−1}
    + b_{t−1}); trend b_t = β·(ℓ_t − ℓ_{t−1}) + (1−β)·b_{t−1};
    ℓ_0 = x_0, b_0 = x_1 − x_0, or 0 on a one-day series).
    ``ema_daily_value`` proves the one-variable recurrence; Holt adds
    the state COUPLING a recursive CTE must carry as a tuple — the
    forecasting-baseline surface. Every step is the identical IEEE
    double sequence on both sides (x = exact cents / 100.0), 4-dp
    publish.

    Scale shape: daily cents via one calendar-bounded Sum; the driver
    scan is over the day frame (ema's disclosed discipline — the
    affine-composition two-pass is the unbounded-series path)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "x_r": pa.array([], type=pa.float64()),
                      "level_r": pa.array([], type=pa.float64()),
                      "trend_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    x = c.astype(np.float64) / 100.0
    a, b = HOLT_ALPHA, HOLT_BETA
    lev = x[0]
    tr = (x[1] - x[0]) if x.size > 1 else 0.0
    out_l, out_t = [lev], [tr]
    for i in range(1, x.size):
        prev = lev
        lev = a * x[i] + (1.0 - a) * (lev + tr)
        tr = b * (lev - prev) + (1.0 - b) * tr
        out_l.append(lev)
        out_t.append(tr)
    return pa.table({
        "day_us": pa.array(grid),
        "x_r": pa.array(_round_vec(x, 4)),
        "level_r": pa.array(_round_vec(np.asarray(out_l), 4)),
        "trend_r": pa.array(_round_vec(np.asarray(out_t), 4)),
    })


def segment_value_cv(sf_dir: str):
    """(c_mktsegment, n_orders, mean_r, cv_r): order-value dispersion
    per MARKET SEGMENT — the coefficient of variation (sample
    std / mean) of order totals after a customer-dimension broadcast
    join. ``group_moments`` proves grouped moments on a raw fact
    column; this computes them on a DIM-ATTRIBUTED measure and
    publishes the scale-free ratio analysts compare across segments.
    Moments are exact ints (decimal-string partials, Python-bigint
    fold — cents² clears int64 at any N), HUGEINT oracle-side; mean
    and cv are single double expressions, 4-dp; cv NULL when n < 2 or
    mean = 0.

    Scale shape: the customer→segment map broadcasts once (sorted
    arrays, searchsorted per batch); ≤|segments| moment partials, no
    shuffle at all."""
    import math

    import pandas as pd
    import pyarrow.parquet as _pq

    dim = _pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"]) \
        .drop_null()
    ck = dim["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    seg = np.asarray(dim["c_mktsegment"].to_pylist(), dtype=object)
    order0 = np.argsort(ck)
    ck, seg = ck[order0], seg[order0]

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        empty = pa.table({"s": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "s1": pa.array([], type=pa.string()),
                          "s2": pa.array([], type=pa.string())})
        if batch.num_rows == 0 or ck.size == 0:
            return empty
        oc = batch["o_custkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ck, oc), ck.size - 1)
        hit = ck[pos] == oc
        if not hit.any():
            return empty
        cents = np.rint(p[hit] * 100.0).astype(np.int64)
        g = pd.DataFrame({"s": seg[pos[hit]], "n": 1, "s1": cents,
                          "s2": cents.astype(object) ** 2}).groupby(
            "s", as_index=False).sum()
        return pa.table({
            "s": pa.array(g["s"].tolist(), type=pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "s1": pa.array([str(v) for v in g["s1"]],
                           type=pa.string()),
            "s2": pa.array([str(v) for v in g["s2"]],
                           type=pa.string()),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    empty = pa.table({"c_mktsegment": pa.array([], type=pa.string()),
                      "n_orders": pa.array([], type=pa.int64()),
                      "mean_r": pa.array([], type=pa.float64()),
                      "cv_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    acc: dict[str, list[int]] = {}
    for row in parts.itertuples():
        a = acc.setdefault(row.s, [0, 0, 0])
        a[0] += int(row.n)
        a[1] += int(row.s1)
        a[2] += int(row.s2)
    out = {"s": [], "n": [], "mean": [], "cv": []}
    for s in sorted(acc):
        n, s1, s2 = acc[s]
        mean = float(s1) / float(n)
        cv = None
        if n > 1 and s1 != 0:
            var = (float(n) * float(s2) - float(s1) * float(s1)) \
                / (float(n) * float(n - 1))
            sd = math.sqrt(var) if var > 0.0 else 0.0
            cv = float(round_half_away(sd / mean, 4))
        out["s"].append(s)
        out["n"].append(n)
        out["mean"].append(float(round_half_away(mean / 100.0, 4)))
        out["cv"].append(cv)
    return pa.table({
        "c_mktsegment": pa.array(out["s"], type=pa.string()),
        "n_orders": pa.array(out["n"], type=pa.int64()),
        "mean_r": pa.array(out["mean"], type=pa.float64()),
        "cv_r": pa.array(out["cv"], type=pa.float64()),
    })


def last_touch_attribution(sf_dir: str):
    """(attributed_type, n_purchases, revenue_r): last-touch
    attribution — every 'purchase' credits the SAME user's most
    recent PRECEDING non-purchase event (strictly before under the
    (ts, event_id) total order); purchases with no prior touch drop.
    The marketing-attribution surface: ``asof_join_events`` proves
    the row-level as-of lookup between two anointed types; this is
    the any-type attribution AGGREGATE (which channel gets credit for
    revenue?). Revenue folds as exact cents, one /100.0 publish.

    Scale shape: ONE user-hash co-partition exchange; the per-user
    last-touch resolves with a segmented forward-fill
    (maximum.accumulate over masked indices — no per-row Python),
    partials collapse to ≤|types| rows before a tiny Sum exchange."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        cents = np.rint(batch["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
            "eid": batch["event_id"].cast(pa.int64()),
            "cents": pa.array(cents),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({"attributed_type": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "cents": pa.array([], type=pa.int64())})
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = group["cents"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = np.asarray(group["et"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid, cents, et = uid[order], cents[order], et[order]
        n = uid.size
        idx = np.arange(n, dtype=np.int64)
        touch = np.where(et != "purchase", idx, -1)
        # segmented forward-fill: reset the running max at each new
        # user by lifting indices with a per-segment offset
        seg_start = np.concatenate(
            ([0], np.flatnonzero(uid[1:] != uid[:-1]) + 1))
        seg_of = np.repeat(np.arange(seg_start.size, dtype=np.int64),
                           np.diff(np.concatenate((seg_start, [n]))))
        base = seg_start[seg_of]
        # one global maximum.accumulate serves every segment: keys are
        # lifted by segment·BIG so a previous segment's fill can never
        # win inside the current one
        BIG = np.int64(n + 1)
        keyed = np.where(touch >= 0, seg_of * BIG + (touch - base),
                         np.int64(-1))
        run = np.maximum.accumulate(keyed)
        valid = (run >= seg_of * BIG) & (run != -1)
        src = np.where(valid, run - seg_of * BIG + base, -1)
        is_p = et == "purchase"
        m = is_p & (src >= 0) & (src < idx)
        if not m.any():
            return empty
        g = pd.DataFrame({
            "t": et[src[m]],
            "n": 1,
            "cents": cents[m],
        }).groupby("t", as_index=False).sum()
        return pa.table({
            "attributed_type": pa.array(g["t"].tolist(),
                                        type=pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "cents": pa.array(g["cents"].to_numpy(dtype=np.int64)),
        })

    def publish(batch: pa.Table) -> pa.Table:
        c = batch["sum_cents"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "attributed_type": batch["attributed_type"],
            "n_purchases": batch["sum_n"],
            "revenue_r": pa.array(c.astype(np.float64) / 100.0),
        })

    return (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "event_type",
                                    "event_id", "value"])
        .map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
        .groupby("attributed_type")
        .aggregate(Sum("n", alias_name="sum_n"),
                   Sum("cents", alias_name="sum_cents"))
        .map_batches(publish, batch_format="pyarrow")
    )


def scd2_intervals(sf_dir: str):
    """(user_id, event_type, valid_from_us, valid_to_us): the SCD
    type-2 reconstruction — each event opens a state VALIDITY
    interval [ts, next-event ts) under the (ts, event_id) total
    order; the user's final state closes at the corpus end (global
    max event timestamp), so every interval is closed and the output
    is NULL-free. ``state_durations`` aggregates these into dwell
    totals; the raw interval table IS the slowly-changing-dimension
    surface (point-in-time joins, history reconstruction,
    ``latest_events``' full history complement). One row per event —
    a Dataset, never a driver pull.

    Scale shape: a ≤1-row-per-batch global-max pass, then ONE
    user-hash co-partition exchange; adjacency is per-user so the
    lead(ts) resolves locally in a lexsorted vectorized pass."""
    def max_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].drop_null().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if ts.size == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(ts.max())], type=pa.int64())})

    src = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_type",
                                      "event_id"])
    mm = src.map_batches(max_partial, batch_format="pyarrow",
                         batch_size=8192).to_pandas()
    empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                      "event_type": pa.array([], type=pa.string()),
                      "valid_from_us": pa.array([], type=pa.int64()),
                      "valid_to_us": pa.array([], type=pa.int64())})
    if mm.empty:
        return empty
    gmax = int(mm["m"].max())

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        return _user_part_table(batch, {
            "et": batch["event_type"].cast(pa.string()),
            "eid": batch["event_id"].cast(pa.int64()),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        uid = uid.astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = np.asarray(group["et"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        nxt = np.empty(uid.size, dtype=np.int64)
        same = uid[:-1] == uid[1:]
        nxt[:-1] = np.where(same, ts[1:], gmax)
        nxt[-1] = gmax
        return pa.table({
            "user_id": pa.array(uid),
            "event_type": pa.array(et.tolist(), type=pa.string()),
            "valid_from_us": pa.array(ts),
            "valid_to_us": pa.array(nxt),
        })

    return (
        src.map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition, batch_format="pyarrow")
    )


def label_silhouette(sf_dir: str):
    """(label, n_vecs, mean_sil_r): centroid-based (simplified)
    silhouette of the GIVEN labels under cosine distance — per
    vector, a = distance to its OWN label centroid, b = distance to
    the NEAREST other centroid, s = (b − a)/max(a, b); averaged per
    label. The single-number separation score sitting between
    ``label_centroid_dists`` (geometry only) and
    ``knn_label_purity`` (neighborhoods only): high purity with low
    silhouette flags compact-but-adjacent classes. Degenerate rows
    (max(a, b) = 0) drop on both sides; a single-label corpus emits
    nothing (no "other" centroid exists). Mean publishes 4-dp — the
    embedding_dim_stats precedent absorbs float merge-order drift.

    Scale shape: one bounded (label × dim) centroid-partial pass
    (driver-folded — labels × dims, never rows), then the tiny
    centroid matrix broadcasts and every batch scores vectorized
    (one b×L matmul); partials collapse to ≤|labels| rows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def cpartial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["embedding"]),
                       pc.is_valid(batch["label"]))
        batch = batch.filter(keep)
        empty = pa.table({"label": pa.array([], type=pa.int64()),
                          "dim": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty
        lab = batch["label"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = np.asarray(batch["embedding"].to_pylist(),
                       dtype=np.float64)
        ul, inv = np.unique(lab, return_inverse=True)
        dims = m.shape[1]
        sums = np.zeros((ul.size, dims), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=ul.size)
        return pa.table({
            "label": pa.array(np.repeat(ul, dims)),
            "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64),
                                    ul.size)),
            "n": pa.array(np.repeat(counts, dims).astype(np.int64)),
            "s": pa.array(sums.ravel()),
        })

    src = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "label", "embedding"])
    parts = (src.map_batches(cpartial, batch_format="pyarrow",
                             batch_size=4096).to_pandas())
    empty = pa.table({"label": pa.array([], type=pa.int64()),
                      "n_vecs": pa.array([], type=pa.int64()),
                      "mean_sil_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    agg = parts.groupby(["label", "dim"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"))
    labels_u = np.asarray(sorted(agg["label"].unique()),
                          dtype=np.int64)
    if labels_u.size < 2:
        return empty
    dims = int(agg["dim"].max()) + 1
    C = np.zeros((labels_u.size, dims), dtype=np.float64)
    for i, lb in enumerate(labels_u):
        sub = agg[agg["label"] == lb].sort_values("dim")
        C[i] = sub["s"].to_numpy() / sub["n"].to_numpy()
    cn = np.sqrt((C * C).sum(axis=1))

    def score(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["embedding"]),
                       pc.is_valid(batch["label"]))
        batch = batch.filter(keep)
        empty_p = pa.table({"label": pa.array([], type=pa.int64()),
                            "n": pa.array([], type=pa.int64()),
                            "ssum": pa.array([], type=pa.float64())})
        if batch.num_rows == 0:
            return empty_p
        lab = batch["label"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bm = np.asarray(batch["embedding"].to_pylist(),
                        dtype=np.float64)
        bn = np.sqrt((bm * bm).sum(axis=1))
        dd = 1.0 - (bm @ C.T) / (bn[:, None] * cn[None, :])
        own_idx = np.searchsorted(labels_u, lab)
        rows = np.arange(lab.size)
        a = dd[rows, own_idx]
        dd_other = dd.copy()
        dd_other[rows, own_idx] = np.inf
        b = dd_other.min(axis=1)
        mx = np.maximum(a, b)
        ok = mx > 0.0
        if not ok.any():
            return empty_p
        sil = (b[ok] - a[ok]) / mx[ok]
        lo = lab[ok]
        ul, inv = np.unique(lo, return_inverse=True)
        ssum = np.zeros(ul.size, dtype=np.float64)
        np.add.at(ssum, inv, sil)
        return pa.table({
            "label": pa.array(ul),
            "n": pa.array(np.bincount(inv, minlength=ul.size)
                          .astype(np.int64)),
            "ssum": pa.array(ssum),
        })

    agg2 = (src.map_batches(score, batch_format="pyarrow",
                            batch_size=4096)
            .groupby("label")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("ssum", alias_name="ssum"))
            .to_pandas().sort_values("label"))
    if agg2.empty:
        return empty
    n = agg2["n"].to_numpy(dtype=np.int64)
    ssum = agg2["ssum"].to_numpy(dtype=np.float64)
    return pa.table({
        "label": pa.array(agg2["label"].to_numpy(dtype=np.int64)),
        "n_vecs": pa.array(n),
        "mean_sil_r": pa.array(_round_vec(ssum / n, 4)),
    })


def cdc_apply(sf_dir: str):
    """(user_id, state_type, ts_us, event_id, state_value, n_ops):
    MERGE-style CDC apply — the events stream is a keyed changelog on
    ``user_id`` where an ``'error'`` event is a DELETE tombstone and
    every other type an UPSERT of (type, value); ops apply in
    (ts, event_id) order and the output is the CURRENT state table:
    one row per surviving key carrying its last upsert, keys whose
    final op is a delete are ABSENT, and ``n_ops`` counts every op
    (deletes included) that touched the key. ``latest_events`` is the
    per-(user, type) LWW compaction; this adds the tombstone
    semantics every changelog consumer (Debezium-style sink, iceberg
    MERGE INTO) actually applies. Values pass through untouched.

    Scale shape: each batch compacts map-side to ≤ one row per user
    present (argmax by (ts, event_id)) plus a per-user op count, so
    the exchange carries key-cardinality rows; ONE user-hash
    co-partition exchange, then a per-partition vectorized final
    argmax + segmented count sum (lexsort + boundary mask, no
    per-key Python). Output stays a distributed Dataset sized by
    live keys."""
    import pandas as pd

    _empty = {
        "q": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "ts_us": pa.array([], type=pa.int64()),
        "event_id": pa.array([], type=pa.int64()),
        "value": pa.array([], type=pa.float64()),
        "n_part": pa.array([], type=pa.int64()),
    }

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
            "value": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna(subset=["user_id", "event_type", "ts_us", "event_id"])
        if df.empty:
            return pa.table(_empty)
        counts = df.groupby("user_id").size()
        g = df.sort_values(["user_id", "ts_us", "event_id"],
                           kind="mergesort") \
            .drop_duplicates(subset=["user_id"], keep="last")
        u = g["user_id"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            "user_id": pa.array(u),
            "event_type": pa.array(g["event_type"].tolist(),
                                   type=pa.string()),
            "ts_us": pa.array(g["ts_us"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(g["event_id"].to_numpy(dtype=np.int64)),
            "value": pa.array(g["value"].to_numpy(dtype=np.float64)),
            "n_part": pa.array(counts.loc[u].to_numpy(dtype=np.int64)),
        })

    def final(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        npart = group["n_part"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, eid_s = uid[order], ts[order], eid[order]
        last = np.empty(uid_s.size, dtype=bool)
        last[-1] = True
        last[:-1] = uid_s[1:] != uid_s[:-1]
        # per-user total op count: segmented sum of the map-side partials
        starts = np.nonzero(np.concatenate(
            ([True], uid_s[1:] != uid_s[:-1])))[0]
        nsum = np.add.reduceat(npart[order], starts)
        idx = order[last]
        et = group["event_type"].to_numpy(zero_copy_only=False)[idx]
        keep = et != "error"
        return pa.table({
            "user_id": pa.array(uid[idx][keep]),
            "state_type": pa.array(et[keep].tolist(), type=pa.string()),
            "ts_us": pa.array(ts[idx][keep]),
            "event_id": pa.array(eid[idx][keep]),
            "state_value": pa.array(
                group["value"].to_numpy(zero_copy_only=False)[idx][keep]
                .astype(np.float64)),
            "n_ops": pa.array(nsum[keep]),
        })

    return (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts", "event_id", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(final, batch_format="pyarrow")
    )


def type_dow_mi(sf_dir: str):
    """(n_events, mi_r, nmi_r): mutual information between the
    event-type and day-of-week columns — the categorical-dependence
    audit (is traffic mix weekday-stable?) that the per-cell views
    (``pivot_events``, ``seasonal_dow_index``) summarize but never
    score. MI in nats over the joint (type, dow) histogram; NMI
    normalizes by sqrt(H(type)·H(dow)) and publishes 0 when either
    marginal is degenerate (single type or single dow — MI is 0
    there too). Cells sum in sorted (type, dow) order so the ≤
    |types|×7 float fold is deterministic; 4-dp publish absorbs the
    engine-vs-SQL association drift. Day-of-week uses the repo's
    pure epoch convention ((d // DAY + 3) % 7, 0 = Monday) — no
    datetime parsing per row.

    Scale shape: map-side (type, dow) count partials inside each
    batch → a ≤ 7·|types|-group combine → driver math on the tiny
    contingency matrix. One pruned-column pass, no exchange wider
    than the cell count."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        dow = ((ts // DAY_US) + 3) % 7
        g = pd.DataFrame({"event_type": et, "dow": dow, "n": 1}) \
            .groupby(["event_type", "dow"], as_index=False).agg(
                n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["event_type", "dow"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if cells.empty:
        return pa.table({"n_events": pa.array([], type=pa.int64()),
                         "mi_r": pa.array([], type=pa.float64()),
                         "nmi_r": pa.array([], type=pa.float64())})
    cells = cells.sort_values(["event_type", "dow"],
                              kind="mergesort").reset_index(drop=True)
    nxy = cells["n"].to_numpy(dtype=np.float64)
    n = nxy.sum()
    nx = cells.groupby("event_type")["n"].transform("sum") \
        .to_numpy(dtype=np.float64)
    ny = cells.groupby("dow")["n"].transform("sum") \
        .to_numpy(dtype=np.float64)
    mi = float(((nxy / n) * np.log(nxy * n / (nx * ny))).sum())
    px = cells.groupby("event_type")["n"].sum() \
        .to_numpy(dtype=np.float64) / n
    py = cells.groupby("dow")["n"].sum() \
        .to_numpy(dtype=np.float64) / n
    hx = float(-(px * np.log(px)).sum())
    hy = float(-(py * np.log(py)).sum())
    nmi = mi / np.sqrt(hx * hy) if hx > 0.0 and hy > 0.0 else 0.0
    return pa.table({
        "n_events": pa.array([int(n)], type=pa.int64()),
        "mi_r": pa.array([round_half_away(mi, 4)]),
        "nmi_r": pa.array([round_half_away(float(nmi), 4)]),
    })


def max_drawdown(sf_dir: str):
    """(peak_day_us, trough_day_us, peak_cents, trough_cents,
    drawdown_cents): maximum drawdown of the zero-filled daily
    revenue series — the largest peak-to-trough fall (running-max
    minus current, maximized), the risk-style KPI complement of
    ``bollinger_bands``' envelope and ``cusum_changepoint``'s mean
    shift. Ties break to the EARLIEST trough day; the governing peak
    is the EARLIEST day ≤ trough attaining the running max. All-cent
    integer output → hash-exact, no float publish at all. A monotone
    non-decreasing series emits drawdown 0 anchored at day 0 (both
    sides agree by the same tie-break).

    Scale shape: the daily-cents Sum is the only exchange
    (calendar-bounded groups); the running max / argmax scan runs on
    the driver over the day frame — the ema/holt disclosed
    discipline."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({
        "peak_day_us": pa.array([], type=pa.int64()),
        "trough_day_us": pa.array([], type=pa.int64()),
        "peak_cents": pa.array([], type=pa.int64()),
        "trough_cents": pa.array([], type=pa.int64()),
        "drawdown_cents": pa.array([], type=pa.int64()),
    })
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    v = np.zeros(grid.size, dtype=np.int64)
    v[(od - grid[0]) // DAY_US] = oc
    rm = np.maximum.accumulate(v)
    dd = rm - v
    ti = int(np.argmax(dd))  # argmax takes the FIRST max — earliest trough
    peak_cents = int(rm[ti])
    pi = int(np.nonzero(v[: ti + 1] == peak_cents)[0][0])
    return pa.table({
        "peak_day_us": pa.array([int(grid[pi])], type=pa.int64()),
        "trough_day_us": pa.array([int(grid[ti])], type=pa.int64()),
        "peak_cents": pa.array([peak_cents], type=pa.int64()),
        "trough_cents": pa.array([int(v[ti])], type=pa.int64()),
        "drawdown_cents": pa.array([int(dd[ti])], type=pa.int64()),
    })


def seasonal_decompose(sf_dir: str):
    """(day_us, dow, x_r, trend_r, seasonal_r, resid_r): classical
    additive decomposition of the zero-filled daily revenue series —
    trend = centered 7-day moving mean (full windows only, edge days
    drop), seasonal = per-dow mean of the detrended series centered
    to zero across the present dows, residual = the rest. The
    STL-lite surface between ``seasonal_dow_index`` (dow index only)
    and ``holt_trend`` (recursive smoothing): it SPLITS the series
    into components instead of summarizing or forecasting it.

    Exactness: the detrended value is the rational (7·c_t − s7_t)/700
    with an INTEGER numerator (c = day cents, s7 = exact 7-day cent
    sum), so the per-dow means fold exact int64 sums on both sides
    and only the final ≤7-term centering and the publishes are
    float — 4-dp absorbs that. Series shorter than 7 days emit
    nothing.

    Scale shape: daily cents via one calendar-bounded Sum; the
    sliding sum / dow fold runs on the driver over the day frame
    (the ema/holt disclosed discipline)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({
        "day_us": pa.array([], type=pa.int64()),
        "dow": pa.array([], type=pa.int64()),
        "x_r": pa.array([], type=pa.float64()),
        "trend_r": pa.array([], type=pa.float64()),
        "seasonal_r": pa.array([], type=pa.float64()),
        "resid_r": pa.array([], type=pa.float64()),
    })
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    if grid.size < 7:
        return empty
    cs = np.concatenate(([0], np.cumsum(c)))
    s7 = cs[7:] - cs[:-7]  # exact int 7-day sums, aligned to idx 3..n-4
    mid = np.arange(3, grid.size - 3)
    cm = c[mid]
    u = 7 * cm - s7  # integer detrended numerator (units: cents/700)
    dow = ((grid[mid] // DAY_US) + 3) % 7
    S = np.zeros(7, dtype=np.int64)
    np.add.at(S, dow, u)
    n_dow = np.bincount(dow, minlength=7)
    present = n_dow > 0
    md = np.full(7, np.nan)
    md[present] = S[present] / (700.0 * n_dow[present])
    gm = float(md[present].mean())
    seas = md - gm
    x = cm / 100.0
    trend = s7 / 700.0
    det = u / 700.0
    return pa.table({
        "day_us": pa.array(grid[mid]),
        "dow": pa.array(dow.astype(np.int64)),
        "x_r": pa.array(_round_vec(x, 4)),
        "trend_r": pa.array(_round_vec(trend, 4)),
        "seasonal_r": pa.array(_round_vec(seas[dow], 4)),
        "resid_r": pa.array(_round_vec(det - seas[dow], 4)),
    })


INV_CAP = 2_000  # clamp ceiling (units)
INV_START = 1_000  # opening stock


def capped_inventory(sf_dir: str):
    """(day_us, flow_units, stock_units): bounded inventory ledger —
    daily net unit flow from lineitem (returnflag 'R' receives +qty,
    'A' issues −qty, 'N' doesn't move stock) applied to a running
    level CLAMPED into [0, INV_CAP] from an opening stock of
    INV_START. The clamp makes the recurrence NON-LINEAR — unlike
    ``ema_daily_value``/``holt_trend`` no affine composition exists,
    which is exactly the stockout/capacity semantics every inventory
    system carries; the oracle must walk the same recursive CTE. All
    integer end-to-end → hash-exact, no float anywhere. Days inside
    the [min, max] ship-date span with no R/A rows zero-fill (stock
    carries).

    Scale shape: daily signed-unit Sum partials (calendar-bounded
    groups) are the only exchange; the clamp scan runs on the driver
    over the day frame (the recurrence disciplines' disclosed
    shape)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        rf = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        keep = (rf == "R") | (rf == "A")
        if not keep.any():
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "f": pa.array([], type=pa.int64())})
        qty = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)[keep]).astype(np.int64)
        sign = np.where(rf[keep] == "R", 1, -1)
        ts = (batch["l_shipdate"].cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
              .astype(np.int64))
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        fs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(fs, inv, sign * qty)
        return pa.table({"d": pa.array(ud), "f": pa.array(fs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                           columns=["l_shipdate", "l_returnflag",
                                    "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("f", alias_name="f"))
        .to_pandas()
    )
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "flow_units": pa.array([], type=pa.int64()),
                      "stock_units": pa.array([], type=pa.int64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    of = daily["f"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    f = np.zeros(grid.size, dtype=np.int64)
    f[(od - grid[0]) // DAY_US] = of
    stock = np.empty(grid.size, dtype=np.int64)
    s = INV_START
    for i in range(grid.size):
        s = max(0, min(INV_CAP, s + int(f[i])))
        stock[i] = s
    return pa.table({
        "day_us": pa.array(grid),
        "flow_units": pa.array(f),
        "stock_units": pa.array(stock),
    })


_DQ_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM",
                  "4-NOT SPECIFIED", "5-LOW")
_DQ_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def dq_rules(sf_dir: str):
    """(rule_id, table_name, n_checked, n_violations): declarative
    data-quality rule audit — the contract-check framework sitting
    above the single-purpose audits (``fk_audit`` = referential
    integrity, ``daily_reconcile`` = cross-table totals,
    ``table_profile`` = statistics): each rule is a vectorized
    predicate evaluated over every row of its table, including one
    CROSS-TABLE ordering rule (a line never ships before its order)
    resolved on the orderkey co-partition. NULL counts as a
    violation for range/enum rules (a constraint a NULL can't
    satisfy). All-integer output → hash-exact.

    Rules: L1 quantity ∈ [1, 50]; L2 discount ∈ [0, 0.1]; L3
    tax ≥ 0; O1 totalprice > 0; O2 priority ∈ the 5-value enum;
    E1 value ≥ 0 (and not NaN); E2 type ∈ the 5-type enum;
    J1 l_shipdate ≥ o_orderdate (checked over lines whose order
    header exists and both dates present).

    Scale shape: one pruned-column pass per table emitting a
    per-batch (rule, checked, violations) partial — the exchange
    carries rule-cardinality rows; J1 rides the ship-lag orderkey
    co-partition (both sides fact-sized, no broadcast)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = _PAIR_PARTITIONS

    def _partial_rows(rules: list[tuple[str, str, int, int]]) -> pa.Table:
        return pa.table({
            "rule_id": pa.array([r[0] for r in rules],
                                type=pa.string()),
            "table_name": pa.array([r[1] for r in rules],
                                   type=pa.string()),
            "nc": pa.array([r[2] for r in rules], type=pa.int64()),
            "nv": pa.array([r[3] for r in rules], type=pa.int64()),
        })

    def lineitem_rules(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        t = batch["l_tax"].to_numpy(zero_copy_only=False)
        v1 = int((~((q >= 1.0) & (q <= 50.0))).sum())  # NaN fails both
        v2 = int((~((d >= 0.0) & (d <= 0.1))).sum())
        v3 = int((~(t >= 0.0)).sum())
        return _partial_rows([("L1", "lineitem", n, v1),
                              ("L2", "lineitem", n, v2),
                              ("L3", "lineitem", n, v3)])

    def orders_rules(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        v1 = int((~(p > 0.0)).sum())
        v2 = int((~np.isin(pr, _DQ_PRIORITIES)).sum())
        return _partial_rows([("O1", "orders", n, v1),
                              ("O2", "orders", n, v2)])

    def events_rules(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        v = batch["value"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v1 = int((~(v >= 0.0)).sum())
        v2 = int((~np.isin(et, _DQ_EVENT_TYPES)).sum())
        return _partial_rows([("E1", "events", n, v1),
                              ("E2", "events", n, v2)])

    def tag_orders(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["o_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "side": pa.array(np.zeros(ok.size, dtype=np.int64)),
        })

    def tag_lines(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["l_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["l_shipdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "side": pa.array(np.ones(ok.size, dtype=np.int64)),
        })

    def j1_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        o = df[df["side"] == 0].set_index("ok")["t_us"]
        li = df[df["side"] == 1]
        hit = li["ok"].isin(o.index)
        li = li[hit]
        if li.empty:
            return _partial_rows([("J1", "lineitem+orders", 0, 0)])
        od = o.loc[li["ok"]].to_numpy(dtype=np.int64)
        sd = li["t_us"].to_numpy(dtype=np.int64)
        return _partial_rows([
            ("J1", "lineitem+orders", int(sd.size),
             int((sd < od).sum()))])

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_tax"]
    ).map_batches(lineitem_rules, batch_format="pyarrow",
                  batch_size=8192)
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_totalprice", "o_orderpriority"]
    ).map_batches(orders_rules, batch_format="pyarrow",
                  batch_size=8192)
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["value", "event_type"]
    ).map_batches(events_rules, batch_format="pyarrow",
                  batch_size=8192)
    j1 = (read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate"])
          .map_batches(tag_orders, batch_format="pyarrow",
                       batch_size=8192)
          .union(read_parquet_clean(
              os.path.join(sf_dir, "lineitem.parquet"),
              columns=["l_orderkey", "l_shipdate"])
              .map_batches(tag_lines, batch_format="pyarrow",
                           batch_size=8192))
          .groupby("q").map_groups(j1_partition,
                                   batch_format="pyarrow"))
    out = (li.union(orders).union(ev).union(j1)
           .groupby(["rule_id", "table_name"])
           .aggregate(Sum("nc", alias_name="n_checked"),
                      Sum("nv", alias_name="n_violations"))
           .to_pandas().sort_values("rule_id"))
    return pa.table({
        "rule_id": pa.array(out["rule_id"].tolist(),
                            type=pa.string()),
        "table_name": pa.array(out["table_name"].tolist(),
                               type=pa.string()),
        "n_checked": pa.array(out["n_checked"]
                              .to_numpy(dtype=np.int64)),
        "n_violations": pa.array(out["n_violations"]
                                 .to_numpy(dtype=np.int64)),
    })


def _weekdays_before(d: np.ndarray) -> np.ndarray:
    """Count of weekdays among epoch days [0, d) — the closed-form
    calendar kernel both sides of ``business_day_lag`` share
    (epoch day 0 = Thursday; shift +3 aligns to Monday weeks):
    5·((d+3)//7) + min((d+3)%7, 5) − 3. Valid for d ≥ 0."""
    m = d + 3
    return 5 * (m // 7) + np.minimum(m % 7, 5) - 3


def business_day_lag(sf_dir: str):
    """(bd_lag, n_orders): fulfilment latency in BUSINESS days — per
    order, the count of weekdays (Mon-Fri) in the half-open
    (order-day, first-ship-day] interval, as a histogram.
    ``ship_lag_quantiles`` measures calendar days; real SLAs are
    quoted in business days, which needs the closed-form
    weekday-counting kernel (no per-row calendar walk, no datetime
    objects) — pure int64 floor arithmetic on both sides, identical
    formula, all-integer output → hash-exact.

    Scale shape: the ship-lag orderkey co-partition (both fact
    sides), per-partition min-ship + lag histogram partials, one
    ≤|distinct lags| Sum exchange."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = _PAIR_PARTITIONS

    def tag_orders(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["o_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "side": pa.array(np.zeros(ok.size, dtype=np.int64)),
        })

    def tag_lines(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        ok = batch["l_orderkey"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "q": pa.array((ok % P).astype(np.int64)),
            "ok": pa.array(ok),
            "t_us": batch["l_shipdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "side": pa.array(np.ones(ok.size, dtype=np.int64)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        empty = pa.table({"bd_lag": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        o = df[df["side"] == 0]
        li = df[df["side"] == 1]
        if o.empty or li.empty:
            return empty
        first_ship = li.groupby("ok")["t_us"].min()
        od = o.set_index("ok")["t_us"]
        common = first_ship.index.intersection(od.index)
        if common.empty:
            return empty
        a_day = od.loc[common].to_numpy(dtype=np.int64) // DAY_US
        s_day = first_ship.loc[common].to_numpy(dtype=np.int64) \
            // DAY_US
        lag = _weekdays_before(s_day + 1) - _weekdays_before(a_day + 1)
        vals, counts = np.unique(lag, return_counts=True)
        return pa.table({"bd_lag": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"]
    ).map_batches(tag_orders, batch_format="pyarrow", batch_size=8192)
    lines = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"]
    ).map_batches(tag_lines, batch_format="pyarrow", batch_size=8192)
    out = (orders.union(lines).groupby("q")
           .map_groups(per_partition, batch_format="pyarrow")
           .groupby("bd_lag").aggregate(Sum("n", alias_name="n_orders"))
           .to_pandas().sort_values("bd_lag"))
    return pa.table({
        "bd_lag": pa.array(out["bd_lag"].to_numpy(dtype=np.int64)),
        "n_orders": pa.array(out["n_orders"]
                             .to_numpy(dtype=np.int64)),
    })


def price_model_ols(sf_dir: str):
    """(n, b0_r, b1_r, b2_r, r2_r): TWO-feature linear model —
    l_extendedprice (cents) ~ b0 + b1·quantity + b2·p_retailprice
    (cents) — solved in closed form from the 3×3 normal equations.
    ``brand_price_regr`` proves grouped ONE-feature OLS; this adds
    the multivariate surface (Cramer determinants over exact
    integer moments) plus a dimension join feeding a regression.
    Moments fold exact Python ints on the driver (int64 partials
    per batch); determinants and coefficients then evaluate the
    SAME IEEE double expression tree on both sides, 4-dp publish.
    A singular system (collinear features) publishes all-zero
    coefficients with r2 0.

    Scale shape: the part dimension broadcasts as a sorted
    (p_partkey → cents) lookup into every fact batch (the
    brand_return_rate pattern); the exchange carries one 10-column
    moment row per batch."""
    import math

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_retailprice"]).to_pandas()
    pk = np.sort(part["p_partkey"].to_numpy(dtype=np.int64))
    rp = np.rint(part.sort_values("p_partkey")["p_retailprice"]
                 .to_numpy() * 100.0).astype(np.int64)

    def moments(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(pk, lp)
        pos = np.clip(pos, 0, pk.size - 1)
        hit = pk[pos] == lp
        if not hit.any():
            z = [0] * 10
            return pa.table({k: pa.array([v], type=pa.int64())
                             for k, v in zip(
                ["n", "sx1", "sx2", "sy", "s11", "s22", "s12",
                 "s1y", "s2y", "syy"], z)})
        x1 = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)[hit]).astype(np.int64)
        x2 = rp[pos[hit]]
        y = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[hit] * 100.0).astype(np.int64)
        vals = [int(x1.size), int(x1.sum()), int(x2.sum()),
                int(y.sum()), int((x1 * x1).sum()),
                int((x2 * x2).sum()), int((x1 * x2).sum()),
                int((x1 * y).sum()), int((x2 * y).sum()),
                int((y * y).sum())]
        return pa.table({k: pa.array([v], type=pa.int64())
                         for k, v in zip(
            ["n", "sx1", "sx2", "sy", "s11", "s22", "s12",
             "s1y", "s2y", "syy"], vals)})

    parts = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(moments, batch_format="pyarrow",
                     batch_size=8192).to_pandas())
    n = int(parts["n"].sum())
    empty = pa.table({"n": pa.array([], type=pa.int64()),
                      "b0_r": pa.array([], type=pa.float64()),
                      "b1_r": pa.array([], type=pa.float64()),
                      "b2_r": pa.array([], type=pa.float64()),
                      "r2_r": pa.array([], type=pa.float64())})
    if n == 0:
        return empty
    sx1 = float(int(parts["sx1"].sum()))
    sx2 = float(int(parts["sx2"].sum()))
    sy = float(int(parts["sy"].sum()))
    s11 = float(int(parts["s11"].sum()))
    s22 = float(int(parts["s22"].sum()))
    s12 = float(int(parts["s12"].sum()))
    s1y = float(int(parts["s1y"].sum()))
    s2y = float(int(parts["s2y"].sum()))
    syy = float(int(parts["syy"].sum()))
    fn = float(n)
    # Cramer over the symmetric normal matrix — the identical
    # expression tree the SQL oracle evaluates
    det = (fn * (s11 * s22 - s12 * s12)
           - sx1 * (sx1 * s22 - s12 * sx2)
           + sx2 * (sx1 * s12 - s11 * sx2))
    if det == 0.0:
        b0 = b1 = b2 = 0.0
        r2 = 0.0
    else:
        d0 = (sy * (s11 * s22 - s12 * s12)
              - sx1 * (s1y * s22 - s12 * s2y)
              + sx2 * (s1y * s12 - s11 * s2y))
        d1 = (fn * (s1y * s22 - s12 * s2y)
              - sy * (sx1 * s22 - s12 * sx2)
              + sx2 * (sx1 * s2y - s1y * sx2))
        d2 = (fn * (s11 * s2y - s1y * s12)
              - sx1 * (sx1 * s2y - s1y * sx2)
              + sy * (sx1 * s12 - s11 * sx2))
        b0, b1, b2 = d0 / det, d1 / det, d2 / det
        ss_res = (syy - b0 * sy - b1 * s1y - b2 * s2y)
        ss_tot = syy - sy * sy / fn
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0.0 else 0.0
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "b0_r": pa.array([round_half_away(b0, 4)]),
        "b1_r": pa.array([round_half_away(b1, 4)]),
        "b2_r": pa.array([round_half_away(b2, 4)]),
        "r2_r": pa.array([round_half_away(r2, 4)]),
    })


def _erf_as7(x: np.ndarray) -> np.ndarray:
    """Abramowitz–Stegun 7.1.26 erf approximation (|err| < 1.5e-7),
    written as the exact expression tree the SQL oracle evaluates —
    the closed-form normal-CDF kernel shared by the multiple-testing
    entries (DuckDB has no erf, so the SPEC is this polynomial)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return 1.0 - poly * np.exp(-x * x)


def bh_brand_returns(sf_dir: str):
    """(p_brand, n_lines, n_returns, z_r, p_r, p_adj_r): per-brand
    return-rate anomaly screen with Benjamini–Hochberg correction —
    each brand's two-sided one-proportion z-test against the global
    return rate, p-values via the shared A&S erf kernel, then the
    BH step-up adjustment (suffix-min of m·p/rank, capped at 1)
    over the brand family. The multiple-testing surface the single
    tests (``welch_ttest``, ``chi2_events``, ``anova_f``) stop
    short of: with 25 brands, ~1 false positive at α = 0.05 is
    EXPECTED — BH is what makes the screen actionable. A degenerate
    global rate (0 or 1) publishes z 0 / p 1 everywhere.

    Scale shape: the part dimension broadcasts into one lineitem
    counting pass (≤|brands| partial rows per batch); everything
    after is driver math over the bounded brand family."""
    import pandas as pd
    from ray.data.aggregate import Sum

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"]).to_pandas()
    pk = np.sort(part["p_partkey"].to_numpy(dtype=np.int64))
    brands = part.sort_values("p_partkey")["p_brand"].to_numpy()

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(pk, lp)
        pos = np.clip(pos, 0, pk.size - 1)
        hit = pk[pos] == lp
        empty = pa.table({"brand": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "k": pa.array([], type=pa.int64())})
        if not hit.any():
            return empty
        b = brands[pos[hit]]
        r = (batch["l_returnflag"].to_numpy(
            zero_copy_only=False)[hit] == "R").astype(np.int64)
        g = pd.DataFrame({"brand": b, "n": 1, "k": r}) \
            .groupby("brand", as_index=False).agg(n=("n", "sum"),
                                                  k=("k", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_returnflag"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("brand")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas())
    empty = pa.table({"p_brand": pa.array([], type=pa.string()),
                      "n_lines": pa.array([], type=pa.int64()),
                      "n_returns": pa.array([], type=pa.int64()),
                      "z_r": pa.array([], type=pa.float64()),
                      "p_r": pa.array([], type=pa.float64()),
                      "p_adj_r": pa.array([], type=pa.float64())})
    if agg.empty:
        return empty
    n = agg["n"].to_numpy(dtype=np.int64)
    k = agg["k"].to_numpy(dtype=np.int64)
    nn, kk = float(n.sum()), float(k.sum())
    if kk > 0.0 and kk < nn:
        p0 = kk / nn
        z = (k / n - p0) / np.sqrt(p0 * (1.0 - p0) / n)
        p = 1.0 - _erf_as7(np.abs(z) / np.sqrt(2.0))
    else:
        z = np.zeros(n.size)
        p = np.ones(n.size)
    df = pd.DataFrame({"brand": agg["brand"].to_numpy(), "n": n,
                       "k": k, "z": z, "p": p})
    df = df.sort_values(["p", "brand"], kind="mergesort") \
        .reset_index(drop=True)
    m = float(len(df))
    rk = np.arange(1, len(df) + 1, dtype=np.float64)
    raw = m * df["p"].to_numpy() / rk
    adj = np.minimum(1.0, np.minimum.accumulate(raw[::-1])[::-1])
    df["padj"] = adj
    df = df.sort_values("brand", kind="mergesort")
    return pa.table({
        "p_brand": pa.array(df["brand"].tolist(), type=pa.string()),
        "n_lines": pa.array(df["n"].to_numpy(dtype=np.int64)),
        "n_returns": pa.array(df["k"].to_numpy(dtype=np.int64)),
        "z_r": pa.array(_round_vec(df["z"].to_numpy(), 4)),
        "p_r": pa.array(_round_vec(df["p"].to_numpy(), 4)),
        "p_adj_r": pa.array(_round_vec(df["padj"].to_numpy(), 4)),
    })


def fisher_exact(sf_dir: str):
    """(n_users, a, b, c, d, odds_r, p_r): Fisher's EXACT test on the
    2×2 user contingency table (exposure = user has ≥1 'error'
    event; outcome = user has ≥1 'purchase') — the small-sample
    complement of the asymptotic tests (``chi2_events``,
    ``bh_brand_returns``' z): the two-sided p sums hypergeometric
    point masses P(k) ≤ P(a)·(1+1e-7) over the support, every term
    from lgamma (binomial coefficients in log space) — the 1e-7
    slack is the standard equality guard, identical on both sides.
    Odds ratio (a·d)/(b·c) publishes 0 on a zero denominator.

    Scale shape: per-batch (user → flag-max) partials, one
    user-hash combine to the per-user flag table, then a ≤4-cell
    counting pass; the hypergeometric loop is O(min(r1, c1)) driver
    math (bounded by distinct users, trivially so after the log
    transform)."""
    import math

    import pandas as pd
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "ex": pa.array([], type=pa.int64()),
                             "oc": pa.array([], type=pa.int64())})
        df["ex"] = (df["et"] == "error").astype(np.int64)
        df["oc"] = (df["et"] == "purchase").astype(np.int64)
        g = df.groupby("user_id", as_index=False).agg(
            ex=("ex", "max"), oc=("oc", "max"))
        return pa.table({
            "user_id": pa.array(g["user_id"].to_numpy(dtype=np.int64)),
            "ex": pa.array(g["ex"].to_numpy(dtype=np.int64)),
            "oc": pa.array(g["oc"].to_numpy(dtype=np.int64)),
        })

    def cells(batch: pa.Table) -> pa.Table:
        ex = batch["ex"].to_numpy(zero_copy_only=False)
        oc = batch["oc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array([int((ex * oc).sum())], type=pa.int64()),
            "b": pa.array([int((ex * (1 - oc)).sum())],
                          type=pa.int64()),
            "c": pa.array([int(((1 - ex) * oc).sum())],
                          type=pa.int64()),
            "d": pa.array([int(((1 - ex) * (1 - oc)).sum())],
                          type=pa.int64()),
        })

    parts = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("user_id")
        .aggregate(Max("ex", alias_name="ex"),
                   Max("oc", alias_name="oc"))
        .map_batches(cells, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    empty = pa.table({"n_users": pa.array([], type=pa.int64()),
                      "a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int64()),
                      "d": pa.array([], type=pa.int64()),
                      "odds_r": pa.array([], type=pa.float64()),
                      "p_r": pa.array([], type=pa.float64())})
    if parts.empty:
        return empty
    a = int(parts["a"].sum())
    b = int(parts["b"].sum())
    c = int(parts["c"].sum())
    d = int(parts["d"].sum())
    n = a + b + c + d
    if n == 0:
        return empty
    r1, c1 = a + b, a + c
    lg = math.lgamma

    def logp(kk: int) -> float:
        return (lg(r1 + 1.0) - lg(kk + 1.0) - lg(r1 - kk + 1.0)
                + lg(n - r1 + 1.0) - lg(c1 - kk + 1.0)
                - lg(n - r1 - (c1 - kk) + 1.0)
                - (lg(n + 1.0) - lg(c1 + 1.0) - lg(n - c1 + 1.0)))

    lobs = logp(a)
    lim = math.exp(lobs) * (1.0 + 1e-7)
    p = 0.0
    for kk in range(max(0, r1 + c1 - n), min(r1, c1) + 1):
        pk = math.exp(logp(kk))
        if pk <= lim:
            p += pk
    odds = (float(a * d) / float(b * c)) if b * c > 0 else 0.0
    return pa.table({
        "n_users": pa.array([n], type=pa.int64()),
        "a": pa.array([a], type=pa.int64()),
        "b": pa.array([b], type=pa.int64()),
        "c": pa.array([c], type=pa.int64()),
        "d": pa.array([d], type=pa.int64()),
        "odds_r": pa.array([round_half_away(odds, 4)]),
        "p_r": pa.array([round_half_away(p, 4)]),
    })


def isotonic_daily(sf_dir: str):
    """(day_us, x_r, fit_r): isotonic (monotone non-decreasing) PAVA
    fit of the zero-filled daily revenue series — the calibration /
    shape-constrained-regression surface: ``theilsen_trend`` fits
    one robust LINE, ``holt_trend`` smooths recursively; PAVA finds
    the closest non-decreasing step function in L². Engine runs the
    O(n) pool-adjacent-violators stack over exact (cent-sum, count)
    integer blocks; the oracle evaluates the minimax
    characterization fit(t) = max_{i≤t} min_{j≥t} mean(x[i..j])
    (every candidate mean is the SAME exact-int division both
    sides, so agreement is to the ulp and 4-dp publish is safe).

    Scale shape: the daily-cents Sum is the only exchange; the PAVA
    stack runs on the driver over the day frame (the recurrence
    disciplines' disclosed shape — the oracle's O(n³) minimax is
    oracle-only, the engine is linear)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "x_r": pa.array([], type=pa.float64()),
                      "fit_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    # PAVA over exact integer (sum, count) blocks: merge while the
    # previous block mean exceeds the current (cross-multiplied in
    # int, so the violation test is exact)
    sums: list[int] = []
    cnts: list[int] = []
    for ci in c:
        s, n = int(ci), 1
        while sums and sums[-1] * n > s * cnts[-1]:
            s += sums.pop()
            n += cnts.pop()
        sums.append(s)
        cnts.append(n)
    fit = np.concatenate([
        np.full(n, float(s) / float(n))
        for s, n in zip(sums, cnts)]) / 100.0
    return pa.table({
        "day_us": pa.array(grid),
        "x_r": pa.array(_round_vec(c / 100.0, 4)),
        "fit_r": pa.array(_round_vec(fit, 4)),
    })


DECAY_HALF_LIFE_DAYS = 7.0


def recency_weighted_value(sf_dir: str):
    """(user_id, n_events, raw_cents, decayed_r): per-user
    exponentially time-decayed value — each event contributes
    cents · 0.5^(Δdays / 7) where Δ is measured back from the
    corpus-max timestamp; the recency-weighted engagement score
    every recommender / churn model keeps beside the raw totals
    (``running_user_totals`` is cumulative-forward; this is
    decayed-backward). ``raw_cents`` stays exact int; the decayed
    sum is float with the identical power(0.5, Δ/7) weight both
    sides, 4-dp publish.

    Scale shape: one Max aggregate for the anchor timestamp, then
    one map pass with per-batch (user → partial sums) combine and a
    user groupby — no driver row-level pull; output sized by
    users."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    src = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"])

    def ts_max(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = t[~np.isnan(t)] if t.dtype.kind == "f" else t
        if t.size == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(t.max())],
                                       type=pa.int64())})

    mt = src.map_batches(ts_max, batch_format="pyarrow",
                         batch_size=8192) \
        .aggregate(Max("m", alias_name="m"))
    empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64()),
                      "raw_cents": pa.array([], type=pa.int64()),
                      "decayed_r": pa.array([], type=pa.float64())})
    if mt is None or mt.get("m") is None:
        return empty
    T = int(mt["m"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "ts": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "v": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "rc": pa.array([], type=pa.int64()),
                             "dv": pa.array([], type=pa.float64())})
        cents = np.rint(df["v"].to_numpy() * 100.0).astype(np.int64)
        dt_days = (T - df["ts"].to_numpy(dtype=np.int64)) \
            / float(DAY_US)
        w = cents * np.power(0.5, dt_days / DECAY_HALF_LIFE_DAYS)
        g = pd.DataFrame({"user_id": df["user_id"]
                          .to_numpy(dtype=np.int64),
                          "n": 1, "rc": cents, "dv": w}) \
            .groupby("user_id", as_index=False).agg(
                n=("n", "sum"), rc=("rc", "sum"), dv=("dv", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (src.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
           .groupby("user_id")
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("rc", alias_name="raw_cents"),
                      Sum("dv", alias_name="dv"))
           .to_pandas().sort_values("user_id"))
    if out.empty:
        return empty
    return pa.table({
        "user_id": pa.array(out["user_id"].to_numpy(dtype=np.int64)),
        "n_events": pa.array(out["n_events"]
                             .to_numpy(dtype=np.int64)),
        "raw_cents": pa.array(out["raw_cents"]
                              .to_numpy(dtype=np.int64)),
        "decayed_r": pa.array(_round_vec(out["dv"].to_numpy(), 4)),
    })


ROLL_CORR_TYPES = ("click", "view")
ROLL_CORR_WIN = 7


def rolling_type_corr(sf_dir: str):
    """(day_us, corr_r): trailing-7-day Pearson correlation between
    the 'click' and 'view' daily revenue series — the WINDOWED
    bivariate complement of ``type_corr_matrix`` (one global
    coefficient) and ``bollinger_bands`` (univariate window
    moments): does the co-movement of two streams drift over time?
    Every window moment (Sa, Sb, Saa, Sbb, Sab) is an exact int64
    cent sum via cumulative differences, so the only float is the
    final correlation division — identical tree both sides, 4-dp,
    zero-variance windows publish 0. Emits one row per complete
    window over the zero-filled shared day grid.

    Scale shape: one (day × 2-type)-bounded Sum exchange; window
    cumsums on the driver over the day frame."""
    import pandas as pd
    from ray.data.aggregate import Sum

    tset = ROLL_CORR_TYPES

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ts": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "v": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["et"].isin(tset)]
        if df.empty:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "et": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(df["v"].to_numpy() * 100.0).astype(np.int64)
        day = df["ts"].to_numpy(dtype=np.int64) // DAY_US * DAY_US
        g = pd.DataFrame({"d": day, "et": df["et"].to_numpy(),
                          "c": cents}) \
            .groupby(["d", "et"], as_index=False).agg(c=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["d", "et"]).aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "corr_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    W = ROLL_CORR_WIN
    if grid.size < W:
        return empty
    a = np.zeros(grid.size, dtype=np.int64)
    b = np.zeros(grid.size, dtype=np.int64)
    for arr, name in ((a, tset[0]), (b, tset[1])):
        sub = daily[daily["et"] == name]
        arr[(sub["d"].to_numpy(dtype=np.int64) - lo) // DAY_US] = \
            sub["c"].to_numpy(dtype=np.int64)

    def winsum(x: np.ndarray) -> np.ndarray:
        cs = np.concatenate(([0], np.cumsum(x)))
        return cs[W:] - cs[:-W]

    Sa, Sb = winsum(a), winsum(b)
    Saa, Sbb = winsum(a * a), winsum(b * b)
    Sab = winsum(a * b)
    num = (W * Sab - Sa * Sb).astype(np.float64)
    d1 = (W * Saa - Sa * Sa).astype(np.float64)
    d2 = (W * Sbb - Sb * Sb).astype(np.float64)
    den = np.sqrt(d1 * d2)
    corr = np.where((d1 > 0) & (d2 > 0), num / np.where(den > 0, den,
                                                        1.0), 0.0)
    return pa.table({
        "day_us": pa.array(grid[W - 1:]),
        "corr_r": pa.array(_round_vec(corr, 4)),
    })


MARKOV_CHANNELS = ("click", "error", "signup", "view")
MARKOV_ITERS = 60


def markov_attribution(sf_dir: str, iters: int = MARKOV_ITERS):
    """(channel, p_base_r, p_removed_r, effect_r, attribution_r):
    first-order Markov REMOVAL-EFFECT attribution — the
    data-driven alternative to ``last_touch_attribution``'s
    heuristic: per-user journeys (START → events in (ts, event_id)
    order, truncated at the first purchase, else closed with a NULL
    absorber), a transition matrix from exact count ratios, and for
    each channel the conversion probability with that channel's
    state FORCED to zero (transitions into it leak to NULL, its
    own out-edges become unreachable — the standard removal
    semantics). effect = (P_base − P_removed)/P_base; attribution
    normalizes effects to shares. Both sides run the IDENTICAL
    ``iters``-step absorption iteration (the published figure is
    the 60-step estimate by SPEC, so convergence never diverges
    the sides); journeys here absorb in a handful of steps, so 60
    is far past convergence at 4 dp. No conversions anywhere →
    all-zero effects. Four fixed channel rows always publish.

    Scale shape: one user-hash co-partition pass builds transition
    triples vectorized (segmented shifts, no per-user Python); one
    ≤|states|²-group count combine; the 5 iteration runs are
    O(states²·iters) driver math. The oracle unrolls all five runs
    as MATERIALIZED CTE chains (the pca discipline)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"]
            .to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"q": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "et": pa.array([], type=pa.string()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "event_id": pa.array([],
                                                  type=pa.int64())})
        u = df["user_id"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            "user_id": pa.array(u),
            "et": pa.array(df["et"].tolist(), type=pa.string()),
            "ts_us": pa.array(df["ts_us"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(df["event_id"]
                                 .to_numpy(dtype=np.int64)),
        })

    def transitions(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = group["et"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "t": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
        # per-user first-purchase cut: keep rows up to and incl. the
        # first purchase (vectorized via segmented cumsum of the
        # purchase indicator BEFORE each row)
        is_p = (et == "purchase").astype(np.int64)
        seg = np.cumsum(new_u) - 1
        cp = np.cumsum(is_p)
        seg_base = np.zeros(seg.max() + 1 if seg.size else 0,
                            dtype=np.int64)
        starts = np.nonzero(new_u)[0]
        seg_base[seg[starts]] = np.concatenate(
            ([0], cp[starts[1:] - 1])) if starts.size > 1 else 0
        prior_p = cp - is_p - seg_base[seg]
        keep = prior_p == 0
        uid, et = uid[keep], et[keep]
        if uid.size == 0:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "t": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
        last = np.concatenate((new_u[1:], [True]))
        srcs: list = []
        tgts: list = []
        # START -> first event
        srcs.append(np.full(new_u.sum(), "START", dtype=object))
        tgts.append(et[new_u].astype(object))
        # consecutive pairs within user
        cons = ~new_u[1:] if uid.size > 1 else np.zeros(0, dtype=bool)
        srcs.append(et[:-1][cons].astype(object))
        tgts.append(et[1:][cons].astype(object))
        # unconverted tails -> NULL
        tail = last & (et != "purchase")
        srcs.append(et[tail].astype(object))
        tgts.append(np.full(int(tail.sum()), "NULL", dtype=object))
        s = np.concatenate(srcs)
        t = np.concatenate(tgts)
        g = pd.DataFrame({"s": s, "t": t, "n": 1}) \
            .groupby(["s", "t"], as_index=False).agg(n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts", "event_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(transitions, batch_format="pyarrow")
        .groupby(["s", "t"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    chans = list(MARKOV_CHANNELS)
    empty_cols = {
        "channel": pa.array(chans, type=pa.string()),
        "p_base_r": pa.array([0.0] * 4),
        "p_removed_r": pa.array([0.0] * 4),
        "effect_r": pa.array([0.0] * 4),
        "attribution_r": pa.array([0.0] * 4),
    }
    if cnt.empty:
        return pa.table(empty_cols)
    tot = cnt.groupby("s")["n"].sum()
    cnt["p"] = cnt["n"].astype(np.float64) \
        / tot.loc[cnt["s"]].to_numpy(dtype=np.float64)
    edges = list(zip(cnt["s"], cnt["t"], cnt["p"]))
    sources = sorted(tot.index)

    def absorb(masked: str | None) -> float:
        val = {s: 0.0 for s in sources}
        val["purchase"] = 1.0
        val["NULL"] = 0.0
        for _ in range(iters):
            new = {s: 0.0 for s in sources}
            for s, t, p in edges:
                new[s] += p * val[t]
            if masked is not None and masked in new:
                new[masked] = 0.0
            val.update(new)
        return val.get("START", 0.0)

    p_base = absorb(None)
    p_rem = {c: absorb(c) for c in chans}
    if p_base > 0.0:
        eff = {c: (p_base - p_rem[c]) / p_base for c in chans}
    else:
        eff = {c: 0.0 for c in chans}
    se = sum(eff[c] for c in chans)
    att = {c: (eff[c] / se if se > 0.0 else 0.0) for c in chans}
    return pa.table({
        "channel": pa.array(chans, type=pa.string()),
        "p_base_r": pa.array([round_half_away(p_base, 4)] * 4),
        "p_removed_r": pa.array(
            [round_half_away(p_rem[c], 4) for c in chans]),
        "effect_r": pa.array(
            [round_half_away(eff[c], 4) for c in chans]),
        "attribution_r": pa.array(
            [round_half_away(att[c], 4) for c in chans]),
    })


HLL_TYPES = ("click", "error", "purchase", "signup", "view")


def _hll_est_from_regs(regs: np.ndarray) -> float:
    """The hll_estimate estimator over a dense register array — shared
    by ``hll_set_algebra`` so per-type, union and the SQL oracle all
    evaluate the identical expression tree."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0,
                                          -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


def hll_set_algebra(sf_dir: str):
    """(type_a, type_b, exact_a, exact_b, exact_union, exact_inter,
    est_a_r, est_b_r, est_union_r, est_inter_r): HyperLogLog SET
    ALGEBRA — per event type a user-set sketch, then for every type
    pair the union estimate by register max-merge and the
    intersection by inclusion–exclusion, PUBLISHED NEXT TO THE
    EXACT counts so the sketch error is visible in the output. The
    reason sketches exist at 100 TB is exactly this: union merges
    are lossless on the register state, so cross-segment audience
    overlap costs 5 × 256 ints, not a distinct-set shuffle.
    ``hll_registers`` proves the build; this is the algebra layer
    on top. Estimates are deterministic (md5 hash, identical
    estimator tree both sides, the hll_estimate formula); exact
    counts ride a per-user type-bitmask pass (≤32-combo exchange).
    The fixed 5-type universe always publishes all 10 pairs —
    absent types estimate 0 via linear counting.

    Scale shape: sketch partials collapse to ≤5·256 (type, reg)
    rows per batch (max-merge); the exact side collapses to ≤32
    bitmask-combo counts after one user-hash groupby; everything
    downstream is driver math over those bounded tables."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    types = list(HLL_TYPES)
    tidx = {t: i for i, t in enumerate(types)}

    def sketch_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "u": batch["user_id"].to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["et"].isin(types)].drop_duplicates()
        out_et, out_reg, out_rho = [], [], []
        for et, g in df.groupby("et"):
            regs = np.zeros(_HLL_M, dtype=np.int64)
            for x in g["u"].astype(np.int64).tolist():
                h = _hll_hash64(str(x))
                idx = h >> 56
                rem = h & ((1 << 56) - 1)
                rho = 57 - rem.bit_length() if rem else 57
                if rho > regs[idx]:
                    regs[idx] = rho
            nz = np.nonzero(regs)[0]
            out_et.extend([et] * nz.size)
            out_reg.extend(nz.tolist())
            out_rho.extend(regs[nz].tolist())
        return pa.table({
            "et": pa.array(out_et, type=pa.string()),
            "reg_idx": pa.array(out_reg, type=pa.int64()),
            "rho": pa.array(out_rho, type=pa.int64()),
        })

    src = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"])
    sk = (src.map_batches(sketch_partial, batch_format="pyarrow",
                          batch_size=8192)
          .groupby(["et", "reg_idx"])
          .aggregate(Max("rho", alias_name="rho")).to_pandas())
    dense = {t: np.zeros(_HLL_M, dtype=np.int64) for t in types}
    for _, row in sk.iterrows():
        dense[row["et"]][int(row["reg_idx"])] = int(row["rho"])

    # exact side: per-user type bitmask -> <=32 combo counts
    bit_cols = [f"b{i}" for i in range(len(types))]

    def flags_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "user_id": batch["user_id"]
            .to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["et"].isin(types)]
        if df.empty:
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 **{c: pa.array([], type=pa.int64())
                    for c in bit_cols}})
        for t, c in zip(types, bit_cols):
            df[c] = (df["et"] == t).astype(np.int64)
        g = df.groupby("user_id", as_index=False)[bit_cols].max()
        g["user_id"] = g["user_id"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def combo_partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(batch.num_rows, dtype=np.int64)
        for i, c in enumerate(bit_cols):
            bits |= (batch[c].to_numpy(zero_copy_only=False)
                     .astype(np.int64) << i)
        uv, cn = np.unique(bits, return_counts=True)
        return pa.table({"combo": pa.array(uv),
                         "n": pa.array(cn.astype(np.int64))})

    combos = (src.map_batches(flags_partial, batch_format="pyarrow",
                              batch_size=8192)
              .groupby("user_id")
              .aggregate(*[Max(c, alias_name=c) for c in bit_cols])
              .map_batches(combo_partial, batch_format="pyarrow",
                           batch_size=8192)
              .groupby("combo").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    cmap = dict(zip(combos["combo"].astype(int),
                    combos["n"].astype(int))) if not combos.empty \
        else {}

    def exact_over(mask_any: int, mask_all: int = 0) -> int:
        tot = 0
        for cb, n in cmap.items():
            if mask_any and not (cb & mask_any):
                continue
            if mask_all and (cb & mask_all) != mask_all:
                continue
            tot += n
        return tot

    est = {t: _hll_est_from_regs(dense[t]) for t in types}
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            eu = _hll_est_from_regs(np.maximum(dense[a], dense[b]))
            ea, eb = est[a], est[b]
            ba, bb = 1 << tidx[a], 1 << tidx[b]
            rows.append((
                a, b, exact_over(ba), exact_over(bb),
                exact_over(ba | bb), exact_over(0, ba | bb),
                ea, eb, eu, ea + eb - eu))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], type=pa.string()),
        "type_b": pa.array([r[1] for r in rows], type=pa.string()),
        "exact_a": pa.array([r[2] for r in rows], type=pa.int64()),
        "exact_b": pa.array([r[3] for r in rows], type=pa.int64()),
        "exact_union": pa.array([r[4] for r in rows],
                                type=pa.int64()),
        "exact_inter": pa.array([r[5] for r in rows],
                                type=pa.int64()),
        "est_a_r": pa.array(_round_vec(
            np.asarray([r[6] for r in rows]), 4)),
        "est_b_r": pa.array(_round_vec(
            np.asarray([r[7] for r in rows]), 4)),
        "est_union_r": pa.array(_round_vec(
            np.asarray([r[8] for r in rows]), 4)),
        "est_inter_r": pa.array(_round_vec(
            np.asarray([r[9] for r in rows]), 4)),
    })


def dft_weekly_power(sf_dir: str):
    """(k, re_r, im_r, power_r): 7-point discrete Fourier transform
    of the zero-filled daily revenue series folded at period 7 — the
    SPECTRAL view of weekly seasonality (``seasonal_dow_index``
    measures it by grouping; the DFT separates the harmonics, and
    power at k=1..6 vs k=0 is the classic periodicity detector).
    The angle reduces mod 7 BEFORE the trig call (2π·((k·t) mod 7)/7
    hits only 7 distinct arguments), so both sides evaluate cos/sin
    on identical small values — no large-angle reduction divergence.
    Series values in dollars; 4-dp publish.

    Scale shape: daily-cents Sum exchange, then O(7·days) driver
    math over the day frame."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "re_r": pa.array([], type=pa.float64()),
                      "im_r": pa.array([], type=pa.float64()),
                      "power_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    v = c / 100.0
    t = np.arange(grid.size, dtype=np.int64)
    rows = []
    for k in range(7):
        ang = 2.0 * np.pi * ((k * t) % 7) / 7.0
        re = float((v * np.cos(ang)).sum())
        im = float((v * np.sin(ang)).sum())
        rows.append((k, re, im, re * re + im * im))
    return pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "re_r": pa.array(_round_vec(
            np.asarray([r[1] for r in rows]), 4)),
        "im_r": pa.array(_round_vec(
            np.asarray([r[2] for r in rows]), 4)),
        "power_r": pa.array(_round_vec(
            np.asarray([r[3] for r in rows]), 4)),
    })


def nearest_event_join(sf_dir: str):
    """(event_id, user_id, ts_us, view_ts_us, dt_us): NEAREST-in-time
    join — each 'click' matched to the same user's view with the
    smallest |Δt|, ties broken BACKWARD (the earlier view). The
    bidirectional complement of ``asof_join_events`` (backward-only):
    sensor alignment and sessionless attribution both want nearest,
    not last. Clicks from users with no views drop on both sides.
    All-integer output → hash-exact.

    Scale shape: the asof user-hash co-partition discipline — one
    vectorized pass per partition (sort by (user, ts, view-first),
    running max of view-ts forward + running min backward, pick the
    nearer side)."""
    import ray.data as rd

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        mask = (et == "view") | (et == "click")
        sub = batch.filter(pa.array(mask))
        u = sub["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": sub["event_id"],
            "user_id": sub["user_id"],
            "ts_us": sub["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "is_click": pa.array(
                sub["event_type"].to_numpy(zero_copy_only=False)
                == "click"),
            "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
        })

    BIG = np.int64(1) << 62

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ic = group["is_click"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "view_ts_us": pa.array([], type=pa.int64()),
            "dt_us": pa.array([], type=pa.int64()),
        })
        if uid.size == 0:
            return empty
        order = np.lexsort((ic, ts, uid))  # views before clicks
        uid, ts, ic, eid = (uid[order], ts[order], ic[order],
                            eid[order])
        n = uid.size
        idx = np.arange(n)
        # backward: latest view POSITION at-or-before each row,
        # invalidated across user boundaries by the uid check (the
        # asof_join_events accumulate-positions discipline)
        vpos = np.where(~ic, idx, -1)
        bkpos = np.maximum.accumulate(vpos)
        has_bk = (bkpos >= 0) & (uid[np.clip(bkpos, 0, n - 1)]
                                 == uid)
        # forward: earliest view position at-or-after each row
        vposf = np.where(~ic, idx, n)
        fwpos = np.minimum.accumulate(vposf[::-1])[::-1]
        has_fw = (fwpos < n) & (uid[np.clip(fwpos, 0, n - 1)]
                                == uid)
        keep = ic & (has_bk | has_fw)
        if not keep.any():
            return empty
        cts = ts[keep]
        b = ts[np.clip(bkpos[keep], 0, n - 1)]
        f = ts[np.clip(fwpos[keep], 0, n - 1)]
        hb, hf = has_bk[keep], has_fw[keep]
        db = np.where(hb, cts - b, BIG)
        df = np.where(hf, f - cts, BIG)
        pick_b = db <= df  # tie -> backward (earlier view)
        vsel = np.where(pick_b, b, f)
        dsel = np.where(pick_b, db, df)
        return pa.table({
            "event_id": pa.array(eid[keep]),
            "user_id": pa.array(uid[keep]),
            "ts_us": pa.array(cts),
            "view_ts_us": pa.array(vsel),
            "dt_us": pa.array(dsel),
        })

    return (
        read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(per_partition,
                                 batch_format="pyarrow")
    )


def seasonal_anomalies(sf_dir: str):
    """(day_us, resid_r, score_r): calendar-aware anomaly days —
    ``seasonal_decompose``'s residual screened by the robust
    median/MAD rule (|resid − median| > 3·MAD), publishing only the
    flagged days with their robust z-score. The composition entry:
    decomposition removes the weekly pattern FIRST, so a high
    Saturday doesn't alarm just for being Saturday (which is
    exactly what ``mad_outliers`` on raw values would do). MAD = 0
    (an ultra-regular series) flags nothing. Median convention:
    rank ceil(n·0.5), 1-indexed — the repo's quantile_disc
    discipline.

    Scale shape: inherits seasonal_decompose's one-exchange shape;
    the screen is O(days) driver math."""
    dec = seasonal_decompose(sf_dir)
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "resid_r": pa.array([], type=pa.float64()),
                      "score_r": pa.array([], type=pa.float64())})
    if dec.num_rows == 0:
        return empty
    day = dec["day_us"].to_numpy()
    resid = dec["resid_r"].to_numpy()
    n = resid.size
    srt = np.sort(resid, kind="stable")
    med = srt[int(np.ceil(n * 0.5)) - 1]
    ad = np.abs(resid - med)
    sad = np.sort(ad, kind="stable")
    mad = sad[int(np.ceil(n * 0.5)) - 1]
    if mad <= 0.0:
        return empty
    score = ad / mad
    flag = score > 3.0
    if not flag.any():
        return empty
    return pa.table({
        "day_us": pa.array(day[flag]),
        "resid_r": pa.array(resid[flag]),
        "score_r": pa.array(_round_vec(score[flag], 4)),
    })


def group_topk_ties(sf_dir: str, k: int = 3):
    """(o_orderpriority, o_orderkey, total_cents, rnk): top-k order
    totals per priority WITH TIES — RANK() semantics (every row
    whose value ties a top-k value is kept, so groups can exceed k
    rows), the deterministic-completeness complement of
    ``group_topk_docs``' ROW_NUMBER cut: WITH TIES output has NO
    arbitrary row selection at all, which is why hashable top-k on
    2-dp money columns should always prefer it. All-integer output.

    Scale shape: per-batch local prune to rows matching the batch's
    top-k DISTINCT values per priority (a superset of the global
    answer), then exact rank over the bounded candidate pool on the
    driver."""
    import pandas as pd

    def local(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        df = pd.DataFrame({
            "p": batch["o_orderpriority"]
            .to_numpy(zero_copy_only=False),
            "ok": batch["o_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "c": np.rint(batch["o_totalprice"]
                         .to_numpy(zero_copy_only=False) * 100.0)
            .astype(np.int64),
        })
        keep = []
        for p, g in df.groupby("p"):
            thresh = np.sort(g["c"].unique())[::-1][:k][-1]
            keep.append(g[g["c"] >= thresh])
        out = pd.concat(keep, ignore_index=True) if keep else df
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = (read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
        .map_batches(local, batch_format="pyarrow", batch_size=8192)
        .to_pandas())
    empty = pa.table({
        "o_orderpriority": pa.array([], type=pa.string()),
        "o_orderkey": pa.array([], type=pa.int64()),
        "total_cents": pa.array([], type=pa.int64()),
        "rnk": pa.array([], type=pa.int64()),
    })
    if cand.empty:
        return empty
    rows = []
    for p, g in cand.groupby("p"):
        vals = np.sort(g["c"].unique())[::-1][:k]
        thresh = vals[-1]
        gg = g[g["c"] >= thresh].sort_values(
            ["c", "ok"], ascending=[False, True], kind="mergesort")
        # RANK(): 1 + count of rows with strictly greater value
        counts = g["c"].value_counts()
        rank_of = {}
        r = 1
        for v in vals:
            rank_of[v] = r
            r += int(counts.loc[v])
        for _, row in gg.iterrows():
            rows.append((p, int(row["ok"]), int(row["c"]),
                         rank_of[int(row["c"])]))
    rows.sort()
    return pa.table({
        "o_orderpriority": pa.array([r[0] for r in rows],
                                    type=pa.string()),
        "o_orderkey": pa.array([r[1] for r in rows],
                               type=pa.int64()),
        "total_cents": pa.array([r[2] for r in rows],
                                type=pa.int64()),
        "rnk": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def kendall_tau_types(sf_dir: str):
    """(n_days, concordant, discordant, tau_r): Kendall's τ-b
    between the 'click' and 'view' daily revenue series over the
    shared zero-filled day grid — the ordinal-association
    complement of ``spearman_corr`` (ranks) and
    ``rolling_type_corr`` (windowed Pearson): τ counts pair
    ORDER agreements, so it is exact integer combinatorics until
    the single final division (tie-corrected τ-b). The day frame
    is calendar-bounded, so the O(days²) pair count is driver-trivial
    at any corpus size.

    Scale shape: one (day × 2-type) Sum exchange; pair counting on
    the driver over the day frame."""
    import pandas as pd
    from ray.data.aggregate import Sum

    tset = ROLL_CORR_TYPES

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ts": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "v": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["et"].isin(tset)]
        if df.empty:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "et": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(df["v"].to_numpy() * 100.0).astype(np.int64)
        day = df["ts"].to_numpy(dtype=np.int64) // DAY_US * DAY_US
        g = pd.DataFrame({"d": day, "et": df["et"].to_numpy(),
                          "c": cents}) \
            .groupby(["d", "et"], as_index=False).agg(c=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["d", "et"]).aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"n_days": pa.array([], type=pa.int64()),
                      "concordant": pa.array([], type=pa.int64()),
                      "discordant": pa.array([], type=pa.int64()),
                      "tau_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    lo, hi = int(daily["d"].min()), int(daily["d"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    a = np.zeros(grid.size, dtype=np.int64)
    b = np.zeros(grid.size, dtype=np.int64)
    for arr, name in ((a, tset[0]), (b, tset[1])):
        sub = daily[daily["et"] == name]
        arr[(sub["d"].to_numpy(dtype=np.int64) - lo) // DAY_US] = \
            sub["c"].to_numpy(dtype=np.int64)
    n = grid.size
    if n < 2:
        return empty
    da = np.sign(a[:, None] - a[None, :])
    db = np.sign(b[:, None] - b[None, :])
    iu = np.triu_indices(n, 1)
    prod = da[iu] * db[iu]
    C = int((prod > 0).sum())
    D = int((prod < 0).sum())
    n0 = n * (n - 1) // 2
    # tie corrections from value multiplicities
    def tsum(x):
        _, c = np.unique(x, return_counts=True)
        return int((c * (c - 1) // 2).sum())
    n1, n2 = tsum(a), tsum(b)
    den = float(n0 - n1) * float(n0 - n2)
    tau = (C - D) / np.sqrt(den) if den > 0 else 0.0
    return pa.table({
        "n_days": pa.array([n], type=pa.int64()),
        "concordant": pa.array([C], type=pa.int64()),
        "discordant": pa.array([D], type=pa.int64()),
        "tau_r": pa.array([round_half_away(float(tau), 4)]),
    })


def runs_test_daily(sf_dir: str):
    """(n_used, n_above, n_below, n_runs, z_r): Wald–Wolfowitz runs
    test for randomness of the daily revenue series — days
    dichotomize above/below the median (equal-to-median days drop,
    the standard treatment), R = count of sign runs, z = (R − μ)/σ
    with the closed-form run moments. The "is this series actually
    random?" gate that should precede every trend entry
    (``theilsen_trend``, ``holt_trend``). Counts are exact ints;
    the z formula is the identical expression tree both sides.
    Degenerate splits (n_above·n_below = 0) publish z 0. Median:
    rank ceil(n·0.5) — the repo's quantile_disc convention.

    Scale shape: daily-cents Sum exchange, O(days) driver scan."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (
        read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    empty = pa.table({"n_used": pa.array([], type=pa.int64()),
                      "n_above": pa.array([], type=pa.int64()),
                      "n_below": pa.array([], type=pa.int64()),
                      "n_runs": pa.array([], type=pa.int64()),
                      "z_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    n = c.size
    med = np.sort(c, kind="stable")[int(np.ceil(n * 0.5)) - 1]
    sgn = np.sign(c - med)
    sgn = sgn[sgn != 0]
    n1 = int((sgn > 0).sum())
    n2 = int((sgn < 0).sum())
    if sgn.size == 0:
        return empty
    R = int(1 + (sgn[1:] != sgn[:-1]).sum()) if sgn.size else 0
    if n1 * n2 == 0:
        z = 0.0
    else:
        fn1, fn2 = float(n1), float(n2)
        mu = 2.0 * fn1 * fn2 / (fn1 + fn2) + 1.0
        var = (2.0 * fn1 * fn2 * (2.0 * fn1 * fn2 - fn1 - fn2)
               / ((fn1 + fn2) * (fn1 + fn2) * (fn1 + fn2 - 1.0)))
        z = (R - mu) / np.sqrt(var)
    return pa.table({
        "n_used": pa.array([n1 + n2], type=pa.int64()),
        "n_above": pa.array([n1], type=pa.int64()),
        "n_below": pa.array([n2], type=pa.int64()),
        "n_runs": pa.array([R], type=pa.int64()),
        "z_r": pa.array([round_half_away(float(z), 4)]),
    })


def time_weighted_value(sf_dir: str):
    """(user_id, n_events, dur_us, twap_r): per-user TIME-WEIGHTED
    average value — each event's value HOLDS until the user's next
    event (the ``scd2_intervals`` validity convention, final state
    closed at the corpus-max timestamp), and the average weights by
    holding duration, not event count. The state-integral/TWAP
    surface every pricing and telemetry system needs where plain
    AVG over-counts bursts. Durations are exact int64 µs; only the
    weighted sum and final division are float (4-dp). Users whose
    total duration is 0 (single event at the corpus max) drop on
    both sides.

    Scale shape: one Max aggregate anchors the corpus end; one
    user-hash co-partition pass computes segmented durations
    vectorized and folds per-user sums — output sized by users."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    src = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"])

    def ts_max(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if t.dtype.kind == "f":
            t = t[~np.isnan(t)]
        if t.size == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(t.max())],
                                       type=pa.int64())})

    mt = src.map_batches(ts_max, batch_format="pyarrow",
                         batch_size=8192) \
        .aggregate(Max("m", alias_name="m"))
    empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64()),
                      "dur_us": pa.array([], type=pa.int64()),
                      "twap_r": pa.array([], type=pa.float64())})
    if mt is None or mt.get("m") is None:
        return empty
    T = int(mt["m"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"]
            .to_numpy(zero_copy_only=False),
            "v": batch["value"].to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"q": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "event_id": pa.array([],
                                                  type=pa.int64()),
                             "v": pa.array([], type=pa.float64())})
        u = df["user_id"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            "user_id": pa.array(u),
            "ts_us": pa.array(df["ts_us"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(df["event_id"]
                                 .to_numpy(dtype=np.int64)),
            "v": pa.array(df["v"].to_numpy(dtype=np.float64)),
        })

    def per_partition(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = group["ts_us"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = group["v"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return empty
        order = np.lexsort((eid, ts, uid))
        uid, ts, v = uid[order], ts[order], v[order]
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[last] = T
        dur = nxt - ts
        ug, inv = np.unique(uid, return_inverse=True)
        dsum = np.zeros(ug.size, dtype=np.int64)
        np.add.at(dsum, inv, dur)
        wsum = np.zeros(ug.size)
        np.add.at(wsum, inv, v * dur)
        cnt = np.bincount(inv, minlength=ug.size)
        keep = dsum > 0
        if not keep.any():
            return empty
        return pa.table({
            "user_id": pa.array(ug[keep]),
            "n_events": pa.array(cnt[keep].astype(np.int64)),
            "dur_us": pa.array(dsum[keep]),
            "twap_r": pa.array(_round_vec(
                wsum[keep] / dsum[keep], 4)),
        })

    return (src.map_batches(partial, batch_format="pyarrow",
                            batch_size=8192)
            .groupby("q").map_groups(per_partition,
                                     batch_format="pyarrow"))


_BITMAP_WIDTH = 32


def bitmap_index(sf_dir: str):
    """(event_type, bucket, mask): bitmap-index build — for every
    event type, the set of active users encoded as 32-bit bucket
    masks (bucket = user_id // 32, bit = user_id % 32), the
    roaring-bitmap-style layout real engines put behind categorical
    predicates. All-integer output → hash-exact, and the layout IS
    the operator: bitmap AND/OR across types answers the
    ``type_overlap`` family in O(buckets) words. 32-bit bits inside
    int64 words keep every mask positive on both sides (bit 63
    sign-wrap is the classic cross-engine trap).

    Scale shape: per-batch (type, bucket) mask partials (OR inside
    the batch), one bucket-hash co-partition exchange, vectorized
    OR-reduce per partition (lexsort + reduceat) — the exchange
    carries masks, never user rows."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "u": batch["user_id"].to_numpy(zero_copy_only=False),
        }).dropna().drop_duplicates()
        if df.empty:
            return pa.table({"q": pa.array([], type=pa.int64()),
                             "et": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.int64()),
                             "mask": pa.array([], type=pa.int64())})
        u = df["u"].to_numpy(dtype=np.int64)
        bucket = u // _BITMAP_WIDTH
        bit = (np.int64(1) << (u % _BITMAP_WIDTH)).astype(np.int64)
        g = pd.DataFrame({"et": df["et"].to_numpy(),
                          "bucket": bucket, "mask": bit}) \
            .groupby(["et", "bucket"], as_index=False)["mask"] \
            .agg(lambda s: int(np.bitwise_or.reduce(
                s.to_numpy(dtype=np.int64))))
        return pa.table({
            "q": pa.array((g["bucket"].to_numpy(dtype=np.int64)
                           % _USER_PARTITIONS)),
            "et": pa.array(g["et"].tolist(), type=pa.string()),
            "bucket": pa.array(g["bucket"].to_numpy(dtype=np.int64)),
            "mask": pa.array(g["mask"].to_numpy(dtype=np.int64)),
        })

    def orreduce(group: pa.Table) -> pa.Table:
        et = group["et"].to_numpy(zero_copy_only=False)
        bucket = group["bucket"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mask = group["mask"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes, uniq = pd.factorize(
            pd.MultiIndex.from_arrays([et, bucket]))
        order = np.argsort(codes, kind="stable")
        starts = np.nonzero(np.concatenate(
            ([True], np.diff(codes[order]) != 0)))[0]
        om = np.bitwise_or.reduceat(mask[order], starts)
        keys = [uniq[i] for i in codes[order][starts]]
        return pa.table({
            "event_type": pa.array([k[0] for k in keys],
                                   type=pa.string()),
            "bucket": pa.array([int(k[1]) for k in keys],
                               type=pa.int64()),
            "mask": pa.array(om),
        })

    return (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(orreduce, batch_format="pyarrow"))


def weighted_jaccard_types(sf_dir: str):
    """(type_a, type_b, sum_min, sum_max, wjacc_r): WEIGHTED Jaccard
    (Ruzicka) similarity between event-type pairs over per-user
    event-count vectors — Σ min(cₐ(u), c_b(u)) / Σ max(...), the
    multiplicity-aware refinement of ``type_overlap``'s binary
    Jaccard (a user with 100 clicks and 1 view stops counting as
    full overlap). Integer min/max sums → the single division is
    the only float, 4-dp. An empty denominator publishes 0.

    Scale shape: per-batch (user, type) count partials → one user
    groupby to the 5-column count vectors → per-batch 10-pair
    min/max partial sums → a ≤10-group combine."""
    import pandas as pd
    from ray.data.aggregate import Sum

    types = list(HLL_TYPES)
    cols = [f"c{i}" for i in range(len(types))]

    def counts_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "user_id": batch["user_id"]
            .to_numpy(zero_copy_only=False),
        }).dropna()
        df = df[df["et"].isin(types)]
        if df.empty:
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 **{c: pa.array([], type=pa.int64())
                    for c in cols}})
        for t, c in zip(types, cols):
            df[c] = (df["et"] == t).astype(np.int64)
        g = df.groupby("user_id", as_index=False)[cols].sum()
        g["user_id"] = g["user_id"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def pair_partial(batch: pa.Table) -> pa.Table:
        arrs = [batch[c].to_numpy(zero_copy_only=False)
                .astype(np.int64) for c in cols]
        ta, tb, smin, smax = [], [], [], []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                ta.append(types[i])
                tb.append(types[j])
                smin.append(int(np.minimum(arrs[i], arrs[j]).sum()))
                smax.append(int(np.maximum(arrs[i], arrs[j]).sum()))
        return pa.table({
            "type_a": pa.array(ta, type=pa.string()),
            "type_b": pa.array(tb, type=pa.string()),
            "smin": pa.array(smin, type=pa.int64()),
            "smax": pa.array(smax, type=pa.int64()),
        })

    out = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"])
        .map_batches(counts_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby("user_id")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .map_batches(pair_partial, batch_format="pyarrow",
                     batch_size=8192)
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("smin", alias_name="sum_min"),
                   Sum("smax", alias_name="sum_max"))
        .to_pandas().sort_values(["type_a", "type_b"]))
    if out.empty:
        return pa.table({"type_a": pa.array([], type=pa.string()),
                         "type_b": pa.array([], type=pa.string()),
                         "sum_min": pa.array([], type=pa.int64()),
                         "sum_max": pa.array([], type=pa.int64()),
                         "wjacc_r": pa.array([], type=pa.float64())})
    smin = out["sum_min"].to_numpy(dtype=np.int64)
    smax = out["sum_max"].to_numpy(dtype=np.int64)
    wj = np.where(smax > 0, smin / np.where(smax > 0, smax, 1), 0.0)
    return pa.table({
        "type_a": pa.array(out["type_a"].tolist(), type=pa.string()),
        "type_b": pa.array(out["type_b"].tolist(), type=pa.string()),
        "sum_min": pa.array(smin),
        "sum_max": pa.array(smax),
        "wjacc_r": pa.array(_round_vec(wj, 4)),
    })


def hist2d_qty_discount(sf_dir: str):
    """(qty_bin, disc_bin, n): 2-D histogram of lineitem
    (quantity × discount) — quantity at unit grain, discount at
    percent grain — the joint-distribution view the 1-D histograms
    (``value_histogram``, ``basket_size_dist``) can't show (is the
    discount schedule quantity-dependent?). All-integer output →
    hash-exact.

    Scale shape: per-batch (qb, db) count partials (bounded
    50×11 cells) → one tiny Sum combine."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        q = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        d = np.rint(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pd.DataFrame({"qty_bin": q, "disc_bin": d, "n": 1}) \
            .groupby(["qty_bin", "disc_bin"], as_index=False) \
            .agg(n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["qty_bin", "disc_bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values(["qty_bin", "disc_bin"]))
    return pa.table({
        "qty_bin": pa.array(out["qty_bin"].to_numpy(dtype=np.int64)),
        "disc_bin": pa.array(out["disc_bin"]
                             .to_numpy(dtype=np.int64)),
        "n": pa.array(out["n"].to_numpy(dtype=np.int64)),
    })


WILSON_Z = 1.959963984540054  # 97.5th normal quantile, fixed literal


def wilson_ci(sf_dir: str):
    """(cohort, n_users, n_converted, rate_r, lo_r, hi_r): Wilson
    95% score intervals for the purchase-conversion rate of the
    error-exposed vs unexposed user cohorts — INTERVAL estimation,
    the complement every p-value entry (``fisher_exact``,
    ``bh_brand_returns``) stops short of: how big is the effect,
    not just is it there. The Wilson form is closed-form arithmetic
    (no erf), z fixed at the shared literal, identical expression
    tree both sides; counts are exact ints from the same per-user
    flag pass ``fisher_exact`` uses. Empty cohorts emit no row.

    Scale shape: per-batch user-flag partials → one user-hash
    combine → a 4-cell counting pass; the interval math is two rows
    of driver arithmetic."""
    import pandas as pd
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "ex": pa.array([], type=pa.int64()),
                             "oc": pa.array([], type=pa.int64())})
        df["ex"] = (df["et"] == "error").astype(np.int64)
        df["oc"] = (df["et"] == "purchase").astype(np.int64)
        g = df.groupby("user_id", as_index=False).agg(
            ex=("ex", "max"), oc=("oc", "max"))
        return pa.table({
            "user_id": pa.array(g["user_id"].to_numpy(dtype=np.int64)),
            "ex": pa.array(g["ex"].to_numpy(dtype=np.int64)),
            "oc": pa.array(g["oc"].to_numpy(dtype=np.int64)),
        })

    flags = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("user_id")
        .aggregate(Max("ex", alias_name="ex"),
                   Max("oc", alias_name="oc"))
        .to_pandas())
    rows = []
    z = WILSON_Z
    for name, mask in (("exposed", flags["ex"] == 1),
                       ("unexposed", flags["ex"] == 0)):
        sub = flags[mask]
        n = len(sub)
        if n == 0:
            continue
        k = int(sub["oc"].sum())
        fn = float(n)
        p = k / fn
        denom = 1.0 + z * z / fn
        center = (p + z * z / (2.0 * fn)) / denom
        half = (z * np.sqrt(p * (1.0 - p) / fn
                            + z * z / (4.0 * fn * fn))) / denom
        rows.append((name, n, k, p, center - half, center + half))
    return pa.table({
        "cohort": pa.array([r[0] for r in rows], type=pa.string()),
        "n_users": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_converted": pa.array([r[2] for r in rows],
                                type=pa.int64()),
        "rate_r": pa.array(_round_vec(
            np.asarray([r[3] for r in rows]), 4)),
        "lo_r": pa.array(_round_vec(
            np.asarray([r[4] for r in rows]), 4)),
        "hi_r": pa.array(_round_vec(
            np.asarray([r[5] for r in rows]), 4)),
    })


def chi2_residuals(sf_dir: str):
    """(event_type, dow, n_obs, exp_r, resid_r): standardized
    (adjusted) residuals of the (type × day-of-week) contingency
    table — the CELL-level diagnostic ``chi2_events`` (one global
    statistic) and ``type_dow_mi`` (one global score) both hide:
    WHICH cells drive the dependence. resid = (o − e)/√(e·(1 −
    rm/n)·(1 − cm/n)) with e = rm·cm/n — all from exact integer
    marginals, identical expression tree, 4-dp publish. |resid| > 2
    is the classic cell-significance rule (left to the reader — the
    full table publishes).

    Scale shape: map-side (type, dow) count partials → a ≤7·|types|
    combine → driver arithmetic on the tiny table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        dow = ((ts // DAY_US) + 3) % 7
        g = pd.DataFrame({"event_type": et, "dow": dow, "n": 1}) \
            .groupby(["event_type", "dow"], as_index=False) \
            .agg(n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["event_type", "dow"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas())
    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "dow": pa.array([], type=pa.int64()),
                      "n_obs": pa.array([], type=pa.int64()),
                      "exp_r": pa.array([], type=pa.float64()),
                      "resid_r": pa.array([], type=pa.float64())})
    if cells.empty:
        return empty
    cells = cells.sort_values(["event_type", "dow"]) \
        .reset_index(drop=True)
    n = float(cells["n"].sum())
    rm = cells.groupby("event_type")["n"].transform("sum") \
        .to_numpy(dtype=np.float64)
    cm = cells.groupby("dow")["n"].transform("sum") \
        .to_numpy(dtype=np.float64)
    o = cells["n"].to_numpy(dtype=np.float64)
    e = rm * cm / n
    den = np.sqrt(e * (1.0 - rm / n) * (1.0 - cm / n))
    resid = np.where(den > 0.0, (o - e) / np.where(den > 0.0, den,
                                                   1.0), 0.0)
    return pa.table({
        "event_type": pa.array(cells["event_type"].tolist(),
                               type=pa.string()),
        "dow": pa.array(cells["dow"].to_numpy(dtype=np.int64)),
        "n_obs": pa.array(cells["n"].to_numpy(dtype=np.int64)),
        "exp_r": pa.array(_round_vec(e, 4)),
        "resid_r": pa.array(_round_vec(resid, 4)),
    })


def event_entropy_daily(sf_dir: str):
    """(day_us, n_events, entropy_r): daily Shannon entropy (nats)
    of the event-type mix — the diversity-over-time monitor
    (``user_entropy`` scores users; this watches the TRAFFIC MIX
    drift day by day: a collapsing entropy means one event type is
    eating the stream). Cells fold in sorted (day, type) order so
    the ≤|types|-term float sum per day is deterministic; counts
    exact ints; 4-dp publish.

    Scale shape: map-side (day, type) count partials → a bounded
    combine → per-day driver arithmetic over the day frame."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        day = (ts // DAY_US) * DAY_US
        g = pd.DataFrame({"day_us": day, "event_type": et, "n": 1}) \
            .groupby(["day_us", "event_type"], as_index=False) \
            .agg(n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["day_us", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas())
    empty = pa.table({"day_us": pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64()),
                      "entropy_r": pa.array([], type=pa.float64())})
    if cells.empty:
        return empty
    cells = cells.sort_values(["day_us", "event_type"],
                              kind="mergesort")
    rows = []
    for d, g in cells.groupby("day_us", sort=True):
        n = float(g["n"].sum())
        p = g["n"].to_numpy(dtype=np.float64) / n
        h = float(-(p * np.log(p)).sum())
        rows.append((int(d), int(n), h))
    return pa.table({
        "day_us": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_events": pa.array([r[1] for r in rows], type=pa.int64()),
        "entropy_r": pa.array(_round_vec(
            np.asarray([r[2] for r in rows]), 4)),
    })


CCDF_DECADES = (100, 1_000, 10_000, 100_000)  # cents thresholds


def value_ccdf(sf_dir: str):
    """(threshold_cents, n_exceed, frac_r): the event-value tail —
    complementary CDF P(value > 10^k cents) at decade thresholds,
    the heavy-tail diagnostic behind ``benford_values`` and
    ``winsorized_stats``: how much of the stream lives beyond each
    decade. Exact integer exceedance counts; one division per row.

    Scale shape: per-batch threshold-count partials (4 ints) → a
    tiny Sum combine."""
    from ray.data.aggregate import Sum

    ths = list(CCDF_DECADES)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        cents = np.rint(v * 100.0).astype(np.int64)
        return pa.table({
            "threshold_cents": pa.array(ths, type=pa.int64()),
            "ne": pa.array([int((cents > t).sum()) for t in ths],
                           type=pa.int64()),
            "nt": pa.array([int(cents.size)] * len(ths),
                           type=pa.int64()),
        })

    out = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("threshold_cents")
        .aggregate(Sum("ne", alias_name="n_exceed"),
                   Sum("nt", alias_name="n_total"))
        .to_pandas().sort_values("threshold_cents"))
    if out.empty:
        return pa.table({
            "threshold_cents": pa.array([], type=pa.int64()),
            "n_exceed": pa.array([], type=pa.int64()),
            "frac_r": pa.array([], type=pa.float64())})
    ne = out["n_exceed"].to_numpy(dtype=np.int64)
    nt = out["n_total"].to_numpy(dtype=np.int64)
    if int(nt.sum()) == 0:  # all-null value column: nothing measured
        return pa.table({
            "threshold_cents": pa.array([], type=pa.int64()),
            "n_exceed": pa.array([], type=pa.int64()),
            "frac_r": pa.array([], type=pa.float64())})
    frac = np.where(nt > 0, ne / np.where(nt > 0, nt, 1), 0.0)
    return pa.table({
        "threshold_cents": pa.array(out["threshold_cents"]
                                    .to_numpy(dtype=np.int64)),
        "n_exceed": pa.array(ne),
        "frac_r": pa.array(_round_vec(frac, 4)),
    })


def jarque_bera_daily(sf_dir: str):
    """(n_days, skew_r, kurt_r, jb_r): Jarque–Bera normality check
    on the zero-filled daily revenue series — sample skewness g₁,
    excess kurtosis g₂ − 3, JB = n/6·(g₁² + (g₂−3)²/4). The
    distributional-assumption gate for the parametric entries
    (``bollinger_bands``' ±2σ only means 95% under normality).
    Central moments fold on the driver over the day frame in the
    identical float sequence both sides (m_k = Σ(x−x̄)^k/n over the
    day-ordered series — the oracle mirrors with power sums), 4-dp
    publish. Fewer than 3 days emits nothing.

    Scale shape: daily-cents Sum exchange, O(days) driver math."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas())
    empty = pa.table({"n_days": pa.array([], type=pa.int64()),
                      "skew_r": pa.array([], type=pa.float64()),
                      "kurt_r": pa.array([], type=pa.float64()),
                      "jb_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    n = c.size
    if n < 3:
        return empty
    x = c / 100.0
    fn = float(n)
    # power sums (exact-order parity with the SQL oracle): central
    # moments via s1..s4 algebra, not np.mean chains
    s1 = float(x.sum())
    s2 = float((x * x).sum())
    s3 = float((x * x * x).sum())
    s4 = float((x * x * x * x).sum())
    mu = s1 / fn
    m2 = s2 / fn - mu * mu
    m3 = s3 / fn - 3.0 * mu * s2 / fn + 2.0 * mu * mu * mu
    m4 = (s4 / fn - 4.0 * mu * s3 / fn
          + 6.0 * mu * mu * s2 / fn - 3.0 * mu * mu * mu * mu)
    if m2 <= 0.0:
        return empty
    g1 = m3 / (m2 ** 1.5)
    g2 = m4 / (m2 * m2)
    jb = fn / 6.0 * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0)
    return pa.table({
        "n_days": pa.array([n], type=pa.int64()),
        "skew_r": pa.array([round_half_away(float(g1), 4)]),
        "kurt_r": pa.array([round_half_away(float(g2), 4)]),
        "jb_r": pa.array([round_half_away(float(jb), 4)]),
    })


ACF_MAX_LAG = 10


def _daily_cents_series(sf_dir: str):
    """Shared zero-filled daily cents series for the ACF-family
    entries: one calendar-bounded Sum exchange, driver grid fill.
    Returns (grid_day_us, cents) or (None, None) on an empty
    table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = batch["value"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        v, ts = v[ok], ts[ok].astype(np.int64)
        if v.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        cents = np.rint(v * 100.0).astype(np.int64)
        day = ts // DAY_US * DAY_US
        ud, inv = np.unique(day, return_inverse=True)
        cs = np.zeros(ud.size, dtype=np.int64)
        np.add.at(cs, inv, cents)
        return pa.table({"d": pa.array(ud), "c": pa.array(cs)})

    daily = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("c", alias_name="c"))
        .to_pandas())
    if daily.empty:
        return None, None
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    oc = daily["c"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    c = np.zeros(grid.size, dtype=np.int64)
    c[(od - grid[0]) // DAY_US] = oc
    return grid, c


def acf_daily(sf_dir: str, max_lag: int = ACF_MAX_LAG):
    """(lag, acf_r): the sample autocorrelation FUNCTION of daily
    revenue at lags 1..10 — the standard fixed-mean, fixed-
    denominator estimator r_k = Σ(x_t−x̄)(x_{t−k}−x̄)/Σ(x−x̄)².
    ``events_autocorr`` publishes one lag; the full ACF table is
    what actually diagnoses seasonality order and MA structure.
    Lags ≥ n or with zero total variance emit nothing. Centered
    products fold in day order; 4-dp publish.

    Scale shape: the shared daily-cents Sum exchange; O(lags·days)
    driver math."""
    grid, c = _daily_cents_series(sf_dir)
    empty = pa.table({"lag": pa.array([], type=pa.int64()),
                      "acf_r": pa.array([], type=pa.float64())})
    if grid is None:
        return empty
    x = c / 100.0
    n = x.size
    mu = float(x.sum()) / float(n)
    d0 = float(((x - mu) * (x - mu)).sum())
    if d0 <= 0.0:
        return empty
    rows = []
    for k in range(1, max_lag + 1):
        if k >= n:
            break
        num = float(((x[k:] - mu) * (x[:-k] - mu)).sum())
        rows.append((k, num / d0))
    if not rows:
        return empty
    return pa.table({
        "lag": pa.array([r[0] for r in rows], type=pa.int64()),
        "acf_r": pa.array(_round_vec(
            np.asarray([r[1] for r in rows]), 4)),
    })


def ljung_box_daily(sf_dir: str, max_lag: int = ACF_MAX_LAG):
    """(n_days, n_lags, q_r): Ljung–Box portmanteau statistic over
    the first 10 daily-revenue autocorrelations — Q = n(n+2)·
    Σ r_k²/(n−k), the one-number "is there ANY serial structure"
    gate that complements ``runs_test_daily`` (signs only) and
    ``acf_daily`` (per-lag detail). Shares the exact acf
    expressions; the ≤10-term fold runs in lag order. Degenerate
    series emit nothing.

    Scale shape: the shared daily-cents Sum exchange; O(lags·days)
    driver math."""
    grid, c = _daily_cents_series(sf_dir)
    empty = pa.table({"n_days": pa.array([], type=pa.int64()),
                      "n_lags": pa.array([], type=pa.int64()),
                      "q_r": pa.array([], type=pa.float64())})
    if grid is None:
        return empty
    x = c / 100.0
    n = x.size
    mu = float(x.sum()) / float(n)
    d0 = float(((x - mu) * (x - mu)).sum())
    if d0 <= 0.0 or n < 2:
        return empty
    fn = float(n)
    q = 0.0
    used = 0
    for k in range(1, max_lag + 1):
        if k >= n:
            break
        rk = float(((x[k:] - mu) * (x[:-k] - mu)).sum()) / d0
        q += rk * rk / (fn - k)
        used += 1
    if used == 0:
        return empty
    q = fn * (fn + 2.0) * q
    return pa.table({
        "n_days": pa.array([n], type=pa.int64()),
        "n_lags": pa.array([used], type=pa.int64()),
        "q_r": pa.array([round_half_away(float(q), 4)]),
    })


def dispersion_index(sf_dir: str):
    """(n_days, mean_r, var_r, vmr_r, chi2_r): variance-to-mean
    ratio of DAILY EVENT COUNTS (zero-filled) — the over/under-
    dispersion diagnostic for count data (Poisson arrivals ⇒ VMR 1;
    VMR ≫ 1 = bursty traffic, the count-domain counterpart of
    ``error_bursts``). Counts are exact ints; mean/variance fold
    from power sums in the identical order both sides; chi2 is the
    classical index-of-dispersion Σ(n_d − m)²/m. A zero-mean
    (empty) series emits nothing.

    Scale shape: per-batch (day, count) partials → calendar-bounded
    Sum → O(days) driver arithmetic."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        if ts.dtype.kind == "f":
            ts = ts[~np.isnan(ts)]
        ts = ts.astype(np.int64)
        if ts.size == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        day = ts // DAY_US * DAY_US
        ud, cnt = np.unique(day, return_counts=True)
        return pa.table({"d": pa.array(ud),
                         "n": pa.array(cnt.astype(np.int64))})

    daily = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("d").aggregate(Sum("n", alias_name="n"))
        .to_pandas())
    empty = pa.table({"n_days": pa.array([], type=pa.int64()),
                      "mean_r": pa.array([], type=pa.float64()),
                      "var_r": pa.array([], type=pa.float64()),
                      "vmr_r": pa.array([], type=pa.float64()),
                      "chi2_r": pa.array([], type=pa.float64())})
    if daily.empty:
        return empty
    daily = daily.sort_values("d")
    od = daily["d"].to_numpy(dtype=np.int64)
    on = daily["n"].to_numpy(dtype=np.int64)
    grid = np.arange(od[0], od[-1] + DAY_US, DAY_US, dtype=np.int64)
    cnt = np.zeros(grid.size, dtype=np.int64)
    cnt[(od - grid[0]) // DAY_US] = on
    d = float(cnt.size)
    s1 = int(cnt.sum())
    s2 = int((cnt * cnt).sum())
    m = s1 / d
    var = s2 / d - m * m
    if m <= 0.0:
        return empty
    vmr = var / m
    chi2 = (var * d) / m
    return pa.table({
        "n_days": pa.array([cnt.size], type=pa.int64()),
        "mean_r": pa.array([round_half_away(float(m), 4)]),
        "var_r": pa.array([round_half_away(float(var), 4)]),
        "vmr_r": pa.array([round_half_away(float(vmr), 4)]),
        "chi2_r": pa.array([round_half_away(float(chi2), 4)]),
    })


def priority_psi(sf_dir: str):
    """(o_orderpriority, n_a, n_b, contrib_r): population-stability
    index of the ORDER-PRIORITY mix between the first and second
    half of the order-date span (split at the midpoint of
    [min, max]) — ``psi_drift`` watches a numeric column's bins;
    this is the categorical-mix version with +0.5 count smoothing
    (so an absent category contributes a finite, correctly-signed
    term instead of ±inf). contrib = (p_a − p_b)·ln(p_a/p_b) per
    category; Σ contrib is the PSI. Counts exact ints; identical
    smoothing arithmetic both sides; 4-dp publish.

    Scale shape: one min/max date pass + one bounded (priority ×
    half) counting pass; driver math over ≤5 categories."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    src = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_orderpriority"])

    def dminmax(batch: pa.Table) -> pa.Table:
        t = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if t.dtype.kind == "f":
            t = t[~np.isnan(t)]
        t = t.astype(np.int64)
        if t.size == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64())})
        return pa.table({"lo": pa.array([int(t.min())],
                                        type=pa.int64()),
                         "hi": pa.array([int(t.max())],
                                        type=pa.int64())})

    mm = src.map_batches(dminmax, batch_format="pyarrow",
                         batch_size=8192) \
        .aggregate(Min("lo", alias_name="lo"),
                   Max("hi", alias_name="hi"))
    empty = pa.table({
        "o_orderpriority": pa.array([], type=pa.string()),
        "n_a": pa.array([], type=pa.int64()),
        "n_b": pa.array([], type=pa.int64()),
        "contrib_r": pa.array([], type=pa.float64())})
    if mm is None or mm.get("lo") is None:
        return empty
    split = (int(mm["lo"]) + int(mm["hi"])) // 2

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "t": batch["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "p": batch["o_orderpriority"]
            .to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"p": pa.array([], type=pa.string()),
                             "na": pa.array([], type=pa.int64()),
                             "nb": pa.array([], type=pa.int64())})
        half = (df["t"].to_numpy(dtype=np.int64)
                >= split).astype(np.int64)
        g = pd.DataFrame({"p": df["p"].to_numpy(), "na": 1 - half,
                          "nb": half}) \
            .groupby("p", as_index=False).agg(na=("na", "sum"),
                                              nb=("nb", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (src.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
           .groupby("p")
           .aggregate(Sum("na", alias_name="n_a"),
                      Sum("nb", alias_name="n_b"))
           .to_pandas().sort_values("p"))
    if agg.empty:
        return empty
    na = agg["n_a"].to_numpy(dtype=np.int64)
    nb = agg["n_b"].to_numpy(dtype=np.int64)
    ta, tb = float(na.sum()), float(nb.sum())
    k = float(len(agg))
    pa_ = (na + 0.5) / (ta + 0.5 * k)
    pb_ = (nb + 0.5) / (tb + 0.5 * k)
    contrib = (pa_ - pb_) * np.log(pa_ / pb_)
    return pa.table({
        "o_orderpriority": pa.array(agg["p"].tolist(),
                                    type=pa.string()),
        "n_a": pa.array(na),
        "n_b": pa.array(nb),
        "contrib_r": pa.array(_round_vec(contrib, 4)),
    })


def first_touch_dist(sf_dir: str):
    """(event_type, n_users, share_r): the FIRST-touch distribution
    — each user's very first event (under the (ts, event_id) total
    order) classified by type, as counts and shares of all users.
    The top-of-funnel acquisition mix ``last_touch_attribution``
    (conversion credit) and ``session_funnel`` (within-session)
    both skip. Exact integer counts; one division per row.

    Scale shape: per-batch first-per-user compaction (the
    latest_events argmin mirror — exchange carries key-cardinality
    rows), one user-hash co-partition final argmin, then a
    ≤|types| counting combine."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"]
            .to_numpy(zero_copy_only=False),
        }).dropna()
        if df.empty:
            return pa.table({"q": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "et": pa.array([], type=pa.string()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "event_id": pa.array([],
                                                  type=pa.int64())})
        g = df.sort_values(["user_id", "ts_us", "event_id"],
                           kind="mergesort") \
            .drop_duplicates(subset=["user_id"], keep="first")
        u = g["user_id"].to_numpy(dtype=np.int64)
        return pa.table({
            "q": pa.array((u % _USER_PARTITIONS).astype(np.int64)),
            "user_id": pa.array(u),
            "et": pa.array(g["et"].tolist(), type=pa.string()),
            "ts_us": pa.array(g["ts_us"].to_numpy(dtype=np.int64)),
            "event_id": pa.array(g["event_id"]
                                 .to_numpy(dtype=np.int64)),
        })

    def final(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        g = df.sort_values(["user_id", "ts_us", "event_id"],
                           kind="mergesort") \
            .drop_duplicates(subset=["user_id"], keep="first")
        c = g.groupby("et").size().reset_index(name="n")
        return pa.table({
            "et": pa.array(c["et"].tolist(), type=pa.string()),
            "n": pa.array(c["n"].to_numpy(dtype=np.int64)),
        })

    out = (read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts", "event_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("q").map_groups(final, batch_format="pyarrow")
        .groupby("et").aggregate(Sum("n", alias_name="n_users"))
        .to_pandas().sort_values("et"))
    if out.empty:
        return pa.table({"event_type": pa.array([], type=pa.string()),
                         "n_users": pa.array([], type=pa.int64()),
                         "share_r": pa.array([], type=pa.float64())})
    n = out["n_users"].to_numpy(dtype=np.int64)
    tot = float(n.sum())
    return pa.table({
        "event_type": pa.array(out["et"].tolist(), type=pa.string()),
        "n_users": pa.array(n),
        "share_r": pa.array(_round_vec(n / tot, 4)),
    })
