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
        rd.read_parquet(
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


def sessionize_events(sf_dir: str):
    """Gap-based session windows per user (gap > 30 min starts a new
    session): (user_id, session_start_us, n_events, duration_us_max).

    Shape: ``groupby(user_id).map_groups`` — sessions need a per-user time
    sort, which the groupby co-locates; each group is one user's events
    (bounded: sessions never span users, so there is no global sort). The
    SQL mirror is the classic lag/cumsum session assignment."""
    import pandas as pd
    import ray.data as rd

    def sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        uid = group["user_id"][0].as_py()
        new_sess = np.empty(ts.size, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        sess_id = np.cumsum(new_sess) - 1
        starts = ts[new_sess]
        n_events = np.bincount(sess_id)
        ends = np.maximum.reduceat(ts, np.nonzero(new_sess)[0])
        return pa.table(
            {
                "user_id": pa.array([uid] * starts.size, type=pa.int64()),
                "session_start_us": pa.array(starts, type=pa.int64()),
                "n_events": pa.array(n_events, type=pa.int64()),
                "duration_us": pa.array(ends - starts, type=pa.int64()),
            }
        )

    out = (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["user_id", "session_start_us"], kind="stable").reset_index(
        drop=True
    )


def asof_join_events(sf_dir: str):
    """As-of join (an operator Ray Data lacks): each 'click' event matched
    to the SAME user's most recent 'view' event at ts ≤ click ts. Composed
    as one read + side tags + ``groupby(user_id).map_groups`` with a sorted
    ``searchsorted`` merge per user — the partitioning assumption is that
    one user's history fits a task (same as sessionization); range-salting
    by time would bound pathological users. Returns
    (event_id, user_id, ts_us, view_ts_us, view_value_r)."""
    import ray.data as rd

    def per_user(group: pa.Table) -> pa.Table:
        et = group["event_type"].to_numpy(zero_copy_only=False)
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        val = group["value"].to_numpy(zero_copy_only=False)
        uid = group["user_id"][0].as_py()
        is_view = et == "view"
        is_click = et == "click"
        vts = ts[is_view]
        vval = val[is_view]
        o = np.argsort(vts, kind="stable")
        vts, vval = vts[o], vval[o]
        cts = ts[is_click]
        ceid = eid[is_click]
        pos = np.searchsorted(vts, cts, side="right") - 1
        ok = pos >= 0
        return pa.table(
            {
                "event_id": pa.array(ceid[ok], type=pa.int64()),
                "user_id": pa.array(np.full(int(ok.sum()), uid), type=pa.int64()),
                "ts_us": pa.array(cts[ok], type=pa.int64()),
                "view_ts_us": pa.array(vts[pos[ok]], type=pa.int64()),
                "view_value_r": pa.array(_round_vec(vval[pos[ok]]), type=pa.float64()),
            }
        )

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type", "value"],
        )
        .filter(lambda r: r["event_type"] in ("view", "click"))
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("event_id", kind="stable").reset_index(drop=True)


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
        rd.read_parquet(
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
