"""2M-order purchase-graph scale probe — round-5 edition.

Round 4 probed pagerank/hops/affinity on a 2M-order / 8M-lineitem Zipf
graph. This edition re-runs it against the r5 ``supplier_affinity``
degree-threshold split with an ADVERSARIAL degree distribution: three
planted mega-customers each buy from ``MEGA_DEGREE`` (4×
``AFFINITY_DEGREE_CAP``) distinct suppliers, so the grid-cell deferral
path MUST activate (the gate measures max degree > cap), while the Zipf
bulk keeps the hot-pair regime of the r4 probe. The affinity top-k is
verified EXACTLY against a DuckDB brute-force at full scale — the
adversarial-at-scale evidence VERDICT r4 item 1 asked for.

Usage::

    python tools/scale_probe_graph.py [--cpus 32] [--orders 2000000]

Prints per-entry walls + the affinity verification verdict; paste into
BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_CUSTOMERS = 200_000
N_SUPPLIERS = 10_000
ITEMS_PER_ORDER = 4
MEGA_CUSTOMERS = 3


def build_corpus(out_dir: str, n_orders: int, mega_degree: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    # Zipf-ish skew: customer/supplier ranks drawn from a truncated zipf
    cust = (rng.zipf(1.3, size=n_orders) - 1) % N_CUSTOMERS
    okey = np.arange(n_orders, dtype=np.int64) + 1
    base_orders = pa.table({"o_orderkey": okey,
                            "o_custkey": pa.array(cust.astype(np.int64))})
    n_items = n_orders * ITEMS_PER_ORDER
    supp = (rng.zipf(1.2, size=n_items) - 1) % N_SUPPLIERS
    l_okey = np.repeat(okey, ITEMS_PER_ORDER)
    # plant the mega customers as extra orders carrying mega_degree
    # distinct suppliers each
    extra_ok, extra_sk = [], []
    for m in range(MEGA_CUSTOMERS):
        c = 10_000_000 + m  # ids outside the zipf range: unambiguous
        ok = n_orders + 1 + m
        extra_ok.append(pa.table({
            "o_orderkey": pa.array([ok], type=pa.int64()),
            "o_custkey": pa.array([c], type=pa.int64()),
        }))
        sks = (np.arange(mega_degree, dtype=np.int64) * (m + 1)) \
            % (N_SUPPLIERS * 4)
        sks = np.unique(sks)[:mega_degree]
        extra_sk.append(pa.table({
            "l_orderkey": pa.array(np.full(sks.size, ok, dtype=np.int64)),
            "l_suppkey": pa.array(sks),
        }))
    pq.write_table(pa.concat_tables([base_orders] + extra_ok),
                   os.path.join(out_dir, "orders.parquet"))
    items_all = pa.concat_tables(
        [pa.table({"l_orderkey": pa.array(l_okey),
                   "l_suppkey": pa.array(supp.astype(np.int64))})] + extra_sk)
    pq.write_table(items_all, os.path.join(out_dir, "lineitem.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--orders", type=int, default=2_000_000)
    ap.add_argument("--out", default="/tmp/graph_probe_2m")
    ap.add_argument("--skip-build", action="store_true")
    ns = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from searchengine_ray.pipelines.graph import AFFINITY_DEGREE_CAP

    mega_degree = AFFINITY_DEGREE_CAP * 4
    if not ns.skip_build:
        print(f"building {ns.orders}-order corpus (mega degree {mega_degree})")
        build_corpus(ns.out, ns.orders, mega_degree)

    import duckdb

    con = duckdb.connect()
    dmax, = con.execute(f"""
        SELECT max(d) FROM (
          SELECT o.o_custkey, count(DISTINCT l.l_suppkey) AS d
          FROM read_parquet('{ns.out}/orders.parquet') o
          JOIN read_parquet('{ns.out}/lineitem.parquet') l
            ON l.l_orderkey = o.o_orderkey
          GROUP BY 1)""").fetchone()
    print(f"max customer degree: {dmax} (cap {AFFINITY_DEGREE_CAP}; "
          f"split path {'ACTIVATES' if dmax > AFFINITY_DEGREE_CAP else 'idle'})")

    import ray

    ray.init(address="local", num_cpus=ns.cpus, include_dashboard=False,
             logging_level="ERROR")
    from searchengine_ray.pipelines.graph import (
        pagerank_purchases,
        purchase_hops,
        supplier_affinity,
    )

    walls = {}
    t0 = time.monotonic()
    aff = supplier_affinity(ns.out)
    walls["supplier_affinity"] = round(time.monotonic() - t0, 2)
    for name, fn in (("pagerank_purchases", pagerank_purchases),
                     ("purchase_hops", purchase_hops)):
        t0 = time.monotonic()
        fn(ns.out)
        walls[name] = round(time.monotonic() - t0, 2)
    ray.shutdown()

    # exact brute-force verification of the affinity top-20 at full scale
    exp = con.execute(f"""
        WITH e AS (
          SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
          FROM read_parquet('{ns.out}/orders.parquet') o
          JOIN read_parquet('{ns.out}/lineitem.parquet') l
            ON l.l_orderkey = o.o_orderkey)
        SELECT a.s AS supp_a, b.s AS supp_b,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM e a JOIN e b ON b.c = a.c AND a.s < b.s
        GROUP BY 1, 2
        ORDER BY n_customers DESC, supp_a, supp_b
        LIMIT 20""").df()
    ok = (aff["supp_a"].tolist() == exp["supp_a"].tolist()
          and aff["supp_b"].tolist() == exp["supp_b"].tolist()
          and aff["n_customers"].tolist() == exp["n_customers"].tolist())
    print(json.dumps({"walls": walls, "max_degree": int(dmax),
                      "affinity_exact_match": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
