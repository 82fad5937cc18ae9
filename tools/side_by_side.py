"""Driver-style correctness sweep: run every ``queries()`` entry and its
``oracle_sql()`` side-by-side over an sf-style table directory, compare
rows / schema / values exactly (columns sorted by name, rows sorted by all
columns — the driver's comparison discipline).

Usage::

    python tools/side_by_side.py [/root/testdata/sf0.01] [--json OUT.json]

Exit code 0 iff every oracle-backed entry matches and every entry runs.
``--json`` additionally writes a driver-style record per entry
(rows/schema/hash matches, row counts, error) — the committed
``CORRECTNESS_full_r{N}.json`` artifact covering ALL entries, not just
the driver's 50-entry window.
"""

import json
import os
import sys


def main(sf: str, json_out: str | None = None,
         only: str | None = None, first: int | None = None) -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    if first is not None:
        qs = {k: v for i, (k, v) in enumerate(qs.items()) if i < first}
    if only:
        qs = {k: v for k, v in qs.items() if only in k}
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        records[name] = rec
        try:
            res = fn(sf)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            n = len(res)
            rec["spark_rows"] = int(n)
            if name not in osql:
                rec["err"] = "no_oracle"
                print(f"{name:28s} rows={n:<7d} (rows-only)")
                continue
            ora = con.execute(osql[name]).df()
            rec["oracle_rows"] = int(len(ora))
            cols = sorted(res.columns)
            rec["schema_match"] = cols == sorted(ora.columns)
            if not rec["schema_match"]:
                fails.append((name, f"schema {cols} vs {sorted(ora.columns)}"))
                print(f"{name:28s} SCHEMA MISMATCH")
                continue
            a = res[cols].sort_values(cols).reset_index(drop=True)
            b = ora[cols].sort_values(cols).reset_index(drop=True)
            rec["rows_match"] = a.shape == b.shape
            if not rec["rows_match"]:
                fails.append((name, f"rows {a.shape} vs {b.shape}"))
                print(f"{name:28s} ROWS MISMATCH {a.shape} vs {b.shape}")
                continue
            rec["hash_match"] = bool((a.values == b.values).all())
            if not rec["hash_match"]:
                fails.append((name, "values"))
                print(f"{name:28s} VALUE MISMATCH")
            else:
                print(f"{name:28s} rows={n:<7d} OK")
        except Exception as ex:  # noqa: BLE001 — report and continue
            rec["err"] = repr(ex)
            fails.append((name, repr(ex)))
            print(f"{name:28s} ERROR {ex}")

    print("\nFAILS:", fails if fails else "none")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1)
        print("wrote", json_out)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--only", default=None,
                    help="run only entries whose name contains this")
    ap.add_argument("--first", type=int, default=None,
                    help="run only the first N registry entries (the "
                         "driver's window discipline)")
    ns = ap.parse_args()
    sys.exit(main(ns.sf, ns.json_out, ns.only, ns.first))
