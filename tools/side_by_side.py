"""Driver-style correctness sweep: run every ``queries()`` entry and its
``oracle_sql()`` side-by-side over an sf-style table directory, compare
rows / schema / values exactly (columns sorted by name, rows sorted by all
columns — the driver's comparison discipline).

Usage::

    python tools/side_by_side.py [/root/testdata/sf0.01]

Exit code 0 iff every oracle-backed entry matches and every entry runs.
"""

import os
import sys


def main(sf: str) -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails = []
    for name, fn in qs.items():
        try:
            res = fn(sf)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            n = len(res)
            if name not in osql:
                print(f"{name:28s} rows={n:<7d} (rows-only)")
                continue
            ora = con.execute(osql[name]).df()
            cols = sorted(res.columns)
            if cols != sorted(ora.columns):
                fails.append((name, f"schema {cols} vs {sorted(ora.columns)}"))
                print(f"{name:28s} SCHEMA MISMATCH")
                continue
            a = res[cols].sort_values(cols).reset_index(drop=True)
            b = ora[cols].sort_values(cols).reset_index(drop=True)
            if a.shape != b.shape:
                fails.append((name, f"rows {a.shape} vs {b.shape}"))
                print(f"{name:28s} ROWS MISMATCH {a.shape} vs {b.shape}")
                continue
            if not (a.values == b.values).all():
                fails.append((name, "values"))
                print(f"{name:28s} VALUE MISMATCH")
            else:
                print(f"{name:28s} rows={n:<7d} OK")
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append((name, repr(ex)))
            print(f"{name:28s} ERROR {ex}")

    print("\nFAILS:", fails if fails else "none")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
