"""Driver-contract registry invariants — fast checks that don't execute
pipelines: every oracle key has a queries() entry, every callable takes one
positional sf_dir, rows-only entries are the documented set, and the oracle
SQL parses in DuckDB against empty views (catches SQL syntax/binder errors
without running the engine side)."""

import inspect

import duckdb
import pytest


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


# r5 (VERDICT r4 item 7): the former rows-only trio (fingerprint_rolling,
# multimodal_features, frame_sample) was folded into its oracle-backed
# flat/hex projections — every registry entry now has an oracle.
ROWS_ONLY: set[str] = set()

EMPTY_VIEWS = {
    "documents": "SELECT CAST(0 AS BIGINT) AS doc_id, '' AS text, '' AS lang, '' AS source, CAST(0 AS BIGINT) AS n_chars WHERE 1=0",
    "embeddings": "SELECT CAST(0 AS BIGINT) AS vec_id, [0.0] AS embedding, CAST(0 AS INTEGER) AS label WHERE 1=0",
    "events": "SELECT CAST(0 AS BIGINT) AS event_id, CAST(0 AS BIGINT) AS user_id, TIMESTAMP '2026-01-01' AS ts, '' AS event_type, 0.0 AS value, '' AS props WHERE 1=0",
    "orders": "SELECT CAST(0 AS BIGINT) AS o_orderkey, CAST(0 AS BIGINT) AS o_custkey, '' AS o_orderstatus, 0.0 AS o_totalprice, TIMESTAMP '2026-01-01' AS o_orderdate, '' AS o_orderpriority WHERE 1=0",
    "customer": "SELECT CAST(0 AS BIGINT) AS c_custkey, CAST(0 AS BIGINT) AS c_nationkey, '' AS c_name, '' AS c_mktsegment, 0.0 AS c_acctbal WHERE 1=0",
    "lineitem": "SELECT CAST(0 AS BIGINT) AS l_orderkey, CAST(0 AS BIGINT) AS l_partkey, CAST(0 AS BIGINT) AS l_suppkey, CAST(0 AS INTEGER) AS l_linenumber, 0.0 AS l_quantity, 0.0 AS l_extendedprice, 0.0 AS l_discount, 0.0 AS l_tax, '' AS l_returnflag, '' AS l_linestatus, TIMESTAMP '2026-01-01' AS l_shipdate WHERE 1=0",
    "nation": "SELECT CAST(0 AS BIGINT) AS n_nationkey, CAST(0 AS BIGINT) AS n_regionkey, '' AS n_name WHERE 1=0",
    "supplier": "SELECT CAST(0 AS BIGINT) AS s_suppkey, CAST(0 AS BIGINT) AS s_nationkey, '' AS s_name, 0.0 AS s_acctbal WHERE 1=0",
    "part": "SELECT CAST(0 AS BIGINT) AS p_partkey, '' AS p_name, '' AS p_brand, '' AS p_type, CAST(0 AS INTEGER) AS p_size, 0.0 AS p_retailprice WHERE 1=0",
    "region": "SELECT CAST(0 AS BIGINT) AS r_regionkey, '' AS r_name WHERE 1=0",
}


def test_every_oracle_has_a_query(contract):
    qs, osql = contract
    assert set(osql) <= set(qs), set(osql) - set(qs)


def test_rows_only_set_is_exactly_documented(contract):
    qs, osql = contract
    assert set(qs) - set(osql) == ROWS_ONLY


def test_callables_take_one_positional_sf_dir(contract):
    qs, _ = contract
    for name, fn in qs.items():
        sig = inspect.signature(fn)
        required = [
            p
            for p in sig.parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
        ]
        assert len(required) == 1, f"{name}: {sig}"


def test_oracle_sql_parses_and_binds(contract):
    _, osql = contract
    con = duckdb.connect()
    for t, body in EMPTY_VIEWS.items():
        con.execute(f"CREATE VIEW {t} AS {body}")
    for name, sql in osql.items():
        try:
            con.execute(sql)
        except Exception as ex:  # noqa: BLE001
            pytest.fail(f"{name}: oracle SQL failed to bind: {ex}")


def test_documented_registry_counts_match(contract):
    """The count-drift guard (a VERDICT r3 finding: docs said 58, registry
    held 57): the LAST 'Registry after §N: **X entries, Y oracle-backed**'
    line in SURVEY.md must state the actual registry size and oracle
    coverage. Update SURVEY.md when adding an entry — this test is the
    reminder."""
    import pathlib
    import re

    qs, osql = contract
    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "SURVEY.md").read_text()
    matches = re.findall(
        r"Registry after §\d+: \*\*(\d+) entries, (\d+) oracle-backed\*\*",
        text,
    )
    assert matches, "SURVEY.md registry-count line not found"
    n_entries, n_oracle = map(int, matches[-1])
    assert n_entries == len(qs), (n_entries, len(qs))
    assert n_oracle == len(osql), (n_oracle, len(osql))


def test_r5_window_is_exactly_the_first_50(contract):
    """The driver checks the FIRST 50 queries() entries; the window list
    must resolve completely (a typo'd name would silently shrink the
    window) and must be exactly the registry's head."""
    import __ray_entry__ as e

    qs, _ = contract
    assert len(e._R5_WINDOW) == 50
    assert len(set(e._R5_WINDOW)) == 50
    missing = [n for n in e._R5_WINDOW if n not in qs]
    assert not missing, missing
    assert list(qs)[:50] == e._R5_WINDOW
