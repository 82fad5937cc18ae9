"""Oracle self-consistency + reference search-semantics tests on F1-tiny."""

import pyarrow as pa
import pytest

from searchengine_ray.config import EngineConfig
from searchengine_ray.corpus import generate_transcripts, reference_queries
from searchengine_ray.oracle import OracleIndex, OracleSearcher
from searchengine_ray.results import ERROR_EMPTY_QUERY, ERROR_NOTHING_FOUND
from searchengine_ray.textproc import lemma_of


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    return OracleSearcher(OracleIndex(tiny_corpus))


def _mini_table(rows):
    return pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
        }
    )


class TestIndexContent:
    def test_stats(self, tiny_corpus):
        idx = OracleIndex(tiny_corpus)
        assert idx.n_docs == tiny_corpus.num_rows  # corpus is duplicate-free
        assert idx.avgdl > 0
        assert idx.total_len == sum(idx.doc_len.values())

    def test_tf_counting(self):
        idx = OracleIndex(_mini_table([("c0", 0, "суд суд дело"), ("c1", 0, "суд")]))
        base = lemma_of("суд")
        assert idx.postings[base][("c0", 0)] == 2
        assert idx.postings[base][("c1", 0)] == 1
        assert idx.df(base) == 2
        assert idx.doc_len[("c0", 0)] == 3

    def test_empty_doc_counts_in_n(self):
        idx = OracleIndex(_mini_table([("c0", 0, "суд"), ("c1", 0, "")]))
        assert idx.n_docs == 2
        assert idx.doc_len[("c1", 0)] == 0

    def test_dedup_first_wins(self):
        idx = OracleIndex(_mini_table([("c0", 0, "суд"), ("c0", 0, "дело")]))
        assert idx.n_docs == 1
        assert idx.texts[("c0", 0)] == "суд"


class TestSearchSemantics:
    def test_empty_query(self, oracle):
        r = oracle.search("")
        assert r["result"] is False and r["error"] == ERROR_EMPTY_QUERY

    def test_insignificant_query(self, oracle):
        for q in ["и в на", "?!, .", "hello"]:
            assert oracle.search(q)["result"] is False, q

    def test_missing_term_zero_results(self, oracle):
        r = oracle.search("суд абракадабрион")
        assert r["result"] is False and r["error"] == ERROR_NOTHING_FOUND

    def test_and_semantics(self, oracle):
        idx = oracle.index
        r_and = oracle.search("суд решение", limit=10_000)
        if r_and["result"]:
            base_a, base_b = lemma_of("суд"), lemma_of("решение")
            both = set(idx.postings[base_a]) & set(idx.postings[base_b])
            assert r_and["count"] == len(both)

    def test_scores_descending_and_tiebreak(self, oracle):
        r = oracle.search("суд", limit=50)
        assert r["result"]
        rows = [(d["relevance"], d["conv_id"], d["turn_idx"]) for d in r["data"]]
        for a, b in zip(rows, rows[1:]):
            assert (-a[0], a[1], a[2]) <= (-b[0], b[1], b[2])

    def test_inflected_query_matches_base(self, oracle):
        r1 = oracle.search("суда", limit=5)
        r2 = oracle.search("суд", limit=5)
        assert r1["count"] == r2["count"]

    def test_pagination(self, oracle):
        full = oracle.search("суд", limit=20)
        page = oracle.search("суд", offset=5, limit=5)
        assert [d["uri"] for d in page["data"]] == [d["uri"] for d in full["data"][5:10]]
        assert page["count"] == full["count"]

    def test_offset_beyond(self, oracle):
        r = oracle.search("суд", offset=10_000, limit=10)
        assert r["result"] and r["data"] == [] and r["count"] > 0

    def test_latin_dropped_from_query(self, oracle):
        # latin word is insignificant → query reduces to "суд"
        assert oracle.search("hello суд")["count"] == oracle.search("суд")["count"]

    def test_identifier_gate_bypass(self):
        # stopword-like content term above the gate is dropped; identifier passes
        rows = [("c0", i, f"337 суд номер 337") for i in range(5)]
        t = _mini_table(rows + [("c9", 0, "дело")])
        cfg = EngineConfig(search_filter=50)
        s = OracleSearcher(OracleIndex(t, cfg))
        r = s.search("337")
        assert r["result"] and r["count"] == 5

    def test_frequency_gate_drops_common_lemma(self):
        rows = [("c0", i, "суд общий") for i in range(10)]
        t = _mini_table(rows)
        cfg = EngineConfig(search_filter=50)  # 100*10/10 = 100 > 50 → dropped
        s = OracleSearcher(OracleIndex(t, cfg))
        assert s.search("суд")["result"] is False

    def test_all_reference_queries_run(self, oracle):
        for q in reference_queries():
            r = oracle.search(q["query"], q["offset"], q["limit"])
            assert "result" in r and "count" in r


class TestSnippets:
    def test_snippet_highlights(self, oracle):
        r = oracle.search("суд", limit=5)
        assert r["result"]
        assert any("<b>" in d["snippet"] for d in r["data"])

    def test_snippet_window_shape(self):
        words = [f"w{i}" for i in range(40)]
        text = " ".join(words[:20]) + " суд " + " ".join(words[20:])
        s = OracleSearcher(OracleIndex(_mini_table([("c0", 0, text)])))
        r = s.search("суд")
        snip = r["data"][0]["snippet"]
        assert snip.startswith("...") and snip.endswith("...")
        assert "<b>суд</b>" in snip
        # ±5 window → exactly 11 words in the fragment
        inner = snip[3:-3]
        assert len(inner.split(" ")) == 11

    def test_snippet_max_three_windows(self):
        # hits far apart → max 3 fragments joined by " ... "
        filler = " ".join(["слово"] * 20)
        text = " суд ".join([filler] * 6)
        s = OracleSearcher(OracleIndex(_mini_table([("c0", 0, text)])))
        snip = s.search("суд")["data"][0]["snippet"]
        assert snip.count(" ... ") <= 2

    def test_adjacent_hits_merge(self):
        text = "а-пр суд суд б-пр"  # two adjacent hits → one window
        s = OracleSearcher(OracleIndex(_mini_table([("c0", 0, "суд суд")])))
        snip = s.search("суд")["data"][0]["snippet"]
        assert " ... " not in snip


def test_jaccard_sql_short_doc_branch_matches_engine_shingler():
    """Docs whose normalized text is 1-2 chars collapse to one whole-doc
    shingle in char_shingle_array; the SQL oracle's short branch must pair
    them identically (code-review regression)."""
    import duckdb

    from __ray_entry__ import _jaccard_pairs_sql
    from searchengine_ray.pipelines.dedup import char_shingles

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, 'ab'), (1, 'AB'), (2, 'abc def ghi'), (3, 'abc def ghi'), (4, NULL)"
        ") AS t(doc_id, text)"
    )
    out = con.execute(_jaccard_pairs_sql("char")).df()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(0, 1), (2, 3)}
    # engine-side shingler agrees on the short docs
    assert char_shingles("ab") == char_shingles("AB") != set()
