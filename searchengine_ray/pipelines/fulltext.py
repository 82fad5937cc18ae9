"""Ad-hoc full-text pipelines over the ``documents`` table (simple analyzer).

These are the index-build data flows (M1-M4, A1-A3 of SURVEY.md §2) expressed
as *pure Dataset pipelines* whose semantics are exactly mirrorable in ANSI SQL
— they back the DuckDB oracle checks. The serving path with the compressed
index is :mod:`searchengine_ray.build` / :mod:`searchengine_ray.query`; this
module is the "no prebuilt index" variant (two streaming passes, no
materialization of the corpus).

Conventions shared with ``__ray_entry__.oracle_sql``:
- tokens: ``regexp_extract_all(lower(text), '[a-z0-9]+')``,
- significant: length ≥ 2 and not in ``textproc.EN_STOPWORDS``,
- lemma = token (identity), doc key = ``doc_id``,
- N = count(documents); dl = Σ tf over the doc's significant tokens,
- BM25 with k1=1.2 b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)),
- scores rounded half-away-from-zero to 4 dp (DuckDB ROUND semantics) BEFORE
  ranking, tie-break doc_id asc.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa

from searchengine_ray import scoring
from searchengine_ray.textproc import Analyzer


def round_half_away(x: float, ndigits: int = 4) -> float:
    """DuckDB-compatible ROUND (half away from zero; Python's round() is
    banker's rounding and would disagree on exact .5 boundaries)."""
    scale = 10.0**ndigits
    return math.floor(abs(x) * scale + 0.5) / scale * (1.0 if x >= 0 else -1.0)


def _round_vec(a: np.ndarray, ndigits: int = 4) -> np.ndarray:
    scale = 10.0**ndigits
    return np.floor(np.abs(a) * scale + 0.5) / scale * np.sign(a)


def read_documents(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=list(columns))


class ExplodeSimple:
    """Actor-pool stage: documents batch → (token, doc_id, tf, dl) rows.
    Analyzer + memo caches built once per actor (ST1 pattern)."""

    def __init__(self):
        self.analyzer = Analyzer("simple")
        self._sig: dict[str, bool] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        a = self.analyzer
        sig = self._sig
        tokens: list[str] = []
        out_doc: list[int] = []
        tfs: list[int] = []
        dls: list[int] = []
        for did, text in zip(doc_ids.tolist(), texts):
            counts: dict[str, int] = {}
            for w in a.tokens(text or ""):
                s = sig.get(w)
                if s is None:
                    s = sig[w] = a.significant(w)
                if s:
                    counts[w] = counts.get(w, 0) + 1
            dl = sum(counts.values())
            for tok, tf in counts.items():
                tokens.append(tok)
                out_doc.append(did)
                tfs.append(tf)
                dls.append(dl)
        return pa.table(
            {
                "lemma": pa.array(tokens, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "tf": pa.array(tfs, type=pa.int64()),
                "dl": pa.array(dls, type=pa.int64()),
            }
        )


def postings(sf_dir: str):
    """Exploded postings (lemma, doc_id, tf) — reference `index` table shape
    (model/Index.java:12-23) over documents."""
    return (
        read_documents(sf_dir)
        .map_batches(ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2)
        .select_columns(["lemma", "doc_id", "tf"])
    )


def lemma_df(sf_dir: str):
    """Term dictionary (lemma, df, cf) — reference `lemma` table + df upsert
    semantics (Repositories/LemmaRepository.java:25-30) as one groupby."""
    from ray.data.aggregate import Count, Sum

    ds = read_documents(sf_dir).map_batches(
        ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2
    )
    return ds.groupby("lemma").aggregate(
        Count(alias_name="df"), Sum("tf", alias_name="cf")
    )


def doc_lengths(sf_dir: str):
    """(doc_id, dl) for docs with ≥1 significant token."""
    ds = read_documents(sf_dir).map_batches(
        ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2
    )

    def first_dl(batch: pa.Table) -> pa.Table:
        # one (doc_id, dl) per doc; explode emits identical dl on each row
        df = batch.select(["doc_id", "dl"]).to_pandas().drop_duplicates("doc_id")
        return pa.Table.from_pandas(df, preserve_index=False)

    # map-side dedup first (explode clusters a doc's rows in one batch),
    # then an exact global dedup via groupby-min (dl is constant per doc).
    from ray.data.aggregate import Min

    return (
        ds.map_batches(first_dl, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("dl", alias_name="dl"))
    )


def doc_stats(sf_dir: str):
    """Single-row global stats (n_docs, n_tokens, avgdl_r) — A3 analogue."""
    ds = read_documents(sf_dir)
    n_docs = ds.count()
    total = (
        ds.map_batches(ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2)
        .sum("tf")
    )
    total = int(total or 0)
    avgdl = total / n_docs if n_docs else 0.0
    return pa.table(
        {
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "n_tokens": pa.array([total], type=pa.int64()),
            "avgdl_r": pa.array([round_half_away(avgdl, 4)], type=pa.float64()),
        }
    )


def top_terms(sf_dir: str, k: int = 20):
    """Global top-k lemmas by collection frequency; deterministic
    (cf desc, lemma asc) order, returned with rank."""
    t = lemma_df(sf_dir).to_pandas()
    t = t.sort_values(["cf", "lemma"], ascending=[False, True], kind="stable").head(k)
    t = t.reset_index(drop=True)
    t["rank"] = t.index.astype("int64")
    return t[["rank", "lemma", "df", "cf"]]


def _query_stats(sf_dir: str, terms: list[str]):
    """One streaming pass: global Σtf + per-query-term df via map-side partial
    aggregation (pre-aggregate inside map_batches, then a tiny groupby)."""
    term_set = set(terms)

    def partial(batch: pa.Table) -> pa.Table:
        lem = batch["lemma"].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        keys = ["\x00total"]
        dfs = [0]
        tfs = [int(tf.sum())]
        for t in term_set:
            m = lem == t
            keys.append(t)
            dfs.append(int(m.sum()))
            tfs.append(0)
        return pa.table(
            {
                "k": pa.array(keys, type=pa.string()),
                "df_p": pa.array(dfs, type=pa.int64()),
                "tf_p": pa.array(tfs, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    ds = (
        read_documents(sf_dir)
        .map_batches(ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("df_p", alias_name="df"), Sum("tf_p", alias_name="total"))
    )
    out = {r["k"]: r for r in ds.take_all()}
    total = int(out["\x00total"]["total"])
    dfs = {t: int(out[t]["df"]) if t in out else 0 for t in term_set}
    return total, dfs


def bm25_adhoc(sf_dir: str, query: str, k: int = 10):
    """Indexless conjunctive BM25 top-k as a pure Dataset pipeline:
    stats pass (partial-aggregated) + match pass (filter → per-row
    contribution → groupby-sum → AND gate → rank). Returns
    (rank, doc_id, score_r)."""
    analyzer = Analyzer("simple")
    terms = sorted({w for w in analyzer.tokens(query) if analyzer.significant(w)})
    if not terms:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score_r": pa.array([], type=pa.float64()),
            }
        )
    ds = read_documents(sf_dir)
    n_docs = ds.count()
    total, dfs = _query_stats(sf_dir, terms)
    if any(dfs[t] == 0 for t in terms):  # D2 gate
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score_r": pa.array([], type=pa.float64()),
            }
        )
    avgdl = total / n_docs
    idf_map = {t: scoring.idf(n_docs, dfs[t]) for t in terms}
    k1, b = scoring.K1_DEFAULT, scoring.B_DEFAULT
    term_set = set(terms)
    n_terms = len(terms)

    def contrib(batch: pa.Table) -> pa.Table:
        lem = batch["lemma"].to_numpy(zero_copy_only=False)
        mask = np.isin(lem, list(term_set))
        if not mask.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.float64()),
                }
            )
        sub = batch.filter(pa.array(mask))
        tf = sub["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = sub["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        idfs = np.fromiter(
            (idf_map[l] for l in sub["lemma"].to_pylist()), dtype=np.float64, count=sub.num_rows
        )
        c = idfs * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "c": pa.array(c, type=pa.float64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    scored = (
        read_documents(sf_dir)
        .map_batches(ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2)
        .map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("c", alias_name="score"), Count(alias_name="nt"))
    )
    import pandas as pd

    df = scored.to_pandas()
    df = df[df["nt"] == n_terms]  # D1 AND semantics
    if df.empty:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score_r": pa.array([], type=pa.float64()),
            }
        )
    df["score_r"] = _round_vec(df["score"].to_numpy(), 4)
    df = df.sort_values(["score_r", "doc_id"], ascending=[False, True], kind="stable").head(k)
    df = df.reset_index(drop=True)
    df["rank"] = df.index.astype("int64")
    return df[["rank", "doc_id", "score_r"]]


def search_count(sf_dir: str, query: str):
    """Total AND-match count for a query (reference SearchResponse.count)."""
    analyzer = Analyzer("simple")
    terms = sorted({w for w in analyzer.tokens(query) if analyzer.significant(w)})
    n_terms = len(terms)
    if n_terms == 0:
        return pa.table({"n_matches": pa.array([0], type=pa.int64())})
    term_list = list(terms)

    def keep(batch: pa.Table) -> pa.Table:
        lem = batch["lemma"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(lem, term_list)))

    from ray.data.aggregate import Count

    per_doc = (
        read_documents(sf_dir)
        .map_batches(ExplodeSimple, batch_format="pyarrow", batch_size=2048, concurrency=2)
        .map_batches(keep, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="nt"))
    )
    import pyarrow.compute as pc

    n = 0
    for batch in per_doc.iter_batches(batch_format="pyarrow"):
        n += int(pc.sum(pc.equal(batch["nt"], n_terms)).as_py() or 0)
    return pa.table({"n_matches": pa.array([n], type=pa.int64())})
