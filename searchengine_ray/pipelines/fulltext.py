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
from searchengine_ray.workerstate import per_worker


def round_half_away(x: float, ndigits: int = 4) -> float:
    """DuckDB-compatible ROUND (half away from zero; Python's round() is
    banker's rounding and would disagree on exact .5 boundaries)."""
    scale = 10.0**ndigits
    return math.floor(abs(x) * scale + 0.5) / scale * (1.0 if x >= 0 else -1.0)


def _round_vec(a: np.ndarray, ndigits: int = 4) -> np.ndarray:
    scale = 10.0**ndigits
    return np.floor(np.abs(a) * scale + 0.5) / scale * np.sign(a)


def read_documents(sf_dir: str, columns=("doc_id", "text")):
    from searchengine_ray.sources import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=list(columns))


class ExplodeSimple:
    """Actor-pool stage: documents batch → (token, doc_id, tf, dl) rows.

    Fully vectorized (VERDICT r1 item 7): Arrow-kernel tokenization
    (``tokens_flat_arrow``), dictionary-encode so Python-level significance
    touches only the batch's DISTINCT tokens (memoized per actor, ST1), then
    pure-numpy (row, token) tf counting — no per-row Python loop."""

    def __init__(self):
        self._sig: dict[str, bool] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.textproc import is_significant_simple, tokens_flat_arrow

        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parents = tokens_flat_arrow(batch["text"], "simple")
        enc = flat.dictionary_encode()
        idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        vocab = enc.dictionary.to_pylist()
        memo = self._sig
        sig = np.empty(len(vocab), dtype=bool)
        for i, w in enumerate(vocab):
            s = memo.get(w)
            if s is None:
                s = memo[w] = is_significant_simple(w)
            sig[i] = s
        keep = sig[idx] if len(vocab) else np.zeros(0, dtype=bool)
        rows = parents[keep]
        vids = idx[keep]
        pair = (rows << np.int64(32)) | vids
        upair, tf = np.unique(pair, return_counts=True)
        prow = (upair >> np.int64(32)).astype(np.int64)
        pvid = (upair & np.int64(0xFFFFFFFF)).astype(np.int64)
        dl = np.bincount(rows, minlength=len(doc_ids))
        vocab_arr = np.asarray(vocab, dtype=object)
        return pa.table(
            {
                "lemma": pa.array(vocab_arr[pvid], type=pa.string()),
                "doc_id": pa.array(doc_ids[prow], type=pa.int64()),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(dl[prow].astype(np.int64)),
            }
        )


def postings(sf_dir: str):
    """Exploded postings (lemma, doc_id, tf) — reference `index` table shape
    (model/Index.java:12-23) over documents."""
    return (
        read_documents(sf_dir)
        .map_batches(per_worker(ExplodeSimple), batch_format="pyarrow", batch_size=2048)
        .select_columns(["lemma", "doc_id", "tf"])
    )


_AGG_PARTITIONS = 64


def _crc_partition(strings, P: int = _AGG_PARTITIONS) -> np.ndarray:
    import zlib

    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % P for s in strings),
        dtype=np.int64,
        count=len(strings),
    )


def lemma_df(sf_dir: str):
    """Term dictionary (lemma, df, cf) — reference `lemma` table + df upsert
    semantics (Repositories/LemmaRepository.java:25-30).

    Shape: map-side partial combine per batch, then a FIXED-partition
    groupby with a vectorized pandas aggregation per partition — NOT
    ``groupby(lemma).aggregate``, whose per-group Python dispatch is
    O(vocabulary) (the high-cardinality-aggregate disease; measured
    ~25 µs/group)."""
    ds = read_documents(sf_dir).map_batches(
        per_worker(ExplodeSimple), batch_format="pyarrow", batch_size=2048
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = (
            pd.DataFrame(
                {
                    "lemma": batch["lemma"].to_numpy(zero_copy_only=False),
                    "tf": batch["tf"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("lemma", as_index=False)
            .agg(df=("tf", "size"), cf=("tf", "sum"))
        )
        g["q"] = _crc_partition(g["lemma"])
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(group: pa.Table) -> pa.Table:
        import pandas as pd

        g = (
            group.select(["lemma", "df", "cf"])
            .to_pandas()
            .groupby("lemma", as_index=False)
            .sum()
        )
        g["df"] = g["df"].astype("int64")
        g["cf"] = g["cf"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("q")
        .map_groups(final, batch_format="pyarrow")
    )


def doc_lengths(sf_dir: str):
    """(doc_id, dl) for docs with ≥1 significant token."""
    ds = read_documents(sf_dir).map_batches(
        per_worker(ExplodeSimple), batch_format="pyarrow", batch_size=2048
    )

    def first_dl(batch: pa.Table) -> pa.Table:
        # one (doc_id, dl) per doc; explode emits identical dl on each row
        df = batch.select(["doc_id", "dl"]).to_pandas().drop_duplicates("doc_id")
        df["q"] = df["doc_id"].to_numpy() % _AGG_PARTITIONS
        return pa.Table.from_pandas(df, preserve_index=False)

    # map-side dedup first (explode clusters a doc's rows in one batch),
    # then an exact global dedup per FIXED partition (dl is constant per
    # doc) — vectorized, no per-doc-group Python dispatch.
    def final(group: pa.Table) -> pa.Table:
        df = (
            group.select(["doc_id", "dl"])
            .to_pandas()
            .drop_duplicates("doc_id")
            .astype({"doc_id": "int64", "dl": "int64"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(first_dl, batch_format="pyarrow")
        .groupby("q")
        .map_groups(final, batch_format="pyarrow")
    )


def doc_stats(sf_dir: str):
    """Single-row global stats (n_docs, n_tokens, avgdl_r) — A3 analogue.
    ONE streaming pass: per-batch partial (rows, Σtf) rows, driver sums the
    tiny partials (pre-aggregate-before-collect)."""
    ex = ExplodeSimple()

    def partial(batch: pa.Table) -> pa.Table:
        t = ex(batch)
        tf_np = t["tf"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], type=pa.int64()),
                "tf": pa.array([int(tf_np.sum())], type=pa.int64()),
            }
        )

    import pandas as pd

    parts = (
        read_documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    n_docs = int(parts["n"].sum())
    total = int(parts["tf"].sum())
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
    (cf desc, lemma asc) order, returned with rank. Each lemma is fully
    aggregated inside ONE partition of ``lemma_df``'s output, so a
    per-batch local top-k bounds what reaches the driver to
    k·n_batches rows — never the vocabulary."""

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["cf", "lemma"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    t = (
        lemma_df(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    t = t.sort_values(["cf", "lemma"], ascending=[False, True], kind="stable").head(k)
    t = t.reset_index(drop=True)
    t["rank"] = t.index.astype("int64")
    return t[["rank", "lemma", "df", "cf"]]


class QueryMatchPass:
    """ONE-streaming-pass conjunctive query evaluation over raw documents
    (actor pool; VERDICT r1 item 7 — replaces the 3-pass count/stats/match
    flow). Per batch it explodes in-place and emits:

    - one STATS row (kind=0): a = batch n_docs, b = batch Σtf (significant),
      t{j} = batch df of term j (docs containing it),
    - one MATCH row (kind=1) per doc containing ALL terms: a = doc_id,
      b = dl, t{j} = tf of term j.

    AND-match rows are the only per-doc output, so driver memory is
    O(matches), never O(corpus); stats partials are one row per batch."""

    def __init__(self, terms: list[str]):
        self.terms = list(terms)
        self._sig: dict[str, bool] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.textproc import is_significant_simple, tokens_flat_arrow

        terms = self.terms
        N = len(terms)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = doc_ids.size
        flat, parents = tokens_flat_arrow(batch["text"], "simple")
        enc = flat.dictionary_encode()
        idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        vocab = enc.dictionary.to_pylist()
        memo = self._sig
        sig = np.empty(len(vocab), dtype=bool)
        for i, w in enumerate(vocab):
            s = memo.get(w)
            if s is None:
                s = memo[w] = is_significant_simple(w)
            sig[i] = s
        keep = sig[idx] if len(vocab) else np.zeros(0, dtype=bool)
        rows = parents[keep]
        vids = idx[keep]
        total = int(rows.size)

        vocab_pos = {w: i for i, w in enumerate(vocab)}
        term_of_vid = np.full(len(vocab) + 1, -1, dtype=np.int64)
        for j, t in enumerate(terms):
            p = vocab_pos.get(t)
            if p is not None:
                term_of_vid[p] = j
        tvid = term_of_vid[vids] if vids.size else np.empty(0, dtype=np.int64)
        tkeep = tvid >= 0
        pair = rows[tkeep] * N + tvid[tkeep]
        upair, ptf = np.unique(pair, return_counts=True)
        tf_mat = np.zeros((n, N), dtype=np.int64)
        tf_mat[upair // N, upair % N] = ptf
        has_all = (tf_mat > 0).all(axis=1)
        dfs = (tf_mat > 0).sum(axis=0)
        dl = np.bincount(rows, minlength=n)

        m = int(has_all.sum())
        cols = {
            "kind": pa.array(
                np.concatenate(([0], np.ones(m, dtype=np.int8))), type=pa.int8()
            ),
            "a": pa.array(
                np.concatenate(([n], doc_ids[has_all])), type=pa.int64()
            ),
            "b": pa.array(
                np.concatenate(([total], dl[has_all])), type=pa.int64()
            ),
        }
        for j in range(N):
            cols[f"t{j}"] = pa.array(
                np.concatenate(([dfs[j]], tf_mat[has_all, j])), type=pa.int64()
            )
        return pa.table(cols)


def _empty_ranked():
    return pa.table(
        {
            "rank": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "score_r": pa.array([], type=pa.float64()),
        }
    )


def _query_match_frame(sf_dir: str, terms: list[str]):
    """(n_docs, total, dfs, matched DataFrame) from one streaming pass."""
    out = (
        read_documents(sf_dir)
        .map_batches(
            per_worker(QueryMatchPass, terms=terms),
            batch_format="pyarrow",
            batch_size=2048,
        )
        .to_pandas()
    )
    stats = out[out["kind"] == 0]
    n_docs = int(stats["a"].sum())
    total = int(stats["b"].sum())
    dfs = [int(stats[f"t{j}"].sum()) for j in range(len(terms))]
    return n_docs, total, dfs, out[out["kind"] == 1]


def bm25_adhoc(sf_dir: str, query: str, k: int = 10):
    """Indexless conjunctive BM25 top-k in ONE streaming pass over the
    corpus (stats partials + AND-matched doc rows from the same
    ``QueryMatchPass``), then driver-side scoring of only the matches.
    Returns (rank, doc_id, score_r)."""
    analyzer = Analyzer("simple")
    terms = sorted({w for w in analyzer.tokens(query) if analyzer.significant(w)})
    if not terms:
        return _empty_ranked()
    n_docs, total, dfs, matched = _query_match_frame(sf_dir, terms)
    if any(d == 0 for d in dfs) or matched.empty:  # D2 gate / no AND match
        return _empty_ranked()
    avgdl = total / n_docs
    k1, b = scoring.K1_DEFAULT, scoring.B_DEFAULT
    dl = matched["b"].to_numpy(dtype=np.float64)
    score = np.zeros(len(matched), dtype=np.float64)
    for j, _ in enumerate(terms):
        tf = matched[f"t{j}"].to_numpy(dtype=np.float64)
        score += scoring.idf(n_docs, dfs[j]) * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * (dl / avgdl))
        )
    import pandas as pd

    df = pd.DataFrame({"doc_id": matched["a"].to_numpy(dtype=np.int64), "score_r": _round_vec(score, 4)})
    df = df.sort_values(["score_r", "doc_id"], ascending=[False, True], kind="stable").head(k)
    df = df.reset_index(drop=True)
    df["rank"] = df.index.astype("int64")
    return df[["rank", "doc_id", "score_r"]]


def search_count(sf_dir: str, query: str):
    """Total AND-match count for a query (reference SearchResponse.count) —
    same single-pass shape; only the match COUNT leaves the cluster."""
    analyzer = Analyzer("simple")
    terms = sorted({w for w in analyzer.tokens(query) if analyzer.significant(w)})
    if not terms:
        return pa.table({"n_matches": pa.array([0], type=pa.int64())})

    match_pass = QueryMatchPass(terms)

    def count_partial(batch: pa.Table) -> pa.Table:
        t = match_pass(batch)
        kinds = t["kind"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int((kinds == 1).sum())], type=pa.int64())})

    total = (
        read_documents(sf_dir)
        .map_batches(count_partial, batch_format="pyarrow", batch_size=2048)
        .sum("m")
    )
    return pa.table({"n_matches": pa.array([int(total or 0)], type=pa.int64())})


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """(doc_id, rank, term, tfidf_r): each document's top-k significant
    terms by tf-idf (tf · ln(N/df)) — the classic sparse feature export for
    classifier / retrieval training sets.

    Scale shape: postings and the (lemma, df) dictionary co-partition on
    hash(lemma) (union + fixed-partition groupby, vectorized searchsorted
    attach — no broadcast of the vocabulary, no `Dataset.join` actors);
    the per-doc top-k then co-partitions on hash(doc_id) with one vectorized
    pandas pass per partition. Two shuffles total, both int64/string rows.
    Scores are rounded half-away at 4 dp BEFORE ranking (ties broken by term
    asc) so the ordering is float-noise-proof and SQL-mirrorable."""
    import os

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    posts = read_documents(sf_dir).map_batches(
        per_worker(ExplodeSimple), batch_format="pyarrow", batch_size=2048
    )

    def tag_posts(batch: pa.Table) -> pa.Table:
        lem = batch["lemma"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lemma": batch["lemma"],
                "doc_id": batch["doc_id"],
                "tf": batch["tf"],
                "df": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                "q": pa.array(_crc_partition(lem)),
            }
        )

    def tag_dfs(batch: pa.Table) -> pa.Table:
        lem = batch["lemma"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lemma": batch["lemma"],
                "doc_id": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                "tf": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
                "df": batch["df"],
                "q": pa.array(_crc_partition(lem)),
            }
        )

    def attach_df(group: pa.Table) -> pa.Table:
        lem = np.asarray(group["lemma"].to_pylist(), dtype=object)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy(zero_copy_only=False)
        dfv = group["df"].to_numpy(zero_copy_only=False)
        is_dict = dfv >= 0
        dl, dv = lem[is_dict], dfv[is_dict]
        order = np.argsort(dl, kind="stable")
        dl, dv = dl[order], dv[order]
        pr = ~is_dict
        pos = np.searchsorted(dl, lem[pr])
        # every posting lemma exists in the dictionary by construction
        score = tf[pr] * np.log(float(n_docs) / dv[pos])
        return pa.table(
            {
                "doc_id": pa.array(doc[pr], type=pa.int64()),
                "term": pa.array(lem[pr], type=pa.string()),
                "tfidf_r": pa.array(_round_vec(score), type=pa.float64()),
            }
        )

    def add_doc_part(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (d * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(_AGG_PARTITIONS)
        return batch.append_column("p", pa.array(p.astype(np.int64)))

    def topk_per_doc(group: pa.Table) -> pa.Table:
        import pandas as pd

        g = pd.DataFrame(
            {
                "doc_id": group["doc_id"].to_numpy(zero_copy_only=False),
                "term": group["term"].to_pylist(),
                "tfidf_r": group["tfidf_r"].to_numpy(zero_copy_only=False),
            }
        )
        g = g.sort_values(
            ["doc_id", "tfidf_r", "term"], ascending=[True, False, True], kind="stable"
        )
        g["rank"] = g.groupby("doc_id").cumcount().astype("int64")
        g = g[g["rank"] < k]
        return pa.Table.from_pandas(
            g[["doc_id", "rank", "term", "tfidf_r"]], preserve_index=False
        )

    scored = (
        posts.map_batches(tag_posts, batch_format="pyarrow")
        .union(lemma_df(sf_dir).map_batches(tag_dfs, batch_format="pyarrow"))
        .groupby("q")
        .map_groups(attach_df, batch_format="pyarrow")
    )
    return (
        scored.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("p")
        .map_groups(topk_per_doc, batch_format="pyarrow")
    )


def html_extract(sf_dir: str):
    """M5 non-identity ingest demonstrated end-to-end (VERDICT r3 item 8):
    wrap every document in a deterministic HTML page (title + style in
    head, a comment, an entity-bearing heading, the body in ``<p>``, a
    trailing script), then extract Jsoup-equivalent ``body().text()`` and
    ``title()`` (``htmltext.py``; reference
    ``services/SearchServiceImpl.java:178-193``). The wrapper is
    closed-form, so DuckDB reproduces the expected extraction exactly:
    title = 'Doc {id}', body = 'Doc & {id}' + ws-normalized text.

    Wrap and extract run in the SAME vectorized batch stage — the HTML
    never shuffles, only the (doc_id, title, body_text) rows do."""
    import html as _html

    from searchengine_ray.htmltext import html_body_text, html_title

    def wrap_extract(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        titles: list[str] = []
        bodies: list[str] = []
        for did, text in zip(ids, batch["text"].to_pylist()):
            page = (
                f"<html><head><title>Doc {did}</title>"
                "<style>p {color: #000}</style></head>"
                f"<body><!-- generated --><h1>Doc &amp; {did}</h1>"
                f"<p>{_html.escape(text or '', quote=False)}</p>"
                f"<script>var n = {did};</script></body></html>"
            )
            titles.append(html_title(page))
            bodies.append(html_body_text(page))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "title": pa.array(titles, type=pa.string()),
                "body_text": pa.array(bodies, type=pa.string()),
            }
        )

    out = (
        read_documents(sf_dir)
        .map_batches(wrap_extract, batch_format="pyarrow", batch_size=1024)
        .to_pandas()
    )
    return out.sort_values("doc_id", kind="stable").reset_index(drop=True)


ZIPF_TOPK = 100


def zipf_slope(sf_dir: str, k: int = ZIPF_TOPK):
    """(n_terms, slope_r, intercept_r, r2_r): Zipf's-law fit over the
    corpus vocabulary — OLS of ln(cf) on ln(rank) for the top-k
    lemmas under ``top_terms``' total order (cf desc, lemma asc,
    rank 1-based). English-like corpora sit near slope −1; the
    exponent is the one-number lexical-diversity summary
    ``top_terms`` (the ranked list) and ``token_count`` (volume)
    don't expose. Explicit moment formula (n·Σxy − ΣxΣy)/(n·Σxx −
    (Σx)²) on both sides — no library regression — so the only
    divergence risk is float association over ≤k terms, absorbed by
    the 4-dp publish.

    Scale shape: rides ``lemma_df``'s distributed aggregation and
    ``top_terms``' per-batch local top-k bound — only k rows reach
    the driver regardless of vocabulary size."""
    t = top_terms(sf_dir, k=k)
    n = len(t)
    empty = pa.table({"n_terms": pa.array([], type=pa.int64()),
                      "slope_r": pa.array([], type=pa.float64()),
                      "intercept_r": pa.array([], type=pa.float64()),
                      "r2_r": pa.array([], type=pa.float64())})
    if n < 2:
        return empty
    x = np.log(t["rank"].to_numpy(dtype=np.int64) + 1.0)
    y = np.log(t["cf"].to_numpy(dtype=np.float64))
    fn = float(n)
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    syy = float((y * y).sum())
    den = fn * sxx - sx * sx
    if den == 0.0:
        return empty
    slope = (fn * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / fn
    ss_tot = syy - sy * sy / fn
    # ss_res = Σ(y - a - bx)² expanded to moment form so the oracle
    # can evaluate the identical expression tree
    ss_res = (syy + fn * intercept * intercept
              + slope * slope * sxx
              + 2.0 * intercept * slope * sx
              - 2.0 * intercept * sy - 2.0 * slope * sxy)
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0.0 else 0.0
    return pa.table({
        "n_terms": pa.array([n], type=pa.int64()),
        "slope_r": pa.array([round_half_away(float(slope), 4)]),
        "intercept_r": pa.array([round_half_away(float(intercept), 4)]),
        "r2_r": pa.array([round_half_away(float(r2), 4)]),
    })
