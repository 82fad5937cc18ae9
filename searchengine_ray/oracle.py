"""Exact single-process oracle: dict-of-Counters index + naive BM25 top-k.

The conformance target for the distributed engine (SURVEY.md §5.2-5.3): the
Ray-built index must match this index's postings/df/N/avgdl exactly, and the
Ray query engine must be rank-identical (docids AND float64 scores) to
``OracleSearcher.search`` on every query.

Semantics ported from the reference search pipeline
(``services/SearchServiceImpl.java``):

- empty query → error (:55-57); no significant lemmas → error (:69-73)
- D2 all-lemmas-present gate (:105-107)
- D3 frequency gate with Java integer division ``100 * df / N <= filter`` and
  identifier bypass (:108-110, :269-274)
- O1 rarest-lemma-first ordering (:112) with deterministic (df, lemma)
  tie-break (the reference's tie order is unspecified)
- D1 AND-intersection with early exit (:126-137)
- scoring: BM25 (north star) or the reference's normalized tf-sum
  (:141-161) in ``tf_sum`` mode
- O3 pagination + total count (:167-175,199-201), M8 snippets (:218-267)
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from searchengine_ray import scoring
from searchengine_ray.config import DEFAULT_CONFIG, EngineConfig
from searchengine_ray.results import (
    ERROR_EMPTY_QUERY,
    ERROR_NO_SIGNIFICANT,
    ERROR_NOTHING_FOUND,
    error_response,
    hit,
    ok_response,
)
from searchengine_ray.snippets import build_snippet
from searchengine_ray.textproc import Analyzer


class OracleIndex:
    """In-memory exact index over a transcripts table."""

    def __init__(self, table: pa.Table, config: EngineConfig = DEFAULT_CONFIG):
        self.config = config
        self.analyzer = Analyzer(config.analyzer)
        self.postings: dict[str, dict[tuple[str, int], int]] = {}
        self.doc_len: dict[tuple[str, int], int] = {}
        self.texts: dict[tuple[str, int], str] = {}
        self.roles: dict[tuple[str, int], str] = {}

        conv = table["conv_id"].to_pylist()
        turn = table["turn_idx"].to_pylist()
        text = table["text"].to_pylist()
        role = table["role"].to_pylist() if "role" in table.column_names else [""] * len(conv)
        for c, t, x, r in zip(conv, turn, text, role):
            key = (c, int(t))
            if key in self.texts:  # D4 first-wins dedup
                continue
            counts: Counter = self.analyzer.lemma_counts(x or "")
            self.texts[key] = x or ""
            self.roles[key] = r or ""
            self.doc_len[key] = sum(counts.values())
            for lem, tf in counts.items():
                self.postings.setdefault(lem, {})[key] = tf

        self.n_docs = len(self.texts)
        self.total_len = sum(self.doc_len.values())
        self.avgdl = (self.total_len / self.n_docs) if self.n_docs else 0.0

    def df(self, lemma: str) -> int:
        return len(self.postings.get(lemma, {}))


class OracleSearcher:
    def __init__(self, index: OracleIndex, mode: str = "bm25"):
        self.index = index
        self.mode = mode
        self.config = index.config
        self.analyzer = index.analyzer

    def search(self, query: str, offset: int = 0, limit: int = 10) -> dict:
        idx = self.index
        if query == "":
            return error_response(ERROR_EMPTY_QUERY)
        q_lemmas = self.analyzer.query_lemmas(query)
        if not q_lemmas:
            return error_response(ERROR_NO_SIGNIFICANT)

        # D2: every query lemma must exist in the dictionary.
        if any(l not in idx.postings for l in q_lemmas):
            return error_response(ERROR_NOTHING_FOUND)
        # D3: frequency gate (Java int division), identifiers bypass.
        kept = [
            l
            for l in q_lemmas
            if self.analyzer.is_identifier(l)
            or (100 * idx.df(l)) // idx.n_docs <= self.config.search_filter
        ]
        if not kept:
            return error_response(ERROR_NOTHING_FOUND)

        # O1: rarest-first with canonical tie-break.
        order = scoring.canonical_term_order({l: idx.df(l) for l in kept})

        # D1: AND-intersection with early exit.
        docs: set[tuple[str, int]] = set(idx.postings[order[0]].keys())
        for l in order[1:]:
            docs &= idx.postings[l].keys()
            if not docs:
                break
        if not docs:
            return error_response(ERROR_NOTHING_FOUND)

        scores: dict[tuple[str, int], float] = {}
        if self.mode == "bm25":
            k1, b = self.config.k1, self.config.b
            idfs = [scoring.idf(idx.n_docs, idx.df(l)) for l in order]
            for d in docs:
                s = 0.0
                dl = idx.doc_len[d]
                for l, term_idf in zip(order, idfs):
                    s += term_idf * scoring.tf_norm_scalar(
                        idx.postings[l][d], dl, idx.avgdl, k1, b
                    )
                scores[d] = s
        else:  # reference parity: tf-sum normalized by max (A4/A5)
            for d in docs:
                scores[d] = float(sum(idx.postings[l][d] for l in order))
            mx = max(scores.values())
            for d in scores:
                scores[d] = scores[d] / mx

        ranked = sorted(docs, key=lambda d: (-scores[d], d[0], d[1]))
        total = len(ranked)
        page = ranked[offset : offset + limit]
        data = []
        for conv_id, turn_idx in page:
            from searchengine_ray.textproc import tokenize, tokenize_simple

            words = (
                tokenize(idx.texts[(conv_id, turn_idx)])
                if self.analyzer.mode == "ru"
                else tokenize_simple(idx.texts[(conv_id, turn_idx)])
            )
            snip = build_snippet(
                words,
                set(q_lemmas),
                self.analyzer,
                window=self.config.snippet_window,
                max_windows=self.config.snippet_max_windows,
            )
            data.append(
                hit(conv_id, turn_idx, scores[(conv_id, turn_idx)], snip, idx.roles[(conv_id, turn_idx)])
            )
        return ok_response(total, data)
