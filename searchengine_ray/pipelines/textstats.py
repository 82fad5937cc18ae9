"""Text-analysis pipelines over ``documents``: language ID, quality scoring,
token counting, fingerprinting. All deterministic; the SQL-expressible ones
are mirrored in ``__ray_entry__.oracle_sql`` (same token/char definitions as
:mod:`searchengine_ray.pipelines.fulltext`)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.fulltext import _round_vec, read_documents
from searchengine_ray.textproc import EN_STOPWORDS
from searchengine_ray.workerstate import per_worker

# Distinctive function-word votes per language (deterministic; mirrored
# verbatim in the langid oracle SQL). Keys evaluated in ascending order for
# the tie-break.
LANG_VOTES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ein", "ist"),
    "en": ("the", "and", "was", "with", "that", "this"),
    "es": ("el", "los", "las", "una", "por", "como", "que"),
    "fr": ("le", "les", "des", "est", "une", "dans", "et"),
}
_ASCII_ALPHA_RE = re.compile(r"[a-zA-Z]")
ZH_ASCII_RATIO = 0.35


def _flat_tokens(batch: pa.Table):
    """Shared vectorized tokenization: (rows, vids, vocab, n) over the
    batch's ``text`` via Arrow kernels + dictionary encoding — Python-level
    logic downstream touches only the DISTINCT tokens."""
    from searchengine_ray.textproc import tokens_flat_arrow

    flat, parents = tokens_flat_arrow(batch["text"], "simple")
    enc = flat.dictionary_encode()
    idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    return parents, idx, enc.dictionary.to_pylist(), batch.num_rows


def _char_counts(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(n_chars, ascii_letters) per row, via Arrow kernels."""
    import pyarrow.compute as pc

    texts = batch["text"]
    n_chars = pc.fill_null(pc.utf8_length(texts), 0).to_numpy(zero_copy_only=False)
    ascii_letters = pc.fill_null(
        pc.count_substring_regex(texts, "[a-zA-Z]"), 0
    ).to_numpy(zero_copy_only=False)
    return n_chars.astype(np.int64), ascii_letters.astype(np.int64)


class LangId:
    """Actor-pool language classifier (heuristic function-word voting,
    SURVEY.md training-data ops). ``zh`` via ASCII-letter-ratio; otherwise
    argmax of function-word votes with alphabetical tie-break; no votes →
    ``unknown``. Vectorized: votes counted as one bincount over (row, lang)
    codes; per-token Python work only on the batch's distinct tokens."""

    def __init__(self):
        self.langs = sorted(LANG_VOTES)
        self._vote_memo: dict[str, int] = {}
        for j, lang in enumerate(self.langs):
            for w in LANG_VOTES[lang]:
                self._vote_memo[w] = j

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, vids, vocab, n = _flat_tokens(batch)
        n_langs = len(self.langs)
        get = self._vote_memo.get
        vote_of_vid = np.fromiter(
            (get(w, -1) for w in vocab), dtype=np.int64, count=len(vocab)
        )
        tvote = vote_of_vid[vids] if vids.size else np.empty(0, dtype=np.int64)
        m = tvote >= 0
        votes = np.bincount(
            rows[m] * n_langs + tvote[m], minlength=n * n_langs
        ).reshape(n, n_langs)
        n_chars, ascii_letters = _char_counts(batch)

        best = votes.max(axis=1)
        # argmax returns the FIRST max — columns are alphabetical, matching
        # the reference tie-break
        pick = np.asarray(self.langs, dtype=object)[np.argmax(votes, axis=1)]
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_chars > 0, ascii_letters / np.maximum(n_chars, 1), 0.0)
        preds = np.where(
            n_chars == 0,
            "unknown",
            np.where(ratio < ZH_ASCII_RATIO, "zh", np.where(best == 0, "unknown", pick)),
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds.astype(object), type=pa.string())}
        )


def langid(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        per_worker(LangId), batch_format="pyarrow", batch_size=2048
    )


# BPE-ish token segmentation (letter runs / short digit groups / punctuation
# runs, optional leading space — the GPT-2-style shape WITHOUT lookaheads so
# RE2 (Arrow + DuckDB both use RE2) and Python `re` agree exactly).
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]{1,3}| ?[^\sa-zA-Z0-9]+"


class TokenCount:
    """(doc_id, n_tokens, n_unique, n_sig, n_ws, n_bpe): raw simple tokens,
    distinct tokens, significant tokens (len≥2, non-stopword), whitespace
    tokens, BPE-ish tokens (``BPE_ISH_PATTERN``). Vectorized: bincounts over
    flat (row, token-id) arrays + Arrow regex-count kernels; significance
    evaluated once per distinct token (memoized per actor)."""

    def __init__(self):
        self._sig: dict[str, bool] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rows, vids, vocab, n = _flat_tokens(batch)
        memo = self._sig
        sig = np.empty(len(vocab), dtype=bool)
        for i, w in enumerate(vocab):
            s = memo.get(w)
            if s is None:
                s = memo[w] = len(w) >= 2 and w not in EN_STOPWORDS
            sig[i] = s
        n_tokens = np.bincount(rows, minlength=n)
        upair = np.unique((rows << np.int64(32)) | vids)
        n_unique = np.bincount((upair >> np.int64(32)).astype(np.int64), minlength=n)
        keep = sig[vids] if vids.size else np.zeros(0, dtype=bool)
        n_sig = np.bincount(rows[keep], minlength=n)
        texts = batch["text"]
        n_ws = pc.fill_null(
            pc.count_substring_regex(texts, r"\S+"), 0
        ).to_numpy(zero_copy_only=False)
        n_bpe = pc.fill_null(
            pc.count_substring_regex(texts, BPE_ISH_PATTERN), 0
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "n_unique": pa.array(n_unique.astype(np.int64)),
                "n_sig": pa.array(n_sig.astype(np.int64)),
                "n_ws": pa.array(n_ws.astype(np.int64)),
                "n_bpe": pa.array(n_bpe.astype(np.int64)),
            }
        )


def token_count(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        per_worker(TokenCount), batch_format="pyarrow", batch_size=2048
    )


class QualityScore:
    """Quality heuristics: stopword ratio, ASCII-letter ratio, composite =
    min(1, n_sig/50) * (1 - stop_ratio). All ratios are exact int/int
    float64 divisions (bit-identical in SQL), rounded 4 dp. Vectorized the
    same way as TokenCount."""

    def __init__(self):
        self._sig: dict[str, bool] = {}
        self._stop: dict[str, bool] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, vids, vocab, n = _flat_tokens(batch)
        sig = np.empty(len(vocab), dtype=bool)
        stop = np.empty(len(vocab), dtype=bool)
        ms, mt = self._sig, self._stop
        for i, w in enumerate(vocab):
            s = ms.get(w)
            if s is None:
                s = ms[w] = len(w) >= 2 and w not in EN_STOPWORDS
            sig[i] = s
            t = mt.get(w)
            if t is None:
                t = mt[w] = w in EN_STOPWORDS
            stop[i] = t
        n_tokens = np.bincount(rows, minlength=n)
        keep_s = sig[vids] if vids.size else np.zeros(0, dtype=bool)
        n_sig = np.bincount(rows[keep_s], minlength=n)
        keep_t = stop[vids] if vids.size else np.zeros(0, dtype=bool)
        n_stop = np.bincount(rows[keep_t], minlength=n)
        n_chars, ascii_letters = _char_counts(batch)

        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
        alpha_ratio = np.where(n_chars > 0, ascii_letters / np.maximum(n_chars, 1), 0.0)
        quality = np.minimum(1.0, n_sig / 50.0) * (1.0 - stop_ratio)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "stop_ratio_r": pa.array(_round_vec(stop_ratio), type=pa.float64()),
                "alpha_ratio_r": pa.array(_round_vec(alpha_ratio), type=pa.float64()),
                "quality_r": pa.array(_round_vec(quality), type=pa.float64()),
            }
        )


def quality_score(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        per_worker(QualityScore), batch_format="pyarrow", batch_size=2048
    )


_Q_BINS = 10001  # quality_r is 4-dp in [0, 1] ⇒ ≤10001 exact integer buckets


def _quality_buckets(v: np.ndarray) -> np.ndarray:
    return np.rint(v * 10000.0).astype(np.int64)


def _quality_histogram(scores) -> np.ndarray:
    """One streaming counting pass over a quality-score Dataset: each task
    ships only its nonzero (bucket, count) pairs; the driver np.add.at-sums
    them into a ``_Q_BINS``-bin histogram. Shared by ``quality_filter`` and
    ``percent_rank_quality`` so the quantization lattice lives in exactly
    one place."""
    def vcounts(batch: pa.Table) -> pa.Table:
        b = _quality_buckets(batch["quality_r"].to_numpy(zero_copy_only=False))
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(ub), "c": pa.array(cnt.astype(np.int64))})

    vc = scores.map_batches(vcounts, batch_format="pyarrow").to_pandas()
    counts = np.zeros(_Q_BINS, dtype=np.int64)
    if not vc.empty:  # empty corpus: Ray's to_pandas drops the column names
        np.add.at(counts, vc["b"].to_numpy(), vc["c"].to_numpy())
    return counts


def quality_filter(sf_dir: str, q: float = 0.75):
    """Quality-percentile pruning — the canonical curation compose: compute
    a per-doc quality score, find the global q-th quantile of the scores,
    keep docs at or above it → (doc_id, n_tokens, quality_r), a Dataset.

    Scale shape: scores are computed ONCE (materialized — 3 narrow columns,
    spillable; same tradeoff note as ``exact_quantiles``), then the
    threshold comes from a single counting pass: quality_r is 4-dp in [0,1]
    by construction, so scores quantize exactly onto ≤10001 integer buckets
    — each task ships only its NONZERO (bucket, count) pairs, the driver
    np.add.at-sums them and reads the rank-``ceil(n·q)`` bucket
    (``quantile_disc`` convention, matching the SQL oracle's element
    semantics exactly: bucket/10000.0 reproduces the stored double
    bit-for-bit). The filter pass then streams. No sort, no all-to-all."""
    scores = quality_score(sf_dir).select_columns(
        ["doc_id", "n_tokens", "quality_r"]
    ).materialize()
    counts = _quality_histogram(scores)
    n = int(counts.sum())
    if n == 0:  # empty corpus
        return scores
    k = max(int(np.ceil(n * q)), 1)  # 1-based rank, quantile_disc convention
    thr_bucket = int(np.searchsorted(np.cumsum(counts), k))
    thr = thr_bucket / 10000.0  # same division _round_vec used to make the value

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["quality_r"], thr))

    return scores.map_batches(keep, batch_format="pyarrow")


_WS_RE = re.compile(r"[ \t\n\r]+")


def normalize_for_fp(text: str) -> str:
    """lower + collapse whitespace + strip — mirrored in SQL as
    ``trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g'))``."""
    return _WS_RE.sub(" ", (text or "").lower()).strip()


class Fingerprint:
    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(normalize_for_fp(t).encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())})


def fingerprint(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        per_worker(Fingerprint), batch_format="pyarrow", batch_size=2048
    )


# --- rolling-hash fingerprint (winnowing) — no SQL mirror -----------------

_FP_BASE = np.uint64(1_000_003)
_FP_K = 8  # char k-grams
_FP_WINDOW = 6  # winnowing window


class RollingFingerprint:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    polynomial rolling hash over char k-grams of the normalized text, keep
    the min hash of every window (rightmost-min rule), dedup. Output:
    (doc_id, n_grams, sig) with sig = sorted distinct selected hashes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, n_grams, sigs = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = normalize_for_fp(text)
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if b.size < _FP_K:
                doc_ids.append(did)
                n_grams.append(0)
                sigs.append([])
                continue
            # vectorized polynomial hash of each k-gram
            powers = _FP_BASE ** np.arange(_FP_K - 1, -1, -1, dtype=np.uint64)
            n = b.size - _FP_K + 1
            idx = np.arange(_FP_K)[None, :] + np.arange(n)[:, None]
            h = (b[idx] * powers[None, :]).sum(axis=1, dtype=np.uint64)
            if h.size <= _FP_WINDOW:
                sel = np.array([h.min()], dtype=np.uint64)
            else:
                w = np.lib.stride_tricks.sliding_window_view(h, _FP_WINDOW)
                sel = w.min(axis=1)
            doc_ids.append(did)
            n_grams.append(int(n))
            sigs.append(np.unique(sel).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_grams": pa.array(n_grams, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.list_(pa.int64())),
            }
        )


def fingerprint_rolling(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        per_worker(RollingFingerprint), batch_format="pyarrow", batch_size=1024
    )


# ---------------------------------------------------------------------------
# n-gram language-model counts
# ---------------------------------------------------------------------------


def bigram_counts(sf_dir: str, k: int = 100):
    """(rank, bigram, n) top-k token bigrams by corpus count — the canonical
    n-gram LM counting pipeline. Map-side: Arrow-vectorized tokenize
    (``tokens_flat_arrow``) → consecutive same-doc token pairs → per-batch
    partial counts. Shuffle: each bigram hashes wholly into one of 64 fixed
    partitions (vectorized combine inside — never per-group dispatch), and
    only each partition's local top-k rows travel to the driver (the
    bounded-driver-traffic pattern: k·P candidate rows, never the n-gram
    vocabulary). Ties rank by bigram asc."""
    import pandas as pd

    from searchengine_ray.pipelines.fulltext import _crc_partition
    from searchengine_ray.textproc import tokens_flat_arrow

    def partial(batch: pa.Table) -> pa.Table:
        flat, parents = tokens_flat_arrow(batch["text"], mode="simple")
        toks = np.asarray(flat.to_pylist(), dtype=object)
        if toks.size < 2:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64()),
                 "q": pa.array([], type=pa.int64())}
            )
        same = parents[:-1] == parents[1:]
        big = np.char.add(np.char.add(toks[:-1].astype(str), " "), toks[1:].astype(str))[same]
        g = pd.DataFrame({"bigram": big}).groupby("bigram", as_index=False).size()
        g.columns = ["bigram", "n"]
        g["q"] = _crc_partition(g["bigram"])
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine_topk(group: pa.Table) -> pa.Table:
        import pandas as pd

        g = (
            group.select(["bigram", "n"])
            .to_pandas()
            .groupby("bigram", as_index=False)["n"]
            .sum()
            .sort_values(["n", "bigram"], ascending=[False, True], kind="stable")
            .head(k)
        )
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        read_documents(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("q")
        .map_groups(combine_topk, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(["n", "bigram"], ascending=[False, True], kind="stable").head(k)
    out = out.reset_index(drop=True)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(out), dtype=np.int64)),
            "bigram": pa.array(out["bigram"].tolist(), type=pa.string()),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


def fingerprint_rolling_flat(sf_dir: str):
    """(doc_id, sel_hash) — the winnowing fingerprint exploded to one row
    per selected hash: the hash-checkable projection of
    ``fingerprint_rolling`` (the list-typed ``sig`` column stays rows-only).
    The mod-2^64 polynomial hash IS SQL-expressible: per-k-gram powers of
    the base are precomputed literals and one HUGEINT mod at the end equals
    the wrapped uint64 arithmetic (terms < 2^75 << 2^127)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for did, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
            for h in sig or []:
                ids.append(did)
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "sel_hash": pa.array(hashes, type=pa.int64()),
            }
        )

    return fingerprint_rolling(sf_dir).map_batches(explode, batch_format="pyarrow")


# --- within-doc repetition (Gopher-style repetition rules) -----------------


class RepetitionScore:
    """(doc_id, n_words, dup_word_frac_r, top_bigram_frac_r): within-doc
    repetition signals used by Gopher/MassiveText-style quality filtering —
    the fraction of word occurrences that are repeats of an earlier word,
    and the share of word-2-grams taken by the single most frequent 2-gram
    (high ⇒ looping/boilerplate text). Docs with zero tokens emit no row
    (mirrors the SQL GROUP BY over extracted tokens).

    Vectorized: one ``_flat_tokens`` pass; distinct-per-row via unique
    (row, vid) keys; bigram ids pack adjacent (vid, vid) pairs into int64,
    per-(row, bigram) run counts via lexsort + reduceat, per-row max via
    ``np.maximum.reduceat`` — no Python over rows or tokens."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, vids, _vocab, n = _flat_tokens(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens = np.bincount(rows, minlength=n)
        keep = n_tokens > 0
        upair = np.unique((rows << np.int64(32)) | vids)
        n_unique = np.bincount((upair >> np.int64(32)).astype(np.int64), minlength=n)

        # adjacent same-row (vid, vid) pairs — _flat_tokens preserves
        # in-row token order (Arrow list flatten)
        top = np.zeros(n, dtype=np.int64)
        tot = np.zeros(n, dtype=np.int64)
        if rows.size >= 2:
            adj = rows[1:] == rows[:-1]
            brow = rows[:-1][adj]
            bg = (vids[:-1][adj] << np.int64(32)) | vids[1:][adj]
            if brow.size:
                order = np.lexsort((bg, brow))
                brow, bg = brow[order], bg[order]
                newrun = np.empty(brow.size, dtype=bool)
                newrun[0] = True
                newrun[1:] = (brow[1:] != brow[:-1]) | (bg[1:] != bg[:-1])
                starts = np.nonzero(newrun)[0]
                counts = np.diff(np.concatenate((starts, [brow.size])))
                run_rows = brow[starts]
                tot = np.bincount(brow, minlength=n)
                # per-row max over this row's run counts: runs are grouped
                # by row after the lexsort, so reduceat over row boundaries
                row_first = np.empty(run_rows.size, dtype=bool)
                row_first[0] = True
                row_first[1:] = run_rows[1:] != run_rows[:-1]
                seg = np.nonzero(row_first)[0]
                top[run_rows[seg]] = np.maximum.reduceat(counts, seg)

        nt = n_tokens[keep].astype(np.float64)
        dup = 1.0 - n_unique[keep] / nt
        tf = np.where(tot[keep] > 0, top[keep] / np.maximum(tot[keep], 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep]),
                "n_words": pa.array(n_tokens[keep].astype(np.int64)),
                "dup_word_frac_r": pa.array(_round_vec(dup), type=pa.float64()),
                "top_bigram_frac_r": pa.array(_round_vec(tf), type=pa.float64()),
            }
        )


def repetition_score(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        per_worker(RepetitionScore), batch_format="pyarrow", batch_size=2048
    )


# --- corpus-LM quality score (cross-entropy vs the corpus bigram LM) -------


def lm_score(sf_dir: str):
    """(doc_id, n_bigrams, avg_logp_r): each document scored by the average
    log-probability of its word bigrams under an add-one-smoothed corpus
    bigram distribution ``p(bg) = (c(bg)+1)/(T+B)`` (T = total bigram
    occurrences, B = distinct bigrams) — the CCNet/KenLM-style "LM quality"
    pass of a training pipeline (low avg_logp ⇒ text unlike the corpus).
    Docs with < 2 tokens emit no row.

    Shape (one count-join, no per-group dispatch, driver sees scalars):
    1. map-side explode to (doc_id, bigram, m) batch-partials, bigram
       hashed into 64 fixed partitions;
    2. per PARTITION the corpus count of each of its bigrams is exact
       (a bigram hashes wholly into one partition), so the stage joins
       counts locally and emits per-(doc, partition) partials
       ``(doc_id, n, s=Σ m·ln(c+1))`` plus one tagged ``(T_p, B_p)`` row —
       ``ln p`` separates as ``ln(c+1) − ln(T+B)``, so the global scalar
       enters only at the end;
    3. per-doc combine on 64 doc-hash partitions, then one vectorized map
       applies ``s/n − ln(T+B)``. Only the 64 tagged scalar rows ever
       reach the driver."""
    import pandas as pd

    from searchengine_ray.pipelines.fulltext import _crc_partition
    from searchengine_ray.textproc import tokens_flat_arrow

    def explode(batch: pa.Table) -> pa.Table:
        flat, parents = tokens_flat_arrow(batch["text"], mode="simple")
        toks = np.asarray(flat.to_pylist(), dtype=object)
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "bigram": pa.array([], type=pa.string()),
             "m": pa.array([], type=pa.int64()),
             "q": pa.array([], type=pa.int64())}
        )
        if toks.size < 2:
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = parents[:-1] == parents[1:]
        if not same.any():
            return empty
        big = np.char.add(
            np.char.add(toks[:-1].astype(str), " "), toks[1:].astype(str)
        )[same]
        rows = doc_ids[parents[:-1][same]]
        g = (
            pd.DataFrame({"doc_id": rows, "bigram": big})
            .groupby(["doc_id", "bigram"], as_index=False)
            .size()
        )
        g.columns = ["doc_id", "bigram", "m"]
        g["m"] = g["m"].astype("int64")
        g["q"] = _crc_partition(g["bigram"])
        return pa.Table.from_pandas(g, preserve_index=False)

    def score_partition(group: pa.Table) -> pa.Table:
        df = group.select(["doc_id", "bigram", "m"]).to_pandas()
        cnt = df.groupby("bigram")["m"].sum()
        t_p = int(cnt.sum())
        b_p = int(len(cnt))
        logc = np.log(cnt.to_numpy(dtype=np.float64) + 1.0)
        per_row = df["m"].to_numpy(dtype=np.float64) * logc[
            cnt.index.get_indexer(df["bigram"])
        ]
        agg = pd.DataFrame(
            {"doc_id": df["doc_id"], "n": df["m"], "s": per_row}
        ).groupby("doc_id", as_index=False).sum()
        out = pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate((agg["doc_id"].to_numpy(dtype=np.int64), [-1])),
                    type=pa.int64(),
                ),
                "n": pa.array(
                    np.concatenate((agg["n"].to_numpy(dtype=np.int64), [b_p])),
                    type=pa.int64(),
                ),
                "s": pa.array(
                    np.concatenate((agg["s"].to_numpy(dtype=np.float64), [float(t_p)])),
                    type=pa.float64(),
                ),
            }
        )
        return out

    partials = (
        read_documents(sf_dir)
        .map_batches(explode, batch_format="pyarrow", batch_size=2048)
        .groupby("q")
        .map_groups(score_partition, batch_format="pyarrow")
        .materialize()  # reduced rows (≤ one per (doc, partition) + 64 tags)
    )

    def split_tags(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch["doc_id"], -1))

    tags = partials.map_batches(split_tags, batch_format="pyarrow").to_pandas()
    total = float(tags["s"].sum())  # T
    distinct = int(tags["n"].sum())  # B
    log_tb = float(np.log(total + distinct)) if (total + distinct) > 0 else 0.0

    def add_doc_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids >= 0
        t = batch.filter(pa.array(keep))
        ids = ids[keep]
        return t.append_column("q2", pa.array((ids % 64).astype(np.int64)))

    def combine_doc(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        # lexsort on (id, s): per-doc float summation order is deterministic
        # across runs regardless of partition-row arrival order
        order = np.lexsort((s, ids))
        ids, s = ids[order], s[order]
        n = group["n"].to_numpy(zero_copy_only=False)[order]
        uids, starts = np.unique(ids, return_index=True)
        n_sum = np.add.reduceat(n, starts)
        s_sum = np.add.reduceat(s, starts)
        avg = s_sum / n_sum - log_tb
        return pa.table(
            {
                "doc_id": pa.array(uids, type=pa.int64()),
                "n_bigrams": pa.array(n_sum.astype(np.int64)),
                "avg_logp_r": pa.array(_round_vec(avg), type=pa.float64()),
            }
        )

    return (
        partials.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("q2")
        .map_groups(combine_doc, batch_format="pyarrow")
    )


class GroupTopK:
    """Per-language top-k documents by (quality_r DESC, doc_id ASC): the
    distributed grouped-top-k shape — each batch keeps only ITS k best per
    language (top-k is distributive: the global top-k is contained in the
    union of per-batch top-ks), so the driver combine sees ≤ batches ×
    languages × k tiny rows, never a sort of the corpus. Reuses the
    QualityScore kernel per actor; SQL mirror is row_number() OVER
    (PARTITION BY lang ORDER BY quality_r DESC, doc_id)."""

    def __init__(self, k: int):
        self._k = k
        self._quality = QualityScore()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        q = self._quality(batch)
        df = pd.DataFrame({
            "lang": np.asarray(batch["lang"].to_pylist(), dtype=object),
            "doc_id": q["doc_id"].to_numpy(zero_copy_only=False),
            "quality_r": q["quality_r"].to_numpy(zero_copy_only=False),
        })
        df = df.sort_values(["lang", "quality_r", "doc_id"],
                            ascending=[True, False, True])
        top = df.groupby("lang", as_index=False).head(self._k)
        return pa.table({
            "lang": pa.array(top["lang"].to_numpy(), type=pa.string()),
            "doc_id": pa.array(top["doc_id"].to_numpy(dtype=np.int64)),
            "quality_r": pa.array(top["quality_r"].to_numpy(dtype=np.float64)),
        })


def group_topk_docs(sf_dir: str, k: int = 3, batch_size: int = 2048):
    """(lang, rk, doc_id, quality_r): the k best documents per language by
    (quality_r DESC, doc_id ASC) with their 1-based rank — grouped top-k
    without a global sort (per-batch local top-k, tiny driver final)."""
    import pandas as pd

    parts = (
        read_documents(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(per_worker(GroupTopK, k=k),
                     batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
    )
    if parts.empty:  # all-empty blocks drop column names in to_pandas
        return pa.table({"lang": pa.array([], type=pa.string()),
                         "rk": pa.array([], type=pa.int64()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "quality_r": pa.array([], type=pa.float64())})
    parts = parts.sort_values(["lang", "quality_r", "doc_id"],
                              ascending=[True, False, True])
    top = parts.groupby("lang", as_index=False).head(k).reset_index(drop=True)
    top["rk"] = top.groupby("lang").cumcount() + 1
    return pa.table({
        "lang": pa.array(top["lang"].to_numpy(), type=pa.string()),
        "rk": pa.array(top["rk"].to_numpy(dtype=np.int64)),
        "doc_id": pa.array(top["doc_id"].to_numpy(dtype=np.int64)),
        "quality_r": pa.array(top["quality_r"].to_numpy(dtype=np.float64)),
    })


def percent_rank_quality(sf_dir: str):
    """(doc_id, quality_r, pct_rank_r): each document's quality score
    mapped to its corpus percentile (``percent_rank`` = docs-strictly-below
    / (N−1)) — quantile-transform normalization, the step that makes
    quality thresholds portable across corpora whose raw score
    distributions differ.

    Scale shape: the same counting pass as :func:`quality_filter` —
    quality_r is 4-dp in [0, 1] by construction, so one streaming pass
    ships only nonzero (bucket, count) pairs per task into a 10001-bin
    driver histogram; the exclusive cumsum (= docs strictly below each
    bucket) broadcasts as one tiny int array and a second streaming pass
    finishes every doc with one vectorized lookup + an exact int/int
    double division. Equivalent SQL is a percent_rank() window over a
    GLOBAL SORT; no sort here."""
    scores = quality_score(sf_dir).select_columns(
        ["doc_id", "quality_r"]).materialize()
    counts = _quality_histogram(scores)
    n = int(counts.sum())
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))  # exclusive cumsum
    den = float(n - 1) if n > 1 else 1.0  # N=1: percent_rank is 0 by convention

    def finish(batch: pa.Table) -> pa.Table:
        b = _quality_buckets(batch["quality_r"].to_numpy(zero_copy_only=False))
        pct = below[b].astype(np.float64) / den
        return pa.table({
            "doc_id": batch["doc_id"],
            "quality_r": batch["quality_r"],
            "pct_rank_r": pa.array(_round_vec(pct), type=pa.float64()),
        })

    return scores.map_batches(finish, batch_format="pyarrow")


PMI_MIN_N12 = 5
PMI_TOP_K = 100


def bigram_pmi(sf_dir: str, k: int = PMI_TOP_K, min_n12: int = PMI_MIN_N12):
    """(rank, bigram, pmi_r, n12): top-k token bigrams by pointwise mutual
    information, pmi = ln(n12·N / (n1·n2)), over bigrams seen ≥ min_n12
    times — the collocation-mining pipeline (phrase detection before
    tokenizer training). The surface ``bigram_counts`` doesn't have: the
    bigram aggregate must JOIN two VOCABULARY-SCALE marginal aggregates
    (each constituent word's corpus count), so this is a distributed
    join of aggregates on a high-cardinality string key — the unigram
    table can't broadcast at 100 TB.

    Determinism: pmi rounds to 4 dp and the top-k cut happens AFTER
    rounding with the (pmi_r DESC, bigram ASC) tie-break (the repo's
    rank contract); both engines evaluate the identical double
    expression (n12·N)/(n1·n2) before one ln().

    Scale shape: unigram counts combine per batch, take ONE fixed-
    partition crc(token) exchange and materialize combined —
    vocabulary-sized, the smallest complete marginal representation.
    Bigram partials key by crc(w1) and union the SAME-partitioned
    marginal rows, so each partition combines its bigrams and attaches
    n1 locally; the second exchange re-keys by crc(w2) to attach n2,
    computes pmi and keeps a local top-k — only k·P candidate rows ever
    reach the driver, never the bigram vocabulary (the bigram_counts
    discipline). N broadcasts as one closure float resolved from ≤1-row
    scalar partials over the marginal table."""
    import pandas as pd

    from searchengine_ray.pipelines.fulltext import _crc_partition
    from searchengine_ray.textproc import tokens_flat_arrow

    uni_empty = pa.table({"q": pa.array([], type=pa.int64()),
                          "w": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _ = tokens_flat_arrow(batch["text"], mode="simple")
        toks = np.asarray(flat.to_pylist(), dtype=object)
        if toks.size == 0:
            return uni_empty
        g = (pd.DataFrame({"w": toks}).groupby("w", as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.table({"q": pa.array(_crc_partition(g["w"])),
                         "w": pa.array(g["w"].tolist(), type=pa.string()),
                         "n": pa.array(g["n"].to_numpy(dtype=np.int64))})

    def uni_combine(group: pa.Table) -> pa.Table:
        g = (group.select(["q", "w", "n"]).to_pandas()
             .groupby(["q", "w"], as_index=False)["n"].sum())
        return pa.table({"q": pa.array(g["q"].to_numpy(dtype=np.int64)),
                         "w": pa.array(g["w"].tolist(), type=pa.string()),
                         "n": pa.array(g["n"].to_numpy(dtype=np.int64))})

    uni = (read_documents(sf_dir)
           .map_batches(uni_partial, batch_format="pyarrow", batch_size=2048)
           .groupby("q").map_groups(uni_combine, batch_format="pyarrow")
           .materialize())  # vocabulary-sized; consumed three times below

    def n_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"t": pa.array(
            [int(batch["n"].to_numpy(zero_copy_only=False).sum())],
            type=pa.int64())})

    n_parts = uni.map_batches(n_partial, batch_format="pyarrow",
                              batch_size=8192).to_pandas()
    total_n = int(n_parts["t"].sum()) if not n_parts.empty else 0
    empty = pa.table({"rank": pa.array([], type=pa.int64()),
                      "bigram": pa.array([], type=pa.string()),
                      "pmi_r": pa.array([], type=pa.float64()),
                      "n12": pa.array([], type=pa.int64())})
    if total_n == 0:
        return empty
    nf = float(total_n)

    # exchange-row schema shared by both joins: side 0 = marginal
    # (w = token, n = count), side 1 = bigram rows (w = join word,
    # w2 = the other word, n = n12, n1 = attached first marginal)
    def ex_empty() -> pa.Table:
        z = pa.array([], type=pa.int64())
        s = pa.array([], type=pa.string())
        return pa.table({"q": z, "side": z, "w": s, "w2": s,
                         "n": z, "n1": z})

    def bi_partial(batch: pa.Table) -> pa.Table:
        flat, parents = tokens_flat_arrow(batch["text"], mode="simple")
        toks = np.asarray(flat.to_pylist(), dtype=object)
        if toks.size < 2:
            return ex_empty()
        same = parents[:-1] == parents[1:]
        w1, w2 = toks[:-1][same], toks[1:][same]
        if w1.size == 0:
            return ex_empty()
        g = (pd.DataFrame({"w": w1, "w2": w2}).groupby(["w", "w2"],
                                                       as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.table({
            "q": pa.array(_crc_partition(g["w"])),
            "side": pa.array(np.ones(len(g), dtype=np.int64)),
            "w": pa.array(g["w"].tolist(), type=pa.string()),
            "w2": pa.array(g["w2"].tolist(), type=pa.string()),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            "n1": pa.array(np.zeros(len(g), dtype=np.int64)),
        })

    def uni_as_side0(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "q": batch["q"],
            "side": pa.array(np.zeros(n, dtype=np.int64)),
            "w": batch["w"],
            "w2": pa.array([""] * n, type=pa.string()),
            "n": batch["n"],
            "n1": pa.array(np.zeros(n, dtype=np.int64)),
        })

    def attach_n1(group: pa.Table) -> pa.Table:
        df = group.select(["side", "w", "w2", "n"]).to_pandas()
        marg = df[df["side"] == 0][["w", "n"]].rename(columns={"n": "m"})
        big = (df[df["side"] == 1].groupby(["w", "w2"], as_index=False)["n"]
               .sum())
        if big.empty or marg.empty:
            return ex_empty()
        j = big.merge(marg, on="w")  # inner: every w1 has a marginal
        # re-key by the SECOND word for the n2 join
        return pa.table({
            "q": pa.array(_crc_partition(j["w2"])),
            "side": pa.array(np.ones(len(j), dtype=np.int64)),
            "w": pa.array(j["w2"].tolist(), type=pa.string()),
            "w2": pa.array(j["w"].tolist(), type=pa.string()),
            "n": pa.array(j["n"].to_numpy(dtype=np.int64)),
            "n1": pa.array(j["m"].to_numpy(dtype=np.int64)),
        })

    def attach_n2_topk(group: pa.Table) -> pa.Table:
        df = group.select(["side", "w", "w2", "n", "n1"]).to_pandas()
        marg = df[df["side"] == 0][["w", "n"]].rename(columns={"n": "m"})
        big = df[df["side"] == 1]  # already fully combined in pass 1
        empty_k = pa.table({"bigram": pa.array([], type=pa.string()),
                            "pmi_r": pa.array([], type=pa.float64()),
                            "n12": pa.array([], type=pa.int64())})
        if big.empty or marg.empty:
            return empty_k
        big = big[big["n"] >= min_n12]
        if big.empty:
            return empty_k
        j = big.merge(marg, on="w")
        x = ((j["n"].to_numpy(dtype=np.float64) * nf)
             / (j["n1"].to_numpy(dtype=np.float64)
                * j["m"].to_numpy(dtype=np.float64)))
        pmi = _round_vec(np.log(x), 4)
        # w held the SECOND word through this exchange; w2 the first
        out = pd.DataFrame({
            "bigram": j["w2"].astype(str) + " " + j["w"].astype(str),
            "pmi_r": pmi, "n12": j["n"].to_numpy(dtype=np.int64),
        }).sort_values(["pmi_r", "bigram"], ascending=[False, True],
                       kind="stable").head(k)
        return pa.table({
            "bigram": pa.array(out["bigram"].tolist(), type=pa.string()),
            "pmi_r": pa.array(out["pmi_r"].to_numpy(dtype=np.float64)),
            "n12": pa.array(out["n12"].to_numpy(dtype=np.int64)),
        })

    side0 = uni.map_batches(uni_as_side0, batch_format="pyarrow",
                            batch_size=8192)
    bigrams = read_documents(sf_dir).map_batches(
        bi_partial, batch_format="pyarrow", batch_size=2048)
    out = (bigrams.union(side0).groupby("q")
           .map_groups(attach_n1, batch_format="pyarrow")
           .union(side0).groupby("q")
           .map_groups(attach_n2_topk, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return empty
    out = (out.sort_values(["pmi_r", "bigram"], ascending=[False, True],
                           kind="stable").head(k).reset_index(drop=True))
    return pa.table({
        "rank": pa.array(np.arange(len(out), dtype=np.int64)),
        "bigram": pa.array(out["bigram"].tolist(), type=pa.string()),
        "pmi_r": pa.array(out["pmi_r"].to_numpy(dtype=np.float64)),
        "n12": pa.array(out["n12"].to_numpy(dtype=np.int64)),
    })


BURROWS_TOPK = 50


def burrows_delta(sf_dir: str, k: int = BURROWS_TOPK):
    """(source_a, source_b, n_terms, delta_r): Burrows' Delta
    stylometric distance between document SOURCES — for the corpus's
    top-k terms (the ``top_terms`` total order), each source's
    relative term frequency is z-scored across sources and Delta is
    the mean |z_a − z_b| per pair. The authorship/provenance surface
    (which crawl sources write alike?) that the per-doc scores
    (``quality_score``, ``langid``) can't see. Terms with zero
    cross-source variance drop on both sides (the all-equal case is
    exactly 0 in IEEE regardless of fold order, so the drop is
    deterministic). Frequencies are exact-int ratios; the z/Delta
    folds run over the ≤|sources|×k bounded table, 4-dp publish.

    Scale shape: one flat-token pass emitting per-batch (source,
    term) partials for the broadcast top-k set plus per-source
    totals — exchange bounded by |sources|·(k+1) rows per batch;
    driver math on the tiny matrix. Reference tokenizer parity: the
    same simple-mode significant-token space every _TOKS-oracle
    entry shares."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from searchengine_ray.pipelines.fulltext import (_round_vec,
                                                     read_documents,
                                                     top_terms)
    from searchengine_ray.textproc import is_significant_simple

    top = set(top_terms(sf_dir, k=k)["lemma"].tolist())

    def partial(batch: pa.Table) -> pa.Table:
        parents, idx, vocab, _ = _flat_tokens(batch)
        sig = np.asarray([is_significant_simple(w) for w in vocab],
                         dtype=bool) if vocab else np.zeros(0, bool)
        keep = sig[idx] if vocab else np.zeros(0, bool)
        rows = parents[keep]
        vids = idx[keep]
        src = np.asarray(batch["source"].to_pylist(),
                         dtype=object)[rows]
        if rows.size == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "term": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        words = np.asarray(vocab, dtype=object)[vids]
        df = pd.DataFrame({"source": src, "term": words})
        tot = df.groupby("source").size().reset_index(name="n")
        tot["term"] = ""
        hits = df[df["term"].isin(top)] \
            .groupby(["source", "term"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out = pd.concat([hits, tot[["source", "term", "n"]]],
                        ignore_index=True)
        return pa.table({
            "source": pa.array(out["source"].tolist(),
                               type=pa.string()),
            "term": pa.array(out["term"].tolist(), type=pa.string()),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64)),
        })

    agg = (read_documents(sf_dir, columns=["doc_id", "text", "source"])
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=2048)
           .groupby(["source", "term"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    empty = pa.table({"source_a": pa.array([], type=pa.string()),
                      "source_b": pa.array([], type=pa.string()),
                      "n_terms": pa.array([], type=pa.int64()),
                      "delta_r": pa.array([], type=pa.float64())})
    if agg.empty:
        return empty
    totals = agg[agg["term"] == ""].set_index("source")["n"]
    srcs = sorted(totals.index)
    terms = sorted(top)
    if len(srcs) < 2 or not terms:
        return empty
    cnt = agg[agg["term"] != ""] \
        .set_index(["source", "term"])["n"]
    F = np.zeros((len(srcs), len(terms)))
    for i, s in enumerate(srcs):
        nt = float(totals.loc[s])
        for j, w in enumerate(terms):
            F[i, j] = float(cnt.get((s, w), 0)) / nt
    ns = float(len(srcs))
    mu = F.sum(axis=0) / ns
    var = ((F - mu) * (F - mu)).sum(axis=0) / ns
    ok = var > 0.0
    Z = (F[:, ok] - mu[ok]) / np.sqrt(var[ok])
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            dz = np.abs(Z[i] - Z[j])
            rows.append((srcs[i], srcs[j], int(dz.size),
                         float(dz.sum() / dz.size)))
    return pa.table({
        "source_a": pa.array([r[0] for r in rows], type=pa.string()),
        "source_b": pa.array([r[1] for r in rows], type=pa.string()),
        "n_terms": pa.array([r[2] for r in rows], type=pa.int64()),
        "delta_r": pa.array(_round_vec(
            np.asarray([r[3] for r in rows]), 4)),
    })


TREND_VOCAB = 200
TREND_TOPK = 20
TREND_ALPHA = 0.5


def trending_terms(sf_dir: str, vocab_k: int = TREND_VOCAB,
                   k: int = TREND_TOPK):
    """(term, y_a, y_b, z_r): corpus drift — the top-k terms by
    |log-odds z| between the first and second half of the corpus
    (doc_id < split vs ≥, split = (max_doc_id + 1) // 2 — the
    ``dedup_incremental`` convention), scored with Monroe et al.'s
    Dirichlet-smoothed log-odds-ratio (α = 0.5 per term):
    δ = ln((y_a+α)/(n_a+α₀−y_a−α)) − ln((y_b+α)/(n_b+α₀−y_b−α)),
    z = δ/√(1/(y_a+α) + 1/(y_b+α)). The "what changed between
    crawls" monitor ``psi_drift`` gives for a numeric column, done
    properly for text. Scored over the top-``vocab_k`` corpus terms
    (the ``top_terms`` total order); ranked by (round(|z|, 4) desc,
    term asc) — the knn margin convention, so the cut is identical
    on both sides.

    Scale shape: one flat-token pass with per-batch (half, term)
    partials over the broadcast vocab set plus per-half totals;
    driver math on the 2×vocab_k matrix."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from searchengine_ray.pipelines.fulltext import (_round_vec,
                                                     read_documents,
                                                     top_terms)
    from searchengine_ray.textproc import is_significant_simple

    top = set(top_terms(sf_dir, k=vocab_k)["lemma"].tolist())
    md = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id"])
    if md.num_rows == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "y_a": pa.array([], type=pa.int64()),
                         "y_b": pa.array([], type=pa.int64()),
                         "z_r": pa.array([], type=pa.float64())})
    split = (int(pa.compute.max(md["doc_id"]).as_py()) + 1) // 2

    def partial(batch: pa.Table) -> pa.Table:
        parents, idx, vocab, _ = _flat_tokens(batch)
        sig = np.asarray([is_significant_simple(w) for w in vocab],
                         dtype=bool) if vocab else np.zeros(0, bool)
        keep = sig[idx] if vocab else np.zeros(0, bool)
        rows = parents[keep]
        vids = idx[keep]
        if rows.size == 0:
            return pa.table({"half": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[rows]
        half = (did >= split).astype(np.int64)
        words = np.asarray(vocab, dtype=object)[vids]
        df = pd.DataFrame({"half": half, "term": words})
        tot = df.groupby("half").size().reset_index(name="n")
        tot["term"] = ""
        hits = df[df["term"].isin(top)] \
            .groupby(["half", "term"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out = pd.concat([hits, tot[["half", "term", "n"]]],
                        ignore_index=True)
        return pa.table({
            "half": pa.array(out["half"].to_numpy(dtype=np.int64)),
            "term": pa.array(out["term"].tolist(), type=pa.string()),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64)),
        })

    agg = (read_documents(sf_dir)
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=2048)
           .groupby(["half", "term"])
           .aggregate(Sum("n", alias_name="n")).to_pandas())
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "y_a": pa.array([], type=pa.int64()),
                      "y_b": pa.array([], type=pa.int64()),
                      "z_r": pa.array([], type=pa.float64())})
    if agg.empty:
        return empty
    tot = agg[agg["term"] == ""].set_index("half")["n"]
    n_a = float(tot.get(0, 0))
    n_b = float(tot.get(1, 0))
    if n_a == 0.0 or n_b == 0.0:
        return empty
    terms = sorted(top)
    cnt = agg[agg["term"] != ""].set_index(["half", "term"])["n"]
    a0 = TREND_ALPHA * len(terms)
    al = TREND_ALPHA
    rows = []
    for w in terms:
        ya = float(cnt.get((0, w), 0))
        yb = float(cnt.get((1, w), 0))
        d = (np.log((ya + al) / (n_a + a0 - ya - al))
             - np.log((yb + al) / (n_b + a0 - yb - al)))
        z = d / np.sqrt(1.0 / (ya + al) + 1.0 / (yb + al))
        rows.append((w, int(ya), int(yb), float(z)))
    df = pd.DataFrame(rows, columns=["term", "y_a", "y_b", "z"])
    df["za"] = _round_vec(np.abs(df["z"].to_numpy()), 4)
    df = df.sort_values(["za", "term"], ascending=[False, True],
                        kind="mergesort").head(k)
    return pa.table({
        "term": pa.array(df["term"].tolist(), type=pa.string()),
        "y_a": pa.array(df["y_a"].to_numpy(dtype=np.int64)),
        "y_b": pa.array(df["y_b"].to_numpy(dtype=np.int64)),
        "z_r": pa.array(_round_vec(df["z"].to_numpy(), 4)),
    })
