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
from searchengine_ray.textproc import EN_STOPWORDS, tokenize_simple

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


class LangId:
    """Actor-pool language classifier (heuristic n-gram/function-word voting,
    SURVEY.md training-data ops). ``zh`` via ASCII-letter-ratio; otherwise
    argmax of function-word votes with alphabetical tie-break; no votes →
    ``unknown``."""

    def __init__(self):
        self.vote_sets = {k: frozenset(v) for k, v in LANG_VOTES.items()}
        self.langs = sorted(LANG_VOTES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"]
        texts = batch["text"].to_pylist()
        preds = []
        for text in texts:
            text = text or ""
            n_chars = len(text)
            ascii_letters = len(_ASCII_ALPHA_RE.findall(text))
            if n_chars == 0:
                preds.append("unknown")
                continue
            if ascii_letters / n_chars < ZH_ASCII_RATIO:
                preds.append("zh")
                continue
            toks = tokenize_simple(text)
            votes = {
                lang: sum(1 for t in toks if t in s) for lang, s in self.vote_sets.items()
            }
            best = max(votes.values())
            if best == 0:
                preds.append("unknown")
            else:
                preds.append(next(l for l in self.langs if votes[l] == best))
        return pa.table({"doc_id": doc_ids, "pred_lang": pa.array(preds, type=pa.string())})


def langid(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        LangId, batch_format="pyarrow", batch_size=2048, concurrency=2
    )


class TokenCount:
    """(doc_id, n_tokens, n_unique, n_sig): raw simple tokens, distinct
    tokens, significant tokens (len≥2, non-stopword)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tokens, n_unique, n_sig = [], [], []
        for text in texts:
            toks = tokenize_simple(text or "")
            n_tokens.append(len(toks))
            n_unique.append(len(set(toks)))
            n_sig.append(sum(1 for t in toks if len(t) >= 2 and t not in EN_STOPWORDS))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "n_unique": pa.array(n_unique, type=pa.int64()),
                "n_sig": pa.array(n_sig, type=pa.int64()),
            }
        )


def token_count(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        TokenCount, batch_format="pyarrow", batch_size=2048, concurrency=2
    )


class QualityScore:
    """Quality heuristics: stopword ratio, ASCII-letter ratio, mean token
    length; composite = min(1, n_sig/50) * (1 - stop_ratio). All ratios are
    exact int/int float64 divisions (bit-identical in SQL), rounded 4 dp."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        rows = {"n_tokens": [], "stop_ratio": [], "alpha_ratio": [], "quality": []}
        for text in texts:
            text = text or ""
            toks = tokenize_simple(text)
            n = len(toks)
            n_stop = sum(1 for t in toks if t in EN_STOPWORDS)
            n_sig = sum(1 for t in toks if len(t) >= 2 and t not in EN_STOPWORDS)
            n_chars = len(text)
            ascii_letters = len(_ASCII_ALPHA_RE.findall(text))
            stop_ratio = n_stop / n if n else 0.0
            alpha_ratio = ascii_letters / n_chars if n_chars else 0.0
            quality = min(1.0, n_sig / 50.0) * (1.0 - stop_ratio)
            rows["n_tokens"].append(n)
            rows["stop_ratio"].append(stop_ratio)
            rows["alpha_ratio"].append(alpha_ratio)
            rows["quality"].append(quality)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(rows["n_tokens"], type=pa.int64()),
                "stop_ratio_r": pa.array(
                    _round_vec(np.asarray(rows["stop_ratio"], dtype=np.float64)), type=pa.float64()
                ),
                "alpha_ratio_r": pa.array(
                    _round_vec(np.asarray(rows["alpha_ratio"], dtype=np.float64)), type=pa.float64()
                ),
                "quality_r": pa.array(
                    _round_vec(np.asarray(rows["quality"], dtype=np.float64)), type=pa.float64()
                ),
            }
        )


def quality_score(sf_dir: str):
    return read_documents(sf_dir).map_batches(
        QualityScore, batch_format="pyarrow", batch_size=2048, concurrency=2
    )


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
        Fingerprint, batch_format="pyarrow", batch_size=2048, concurrency=2
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
        RollingFingerprint, batch_format="pyarrow", batch_size=1024, concurrency=2
    )
