"""Training-data preparation operators: deterministic corpus splitting,
LLM sequence packing, and PII scrubbing — the remaining staples of a
large-scale training-data pipeline alongside dedup/similarity/textstats.

Scale shapes (ray_guide patterns):
- split: stateless hash-of-key map — embarrassingly parallel, no shuffle;
- packing: the classic DISTRIBUTED PREFIX SUM — one tokenize pass emits
  (doc_id, n_tokens, range), per-range subtotals reduce to the driver
  (~n_ranges tiny rows), the driver prefix-scans them, and a range-grouped
  second phase assigns global token offsets with a local cumsum + the
  broadcast range base. No stage ever sees more than one range's rows;
- scrub: compiled-regex map_batches (per-worker cached state), one pass.

All three are exactly SQL-expressible (md5-prefix split / window cumsum /
regexp_replace chain), so each is hash-checked against DuckDB.
"""

from __future__ import annotations

import hashlib
import math
import os
import re

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.fulltext import read_documents
from searchengine_ray.workerstate import per_worker

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

# Hex-digit buckets of md5(str(doc_id)): 0-d train (14/16 = 87.5%),
# e val (6.25%), f test (6.25%). Hex-boundary fractions make the rule a
# single-character comparison in both Python and SQL — no float thresholds.
_SPLIT_OF_HEX = {**{h: "train" for h in "0123456789abcd"}, "e": "val", "f": "test"}


def sample_split(sf_dir: str):
    """(doc_id, split): deterministic, key-stable corpus split. The split of
    a document never depends on corpus size, ordering, or parallelism — the
    property that keeps train/val membership stable as a 100-TB corpus
    grows (a `random()` split re-shuffles membership every run)."""

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # md5 is per-key by nature (the SQL oracle computes md5(doc_id)
        # too); the loop is slimmed to one C-level digest + first nibble
        # per id, and the nibble → split mapping is vectorized
        md5 = hashlib.md5
        nib = np.fromiter(
            (md5(b"%d" % i).digest()[0] for i in ids.tolist()),
            dtype=np.uint8,
            count=ids.size,
        ) >> 4
        splits = np.full(ids.size, "train", dtype=object)
        splits[nib == 0xE] = "val"
        splits[nib == 0xF] = "test"
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "split": pa.array(splits, type=pa.string()),
            }
        )

    return read_documents(sf_dir, columns=("doc_id",)).map_batches(
        assign, batch_format="pyarrow", batch_size=8192
    )


# ---------------------------------------------------------------------------
# Sequence packing (LLM pretraining batch layout)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_PACK_RANGE = 1 << 12  # docs per prefix-sum range (tune to ~seconds of work)


def _range_prefix_bases(counts, val_col: str):
    """Distributed prefix sum over the doc_id order — the single copy of
    the decomposition shared by :func:`pack_sequences` (token offsets) and
    :func:`pps_sample` (weight offsets): per-range subtotals of
    ``val_col`` → driver prefix scan (n_ranges rows — ~2.4M ranges at
    10^10 docs, MBs not GBs) → (sorted range keys, exclusive base
    offsets, grand total). Broadcast the two parallel numpy arrays, NOT a
    dict: ``ray.get`` of numpy is zero-copy from the object store (a dict
    re-deserializes per consumer call)."""
    import pandas as pd

    def range_subtotal(batch: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({
                "rng": batch["rng"].to_numpy(zero_copy_only=False),
                "n": batch[val_col].to_numpy(zero_copy_only=False),
            })
            .groupby("rng", as_index=False)["n"]
            .sum()
        )
        return pa.table({
            "rng": pa.array(g["rng"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
        })

    sub = counts.map_batches(range_subtotal, batch_format="pyarrow").to_pandas()
    sub = sub.groupby("rng", as_index=False)["n"].sum().sort_values("rng")
    keys = sub["rng"].to_numpy(dtype=np.int64)
    totals = sub["n"].to_numpy(dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(totals)[:-1]))
    return keys, bases, int(totals.sum())


class _TokenCounts:
    """(doc_id, n_tokens, rng) per doc — the tokenize pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.fromiter(
            (len(_TOKEN_RE.findall((t or "").lower())) for t in batch["text"].to_pylist()),
            dtype=np.int64,
            count=len(ids),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(counts, type=pa.int64()),
                "rng": pa.array(ids // _PACK_RANGE, type=pa.int64()),
            }
        )


def pack_sequences(sf_dir: str, seq_len: int = 512):
    """(doc_id, n_tokens, tok_start, seq_id): concatenate documents in
    doc_id order and lay them out into fixed ``seq_len``-token training
    sequences; ``tok_start`` is each doc's global token offset and
    ``seq_id = tok_start // seq_len`` the sequence (bin) its first token
    lands in.

    Distributed prefix sum: per-range token subtotals → driver prefix scan
    (n_ranges rows — ~2.4M ranges at 10^10 docs, MBs not GBs) → broadcast
    base-offset arrays (zero-copy numpy via ``ray.put``) → per-range local
    cumsum. Equivalent SQL: a window
    ``sum() OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)`` — which no engine can parallelize without exactly this
    decomposition."""
    import ray

    counts = read_documents(sf_dir).map_batches(
        per_worker(_TokenCounts), batch_format="pyarrow", batch_size=4096
    )
    # tiny relative to the corpus (2 ints/doc); reused by both phases
    counts = counts.materialize()

    rng_keys, rng_bases, _ = _range_prefix_bases(counts, "n_tokens")
    keys_ref = ray.put(rng_keys)
    bases_ref = ray.put(rng_bases)

    def offsets_in_range(group: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        bases = ray.get(bases_ref)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        n = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        base = int(bases[np.searchsorted(keys, int(ids[0]) // _PACK_RANGE)])
        start = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n, type=pa.int64()),
                "tok_start": pa.array(start, type=pa.int64()),
                "seq_id": pa.array(start // seq_len, type=pa.int64()),
            }
        )

    return counts.groupby("rng").map_groups(offsets_in_range, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Plain-syntax patterns with IDENTICAL semantics in Python re and RE2
# (DuckDB) — the SQL oracle uses the same strings verbatim. [0-9], not \d:
# Python's \d matches Unicode digits while RE2's is ASCII-only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
PII_ID = r"[0-9]{9,}"

PII_PLANT_EVERY = 20
PII_PLANT_OFFSET = 2_000_000


def _plant_pii(batch: pa.Table) -> pa.Table:
    """Closed-form PII fixture derivation (the synthetic corpus contains no
    natural PII): for every doc_id divisible by PII_PLANT_EVERY, append a
    copy at doc_id+PII_PLANT_OFFSET with one email, one phone and one long
    id appended — reconstructed verbatim by the SQL oracle."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    out_ids = list(ids)
    out_texts = list(texts)
    for i in np.nonzero(ids % PII_PLANT_EVERY == 0)[0].tolist():
        d = int(ids[i])
        out_ids.append(d + PII_PLANT_OFFSET)
        out_texts.append(
            f"{texts[i] or ''} contact user{d}@mail.example.org"
            f" or call 555-123-4567 ref 9{d:08d}"
        )
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "text": pa.array(out_texts, type=pa.string()),
        }
    )


class _Scrubber:
    """Per-worker compiled patterns (ST1 shape: state in __init__)."""

    def __init__(self):
        self.email = re.compile(PII_EMAIL)
        self.phone = re.compile(PII_PHONE)
        self.ident = re.compile(PII_ID)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_email, n_phone, n_id, clean = [], [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = text or ""
            t1, ne = self.email.subn("<EMAIL>", t)
            t2, np_ = self.phone.subn("<PHONE>", t1)
            t3, ni = self.ident.subn("<ID>", t2)
            ids.append(did)
            n_email.append(ne)
            n_phone.append(np_)
            n_id.append(ni)
            clean.append(t3)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_email": pa.array(n_email, type=pa.int64()),
                "n_phone": pa.array(n_phone, type=pa.int64()),
                "n_id": pa.array(n_id, type=pa.int64()),
                "text_clean": pa.array(clean, type=pa.string()),
            }
        )


def pii_scrub(sf_dir: str, plant: bool = False):
    """(doc_id, n_email, n_phone, n_id, text_clean): sequential redaction
    email → phone → long-id (each count taken on the text state the pattern
    actually sees, so counts are order-consistent with the replacements)."""
    ds = read_documents(sf_dir)
    if plant:
        ds = ds.map_batches(_plant_pii, batch_format="pyarrow", batch_size=4096)
    return ds.map_batches(
        per_worker(_Scrubber), batch_format="pyarrow", batch_size=2048
    )


# ---------------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------------


def stratified_sample(sf_dir: str, k: int = 20):
    """(lang, rank, doc_id): a deterministic k-document sample per language
    stratum — rank = position in the md5(doc_id) order within the stratum,
    so membership is key-stable (a growing corpus only ever displaces the
    largest hashes, never reshuffles the whole sample the way random()
    would).

    Shape: per-batch local top-k per stratum (map-side — ships at most
    k × strata rows per batch), then one LOW-cardinality groupby(lang) with
    a vectorized combine. Strata counts are small by definition; the
    high-cardinality key here (doc_id) never becomes a groupby key."""
    import pandas as pd

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        md5 = hashlib.md5
        u = [md5(b"%d" % i).hexdigest() for i in ids.tolist()]
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "doc_id": ids,
                "u": u,
            }
        )
        df = df.sort_values(["lang", "u", "doc_id"], kind="stable")
        df = df.groupby("lang", as_index=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine(group: pa.Table) -> pa.Table:
        df = (
            group.to_pandas()
            .sort_values(["lang", "u", "doc_id"], kind="stable")
            .groupby("lang", as_index=False)
            .head(k)
        )
        df["rank"] = df.groupby("lang").cumcount().astype("int64")
        return pa.Table.from_pandas(
            df[["lang", "rank", "doc_id"]], preserve_index=False
        )

    return (
        read_documents(sf_dir, columns=("doc_id", "lang"))
        .map_batches(local_topk, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .map_groups(combine, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle (training-order assignment without
# random_shuffle's all-to-all)
# ---------------------------------------------------------------------------

_SHUF_BUCKETS = 1 << 16  # first 16 bits of md5 → histogram grain
_SHUF_PARTITIONS = 256  # fixed shuffle partitions (many buckets per task)


def _md5_hexes(ids: np.ndarray) -> list:
    """md5(b"%d" % doc_id) hex digests — the ONE derivation of the
    deterministic per-doc key (``shuffle_rank``, ``corpus_mix`` and
    ``weighted_sample`` all build on it, so they can never drift)."""
    md5 = hashlib.md5
    return [md5(b"%d" % i).hexdigest() for i in ids.tolist()]


def _md5_keys(ids: np.ndarray):
    """(hex_keys, buckets): the shuffle-key contract — hex digest plus
    bucket = first 4 hex digits, for the histogram-rank pattern."""
    u = _md5_hexes(ids)
    b = np.fromiter((int(h[:4], 16) for h in u), dtype=np.int64, count=len(u))
    return u, b


def _run_positions(run: np.ndarray) -> np.ndarray:
    """0-based position of each row within its run of equal consecutive
    labels (input already sorted by run) — the shared within-bucket rank
    step of the histogram-based global-rank pattern."""
    if run.size == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.concatenate(([0], np.nonzero(np.diff(run))[0] + 1))
    within = np.arange(run.size, dtype=np.int64)
    return within - np.repeat(
        within[starts], np.diff(np.concatenate((starts, [run.size]))))


def shuffle_rank(sf_dir: str, n_shards: int = 8, ds=None):
    """(doc_id, shuffle_rank, shard): a deterministic global training order
    — rank = position in the md5(doc_id) order (key-stable: re-runs and
    retries give byte-identical layouts, unlike ``random_shuffle``) and
    shard = rank % n_shards (round-robin over the shuffled order, so every
    shard is an unbiased sample of the corpus).

    Scale shape: assigning a GLOBAL rank normally means a global sort; the
    md5 key is uniform, so a 65536-bin histogram pass + a driver cumsum
    yields exact per-bucket base offsets, and one fixed-partition pass
    finishes ranks with a local vectorized argsort per partition (each
    partition holds all rows of its buckets). Equivalent SQL is
    ``row_number() OVER (ORDER BY md5(doc_id))`` — a single-node window."""
    import ray

    source = ds if ds is not None else read_documents(sf_dir, columns=("doc_id",))

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, b = _md5_keys(ids)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "u": pa.array(u, type=pa.string()),
                "b": pa.array(b),
                "q": pa.array(b % _SHUF_PARTITIONS),
            }
        )

    keyed_ds = source.map_batches(
        keyed, batch_format="pyarrow", batch_size=8192
    ).materialize()  # ids + 32-char keys only; reused by both passes

    def bucket_counts(batch: pa.Table) -> pa.Table:
        c = np.bincount(
            batch["b"].to_numpy(zero_copy_only=False), minlength=_SHUF_BUCKETS
        )
        nz = np.nonzero(c)[0]
        return pa.table(
            {"b": pa.array(nz.astype(np.int64)), "n": pa.array(c[nz].astype(np.int64))}
        )

    hist = keyed_ds.map_batches(bucket_counts, batch_format="pyarrow").to_pandas()
    hist = hist.groupby("b", as_index=False)["n"].sum()
    counts = np.zeros(_SHUF_BUCKETS, dtype=np.int64)
    counts[hist["b"].to_numpy()] = hist["n"].to_numpy()
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bases_ref = ray.put(bases)

    def rank_in_partition(group: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.asarray(group["u"].to_pylist(), dtype="U32")
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, u, b))
        ids, u, b = ids[order], u[order], b[order]
        rank = base[b] + _run_positions(b)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shuffle_rank": pa.array(rank),
                "shard": pa.array(rank % n_shards),
            }
        )

    return keyed_ds.groupby("q").map_groups(rank_in_partition, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Token-budget selection (best docs under a global token budget)
# ---------------------------------------------------------------------------

# quality_r is rounded to 4 dp, so its exact integer image lives in [0, 10000]
_QI_BINS = 10001


def token_budget_select(
    sf_dir: str,
    budget_den: int = 4,
    n_buckets: int = 4096,
    pull_limit: int = 65536,
    ds=None,
):
    """(doc_id, quality_r, n_tokens): the maximal PREFIX of the corpus in
    (quality desc, doc_id asc) order whose running token total stays within
    a global budget (= total tokens // ``budget_den``) — "take the best N
    tokens", the standard data-selection step before training.

    Equivalent SQL is a window cumsum over a GLOBAL SORT; the engine never
    sorts. Because the running total is monotone, the selected set is fully
    described by a cut point (q*, D*): counting-based selection in the
    spirit of ``relational.exact_quantiles``:

    1. one streaming pass bins token mass by the 4-dp quality image
       (10001 fixed bins, map-side partials → driver combine of tiny rows);
       the driver scans bins best-first to find the crossing bin q* and the
       remaining budget inside it;
    2. the tie bin resolves by doc_id order: RANGE-bucket refinement passes
       (bucket token subtotals + per-bucket doc_id bounds) narrow the
       crossing bucket until ≤ ``pull_limit`` docs remain, which are pulled
       and finished exactly on the driver (cumsum + searchsorted) — zero-
       token docs after the crossing doc stay excluded, matching the SQL
       prefix semantics positionally;
    3. one filter pass emits the selected rows.

    Every pass streams the materialized 4-column projection (ids + small
    ints — the ``pack_sequences`` trade); driver state is O(bins + buckets +
    pull_limit), never O(corpus)."""
    from searchengine_ray.pipelines.textstats import QualityScore

    def project(batch: pa.Table) -> pa.Table:
        q = batch["quality_r"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality_r": batch["quality_r"],
                "n_tokens": batch["n_tokens"],
                "qi": pa.array(np.rint(q * 10000.0).astype(np.int64)),
            }
        )

    source = ds if ds is not None else read_documents(sf_dir)
    scored = (
        source
        .map_batches(per_worker(QualityScore), batch_format="pyarrow", batch_size=2048)
        .map_batches(project, batch_format="pyarrow")
        .materialize()
    )

    def qi_hist(batch: pa.Table) -> pa.Table:
        qi = batch["qi"].to_numpy(zero_copy_only=False)
        tok = batch["n_tokens"].to_numpy(zero_copy_only=False)
        t = np.bincount(qi, weights=tok.astype(np.float64), minlength=_QI_BINS)
        c = np.bincount(qi, minlength=_QI_BINS)
        nz = np.nonzero(c)[0]
        return pa.table(
            {
                "qi": pa.array(nz.astype(np.int64)),
                "tok": pa.array(t[nz].astype(np.int64)),
                "cnt": pa.array(c[nz].astype(np.int64)),
            }
        )

    hist = scored.map_batches(qi_hist, batch_format="pyarrow").to_pandas()
    hist = hist.groupby("qi", as_index=False).sum()
    tok_by_qi = np.zeros(_QI_BINS, dtype=np.int64)
    cnt_by_qi = np.zeros(_QI_BINS, dtype=np.int64)
    tok_by_qi[hist["qi"].to_numpy()] = hist["tok"].to_numpy()
    cnt_by_qi[hist["qi"].to_numpy()] = hist["cnt"].to_numpy()
    budget = int(tok_by_qi.sum()) // budget_den

    # best-first scan: suffix sums from qi=10000 down
    order = np.arange(_QI_BINS - 1, -1, -1)
    acc = np.cumsum(tok_by_qi[order])
    over = np.nonzero(acc > budget)[0]
    if over.size == 0:  # budget covers the whole corpus
        return scored.drop_columns(["qi"])
    qstar = int(order[over[0]])
    rem = budget - (int(acc[over[0]]) - int(tok_by_qi[qstar]))

    # --- resolve the tie bin by doc_id order -------------------------------
    lo, hi = None, None  # current doc_id window inside the tie bin
    bin_cnt = int(cnt_by_qi[qstar])

    def bucket_pass(lo_, hi_):
        span = (hi_ - lo_ + 1) if lo_ is not None else 0

        def agg(batch: pa.Table) -> pa.Table:
            qi = batch["qi"].to_numpy(zero_copy_only=False)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            tok = batch["n_tokens"].to_numpy(zero_copy_only=False)
            m = qi == qstar
            if lo_ is not None:
                m &= (ids >= lo_) & (ids <= hi_)
            ids, tok = ids[m], tok[m]
            if ids.size == 0:
                return pa.table(
                    {
                        "b": pa.array([], type=pa.int64()),
                        "tok": pa.array([], type=pa.int64()),
                        "cnt": pa.array([], type=pa.int64()),
                        "dmin": pa.array([], type=pa.int64()),
                        "dmax": pa.array([], type=pa.int64()),
                    }
                )
            if lo_ is None:
                b = np.zeros(ids.size, dtype=np.int64)  # bounds pass only
            else:
                b = (ids - lo_) * n_buckets // span
            import pandas as pd

            df = pd.DataFrame({"b": b, "tok": tok, "cnt": 1, "dmin": ids, "dmax": ids})
            g = df.groupby("b", as_index=False).agg(
                tok=("tok", "sum"), cnt=("cnt", "sum"),
                dmin=("dmin", "min"), dmax=("dmax", "max"),
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        out = scored.map_batches(agg, batch_format="pyarrow").to_pandas()
        return out.groupby("b", as_index=False).agg(
            tok=("tok", "sum"), cnt=("cnt", "sum"),
            dmin=("dmin", "min"), dmax=("dmax", "max"),
        )

    # first pass doubles as the doc_id-bounds pass for the tie bin. Loop
    # invariant: rem < token mass of the current [lo, hi] window (true at
    # entry — the bin crossed — and preserved by picking the crossing
    # bucket), so a crossing bucket always exists; distinct doc_ids
    # guarantee the window shrinks every pass (≤ ~log_nb(N) passes).
    while bin_cnt > pull_limit:
        g = bucket_pass(lo, hi)
        if lo is None and len(g) == 1:
            lo, hi = int(g["dmin"].iloc[0]), int(g["dmax"].iloc[0])
            continue
        g = g.sort_values("b")
        run = 0
        for _, row in g.iterrows():
            if run + int(row["tok"]) > rem:
                rem -= run
                lo, hi, bin_cnt = int(row["dmin"]), int(row["dmax"]), int(row["cnt"])
                break
            run += int(row["tok"])
        if lo == hi:
            break

    # exact finish on the ≤ pull_limit tie docs
    def tie_rows(batch: pa.Table) -> pa.Table:
        qi = batch["qi"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = batch["n_tokens"].to_numpy(zero_copy_only=False)
        m = qi == qstar
        if lo is not None:
            m &= (ids >= lo) & (ids <= hi)
        return pa.table(
            {
                "doc_id": pa.array(ids[m]),
                "n_tokens": pa.array(tok[m], type=pa.int64()),
            }
        )

    tie = scored.map_batches(tie_rows, batch_format="pyarrow").to_pandas()
    tie = tie.sort_values("doc_id")
    cum = np.cumsum(tie["n_tokens"].to_numpy(dtype=np.int64))
    n_in = int(np.searchsorted(cum, rem, side="right"))
    if n_in > 0:
        dstar = int(tie["doc_id"].iloc[n_in - 1])
    elif lo is not None:
        dstar = lo - 1  # window fully excluded; earlier tie docs stay in
    else:
        dstar = -1  # whole tie bin excluded (doc_ids are non-negative)

    def select(batch: pa.Table) -> pa.Table:
        qi = batch["qi"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (qi > qstar) | ((qi == qstar) & (ids <= dstar))
        return batch.filter(pa.array(m)).select(["doc_id", "quality_r", "n_tokens"])

    return scored.map_batches(select, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram membership against a held-out set)
# ---------------------------------------------------------------------------

DECON_N = 5  # n-gram size (13 in the GPT-3 recipe; 5 fits sandbox doc sizes)
DECON_BENCH_EVERY = 20  # doc_id % 20 == 0 → benchmark member
DECON_PLANT_SLOT = 3  # doc_id % 20 == 3 → gets a planted contamination


def _decon_marker(bench_doc_id: int, n: int = DECON_N) -> str:
    """Closed-form n-token marker for a benchmark doc — reconstructed
    verbatim by the SQL oracle, so planted contamination is hash-checkable
    (the pii_scrub/planted-neardup pattern)."""
    d = int(bench_doc_id)
    return " ".join(f"qq{chr(ord('a') + j)}{d}" for j in range(n))


def decontaminate(sf_dir: str, n: int = DECON_N, plant: bool = False):
    """(doc_id, n_grams, n_hits) per TRAINING doc: how many of its word
    n-gram occurrences appear in the benchmark set's distinct n-grams —
    the GPT-3-style decontamination pass every training pipeline runs
    before a data release. n_hits > 0 ⇒ drop or scrub the doc.

    Shape: the benchmark here is every ``DECON_BENCH_EVERY``-th doc; its
    DISTINCT gram set is collected map-side (per-batch dedup) and unioned
    on the driver — small-by-contract (benchmarks are 10^3-10^5 examples,
    not the corpus), broadcast once as a SORTED array via ``ray.put``, and
    probed per training batch with one vectorized ``searchsorted``
    membership test. A benchmark too big for one worker's heap would flip
    the probe to the hash-partitioned sig join the dedup verify uses.

    ``plant=True`` appends a closed-form marker gram to each benchmark doc
    AND the matching marker of donor ``doc_id - DECON_PLANT_SLOT`` to every
    ``doc_id % DECON_BENCH_EVERY == DECON_PLANT_SLOT`` doc, so contamination
    provably exists and the SQL oracle reconstructs it exactly."""
    import ray

    from searchengine_ray.textproc import tokenize_simple

    def planted_text(doc_id: int, text: str) -> str:
        if not plant:
            return text or ""
        m = doc_id % DECON_BENCH_EVERY
        if m == 0:
            return (text or "") + " " + _decon_marker(doc_id, n)
        if m == DECON_PLANT_SLOT:
            return (text or "") + " " + _decon_marker(doc_id - DECON_PLANT_SLOT, n)
        return text or ""

    def doc_grams(doc_id: int, text: str) -> list[str]:
        toks = tokenize_simple(planted_text(doc_id, text))
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    def bench_distinct(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        grams: set[str] = set()
        for d, t in zip(ids.tolist(), texts):
            if d % DECON_BENCH_EVERY == 0:
                grams.update(doc_grams(d, t))
        return pa.table({"gram": pa.array(sorted(grams), type=pa.string())})

    parts = [
        b["gram"].to_numpy(zero_copy_only=False)
        for b in read_documents(sf_dir)
        .map_batches(bench_distinct, batch_format="pyarrow", batch_size=2048)
        .iter_batches(batch_format="pyarrow")
    ]
    bench = (
        np.unique(np.concatenate(parts)).astype(np.str_)
        if parts
        else np.array([], dtype=np.str_)
    )
    bench_ref = ray.put(bench)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_id, out_ng, out_hits = [], [], []
        for d, t in zip(ids.tolist(), texts):
            if d % DECON_BENCH_EVERY == 0:
                continue  # benchmark members are not training docs
            grams = doc_grams(d, t)
            out_id.append(d)
            out_ng.append(len(grams))
            if grams and b.size:
                g = np.asarray(grams, dtype=np.str_)
                pos = np.minimum(np.searchsorted(b, g), b.size - 1)
                out_hits.append(int((b[pos] == g).sum()))
            else:
                out_hits.append(0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_grams": pa.array(out_ng, type=pa.int64()),
                "n_hits": pa.array(out_hits, type=pa.int64()),
            }
        )

    return read_documents(sf_dir).map_batches(
        probe, batch_format="pyarrow", batch_size=2048
    )


# ---------------------------------------------------------------------------
# Partitioned training-data export (the resumable-output layout)
# ---------------------------------------------------------------------------


def export_shards(sf_dir: str, n_shards: int = 8, out_root: str | None = None):
    """(shard, n_docs, n_chars): deterministic key-stable shard assignment
    (first md5 byte of the doc key, mod ``n_shards``) plus a PARTITIONED
    parquet export — one ``shard=K/`` directory per shard, each written
    atomically (tmp + rename): a crashed run never leaves a partial shard
    visible, a re-run replaces shards idempotently, and a consumer can
    checkpoint at shard granularity (the same resume grain as the index
    build's shards). Membership never depends on corpus size, ordering or
    parallelism. Returns the per-shard summary table (hash-checkable); the
    files land under ``out_root``.

    Scale shape: assignment is a stateless map; the write runs one task per
    shard (bounded groups = n_shards — a LOW-cardinality map_groups), and
    the summary is one row per shard."""
    import shutil
    import tempfile

    import ray.data as rd

    out_dir = out_root or os.path.join(
        tempfile.gettempdir(), "searchengine_ray_export",
        hashlib.md5(f"{os.path.abspath(sf_dir)}|{n_shards}".encode()).hexdigest()[:12],
    )
    os.makedirs(out_dir, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        md5 = hashlib.md5
        first = np.fromiter(
            (md5(b"%d" % i).digest()[0] for i in ids.tolist()),
            dtype=np.int64,
            count=ids.size,
        )
        return batch.append_column("shard", pa.array(first % n_shards))

    def write_shard(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq_mod

        k = int(group["shard"][0].as_py())
        shard_dir = os.path.join(out_dir, f"shard={k:05d}")
        tmp = shard_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        body = group.sort_by("doc_id").drop_columns(["shard"])
        pq_mod.write_table(body, os.path.join(tmp, "part-00000.parquet"))
        shutil.rmtree(shard_dir, ignore_errors=True)
        os.replace(tmp, shard_dir)
        n_chars = int(
            pc.sum(pc.utf8_length(pc.fill_null(body["text"], ""))).as_py() or 0
        )
        return pa.table(
            {
                "shard": pa.array([k], type=pa.int64()),
                "n_docs": pa.array([body.num_rows], type=pa.int64()),
                "n_chars": pa.array([n_chars], type=pa.int64()),
            }
        )

    return (
        read_documents(sf_dir, columns=("doc_id", "text"))
        .map_batches(assign, batch_format="pyarrow", batch_size=8192)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Systematic PPS (probability-proportional-to-size) sampling
# ---------------------------------------------------------------------------

PPS_K = 64  # selection points


def pps_sample(sf_dir: str, k: int = PPS_K):
    """Deterministic systematic PPS sample: lay every doc's integer weight
    (``n_chars``) end-to-end in doc_id order, place ``k`` evenly-spaced
    midpoints p_i = ((2i+1)·W) // (2k) over the total weight W, and select
    each doc whose weight interval [cum, cum+wt) contains a point — the
    classic probability-proportional-to-size design (Madow 1949) used to
    weight training-corpus sources by size. Output: (doc_id, wt, n_hits)
    for selected docs; a doc heavier than W/k can catch several points
    (with-replacement multiplicity), and Σ n_hits == k exactly since the
    midpoints all land in [0, W). Exact integer arithmetic end to end —
    no float sampling, byte-identical across re-runs.

    Scale shape: the cumulative offset is :func:`pack_sequences`'
    distributed prefix sum (per-range subtotals → driver scan of
    n_ranges rows → broadcast bases); each range then counts point hits
    locally with two ``searchsorted`` calls against the ≤k point array.
    One exchange, no sort, no driver materialization beyond the
    n_ranges subtotal frame."""
    import ray

    rngs = read_documents(sf_dir, columns=("doc_id", "n_chars")).map_batches(
        lambda b: pa.table({
            "rng": pa.array(
                (b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                 // _PACK_RANGE)),
            "doc_id": b["doc_id"].cast(pa.int64()),
            "wt": b["n_chars"].cast(pa.int64()),
        }),
        batch_format="pyarrow", batch_size=8192,
    )
    rngs = rngs.materialize()  # tiny (2 ints + range key per doc); reused

    rng_keys, rng_bases, w_total = _range_prefix_bases(rngs, "wt")
    # the k selection midpoints, exact integers in [0, W)
    pts = ((2 * np.arange(k, dtype=np.int64) + 1) * w_total) // (2 * k)
    keys_ref = ray.put(rng_keys)
    bases_ref = ray.put(rng_bases)
    pts_ref = ray.put(pts)

    def hits_in_range(group: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        bases = ray.get(bases_ref)
        p = ray.get(pts_ref)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wt = group["wt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, wt = ids[order], wt[order]
        base = int(bases[np.searchsorted(keys, int(ids[0]) // _PACK_RANGE)])
        cum = base + np.concatenate(([0], np.cumsum(wt)[:-1]))
        lo = np.searchsorted(p, cum, side="left")
        hi = np.searchsorted(p, cum + wt, side="left")
        n_hits = (hi - lo).astype(np.int64)
        m = n_hits > 0
        return pa.table({
            "doc_id": pa.array(ids[m]),
            "wt": pa.array(wt[m]),
            "n_hits": pa.array(n_hits[m]),
        })

    return rngs.groupby("rng").map_groups(hits_in_range, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic corpus mixing (weighted source interleave)
# ---------------------------------------------------------------------------

# Integer sampling weights per language group; groups not listed weigh 1.
# MIX_L is the lcm of all weights (incl. the default), so every group's
# stride m = MIX_L // w is an exact integer — the mix key never touches
# floats. The SQL oracle in __ray_entry__ embeds the same table as a CASE;
# tests/test_traindata.py pins the two against each other.
MIX_WEIGHTS = {"en": 4, "de": 2, "fr": 2}
MIX_DEFAULT_WEIGHT = 1
MIX_L = math.lcm(MIX_DEFAULT_WEIGHT, *MIX_WEIGHTS.values())


def _mix_stride(lang: str) -> int:
    return MIX_L // MIX_WEIGHTS.get(lang, MIX_DEFAULT_WEIGHT)


def corpus_mix(sf_dir: str, ds=None):
    """(doc_id, lang, grp_rank, mix_key, mix_rank): a deterministic
    weighted interleave of the corpus's language groups — the source/
    domain MIXING step of LLM training-data assembly (sample sources in a
    fixed ratio, e.g. 4:2:2:1:1, so any training prefix tracks the target
    mixture). Stride scheduling (Waldspurger & Weihl 1995): group g with
    integer weight w_g emits its r-th document (in the group's
    deterministic md5 shuffle order, ``shuffle_rank``'s key) at exact
    integer virtual time ``mix_key = (2r+1) · (L/w_g)``; ordering every
    document by (mix_key, lang, grp_rank) interleaves groups in weight
    proportion. Key-stable: re-runs, retries and corpus growth never
    reorder an existing prefix of any group.

    Scale shape: the global interleave position is NOT computed by a
    global sort. Per-group ranks come from the ``shuffle_rank`` histogram
    pattern (md5 is uniform, so a 65536-bin per-(group, bucket) count
    pass + a driver cumsum gives exact bucket bases; one fixed-partition
    pass finishes ranks locally). The global rank of key k then has a
    CLOSED FORM — groups emit keys in arithmetic progression, so
    ``#{r' in group h: (2r'+1)·m_h < k}`` is one integer division —
    evaluated vectorized per row against the broadcast per-group totals;
    the all-to-all a sort would need never happens. Driver state is one
    65536-int array per group (groups = languages, low-cardinality by
    contract)."""
    import ray

    source = ds if ds is not None else read_documents(
        sf_dir, columns=("doc_id", "lang"))

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, b = _md5_keys(ids)
        return pa.table({
            "doc_id": pa.array(ids),
            "lang": batch["lang"].cast(pa.string()),
            "u": pa.array(u, type=pa.string()),
            "b": pa.array(b),
            "q": pa.array(b % _SHUF_PARTITIONS),
        })

    keyed_ds = source.map_batches(
        keyed, batch_format="pyarrow", batch_size=8192
    ).materialize()  # ids + lang + 32-char keys only; reused by both passes

    def lang_bucket_counts(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "lang": batch["lang"].to_numpy(zero_copy_only=False),
            "b": batch["b"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["lang", "b"], as_index=False).size()
        return pa.table({
            "lang": pa.array(g["lang"].tolist(), type=pa.string()),
            "b": pa.array(g["b"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["size"].to_numpy(dtype=np.int64)),
        })

    hist = keyed_ds.map_batches(
        lang_bucket_counts, batch_format="pyarrow").to_pandas()
    if hist.empty:  # Ray's to_pandas drops column names on an empty corpus
        z = pa.array([], type=pa.int64())
        return pa.table({
            "doc_id": z, "lang": pa.array([], type=pa.string()),
            "grp_rank": z, "mix_key": z, "mix_rank": z,
        })
    hist = hist.groupby(["lang", "b"], as_index=False)["n"].sum()
    langs = sorted(hist["lang"].unique().tolist())  # tiebreak order: lang asc
    bases = {}
    totals = np.zeros(len(langs), dtype=np.int64)
    strides = np.array([_mix_stride(h) for h in langs], dtype=np.int64)
    for j, h in enumerate(langs):
        sub = hist[hist["lang"] == h]
        counts = np.zeros(_SHUF_BUCKETS, dtype=np.int64)
        counts[sub["b"].to_numpy()] = sub["n"].to_numpy()
        bases[h] = np.concatenate(([0], np.cumsum(counts)[:-1]))
        totals[j] = int(sub["n"].sum())
    meta_ref = ray.put((langs, bases, totals, strides))

    def finish(group: pa.Table) -> pa.Table:
        langs, bases, totals, strides = ray.get(meta_ref)
        code_of = {h: j for j, h in enumerate(langs)}
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = np.asarray(group["lang"].to_pylist(), dtype=object)
        u = np.asarray(group["u"].to_pylist(), dtype="U32")
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lc = np.fromiter((code_of[x] for x in lang.tolist()),
                         dtype=np.int64, count=lang.size)
        order = np.lexsort((ids, u, b, lc))
        ids, lang, u, b, lc = ids[order], lang[order], u[order], b[order], lc[order]
        # position within each (group, bucket) run
        run = lc * _SHUF_BUCKETS + b
        within = _run_positions(run)
        base = np.empty(run.size, dtype=np.int64)
        for j, h in enumerate(langs):
            m = lc == j
            if m.any():
                base[m] = bases[h][b[m]]
        grp_rank = base + within
        k = (2 * grp_rank + 1) * strides[lc]
        # closed-form global rank of (k, lang, grp_rank) in the interleave
        mix = np.zeros(run.size, dtype=np.int64)
        for j in range(len(langs)):
            m_h, n_h = strides[j], totals[j]
            mix += np.clip(((k - 1) // m_h - 1) // 2 + 1, 0, n_h)
            quo = k // m_h
            eq = ((k % m_h == 0) & (quo % 2 == 1)
                  & ((quo - 1) // 2 < n_h) & (j < lc))
            mix += eq
        return pa.table({
            "doc_id": pa.array(ids),
            "lang": pa.array(lang.tolist(), type=pa.string()),
            "grp_rank": pa.array(grp_rank),
            "mix_key": pa.array(k),
            "mix_rank": pa.array(mix),
        })

    return keyed_ds.groupby("q").map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

WS_K = 64
_WS_SCALE = float(1 << 52)  # 16^13 = 2^52 — division by it is FP-EXACT


def weighted_sample(sf_dir: str, k: int = WS_K):
    """(sample_rank, doc_id, n_chars): a deterministic k-document sample
    drawn WITHOUT replacement with probability proportional to weight
    (n_chars) — the Efraimidis–Spirakis A-ES scheme (2006): each doc gets
    key = ln(u)/w for a uniform u, and the k LARGEST keys are exactly a
    weighted sample without replacement. Complements ``pps_sample``
    (systematic, WITH replacement): curation wants both draws.

    Determinism contract: u = (h13 + 1) / 2⁵², where h13 is the first 13
    hex digits of md5(doc_id) — ``_md5_keys``' derivation, so the sample
    is key-stable across re-runs and machines; h13 + 1 keeps u in (0, 1]
    (ln(0) can never occur) and the 2⁵² divisor makes u EXACT in float64
    (power-of-two division), so engine and SQL compute ln on identical
    doubles. Zero/negative weights are unsampleable and drop on both
    sides.

    Scale shape: top-k by key is distributive — each batch keeps only ITS
    k best by (key DESC, doc_id ASC) and the driver merges ≤ batches × k
    rows; no shuffle, no sort of the corpus."""

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = w > 0
        ids, w = ids[m], w[m]
        if ids.size == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_chars": pa.array([], type=pa.int64()),
                             "key": pa.array([], type=pa.float64())})
        hexes = _md5_hexes(ids)
        h13 = np.fromiter((int(h[:13], 16) for h in hexes),
                          dtype=np.int64, count=len(hexes))
        key = np.log((h13 + 1) / _WS_SCALE) / w
        order = np.lexsort((ids, -key))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "n_chars": pa.array(w[order]),
                         "key": pa.array(key[order])})

    parts = (
        read_documents(sf_dir, columns=("doc_id", "n_chars"))
        .map_batches(local_topk, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    if parts.empty:
        return pa.table({"sample_rank": pa.array([], type=pa.int64()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "n_chars": pa.array([], type=pa.int64())})
    top = (parts.sort_values(["key", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return pa.table({
        "sample_rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        "doc_id": pa.array(top["doc_id"].to_numpy(dtype=np.int64)),
        "n_chars": pa.array(top["n_chars"].to_numpy(dtype=np.int64)),
    })
