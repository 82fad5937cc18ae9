"""The flagship pipeline for the driver's testdata: build the real inverted
index + BM25 engine over transcripts derived from the ``documents`` table and
serve a fixed query set.

The derivation (``corpus.transcripts_from_documents``) and the simple
analyzer are both exactly SQL-expressible, so this end-to-end path — Ray
Data index build → compressed posting segments → conjunctive BM25 top-k —
is oracle-checked against DuckDB in ``__ray_entry__``.

Scores are rounded (half-away, 4 dp) and re-ranked ``(score_r desc, conv_id,
turn_idx)`` before the top-10 cut so float summation-order noise cannot flip
ranks between engine and SQL.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from searchengine_ray.build import build_index
from searchengine_ray.config import EngineConfig
from searchengine_ray.corpus import transcripts_from_documents

# Fixed reference query set over the documents vocabulary.
FIXED_QUERIES: list[tuple[str, str]] = [
    ("ts-single", "window"),
    ("ts-and2", "scan column"),
    ("ts-and3", "hash join merge"),
    ("ts-rare", "dup"),
    ("ts-missing", "window qzqzqzqz"),
    ("ts-stopword", "the a of"),
]

TRANSCRIPT_CFG = EngineConfig(
    analyzer="simple",
    site_column="role",  # corpus-partition scoping: role = the "site" graft
    num_shards=2,
    num_segments=4,
    num_buckets=8,
    lemmatizer_concurrency=(1, 2),
    batch_size=2048,
)


def ensure_transcript_index(sf_dir: str, root: str = "/tmp/searchengine_ray_idx") -> str:
    """Build (once per sf_dir; resumable) the engine index over the derived
    transcripts. Returns the index directory."""
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|v3".encode()).hexdigest()[:12]
    base = os.path.join(root, key)
    corpus_dir = os.path.join(base, "corpus")
    index_dir = os.path.join(base, "index")
    if os.path.exists(os.path.join(index_dir, "manifest.json")):
        return index_dir
    os.makedirs(corpus_dir, exist_ok=True)
    table = transcripts_from_documents(sf_dir)
    # deterministic 4-file layout → 2 build shards
    n = table.num_rows
    per = (n + 3) // 4
    for i in range(4):
        chunk = table.slice(i * per, min(per, n - i * per))
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(corpus_dir, f"part-{i:05d}.parquet"))
    build_index(corpus_dir, index_dir, TRANSCRIPT_CFG)
    return index_dir


def transcript_search(sf_dir: str, k: int = 10, site: str | None = None) -> pd.DataFrame:
    """(query_id, rank, conv_id, turn_idx, score_r, count) for the fixed
    query set — one row per hit in the rounded-score top-k. ``site`` scopes
    matching + BM25 stats to one corpus partition (role)."""
    from searchengine_ray.query import QueryEngine

    index_dir = ensure_transcript_index(sf_dir)
    return _search_frame(QueryEngine(index_dir), FIXED_QUERIES, k=k, site=site)


def _search_frame(engine, queries: list[tuple[str, str]], k: int, site: str | None = None) -> pd.DataFrame:
    from searchengine_ray.results import rounded_topk_frame

    frames = [
        f
        for qid, qtext in queries
        if not (f := rounded_topk_frame(engine.search_ids(qtext, site=site), qid, k)).empty
    ]
    if not frames:
        return pd.DataFrame(
            columns=["query_id", "rank", "conv_id", "turn_idx", "score_r", "count"]
        )
    return pd.concat(frames, ignore_index=True)


# Fixed upsert batch for the doc-level incremental path (delta.py): two
# replacements of derived docs (doc_id 0 and 3 → conv-000000 turns 0/3,
# roles user/system per the doc_id % 4 mapping), one new turn in an existing
# conversation, one new conversation that sorts after every derived conv id
# (preserving the docid⇔(conv_id, turn_idx) isomorphism). ``zuzuzu`` exists
# ONLY via upsert, so ts-upnew exercises a delta-only dictionary entry.
UPSERT_ROWS: list[dict] = [
    {"conv_id": "conv-000000", "turn_idx": 0, "role": "user", "text": "window scan merge window dup zuzuzu"},
    {"conv_id": "conv-000000", "turn_idx": 3, "role": "system", "text": "hash join merge column scan"},
    {"conv_id": "conv-000000", "turn_idx": 900, "role": "assistant", "text": "column window zuzuzu scan"},
    {"conv_id": "zzzz-upsert", "turn_idx": 0, "role": "user", "text": "zuzuzu dup window hash"},
]

UPSERT_QUERIES: list[tuple[str, str]] = FIXED_QUERIES + [("ts-upnew", "zuzuzu")]


def transcript_upsert_search(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Doc-level incremental re-index, end to end (reference ``POST
    /api/indexPage``, ``services/PageProcessorService.java:34-46``): copy
    the built index, apply ``UPSERT_ROWS`` as two delta generations
    (replacements, then additions — ``delta.py``), and serve the fixed
    query set over the overlaid index. Oracle-checked: the SQL mirror
    overlays the same rows as literals onto the derived corpus, so the
    results must equal a from-scratch index of the UPDATED corpus."""
    import shutil

    from searchengine_ray.delta import upsert_docs
    from searchengine_ray.query import QueryEngine

    base = ensure_transcript_index(sf_dir)
    idx = base + "-upsert"
    shutil.rmtree(idx, ignore_errors=True)
    shutil.copytree(base, idx)
    upsert_docs(idx, UPSERT_ROWS[:2])  # generation 0: replacements
    upsert_docs(idx, UPSERT_ROWS[2:])  # generation 1: additions
    return _search_frame(QueryEngine(idx), UPSERT_QUERIES, k=k)


def transcript_search_actor(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """The distributed serving path (ST7): the fixed query set evaluated by a
    ``QueryActor`` POOL via ``map_batches`` over a query table — each actor
    holds a warm engine (dictionary + doc-length norms + posting LRU built
    once in ``__init__``). ``rounded_topk`` ranks by rounded score with the
    canonical tie-break, so the output is frame-identical to
    ``transcript_search`` and shares its SQL oracle."""
    import ray.data as rd

    from searchengine_ray.query import QueryActor

    index_dir = ensure_transcript_index(sf_dir)
    queries = [
        {"query_id": qid, "query": q, "offset": 0, "limit": k}
        for qid, q in FIXED_QUERIES
    ]
    out = (
        rd.from_items(queries)
        .map_batches(
            QueryActor,
            fn_constructor_kwargs={"index_dir": index_dir, "rounded_topk": True},
            batch_format="pandas",
            batch_size=4,
            concurrency=2,
        )
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"], kind="stable").reset_index(drop=True)


def transcript_search_site(sf_dir: str, site: str = "assistant", k: int = 10) -> pd.DataFrame:
    """Site-scoped flagship search (reference ``site=`` on ``/api/search``,
    ``SearchServiceImpl.java:74-82``): the fixed query set evaluated within
    ONE corpus partition — per-site df/N/avgdl drive gate and BM25, so this
    equals searching an index built from that partition alone. Exactly
    SQL-mirrorable (partition = ``role``, a pure function of doc_id in the
    derived corpus) and oracle-checked."""
    return transcript_search(sf_dir, k=k, site=site)


_DEDUP_PARTITIONS = 64


def dedup_turns(input_path: str | list, out_dir: str) -> list[str]:
    """D4 first-wins dedup on ``(conv_id, turn_idx)`` — the reference's
    frontier/page dedup analogue (``IndexingServiceImpl.java:207``, unique
    path index ``model/Page.java:15``) as a preparation pipeline for inputs
    that may contain duplicate turns: keep the EARLIEST row per key (min
    ``ts``; ties broken by text lexicographically, so the winner is
    deterministic on every run/cluster). Fixed-partition shape: hash keys
    into 64 partitions, one vectorized first-wins pass per partition, write
    partitioned parquet to ``out_dir``. Returns the written files."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.build import _expand_input
    from searchengine_ray.sources import read_parquet_clean

    files = _expand_input(input_path)
    os.makedirs(out_dir, exist_ok=True)

    def add_part(batch: pa.Table) -> pa.Table:
        import zlib

        convs = batch["conv_id"].to_pylist()
        turns = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.fromiter(
            (zlib.crc32(c.encode("utf-8")) for c in convs),
            dtype=np.int64,
            count=len(convs),
        )
        q = (q ^ turns) % _DEDUP_PARTITIONS
        return batch.append_column("q", pa.array(q))

    def first_wins(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        df = df.sort_values(
            ["conv_id", "turn_idx", "ts", "text"], kind="stable"
        ).drop_duplicates(["conv_id", "turn_idx"], keep="first")
        return pa.Table.from_pandas(
            df.drop(columns=["q"]), preserve_index=False
        )

    (
        read_parquet_clean(files)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("q")
        .map_groups(first_wins, batch_format="pyarrow")
        .write_parquet(out_dir)
    )
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )


def transcript_index_dictionary(sf_dir: str) -> pd.DataFrame:
    """Dictionary (lemma, df, cf) of the built transcript index — the
    index-content surface of the engine, oracle-checked in SQL."""
    index_dir = ensure_transcript_index(sf_dir)
    t = pq.read_table(os.path.join(index_dir, "dictionary.parquet"))
    return t.to_pandas()


DUP_LOSER_EVERY = 10   # planted later-ts duplicate (loses first-wins)
DUP_WINNER_EVERY = 40  # planted earlier-ts duplicate (wins first-wins)


def dedup_turns_check(sf_dir: str) -> pd.DataFrame:
    """Driver-contract surface of ``dedup_turns`` (D4 first-wins): derive
    the transcripts, PLANT deterministic duplicate turns — a later-ts copy
    for every DUP_LOSER_EVERY-th doc (must lose) and an earlier-ts variant
    for every DUP_WINNER_EVERY-th doc (must win) — run the distributed
    first-wins pipeline, and return the winners
    (conv_id, turn_idx, role, ts_us, text). The plant is pure arithmetic on
    doc_id, so the SQL oracle reconstructs it exactly."""
    import tempfile

    import pyarrow as pa

    from searchengine_ray.corpus import transcripts_from_documents

    table = transcripts_from_documents(sf_dir)
    df = table.to_pandas()
    doc_id = (
        df["conv_id"].str.slice(5).astype("int64") * 8 + df["turn_idx"].astype("int64")
    )
    losers = df[doc_id % DUP_LOSER_EVERY == 0].copy()
    losers["ts"] = losers["ts"] + pd.Timedelta(hours=1)
    losers["text"] = losers["text"] + " DUPLICATE"
    winners = df[doc_id % DUP_WINNER_EVERY == 0].copy()
    winners["ts"] = winners["ts"] - pd.Timedelta(hours=1)
    winners["text"] = "EARLY " + winners["text"]
    planted = pd.concat([df, losers, winners], ignore_index=True)

    tmp = tempfile.mkdtemp(prefix="dedup_turns_")
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    pq.write_table(
        pa.Table.from_pandas(planted, schema=table.schema, preserve_index=False),
        os.path.join(src, "part-00000.parquet"),
    )
    out_files = dedup_turns(src, os.path.join(tmp, "out"))
    got = pd.concat(
        [pq.read_table(f).to_pandas() for f in out_files], ignore_index=True
    )
    got["ts_us"] = got["ts"].astype("int64")
    got = got[["conv_id", "turn_idx", "role", "ts_us", "text"]]
    return got.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
