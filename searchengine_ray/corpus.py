"""Deterministic synthetic transcripts corpus (FIXTURES.md §F1/F2).

No external data: the 10^12-turn production table is modeled at small scale by
a seeded generator producing the exact ``BASELINE.json input_hint`` schema
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``. Properties exercised (FIXTURES.md):

- Zipfian vocabulary with very-high-df Russian function words (stopword-skew
  exercise for the range-salted posting shuffle, SURVEY.md §4),
- content stems with inflected variants that ``textproc.lemma_of`` maps to a
  common base form,
- ~1% identifier tokens (court case numbers ``а33-5678/2023``, case IDs
  ``66ov0001-01-2021-000076-43``, bare digit sequences) matching
  ``services/LemmaFinder.java:47-55,158-161``,
- punctuation noise the tokenizer must strip, Latin-only words (dropped by the
  significance filter, LemmaFinder.java:128-130), empty/whitespace-only turns.

Also provides ``transcripts_from_documents`` — a deterministic, SQL-mirrorable
mapping of the driver's ``documents`` table into transcript shape (used by
``__ray_entry__.entry`` so the flagship pipeline runs on driver test data).
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "browser", "calculator", "editor"]

# Content stems (≥3 chars, so suffix stripping keeps them intact) + their
# inflected surface forms; textproc maps every form of a stem to one lemma.
_CONTENT = {
    "суд": ["суд", "суда", "суду", "судом", "суды", "судов"],
    "дел": ["дело", "дела", "делу", "делом", "делам"],
    "закон": ["закон", "закона", "закону", "законом", "законы"],
    "решени": ["решение", "решения", "решению", "решением"],
    "договор": ["договор", "договора", "договору", "договором", "договоры"],
    "жалоб": ["жалоба", "жалобы", "жалобу", "жалобой"],
    "документ": ["документ", "документа", "документы", "документом"],
    "заявлени": ["заявление", "заявления", "заявлению"],
    "истец": ["истец"],
    "ответчик": ["ответчик", "ответчика", "ответчику"],
    "судь": ["судья", "судьи", "судье"],
    "стать": ["статья", "статьи", "статье", "статьей"],
    "срок": ["срок", "срока", "сроки", "сроком"],
    "штраф": ["штраф", "штрафа", "штрафы"],
    "налог": ["налог", "налога", "налоги", "налогом"],
    "компани": ["компания", "компании", "компанию"],
    "работ": ["работа", "работы", "работу", "работой"],
    "вопрос": ["вопрос", "вопроса", "вопросы", "вопросом"],
    "ошибк": ["ошибка", "ошибки", "ошибку", "ошибкой"],
    "модел": ["модель", "модели", "моделью"],
    "агент": ["агент", "агента", "агенты", "агентом"],
    "запрос": ["запрос", "запроса", "запросы", "запросом"],
    "поиск": ["поиск", "поиска", "поиском"],
    "индекс": ["индекс", "индекса", "индексы", "индексом"],
    "слов": ["слово", "слова", "словом", "словами"],
    "текст": ["текст", "текста", "тексты", "текстом"],
    "люд": ["люди", "людей", "людям"],  # irregular via LEMMA_EXCEPTIONS
}

# High-frequency function words (dropped at indexing — skew exercise happens
# before the significance filter is applied at the shuffle? No: these ARE
# dropped; the in-index skew comes from the most frequent CONTENT stems,
# which the Zipf distribution makes ~100× hotter than the tail.)
_FUNCTION = ["и", "в", "на", "не", "что", "по", "с", "для", "как", "это"]
_LATIN = ["hello", "world", "ray", "data", "test", "python"]
_PUNCT = [",", ".", "!", "?", "(", ")", '"', "«", "»", "@", "#", ":", ";"]


def _vocab_and_probs() -> tuple[list[str], np.ndarray, list[int]]:
    """Flat surface-form vocabulary with Zipfian base-stem probabilities."""
    words: list[str] = []
    probs: list[float] = []
    kinds: list[int] = []  # 0=function 1=content 2=latin
    for i, w in enumerate(_FUNCTION):
        words.append(w)
        probs.append(2.0 / (i + 1))
        kinds.append(0)
    for i, (_, forms) in enumerate(sorted(_CONTENT.items())):
        base_p = 1.0 / (i + 1) ** 1.1
        for f in forms:
            words.append(f)
            probs.append(base_p / len(forms))
            kinds.append(1)
    for w in _LATIN:
        words.append(w)
        probs.append(0.05)
        kinds.append(2)
    p = np.asarray(probs)
    return words, p / p.sum(), kinds


def generate_transcripts(
    n_convs: int = 20,
    avg_turns: float = 10.0,
    seed: int = 42,
    conv_offset: int = 0,
) -> pa.Table:
    """Seeded transcript table; same args → byte-identical table.
    ``conv_offset`` shifts the conv-id numbering so chunked generation
    (``write_transcripts_chunked``) produces disjoint conversations."""
    rng = np.random.default_rng(seed)
    words, probs, _ = _vocab_and_probs()
    V = len(words)

    n_turns_per_conv = np.clip(rng.poisson(avg_turns, size=n_convs), 1, 1000).astype(np.int64)
    total_turns = int(n_turns_per_conv.sum())

    conv_ids = np.repeat(
        np.array(
            [f"conv-{i + conv_offset:06d}" for i in range(n_convs)], dtype=object
        ),
        n_turns_per_conv,
    )
    turn_idx = np.concatenate([np.arange(n) for n in n_turns_per_conv]).astype(np.int32)
    roles = np.array(_ROLES, dtype=object)[rng.integers(0, 4, size=total_turns)]
    tools = np.where(
        roles == "tool",
        np.array(_TOOLS, dtype=object)[rng.integers(0, len(_TOOLS), size=total_turns)],
        "",
    )

    # Per-turn token counts; a few empty / whitespace-only turns.
    lens = np.clip(rng.poisson(24, size=total_turns), 0, 200)
    lens[rng.random(total_turns) < 0.01] = 0
    flat = rng.choice(V, size=int(lens.sum()), p=probs)
    punct_mask = rng.random(flat.size) < 0.12
    punct_pick = rng.integers(0, len(_PUNCT), size=flat.size)
    ident_turn = rng.random(total_turns) < 0.03
    ident_kind = rng.integers(0, 3, size=total_turns)
    ident_nums = rng.integers(0, 10_000, size=(total_turns, 3))

    texts: list[str] = []
    pos = 0
    for t in range(total_turns):
        L = int(lens[t])
        if L == 0:
            texts.append("   " if (t % 2 == 0) else "")
            continue
        toks = []
        for j in range(pos, pos + L):
            w = words[flat[j]]
            if punct_mask[j]:
                w += _PUNCT[punct_pick[j]]
            toks.append(w)
        pos += L
        if ident_turn[t]:
            a, b, c = (int(x) for x in ident_nums[t])
            k = int(ident_kind[t])
            if k == 0:
                toks.append(f"А{a % 99}-{b}/{2020 + c % 6}")
            elif k == 1:
                toks.append(f"66OV{a:04d}-01-{2020 + c % 6}-{b:06d}-43")
            else:
                # small recurring set so specific identifier queries (FIXTURES
                # F2 "337") have hits at every corpus size
                toks.append(str((105, 337, 228, 44, 1500)[a % 5]))
        texts.append(" ".join(toks))

    base = _dt.datetime(2026, 1, 1)
    ts_offsets = np.cumsum(rng.integers(1, 120, size=total_turns)).astype("timedelta64[s]")
    ts = np.datetime64(base) + ts_offsets

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def write_transcripts(
    out_dir: str,
    n_convs: int,
    avg_turns: float = 10.0,
    seed: int = 42,
    n_files: int = 8,
) -> list[str]:
    """Write the corpus as ``n_files`` parquet files (deterministic row
    ranges) — the multi-file layout is what makes build shards / resume
    partitioning meaningful."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_transcripts(n_convs=n_convs, avg_turns=avg_turns, seed=seed)
    n = table.num_rows
    paths = []
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        lo = i * per
        if lo >= n:
            break
        chunk = table.slice(lo, min(per, n - lo))
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(chunk, path)
        paths.append(path)
    return paths


def write_transcripts_chunked(
    out_dir: str,
    n_convs: int,
    avg_turns: float = 10.0,
    seed: int = 42,
    convs_per_file: int = 50_000,
) -> list[str]:
    """Memory-bounded corpus writer for very large corpora: one deterministic
    chunk (disjoint conv range, derived seed) per file — peak RAM is one
    chunk, not the whole corpus."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    i = 0
    off = 0
    while off < n_convs:
        n = min(convs_per_file, n_convs - off)
        table = generate_transcripts(
            n_convs=n, avg_turns=avg_turns, seed=seed + i, conv_offset=off
        )
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
        off += n
        i += 1
    return paths


def reference_queries() -> list[dict]:
    """The reference query set (FIXTURES.md §F2 coverage matrix)."""
    return [
        {"query_id": "q-rare-single", "query": "ответчику", "offset": 0, "limit": 10},
        {"query_id": "q-multi-and", "query": "суд решение", "offset": 0, "limit": 10},
        {"query_id": "q-multi-and-3", "query": "закон статья срок", "offset": 0, "limit": 10},
        {"query_id": "q-inflected", "query": "судами делами", "offset": 0, "limit": 10},
        {"query_id": "q-missing-term", "query": "суд абракадабрион", "offset": 0, "limit": 10},
        {"query_id": "q-stopword-only", "query": "и в на", "offset": 0, "limit": 10},
        {"query_id": "q-identifier", "query": "337", "offset": 0, "limit": 10},
        {"query_id": "q-empty", "query": "", "offset": 0, "limit": 10},
        {"query_id": "q-punct-only", "query": "?!, .", "offset": 0, "limit": 10},
        {"query_id": "q-offset", "query": "суд", "offset": 5, "limit": 10},
        {"query_id": "q-offset-beyond", "query": "жалоба", "offset": 10_000, "limit": 10},
        {"query_id": "q-latin-dropped", "query": "hello суд", "offset": 0, "limit": 10},
    ]


def transcripts_from_documents(sf_dir: str) -> pa.Table:
    """Deterministically dress the driver's ``documents`` table
    (``doc_id, text, lang, source, n_chars``) as transcripts. The mapping is
    pure arithmetic on ``doc_id`` so it is exactly mirrorable in SQL."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    doc_id = t["doc_id"].to_numpy()
    conv_num = doc_id // 8
    turn_idx = (doc_id % 8).astype(np.int32)
    conv_ids = np.array([f"conv-{c:06d}" for c in conv_num], dtype=object)
    roles = np.array(_ROLES, dtype=object)[(doc_id % 4).astype(np.int64)]
    ts = np.datetime64(_dt.datetime(2026, 1, 1)) + doc_id.astype("timedelta64[s]")
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": t["text"].cast(pa.string()),
            "tool": pa.array([""] * len(doc_id), type=pa.string()),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
