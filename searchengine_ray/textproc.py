"""Deterministic tokenizer + significance filter + lemma normalizer.

This is the single shared text-semantics module: index build, query parsing,
snippet highlighting and the exact oracle all import these functions, which
guarantees index/query consistency the same way the reference guarantees it
by reusing one ``LemmaFinder`` bean everywhere
(``services/SearchServiceImpl.java:92-94,224,276-284``).

Reference semantics reproduced exactly (``services/LemmaFinder.java``):

- M1 tokenizer (``prepareStringArray``, LemmaFinder.java:143-148): lowercase →
  replace every char not in ``[а-яА-Яa-zA-Z0-9/\\-\\s]`` with a space → trim →
  split on whitespace. Hyphens and slashes survive so case-number identifiers
  stay intact. NOTE: the Java char class ``а-я`` excludes ``ё`` — ``ё``
  becomes a space; we match that byte-for-byte.
- Identifier patterns (LemmaFinder.java:47-55,158-161): court case numbers
  ``X-Y/dddd``, case IDs with 2+ hyphen groups, standalone digit sequences of
  length ≥ 2. All three are indexed lowercase-verbatim, bypassing
  lemmatization, the significance filter, and the query-time frequency gate.
- M2 significance (``isWordSignificant``, LemmaFinder.java:124-141):
  identifiers always pass; other words must be Cyrillic-only (the reference's
  ``RussianLuceneMorphology.checkString`` — Latin words are DROPPED) and not
  function words (the reference drops morph tags СОЮЗ/МЕЖД/ПРЕДЛ/ЧАСТ via
  ``lemmaExceptions``, application.yaml:65-69; we use an explicit function-word
  list, which the north star permits: "porting the LuceneMorphology-style
  lemmatizer to a deterministic tokenizer+lemma normalizer").
- M3 lemmatizer (``getLemma``, LemmaFinder.java:102-111): identifiers →
  verbatim (already lowercase); else the dictionary/morphology normal form —
  replaced here by a deterministic exception table + longest-suffix-strip
  normalizer. Same word → same lemma on every worker, by construction.

The ``simple`` analyzer is a second, ASCII-only mode whose semantics are
exactly expressible in ANSI SQL (``regexp_extract_all(lower(text),
'[a-z0-9]+')`` + length/stopword filter + identity lemma); it backs the
DuckDB oracle checks in ``__ray_entry__.py``.
"""

from __future__ import annotations

import re
from collections import Counter

# ---------------------------------------------------------------------------
# M1 — tokenizer (LemmaFinder.java:39,143-148)
# ---------------------------------------------------------------------------

# Java: "[^а-яА-Яa-zA-Z0-9/\\-\\s]" applied AFTER toLowerCase(ROOT); the
# upper-case ranges are dead post-lowering but kept for fidelity.
_SYMBOL_RE = re.compile(r"[^а-яА-Яa-zA-Z0-9/\-\s]")
_WS_RE = re.compile(r"\s+")


def tokenize(text: str) -> list[str]:
    """Exact ``prepareStringArray`` semantics; returns possibly-empty tokens
    filtered out (the reference skips empties in its loop,
    LemmaFinder.java:71)."""
    cleaned = _SYMBOL_RE.sub(" ", text.lower()).strip()
    if not cleaned:
        return []
    return [w for w in _WS_RE.split(cleaned) if w]


# ---------------------------------------------------------------------------
# Identifier patterns (LemmaFinder.java:47-55,150-161)
# ---------------------------------------------------------------------------

_COURT_CASE_RE = re.compile(r"[А-Яа-яA-Za-z0-9]+-[А-Яа-яA-Za-z0-9]+/[0-9]{4}")
_CASE_ID_RE = re.compile(r"[A-Za-z0-9]+(?:-[A-Za-z0-9]+){2,}")
_DIGITS = frozenset("0123456789")


def is_court_case(word: str) -> bool:
    return _COURT_CASE_RE.fullmatch(word) is not None


def is_case_id(word: str) -> bool:
    return _CASE_ID_RE.fullmatch(word) is not None


def is_digit_sequence(word: str) -> bool:
    """Digit runs of length ≥ 2 (article numbers, LemmaFinder.java:158-161)."""
    return len(word) >= 2 and all(c in _DIGITS for c in word)


def is_identifier(word: str) -> bool:
    """Union of the three identifier classes; used for the query-time
    frequency-gate bypass (SearchServiceImpl.java:269-274)."""
    return is_court_case(word) or is_case_id(word) or is_digit_sequence(word)


# ---------------------------------------------------------------------------
# M2 — significance filter (LemmaFinder.java:124-141)
# ---------------------------------------------------------------------------

# Function words dropped at indexing: the deterministic replacement for the
# reference's morph-tag filter (СОЮЗ conjunctions / МЕЖД interjections /
# ПРЕДЛ prepositions / ЧАСТ particles; application.yaml:65-69).
RU_FUNCTION_WORDS: frozenset[str] = frozenset(
    """
    и а но или либо да зато однако тоже также чтобы чтоб если хотя хоть пока
    ибо будто словно причем притом
    в во на с со по за к ко у о об обо от ото из изо при про для без до над
    под подо перед передо через сквозь среди между близ возле вокруг кроме
    вместо ради насчет вдоль против
    же ли ль бы б не ни вот вон ведь уж уже лишь только именно даже пусть
    пускай разве неужели авось небось дескать мол
    ох ах ой ай эх эй увы ура ага угу фу тьфу алло
    """.split()
)

_CYRILLIC = frozenset("абвгдежзийклмнопрстуфхцчшщъыьэюя")


def _is_cyrillic_word(word: str) -> bool:
    """Analogue of ``RussianLuceneMorphology.checkString`` — true iff every
    char is a Russian letter (the tokenizer never emits ``ё``)."""
    return bool(word) and all(c in _CYRILLIC for c in word)


def is_significant(word: str) -> bool:
    if is_identifier(word):
        return True
    if not _is_cyrillic_word(word):
        return False  # Latin-only words are dropped, as in the reference
    return word not in RU_FUNCTION_WORDS


# ---------------------------------------------------------------------------
# M3 — lemma normalizer (LemmaFinder.java:102-111)
# ---------------------------------------------------------------------------

# Irregular forms mapped explicitly (the reference gets these from the
# morphology dictionary; we pin a deterministic table).
LEMMA_EXCEPTIONS: dict[str, str] = {
    "люди": "человек",
    "людей": "человек",
    "людям": "человек",
    "людьми": "человек",
    "дети": "ребенок",
    "детей": "ребенок",
    "детям": "ребенок",
    "детьми": "ребенок",
    "шел": "идти",
    "шла": "идти",
    "шли": "идти",
    "шло": "идти",
}

# Longest-first inflectional suffixes; a suffix is stripped only when the
# remaining stem keeps ≥ MIN_STEM chars. One pass, first match wins —
# deterministic by construction.
_SUFFIXES: tuple[str, ...] = tuple(
    sorted(
        """
        иями иях иям ями ами ыми ими ого его ому ему ейш айш
        ешь ишь ете ите ють ят ут ют ат ишь
        ать ять еть ить уть ыть
        ала яла ела ила али яли ели или ало яло ело ило
        ая яя ое ее ые ие ый ий ой ых их ым им ую юю
        ов ев ей ам ям ах ях ом ем ью ия ие
        ал ял ел ил ет ит
        а я о е ы и у ю ь
        """.split(),
        key=len,
        reverse=True,
    )
)
_MIN_STEM = 3


# Pluggable inflection table (VERDICT r3 item 5): the dictionary-grade
# resolution layer between the exception table and the suffix-strip
# fallback. Defaults to the paradigm-generated table in morphdict.py
# (loaded lazily ONCE PER PROCESS — the ST1 morphology-state shape);
# ``use_lemma_table`` swaps in an external form→lemma mapping (e.g. a full
# OpenCorpora export) or disables the layer with an empty dict.
_LEMMA_TABLE: dict[str, str] | None = None


def use_lemma_table(table: dict[str, str] | None) -> None:
    """Install a custom form→normal-form table (None = revert to the
    bundled morphdict table). Affects every Analyzer in the process; index
    and query must run with the SAME table (same rule as the reference's
    single LemmaFinder bean)."""
    global _LEMMA_TABLE
    _LEMMA_TABLE = table


def _lemma_table() -> dict[str, str]:
    if _LEMMA_TABLE is not None:
        return _LEMMA_TABLE
    from searchengine_ray.morphdict import form_table

    return form_table()


def lemma_of(word: str) -> str:
    """Normal form of a token, resolved like the reference's
    ``LemmaFinder.getLemma`` (LemmaFinder.java:102-111): identifiers pass
    through verbatim (tokens are already lowercase post-tokenize);
    irregulars via the exception table; dictionary words via the inflection
    table (first-normal-form lookup — the ``RussianLuceneMorphology``
    analogue, see morphdict.py); out-of-vocabulary words via longest-suffix
    stripping. Mirrors the reference's fallback contract: any failure → the
    lowercase word itself."""
    if is_identifier(word):
        return word
    exc = LEMMA_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    hit = _lemma_table().get(word)
    if hit is not None:
        return hit
    for suf in _SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= _MIN_STEM:
            return word[: -len(suf)]
    return word


def morphology_signature(lemma_table: dict[str, str] | None = None) -> str:
    """md5 over the ACTIVE lemma-resolution state (exception table, lemma
    table, suffix list). An index's vocabulary is a function of this, so
    the signature joins the shard config signature (a morphology change
    rebuilds shards on reindex instead of silently reusing postings keyed
    to old lemmas) and the manifest (``QueryEngine`` warns when serving an
    index built under different morphology — same word, different lemma
    means silent zero-recall otherwise). Recomputed per call (~ms): the
    table is swappable at runtime via ``use_lemma_table``.

    ``lemma_table`` signs an EXPLICIT table snapshot instead of the live
    module global — ``build_index`` snapshots the table once at entry and
    signs that snapshot, so a concurrent ``use_lemma_table`` call can never
    make the manifest signature disagree with the tables the shards were
    actually built under. ``None`` keeps the live-state behavior (which is
    itself the bundled table when no custom one is installed, so
    signature(snapshot=None) == signature(live) at snapshot time)."""
    import hashlib

    h = hashlib.md5()
    for k in sorted(LEMMA_EXCEPTIONS):
        h.update(f"e\x1f{k}\x1f{LEMMA_EXCEPTIONS[k]}\x1e".encode())
    t = lemma_table if lemma_table is not None else _lemma_table()
    for k in sorted(t):
        h.update(f"t\x1f{k}\x1f{t[k]}\x1e".encode())
    h.update(("s\x1f" + "\x1f".join(_SUFFIXES)).encode())
    return h.hexdigest()


# ---------------------------------------------------------------------------
# Simple ASCII analyzer (SQL-expressible; used by DuckDB oracle checks)
# ---------------------------------------------------------------------------

_ASCII_TOKEN_RE = re.compile(r"[a-z0-9]+")

# Matches the fixed list inlined in __ray_entry__.oracle_sql().
EN_STOPWORDS: frozenset[str] = frozenset(
    "the a an and or of to in on for with as by at is are was were be been "
    "it this that these those from not no".split()
)


def tokenize_simple(text: str) -> list[str]:
    return _ASCII_TOKEN_RE.findall(text.lower())


def is_significant_simple(word: str) -> bool:
    return len(word) >= 2 and word not in EN_STOPWORDS


# ---------------------------------------------------------------------------
# Analyzer — the bundled pipeline used by build / query / oracle
# ---------------------------------------------------------------------------


def tokens_flat_arrow(texts, mode: str = "ru"):
    """Vectorized tokenizer over a pyarrow string array: returns
    ``(flat_tokens: pa.StringArray, parents: np.ndarray)`` where ``parents``
    maps each token to its row index. Token-for-token identical to calling
    ``tokenize``/``tokenize_simple`` per row (asserted by tests): lower →
    replace the disallowed char class with space → split on whitespace →
    drop empties. RE2's ``\\s`` is ASCII-only while Python's is
    Unicode-aware, but the two pipelines agree because any Unicode space is
    either replaced with ' ' by the cleaner (RE2 path) or consumed by the
    splitter (Python path) — both yield a token boundary."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.string())
    low = pc.utf8_lower(texts)
    pattern = r"[^а-яА-Яa-zA-Z0-9/\-\s]" if mode == "ru" else r"[^a-z0-9]"
    cleaned = pc.replace_substring_regex(low, pattern=pattern, replacement=" ")
    split = pc.split_pattern_regex(cleaned, pattern=r"\s+")
    flat = pc.list_flatten(split)
    parents = pc.list_parent_indices(split)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parents = parents.filter(mask)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, np.asarray(parents.to_numpy(zero_copy_only=False), dtype=np.int64)


class Analyzer:
    """Mode-dispatched text pipeline. ``ru`` = reference semantics;
    ``simple`` = SQL-expressible ASCII mode. Stateless and cheap to construct;
    actor stages build one per actor in ``__init__``."""

    def __init__(self, mode: str = "ru"):
        if mode not in ("ru", "simple"):
            raise ValueError(f"unknown analyzer mode: {mode}")
        self.mode = mode

    def tokens(self, text: str) -> list[str]:
        return tokenize(text) if self.mode == "ru" else tokenize_simple(text)

    def significant(self, word: str) -> bool:
        return is_significant(word) if self.mode == "ru" else is_significant_simple(word)

    def lemma(self, word: str) -> str:
        return lemma_of(word) if self.mode == "ru" else word

    def lemmas(self, text: str) -> list[str]:
        """Significant lemmas of a text, in token order."""
        return [self.lemma(w) for w in self.tokens(text) if self.significant(w)]

    def lemma_counts(self, text: str) -> Counter:
        """Per-doc term frequencies — the reference's per-page
        ``HashMap<lemma,count>`` (M4, LemmaFinder.java:65-78)."""
        return Counter(self.lemmas(text))

    def safe_lemma(self, word: str) -> str:
        """Snippet-path lemmatization: empty string for insignificant words
        (``SearchServiceImpl.safeGetLemma``, SearchServiceImpl.java:276-284)."""
        return self.lemma(word) if self.significant(word) else ""

    def query_lemmas(self, query: str) -> set[str]:
        """Dedup'd significant lemma set of a query string
        (``extractQueryLemmas``, SearchServiceImpl.java:91-97)."""
        return {self.lemma(w) for w in self.tokens(query) if self.significant(w)}

    def is_identifier(self, word: str) -> bool:
        if self.mode == "ru":
            return is_identifier(word)
        return is_digit_sequence(word)
