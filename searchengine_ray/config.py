"""Engine configuration.

Reference analogue: ``config/Config.java:13-18`` + ``application.yaml:34-97``
(lemma POS exceptions, search frequency filter, concurrency knobs). The
rebuild exposes the same knobs as a plain dataclass passed to pipelines and
actors via constructor args (no Spring, no DB).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    """All tunables for index build + query.

    Text semantics knobs mirror the reference:

    - ``search_filter``: query-time frequency gate percent — a non-identifier
      lemma is dropped when ``100 * df / N > search_filter``
      (``services/SearchServiceImpl.java:108-110``; default 100 = pass-through,
      ``application.yaml:96-97``).
    - ``analyzer``: ``"ru"`` reproduces the reference tokenizer + significance
      semantics (``services/LemmaFinder.java:124-161``) with a deterministic
      lemma normalizer replacing RussianLuceneMorphology; ``"simple"`` is an
      ASCII analyzer whose semantics are exactly expressible in ANSI SQL
      (used for the DuckDB oracle checks).

    Scale knobs (no reference analogue — the reference is a single JVM):

    - ``num_segments``: range-partitioned posting "salt" — postings of one
      lemma are built as up to ``num_segments`` docid-range-disjoint segments
      so a stopword-sized posting list never lands in a single reduce task
      (SURVEY.md §4 "Skew").
    - ``num_buckets``: lemma-hash bucket count for the on-disk posting layout
      (point reads at query time touch one bucket per lemma).
    - ``block_size``: postings per skip block; per-block ``last_docid`` /
      ``max_tf`` metadata drives conjunctive block skipping and block-max
      scoring bounds.
    """

    # --- text semantics ---
    analyzer: str = "ru"
    search_filter: int = 100
    # Corpus-partition ("site") scoping: name of an input column whose value
    # partitions the docs (reference ``Lemma.site_id`` /
    # ``SearchServiceImpl.java:74-82`` site scoping — the graft analogue is
    # any low-cardinality column, e.g. ``role`` for transcripts). When set,
    # the build rides one extra sentinel posting per doc carrying the doc's
    # partition + length, and search/stats accept ``site=``. None = single
    # logical site (SURVEY.md §1.3 default).
    site_column: str | None = None
    # Ingest: treat the ``text`` column as raw HTML and extract Jsoup
    # ``body().text()``-equivalent plain text (htmltext.py, M5) before
    # tokenization AND before the doc store write — the reference keeps raw
    # HTML in the page table and extracts per search hit
    # (``services/SearchServiceImpl.java:178-193``); extracting ONCE at
    # ingest is the scale-correct equivalent (snippets and postings see the
    # same text either way). False = identity (transcripts are plain text).
    html_content: bool = False
    # --- BM25 ---
    k1: float = 1.2
    b: float = 0.75
    # --- index layout / shuffle ---
    num_segments: int = 8
    num_buckets: int = 16
    block_size: int = 128
    # --- execution sizing ---
    batch_size: int = 4096
    # Autoscaling (min, max) actor pool. A FIXED pool equal to the session's
    # CPU count reserves every CPU and starves the upstream read tasks — the
    # pipeline deadlocks. Keep this a tuple (or < session CPUs) always.
    lemmatizer_concurrency: int | tuple[int, int] = (1, 4)
    # --- build sharding (resume unit) ---
    num_shards: int = 1
    # blocks entering the (bucket, seg) shuffle. The mini-segment stream is
    # small but arrives in many blocks; coalescing before the sort turns an
    # O(blocks²) shard-object explosion into O(partitions²). None → resolved
    # from session CPUs in build_index; set explicitly on big clusters
    # (≈ 2× total cores).
    shuffle_partitions: int | None = None
    # concurrent shard builds (driver threads; each shard is one streaming
    # Dataset job — Ray interleaves their tasks across the cluster)
    build_concurrency: int = 4
    # --- snippet semantics (services/SearchServiceImpl.java:237-249) ---
    snippet_window: int = 5
    snippet_max_windows: int = 3
    # --- HTTP auth (config/SecurityConfig.java:21-32) ---
    # (username, password, role) triples for the API server. The reference
    # guards /api/startIndexing, /api/stopIndexing, /api/indexPage,
    # /api/deleteAll and /api/admin/** behind ROLE_ADMIN; search and
    # statistics stay readable (the graft keeps them unauthenticated so
    # the driver/CLI envelopes are unchanged). Empty tuple = auth
    # disabled (library/test default); ``server.make_server(auth=True)``
    # with no users seeds the reference's default admin/changeme
    # (config/DataInitializer.java:32-42).
    auth_users: tuple = ()

    def replace(self, **kw) -> "EngineConfig":
        from dataclasses import replace

        return replace(self, **kw)


DEFAULT_CONFIG = EngineConfig()
