"""HTML → text extraction (M5 non-identity ingest): Jsoup-equivalence
golden vectors and the html_content build path (VERDICT r3 item 8).

The golden expectations below are the documented/observable behaviors of
``Jsoup.parse(html).body().text()`` / ``Document.title()``
(``services/SearchServiceImpl.java:178-193``) — whitespace normalization,
inline-vs-block separation, data-node exclusion, entity decoding."""

import hashlib
import os

import pytest

from searchengine_ray.htmltext import html_body_text, html_title

GOLDEN = [
    # (html, expected Jsoup body().text())
    ("<html><head><title>T</title></head><body><p>a</p><p>b</p></body></html>", "a b"),
    ("a<b>c</b>d", "acd"),                      # inline tags add no space
    ("a <b>c</b>", "a c"),                      # source whitespace kept as one space
    ("a<br>b", "a b"),                          # br renders as whitespace
    ("a<br/>b", "a b"),
    ("<p>  Hello   world  </p>", "Hello world"),  # runs collapse, ends trim
    ("x<script>var q = '<p>no</p>';</script>y", "xy"),  # script data excluded
    ("<style>p{color:red}</style>hi", "hi"),    # style data excluded
    ("&amp; &lt;tag&gt; &#1089;", "& <tag> с"),  # entities + charrefs decode
    ("<!-- comment -->visible", "visible"),
    ("<div>one</div>two", "one two"),           # block end separates
    ("three<div>four</div>", "three four"),     # block start separates
    ("<ul><li>i1</li><li>i2</li></ul>", "i1 i2"),
    ("<table><tr><td>c1</td><td>c2</td></tr></table>", "c1 c2"),
    ("", ""),
    ("<head><meta charset='utf-8'><title>Ti tle</title></head><body>b</body>", "b"),
    ("no tags at all", "no tags at all"),
    ("a\n\t\nb", "a b"),                        # any whitespace run → one space
    ("a\xa0b", "a b"),                          # nbsp normalizes (isActuallyWhitespace)
    ("x &nbsp; y", "x y"),                      # &nbsp; too, after entity decode
    ("a\x0bb", "a\x0bb"),                       # \v is NOT Jsoup whitespace — text
    ("<body><h1>Заголовок</h1><p>текст дела А40-123/2024</p></body>",
     "Заголовок текст дела А40-123/2024"),
]


class TestJsoupEquivalence:
    def test_body_text_golden_vectors(self):
        for html, want in GOLDEN:
            assert html_body_text(html) == want, html

    def test_title(self):
        assert html_title("<head><title> A  Title </title></head>") == "A Title"
        # first title wins (Document.title() reads the first)
        assert html_title("<title>one</title><title>two</title>") == "one"
        assert html_title("<body>no title</body>") == ""

    def test_head_text_excluded_body_kept(self):
        h = "<head><title>t</title>stray</head><body>kept</body>"
        assert html_body_text(h) == "kept"

    def test_nested_blocks_single_separator(self):
        # consecutive block boundaries still yield ONE space, never two
        assert html_body_text("<div><p>a</p></div><div><p>b</p></div>") == "a b"


class TestHtmlContentBuild:
    def test_index_hash_matches_plain_build(
        self, ray_session, tiny_corpus, tmp_path_factory
    ):
        """Building over an HTML-wrapped corpus with html_content=True must
        produce the IDENTICAL index to the plain-text build (extraction
        recovers the same text; the tokenizer is whitespace-insensitive) —
        dictionary bytes equal, search envelopes equal."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchengine_ray.build import build_index
        from searchengine_ray.config import EngineConfig
        from searchengine_ray.query import QueryEngine

        cfg = EngineConfig(num_segments=4, lemmatizer_concurrency=(1, 2), batch_size=512)
        root = tmp_path_factory.mktemp("htmlbuild")
        plain_dir, html_dir = str(root / "plain"), str(root / "html")
        os.makedirs(plain_dir)
        os.makedirs(html_dir)
        pq.write_table(tiny_corpus, f"{plain_dir}/part-00000.parquet")

        import html as _html

        wrapped = tiny_corpus.set_column(
            tiny_corpus.schema.get_field_index("text"),
            "text",
            pa.array(
                [
                    "<html><head><title>p</title><style>b{}</style></head>"
                    f"<body><!-- x --><p>{_html.escape(t or '', quote=False)}</p>"
                    "<script>var z=1;</script></body></html>"
                    for t in tiny_corpus["text"].to_pylist()
                ],
                type=pa.string(),
            ),
        )
        pq.write_table(wrapped, f"{html_dir}/part-00000.parquet")

        idx_plain, idx_html = str(root / "ip"), str(root / "ih")
        build_index(plain_dir, idx_plain, cfg)
        build_index(html_dir, idx_html, cfg.replace(html_content=True))

        def md5(p):
            return hashlib.md5(open(p, "rb").read()).hexdigest()

        assert md5(f"{idx_plain}/dictionary.parquet") == md5(
            f"{idx_html}/dictionary.parquet"
        )
        ep, eh = QueryEngine(idx_plain), QueryEngine(idx_html)
        for q in ["суд решение", "статья", "А40-123/2024"]:
            assert ep.search(q) == eh.search(q), q

        # round-trips (code-review r4): the manifest records html_content
        # and config_from_manifest reconstructs it (reindex + HTTP rebuild
        # paths), and a doc-grain upsert extracts before tokenizing
        import json

        from searchengine_ray.build import config_from_manifest
        from searchengine_ray.delta import upsert_docs

        with open(f"{idx_html}/manifest.json") as f:
            m = json.load(f)
        assert m["html_content"] is True
        assert "morphology" in m
        assert config_from_manifest(m).html_content is True
        assert config_from_manifest(json.load(open(f"{idx_plain}/manifest.json"))).html_content is False

        upsert_docs(
            idx_html,
            [{
                "conv_id": "conv-000000", "turn_idx": 0, "role": "user",
                "text": "<body><p>зюзюка арбуз</p><script>var tagword=1;</script></body>",
            }],
        )
        eh2 = QueryEngine(idx_html)
        assert eh2.search("зюзюка")["count"] == 1
        assert eh2.search("tagword")["count"] == 0  # script data never indexed
        # and the stored doc text is the EXTRACTED text (the snippet's only
        # markup is the builder's own <b> highlighting, never source tags)
        hit = eh2.search("зюзюка")["data"][0]
        assert "<p>" not in hit["snippet"] and "var" not in hit["snippet"]
        assert "<b>зюзюка</b>" in hit["snippet"]
