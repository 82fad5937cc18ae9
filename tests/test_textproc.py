"""Golden-vector tests for tokenizer / significance / lemma semantics
(SURVEY.md §5.1; reference services/LemmaFinder.java)."""

from searchengine_ray.textproc import (
    Analyzer,
    is_case_id,
    is_court_case,
    is_digit_sequence,
    is_identifier,
    is_significant,
    lemma_of,
    tokenize,
    tokenize_simple,
)


class TestTokenize:
    def test_lowercase_and_symbol_strip(self):
        # chars outside [а-яА-Яa-zA-Z0-9/\-\s] become spaces (LemmaFinder.java:39)
        assert tokenize("Привет, Мир! (тест)") == ["привет", "мир", "тест"]

    def test_hyphen_slash_preserved(self):
        assert tokenize("дело А33-5678/2023 закрыто") == ["дело", "а33-5678/2023", "закрыто"]

    def test_empty_and_whitespace(self):
        assert tokenize("") == []
        assert tokenize("   ") == []
        assert tokenize("?!.,") == []

    def test_yo_becomes_space(self):
        # Java range а-я excludes ё → ё is stripped to a space
        assert tokenize("ёж") == ["ж"]

    def test_mixed_scripts_survive_tokenizer(self):
        assert tokenize("Hello мир 42") == ["hello", "мир", "42"]

    def test_quotes_guillemets(self):
        assert tokenize('«суд» "дело"') == ["суд", "дело"]


class TestIdentifiers:
    def test_court_case(self):
        assert is_court_case("а33-5678/2023")
        assert is_court_case("2а-1234/2024")
        assert is_court_case("7-890/2024")
        assert not is_court_case("а33-5678/202")  # 3-digit year
        assert not is_court_case("а33/2023")  # no hyphen part
        assert not is_court_case("а-б-в/2023")  # 3 groups

    def test_case_id(self):
        assert is_case_id("66ov0001-01-2021-000076-43")
        assert is_case_id("a-b-c")
        assert not is_case_id("a-b")  # needs 2+ hyphen groups
        assert not is_case_id("аб-вг-де")  # Cyrillic not in the case-id class

    def test_digit_sequence(self):
        assert is_digit_sequence("42")
        assert is_digit_sequence("337")
        assert not is_digit_sequence("7")  # length >= 2 required
        assert not is_digit_sequence("4a")

    def test_identifier_union(self):
        assert is_identifier("337")
        assert is_identifier("а33-5678/2023")
        assert not is_identifier("суд")


class TestSignificance:
    def test_identifiers_always_pass(self):
        assert is_significant("337")
        assert is_significant("а33-5678/2023")
        assert is_significant("66ov0001-01-2021-000076-43")

    def test_latin_words_dropped(self):
        # RussianLuceneMorphology.checkString fails for Latin (LemmaFinder.java:128-130)
        assert not is_significant("hello")
        assert not is_significant("ray")

    def test_function_words_dropped(self):
        for w in ["и", "в", "на", "не", "же", "ли", "ох"]:
            assert not is_significant(w), w

    def test_content_words_pass(self):
        for w in ["суд", "дело", "закон", "решение"]:
            assert is_significant(w), w

    def test_single_digit_dropped(self):
        assert not is_significant("7")


class TestLemma:
    def test_identifiers_verbatim(self):
        assert lemma_of("а33-5678/2023") == "а33-5678/2023"
        assert lemma_of("337") == "337"

    def test_inflections_merge(self):
        base = lemma_of("суд")
        for form in ["суда", "суду", "судом", "суды", "судов"]:
            assert lemma_of(form) == base, form

    def test_exception_table(self):
        assert lemma_of("люди") == "человек"
        assert lemma_of("людей") == "человек"
        assert lemma_of("дети") == "ребенок"

    def test_short_words_not_overstripped(self):
        # stripping never leaves a stem shorter than 3 chars
        assert len(lemma_of("дом")) >= 3
        assert lemma_of("дом") == "дом"

    def test_deterministic(self):
        assert lemma_of("решение") == lemma_of("решение")


class TestMorphDict:
    """Dictionary-grade resolution (VERDICT r3 item 5): golden vectors that
    DISTINGUISH first-normal-form lookup (``LemmaFinder.java:102-111``
    semantics via morphdict.py) from the old suffix-strip — each case below
    would produce a non-word stem or split the paradigm under stripping."""

    def test_normal_forms_are_real_words(self):
        # suffix-strip gave 'решени' / 'статей'-vs-'стать' style stems
        assert lemma_of("решение") == "решение"
        assert lemma_of("решения") == "решение"
        assert lemma_of("решению") == "решение"
        assert lemma_of("решением") == "решение"
        assert lemma_of("решений") == "решение"

    def test_paradigm_unification_across_cases(self):
        # статья/статье/статей strip to different stems; dictionary unifies
        for form in ["статья", "статьи", "статье", "статью", "статьей", "статей"]:
            assert lemma_of(form) == "статья", form
        for form in ["судья", "судьи", "судье", "судей", "судьями"]:
            assert lemma_of(form) == "судья", form

    def test_zero_ending_genitive_plural(self):
        # bare-stem forms strip to themselves under suffix rules but are
        # inflections of the -а/-о lemma
        assert lemma_of("слов") == "слово"
        assert lemma_of("жалоб") == "жалоба"
        assert lemma_of("ошибок") == "ошибка"  # fleeting vowel
        assert lemma_of("статей") == "статья"

    def test_suppletive_and_mutating_forms(self):
        assert lemma_of("лет") == "год"
        assert lemma_of("времени") == "время"
        assert lemma_of("истца") == "истец"
        assert lemma_of("конца") == "конец"

    def test_verb_conjugation_to_infinitive(self):
        for form in ["работаю", "работает", "работали", "работая"]:
            assert lemma_of(form) == "работать", form
        for form in ["говорит", "говорят", "говорила"]:
            assert lemma_of(form) == "говорить", form

    def test_oov_falls_back_to_suffix_strip(self):
        # not in the lexicon → the deterministic fallback keeps it searchable
        assert lemma_of("абракадабрион") == "абракадабрион"
        assert lemma_of("квазистемы") == lemma_of("квазистема")

    def test_ambiguous_form_first_normal_form(self):
        # a form claimed by several lemmas resolves to the lexicographically
        # smallest (the reference's normalForms.get(0) analogue)
        from searchengine_ray.morphdict import build_form_table

        t = build_form_table()
        assert t["долгом"] == "долг"  # noun 'долг' < adjective 'долгий'

    def test_table_idempotent_and_coherent(self):
        from searchengine_ray.corpus import _CONTENT
        from searchengine_ray.morphdict import build_form_table

        t = build_form_table()
        assert len(t) > 2000
        assert all(t[l] == l for l in set(t.values()))  # lemma → itself
        # every corpus surface-form group maps to exactly ONE lemma and
        # distinct groups stay distinct (index/query consistency contract)
        group_lemma = {}
        for stem, forms in _CONTENT.items():
            ls = {lemma_of(w) for w in forms}
            assert len(ls) == 1, (stem, {w: lemma_of(w) for w in forms})
            group_lemma[stem] = ls.pop()
        vals = list(group_lemma.values())
        assert len(vals) == len(set(vals)), group_lemma

    def test_pluggable_table_swap(self):
        from searchengine_ray import textproc

        try:
            textproc.use_lemma_table({"зюзюка": "зюзюк"})
            assert lemma_of("зюзюка") == "зюзюк"
            assert lemma_of("решение") == "решен"  # custom table: fallback strips "ие"
        finally:
            textproc.use_lemma_table(None)
        assert lemma_of("решение") == "решение"


class TestAnalyzer:
    def test_lemma_counts(self):
        a = Analyzer("ru")
        counts = a.lemma_counts("Суд рассмотрел дело. Суд вынес решение по делу!")
        base = lemma_of("суд")
        assert counts[base] == 2

    def test_query_lemmas_dedup(self):
        a = Analyzer("ru")
        assert len(a.query_lemmas("суд суд суда")) == 1

    def test_empty_text(self):
        a = Analyzer("ru")
        assert a.lemma_counts("") == {}
        assert a.lemma_counts("   ") == {}

    def test_simple_mode(self):
        a = Analyzer("simple")
        assert a.tokens("Hello, World-42!") == ["hello", "world", "42"]
        assert not a.significant("a")  # len < 2
        assert not a.significant("the")  # stopword
        assert a.significant("hello")
        assert a.lemma("running") == "running"  # identity

    def test_simple_tokenize_matches_sql_regex(self):
        # must equal DuckDB regexp_extract_all(lower(text), '[a-z0-9]+')
        assert tokenize_simple("Ray-Data 2.0; naïve") == ["ray", "data", "2", "0", "na", "ve"]


class TestArrowTokenizerParity:
    CASES = [
        "Суды и Дела: по-закону!  test123",
        "ёлка объём всё",  # ё handling
        "А33-5678/2023 и 66OV0001-01-2021-000076-43",
        "hello,world«quoted»(paren)",
        "   ",
        "",
        "a b c\td",  # unicode spaces
        "цифры 42 и 7",
        "дефис-слово и слэш/путь",
    ]

    def test_ru_matches_python_tokenizer(self):
        from searchengine_ray.textproc import tokenize, tokens_flat_arrow

        flat, parents = tokens_flat_arrow(self.CASES, mode="ru")
        got = [[] for _ in self.CASES]
        for tok, p in zip(flat.to_pylist(), parents.tolist()):
            got[p].append(tok)
        for case, toks in zip(self.CASES, got):
            assert toks == tokenize(case), case

    def test_simple_matches_python_tokenizer(self):
        from searchengine_ray.textproc import tokenize_simple, tokens_flat_arrow

        flat, parents = tokens_flat_arrow(self.CASES, mode="simple")
        got = [[] for _ in self.CASES]
        for tok, p in zip(flat.to_pylist(), parents.tolist()):
            got[p].append(tok)
        for case, toks in zip(self.CASES, got):
            assert toks == tokenize_simple(case), case

    def test_corpus_parity(self):
        from searchengine_ray.corpus import generate_transcripts
        from searchengine_ray.textproc import tokenize, tokens_flat_arrow

        texts = generate_transcripts(n_convs=60)["text"].to_pylist()
        flat, parents = tokens_flat_arrow(texts, mode="ru")
        got = [[] for _ in texts]
        for tok, p in zip(flat.to_pylist(), parents.tolist()):
            got[p].append(tok)
        for t, toks in zip(texts, got):
            assert toks == tokenize(t)

    def test_null_text_yields_no_tokens(self):
        import pyarrow as pa

        from searchengine_ray.textproc import tokens_flat_arrow

        flat, parents = tokens_flat_arrow(pa.array(["суд", None, "дело"]), mode="ru")
        assert flat.to_pylist() == ["суд", "дело"]
        assert parents.tolist() == [0, 2]


class TestPropertyBased:
    """Randomized property tests (hypothesis) — SURVEY.md §5.5."""

    def test_arrow_tokenizer_parity_random(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from searchengine_ray.textproc import tokenize, tokens_flat_arrow

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.text(max_size=60), min_size=1, max_size=8))
        def prop(texts):
            flat, parents = tokens_flat_arrow(texts, mode="ru")
            got = [[] for _ in texts]
            for tok, p in zip(flat.to_pylist(), parents.tolist()):
                got[p].append(tok)
            for t, toks in zip(texts, got):
                assert toks == tokenize(t)

        prop()

    def test_char_shingles_exact_random(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from searchengine_ray.pipelines.dedup import char_shingle_array
        from searchengine_ray.pipelines.textstats import normalize_for_fp

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=120))
        def prop(text):
            s = normalize_for_fp(text)
            naive = {s[i : i + 3] for i in range(len(s) - 2)} if len(s) >= 3 else (
                {s} if s else set()
            )
            # exact packing → shingle count must equal distinct 3-gram count
            assert char_shingle_array(text).size == len(naive)

        prop()

    def test_vb_roundtrip_random(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from searchengine_ray.codec import vb_decode, vb_encode

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), max_size=200))
        def prop(vals):
            a = np.asarray(vals, dtype=np.uint64)
            assert np.array_equal(vb_decode(vb_encode(a)), a)

        prop()
