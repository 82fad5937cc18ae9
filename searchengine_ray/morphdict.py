"""Dictionary-grade Russian morphology: a deterministic inflection table.

The reference resolves lemmas through ``RussianLuceneMorphology`` first-
normal-form lookup (``services/LemmaFinder.java:102-111``): every inflected
surface form of a dictionary word maps to its NORMAL FORM (noun nominative
singular / adjective masc nom sg / verb infinitive). The rebuild's round-1..3
stand-in — longest-suffix stripping — conflates or misses inflections a real
dictionary resolves (e.g. ``решение/решения/решению`` strip to the non-word
stem ``решени``; ``статья`` and ``статье`` strip to different stems).

This module closes that gap with a PARADIGM-GENERATED inflection table built
entirely from public knowledge: standard Russian declension/conjugation
paradigms (school-grammar material) applied to an in-repo lexicon of common
lemmas. No external data, no network, deterministic output (the table is a
pure function of the code below).

Resolution semantics mirror the reference:

- form found in the table → its normal form (``normalForms.get(0)`` — when
  one surface form belongs to several lexicon lemmas, the lexicographically
  SMALLEST lemma wins, a deterministic "first normal form").
- form not in the table → the caller's fallback (``textproc.lemma_of`` keeps
  the suffix-strip normalizer for out-of-vocabulary words, mirroring the
  reference's behavior of keeping a word searchable even when morphology
  can't resolve it).

The table builds lazily ONCE PER PROCESS (a few thousand entries, ~ms) and
is shared by every Analyzer in the worker — the ST1 "morphology state once
per worker" shape. ``textproc.use_lemma_table`` swaps in an external table
(e.g. a full OpenCorpora export) without touching engine code.

NOTE on ``ё``: the reference tokenizer's char class excludes ``ё`` (it
becomes a token boundary, ``LemmaFinder.java:143-148``), so no token ever
contains it; paradigms below use the ``е`` spellings only.
"""

from __future__ import annotations

import threading

# ---------------------------------------------------------------------------
# Paradigms: ending sets appended to the entry's stem. The lemma itself is
# always regenerated from the same paradigm (first ending), so the table is
# idempotent: table[lemma] == lemma for every lexicon lemma.
# ---------------------------------------------------------------------------

_VELARS = ("г", "к", "х")
_HUSHERS = ("ж", "ч", "ш", "щ")


def _noun_m(stem: str) -> tuple[str, list[str]]:
    """Masculine hard-consonant noun (суд → суда, суду, судом, суды, ...)."""
    i_pl = "и" if stem.endswith(_VELARS + _HUSHERS) else "ы"
    gen_pl = "ей" if stem.endswith(_HUSHERS) else "ов"
    return stem, [
        "", "а", "у", "ом", "е",
        i_pl, gen_pl, "ам", "ами", "ах",
    ]


def _noun_m_soft(stem: str) -> tuple[str, list[str]]:
    """Masculine soft-sign noun (словарь → словаря, словарю, ...)."""
    return stem, ["ь", "я", "ю", "ем", "е", "и", "ей", "ям", "ями", "ях"]


def _noun_f_a(stem: str) -> tuple[str, list[str]]:
    """Feminine -а noun (жалоба → жалобы, жалобе, жалобу, жалобой, ...).
    The zero-ending genitive plural is the bare stem; stems that take a
    fleeting vowel there (ошибка → ошибок) add it via the entry's extra
    forms."""
    i_end = "и" if stem.endswith(_VELARS + _HUSHERS) else "ы"
    return stem, ["а", i_end, "е", "у", "ой", "", "ам", "ами", "ах"]


def _noun_f_ya(stem: str) -> tuple[str, list[str]]:
    """Feminine -я noun (неделя → недели, неделе, неделю, неделей, ...)."""
    return stem, ["я", "и", "е", "ю", "ей", "ь", "ям", "ями", "ях"]


def _noun_f_iya(stem: str) -> tuple[str, list[str]]:
    """Feminine -ия noun (компания → компании, компанию, компанией, ...)."""
    return stem, ["я", "и", "ю", "ей", "й", "ям", "ями", "ях"]


def _noun_f_soft(stem: str) -> tuple[str, list[str]]:
    """Feminine soft-sign noun (модель → модели, моделью, моделей, ...)."""
    return stem, ["ь", "и", "ью", "ей", "ям", "ями", "ях"]


def _noun_n_o(stem: str) -> tuple[str, list[str]]:
    """Neuter -о noun (слово → слова, слову, словом, словами, ...). Bare
    stem = genitive plural (слов); fleeting-vowel cases add extras."""
    return stem, ["о", "а", "у", "ом", "е", "", "ам", "ами", "ах"]


def _noun_n_ie(stem: str) -> tuple[str, list[str]]:
    """Neuter -ие/-ние noun (решение → решения, решению, решением,
    решении, решений, решениям, ...)."""
    return stem, ["е", "я", "ю", "ем", "и", "й", "ям", "ями", "ях"]


def _adj(stem: str) -> tuple[str, list[str]]:
    """Hard adjective (новый → нового, новому, новая, новую, новые, ...)."""
    return stem, [
        "ый", "ого", "ому", "ым", "ом",
        "ая", "ой", "ую", "ое",
        "ые", "ых", "ыми",
    ]


def _adj_soft(stem: str) -> tuple[str, list[str]]:
    """Soft adjective (последний → последнего, последняя, последние, ...)."""
    return stem, [
        "ий", "его", "ему", "им", "ем",
        "яя", "ей", "юю", "ее",
        "ие", "их", "ими",
    ]


def _adj_mixed(stem: str) -> tuple[str, list[str]]:
    """Velar/husher-stem adjective (налоговый-style hard forms but -ий/-ие
    spellings after the stem consonant: хороший, налоговый → use for stems
    ending in г/к/х/ж/ч/ш/щ: маленький → маленького, маленькие, ...)."""
    return stem, [
        "ий", "ого", "ому", "им", "ом",
        "ая", "ой", "ую", "ое",
        "ие", "их", "ими",
    ]


def _adj_oy(stem: str) -> tuple[str, list[str]]:
    """End-stressed adjective (большой → большого, большая, большие, ...)."""
    soft = stem.endswith(_HUSHERS + _VELARS)
    return stem, [
        "ой", "ого", "ому", "им" if soft else "ым", "ом",
        "ая", "ую", "ое",
        "ие" if soft else "ые", "их" if soft else "ых",
        "ими" if soft else "ыми",
    ]


def _verb_1(stem: str) -> tuple[str, list[str]]:
    """First-conjugation -ать verb (работать → работаю, работает,
    работал, работали, работать, ...)."""
    return stem, [
        "ать", "аю", "аешь", "ает", "аем", "аете", "ают",
        "ал", "ала", "ало", "али", "ая",
    ]


def _verb_1_ya(stem: str) -> tuple[str, list[str]]:
    """First-conjugation -ять verb (заявлять → заявляю, заявляет, ...)."""
    return stem, [
        "ять", "яю", "яешь", "яет", "яем", "яете", "яют",
        "ял", "яла", "яло", "яли", "яя",
    ]


def _verb_2(stem: str) -> tuple[str, list[str]]:
    """Second-conjugation -ить verb, non-mutating stem (говорить →
    говорю, говорит, говорил, ...). Mutating first-person stems (платить →
    плачу) are NOT generated — the 1sg falls back to suffix-strip rather
    than fabricating a wrong form."""
    endings = ["ить", "ишь", "ит", "им", "ите", "ил", "ила", "ило", "или"]
    if stem.endswith(_HUSHERS):
        endings += ["у", "ат"]  # решу/решат-type spellings
    else:
        endings += ["ю", "ят"]
    return stem, endings


def _verb_2_e(stem: str) -> tuple[str, list[str]]:
    """Second-conjugation -еть verb (смотреть → смотрит, смотрел, ...);
    1sg omitted (often mutating)."""
    return stem, ["еть", "ишь", "ит", "им", "ите", "ят", "ел", "ела", "ело", "ели"]


_PARADIGMS = {
    "m": _noun_m,
    "m-soft": _noun_m_soft,
    "f-a": _noun_f_a,
    "f-ya": _noun_f_ya,
    "f-iya": _noun_f_iya,
    "f-soft": _noun_f_soft,
    "n-o": _noun_n_o,
    "n-ie": _noun_n_ie,
    "adj": _adj,
    "adj-soft": _adj_soft,
    "adj-mixed": _adj_mixed,
    "adj-oy": _adj_oy,
    "v1": _verb_1,
    "v1-ya": _verb_1_ya,
    "v2": _verb_2,
    "v2-e": _verb_2_e,
}

# ---------------------------------------------------------------------------
# Lexicon: (stem, paradigm[, extra forms...]). The lemma is the paradigm's
# first generated form. Extra forms cover fleeting vowels / suppletion the
# paradigm can't derive (ошибка → ошибок). Entirely common public
# vocabulary, weighted toward the legal/administrative register the
# reference engine indexes (court-site corpus) plus the synthetic corpus
# vocabulary (corpus.py _CONTENT).
# ---------------------------------------------------------------------------

_LEXICON: list[tuple] = [
    # --- corpus.py content words (the bench/test vocabulary) ---
    ("суд", "m"),
    ("дел", "n-o"),                      # дело
    ("закон", "m"),
    ("решени", "n-ie"),                  # решение
    ("договор", "m"),
    ("жалоб", "f-a"),                    # жалоба
    ("документ", "m"),
    ("заявлени", "n-ie"),                # заявление
    ("ответчик", "m"),
    ("срок", "m"),
    ("штраф", "m"),
    ("налог", "m"),
    ("компани", "f-iya"),                # компания
    ("работ", "f-a"),                    # работа
    ("вопрос", "m"),
    ("ошибк", "f-a", "ошибок"),          # ошибка, gen pl ошибок
    ("модел", "f-soft"),                 # модель
    ("агент", "m"),
    ("запрос", "m"),
    ("поиск", "m"),
    ("индекс", "m"),
    ("слов", "n-o"),                     # слово
    ("текст", "m"),
    # --- legal / administrative nouns ---
    ("прав", "n-o"),                     # право
    ("стать", "f-ya", "статей"),         # статья, gen pl статей
    ("судь", "f-ya", "судей"),           # судья, gen pl судей
    ("иск", "m"),
    ("акт", "m"),
    ("пункт", "m"),
    ("протокол", "m"),
    ("приказ", "m"),
    ("кодекс", "m"),
    ("процесс", "m"),
    ("x", "порядок", "порядка", "порядку", "порядком", "порядке", "порядки", "порядков"),
    ("орган", "m"),
    ("регион", "m"),
    ("район", "m"),
    ("город", "m"),
    ("адрес", "m"),
    ("номер", "m"),
    ("член", "m"),
    ("состав", "m"),
    ("результат", "m"),
    ("факт", "m"),
    ("отчет", "m"),
    ("доход", "m"),
    ("расход", "m"),
    ("платеж", "m"),
    ("бюджет", "m"),
    ("банк", "m"),
    ("счет", "m"),
    ("долг", "m"),
    ("кредит", "m"),
    ("процент", "m"),
    ("рубл", "m-soft"),                  # рубль
    ("сут", "f-soft"),
    ("власт", "f-soft"),
    ("област", "f-soft"),
    ("част", "f-soft"),
    ("ответственност", "f-soft"),
    ("деятельност", "f-soft"),
    ("обязанност", "f-soft"),
    ("возможност", "f-soft"),
    ("информаци", "f-iya"),
    ("организаци", "f-iya"),
    ("федераци", "f-iya"),
    ("инстанци", "f-iya"),
    ("комисси", "f-iya"),
    ("претензи", "f-iya"),
    ("экспертиз", "f-a"),
    ("инспекци", "f-iya"),
    ("процедур", "f-a"),
    ("систем", "f-a"),
    ("проблем", "f-a"),
    ("причин", "f-a"),
    ("основ", "f-a"),
    ("норм", "f-a"),
    ("сумм", "f-a"),
    ("цен", "f-a"),
    ("оценк", "f-a", "оценок"),
    ("проверк", "f-a", "проверок"),
    ("справк", "f-a", "справок"),
    ("выплат", "f-a"),
    ("защит", "f-a"),
    ("служб", "f-a"),
    ("стран", "f-a"),
    ("сторон", "f-a"),
    ("форм", "f-a"),
    ("мер", "f-a"),
    ("дат", "f-a"),
    ("недел", "f-ya"),                   # неделя
    ("заседани", "n-ie"),
    ("постановлени", "n-ie"),
    ("определени", "n-ie"),
    ("требовани", "n-ie"),
    ("нарушени", "n-ie"),
    ("обязательств", "n-o"),
    ("производств", "n-o"),
    ("рассмотрени", "n-ie"),
    ("взыскани", "n-ie"),
    ("наказани", "n-ie"),
    ("обращени", "n-ie"),
    ("соглашени", "n-ie"),
    ("положени", "n-ie"),
    ("основани", "n-ie"),
    ("значени", "n-ie"),
    ("изменени", "n-ie"),
    ("услови", "n-ie"),                 # условие
    ("мнени", "n-ie"),
    ("имуществ", "n-o"),
    ("средств", "n-o"),
    ("государств", "n-o"),
    ("министерств", "n-o"),
    ("ведомств", "n-o"),
    ("лиц", "n-o"),                      # лицо
    ("мест", "n-o"),                     # место
    ("x", "время", "времени", "временем", "времена", "времен", "временам", "временами"),
    ("x", "имя", "имени", "именем", "имена", "имен", "именам", "именами"),
    # --- general nouns ---
    ("год", "m", "лет"),                 # год, suppletive gen pl лет
    ("x", "день", "дня", "дню", "днем", "дне", "дни", "дней", "дням", "днями", "днях"),
    ("человек", "m"),
    ("народ", "m"),
    ("мир", "m"),
    ("дом", "m"),
    ("час", "m"),
    ("месяц", "m"),
    ("x", "случай", "случая", "случаю", "случаем", "случае", "случаи", "случаев", "случаям", "случаях"),
    ("x", "уровень", "уровня", "уровню", "уровнем", "уровне", "уровни", "уровней", "уровням", "уровнях"),
    ("x", "путь", "пути", "путем", "путям", "путями", "путях", "путей"),
    ("x", "конец", "конца", "концу", "концом", "конце", "концы", "концов", "концам", "концах"),
    ("x", "отец", "отца", "отцу", "отцом", "отце", "отцы", "отцов", "отцам", "отцах"),
    ("x", "истец", "истца", "истцу", "истцом", "истце", "истцы", "истцов", "истцам", "истцах"),
    ("груз", "m"),
    ("товар", "m"),
    ("x", "рынок", "рынка", "рынку", "рынком", "рынке", "рынки", "рынков", "рынкам", "рынках"),
    ("проект", "m"),
    ("план", "m"),
    ("этап", "m"),
    ("метод", "m"),
    ("способ", "m"),
    ("вид", "m"),
    ("тип", "m"),
    ("ряд", "m"),
    ("рук", "f-a"),                      # рука
    ("ног", "f-a"),                      # нога
    ("голов", "f-a"),                    # голова
    ("групп", "f-a"),
    ("программ", "f-a"),
    ("задач", "f-a", "задачей"),         # задача (husher instr -ей)
    ("встреч", "f-a", "встречей"),
    ("жизн", "f-soft"),
    ("связ", "f-soft"),
    ("цел", "f-soft"),
    ("рол", "f-soft"),
    ("реч", "f-soft"),
    ("вещ", "f-soft"),
    ("ноч", "f-soft"),
    ("помощ", "f-soft"),
    ("письм", "n-o"),                    # письмо
    ("числ", "n-o"),                     # число
    ("окн", "n-o"),                      # окно
    ("развити", "n-ie"),
    ("управлени", "n-ie"),
    ("образовани", "n-ie"),
    ("использовани", "n-ie"),
    ("внимани", "n-ie"),
    # --- adjectives ---
    ("нов", "adj"),
    ("стар", "adj"),
    ("перв", "adj"),
    ("втор", "adj-oy"),
    ("главн", "adj"),
    ("важн", "adj"),
    ("полн", "adj"),
    ("разн", "adj"),
    ("известн", "adj"),
    ("основн", "adj-oy"),
    ("государственн", "adj"),
    ("федеральн", "adj"),
    ("судебн", "adj"),
    ("налогов", "adj"),
    ("правов", "adj-oy"),
    ("законн", "adj"),
    ("административн", "adj"),
    ("арбитражн", "adj"),
    ("гражданск", "adj-mixed"),
    ("уголовн", "adj"),
    ("исполнительн", "adj"),
    ("официальн", "adj"),
    ("социальн", "adj"),
    ("финансов", "adj"),
    ("экономическ", "adj-mixed"),
    ("политическ", "adj-mixed"),
    ("техническ", "adj-mixed"),
    ("юридическ", "adj-mixed"),
    ("x", "общественный", "общественного", "общественному", "общественным", "общественном", "общественная", "общественной", "общественную", "общественное", "общественные", "общественных", "общественными"),
    ("последн", "adj-soft"),
    ("больш", "adj-oy"),
    ("маленьк", "adj-mixed"),
    ("хорош", "adj-mixed"),
    ("высок", "adj-mixed"),
    ("широк", "adj-mixed"),
    ("долг", "adj-mixed"),
    ("русск", "adj-mixed"),
    # --- verbs ---
    ("работ", "v1"),
    ("дел", "v1"),                       # делать
    ("зн", "v1"),                        # знать
    ("дум", "v1"),                       # думать
    ("счит", "v1"),                      # считать
    ("получ", "v1"),                     # получать
    ("отвеч", "v1"),                     # отвечать
    ("реш", "v1"),                       # решать
    ("приним", "v1"),                    # принимать
    ("наруш", "v1"),                     # нарушать
    ("рассматрив", "v1"),                # рассматривать
    ("подтвержд", "v1"),                 # подтверждать
    ("указыв", "v1"),                    # указывать
    ("оказыв", "v1"),                    # оказывать
    ("признав", "v1"),                   # признавать
    ("соглаш", "v1"),                    # соглашаться (base forms only)
    ("заявл", "v1-ya"),                  # заявлять
    ("выполн", "v1-ya"),                 # выполнять
    ("представл", "v1-ya"),              # представлять
    ("направл", "v1-ya"),                # направлять
    ("примен", "v1-ya"),                 # применять
    ("говор", "v2"),                     # говорить
    ("получ", "v2"),                     # получить (shares stem with v1 получать)
    ("реш", "v2"),                       # решить
    ("руковод", "v2"),                   # руководить
    ("провод", "v2"),                    # проводить
    ("наход", "v2"),                     # находить(ся), base forms
    ("x", "состоять", "состоит", "состоят", "состоял", "состояла", "состояло", "состояли"),
    ("смотр", "v2-e"),                   # смотреть
    ("x", "следовать", "следует", "следуют", "следовал", "следовала", "следовало", "следовали"),
]


# ---------------------------------------------------------------------------
# Table construction (lazy, once per process)
# ---------------------------------------------------------------------------

_TABLE: dict[str, str] | None = None
_LOCK = threading.Lock()


def build_form_table() -> dict[str, str]:
    """form → normal form over the whole lexicon. Deterministic: paradigm
    expansion order is fixed and a form claimed by several lemmas resolves
    to the lexicographically smallest lemma (the reference's
    ``normalForms.get(0)`` analogue). The lemma (first generated form)
    always maps to itself, so lookup is idempotent."""
    def expand(entry: tuple) -> tuple[str, list[str]]:
        if entry[0] == "x":  # explicit: ("x", lemma, *forms)
            lemma = entry[1]
            return lemma, [lemma, *entry[2:]]
        stem, paradigm, extra = entry[0], entry[1], entry[2:]
        base_stem, endings = _PARADIGMS[paradigm](stem)
        lemma = base_stem + endings[0]
        return lemma, [base_stem + e for e in endings] + list(extra)

    table: dict[str, str] = {}
    for entry in _LEXICON:
        lemma, forms = expand(entry)
        for form in forms:
            cur = table.get(form)
            if cur is None or lemma < cur:
                table[form] = lemma
    # lemmas always win their own entry (a form that IS another lexicon
    # lemma must not get re-mapped: e.g. "дела" belongs to "дело")
    for entry in _LEXICON:
        lemma, _forms = expand(entry)
        table[lemma] = lemma
    return table


def form_table() -> dict[str, str]:
    global _TABLE
    if _TABLE is None:
        with _LOCK:
            if _TABLE is None:
                _TABLE = build_form_table()
    return _TABLE
