"""Snippet builder — exact port of the reference algorithm's semantics.

Reference: ``SearchServiceImpl.buildSnippet`` (SearchServiceImpl.java:218-267):

1. lemmatize every token of the doc in one pass (``safeGetLemma`` — empty
   string for insignificant/erroring words, :276-284),
2. collect positions whose lemma is in the query-lemma set,
3. build up to 3 windows of ±WINDOW(=5) words around hits **in hit order**;
   a window starting inside or adjacent to the previous one EXTENDS the
   previous window instead of opening a new one (:242-248); stop at 3 windows,
4. wrap hit words in ``<b>``, join fragments with ``" ... "`` and wrap the
   whole snippet in leading/trailing ``"..."``.

Shared verbatim by the query engine and the oracle.
"""

from __future__ import annotations

from searchengine_ray.textproc import Analyzer


def build_snippet(
    words: list[str],
    query_lemmas: set[str],
    analyzer: Analyzer,
    window: int = 5,
    max_windows: int = 3,
) -> str:
    if not words:
        return ""
    lemmatized = [analyzer.safe_lemma(w) if w else "" for w in words]
    hits = [i for i, l in enumerate(lemmatized) if l and l in query_lemmas]
    if not hits:
        return ""

    windows: list[list[int]] = []
    for hit in hits:
        lo = max(0, hit - window)
        hi = min(len(words), hit + window + 1)
        if windows and lo <= windows[-1][1]:
            windows[-1][1] = hi  # extend previous window (merge rule)
        else:
            windows.append([lo, hi])
        if len(windows) == max_windows:
            break

    fragments = []
    for lo, hi in windows:
        parts = []
        for i in range(lo, hi):
            if lemmatized[i] and lemmatized[i] in query_lemmas:
                parts.append(f"<b>{words[i]}</b>")
            else:
                parts.append(words[i])
        fragments.append(" ".join(parts))
    return "..." + " ... ".join(fragments) + "..."
