"""Search response shape shared by engine and oracle.

Mirrors the reference DTOs ``dto/search/SearchResponse.java:8-13``
(``result, error, count, data``) and ``dto/search/SearchData.java:6-13``
(``site, siteName, uri, title, snippet, relevance``) — minus the site fields
(the transcript corpus is one logical site; SURVEY.md §1.3).
"""

from __future__ import annotations

ERROR_EMPTY_QUERY = "empty search query"  # reference: "Задан пустой поисковый запрос"
ERROR_NO_SIGNIFICANT = "query contains no significant words"
ERROR_NOTHING_FOUND = "Nothing found"


def error_response(error: str) -> dict:
    return {"result": False, "error": error, "count": 0, "data": []}


def ok_response(count: int, data: list[dict]) -> dict:
    return {"result": True, "error": None, "count": count, "data": data}


def hit(conv_id: str, turn_idx: int, score: float, snippet: str, role: str = "") -> dict:
    """One result row. ``uri`` is the reference's ``page.path`` analogue."""
    return {
        "uri": f"{conv_id}:{turn_idx}",
        "conv_id": conv_id,
        "turn_idx": int(turn_idx),
        "title": role,
        "snippet": snippet,
        "relevance": float(score),
    }
