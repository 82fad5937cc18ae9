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


def rounded_topk_frame(r: dict, qid, k: int, offset: int = 0):
    """The CANONICAL oracle-parity ranking frame from a ``search_ids``
    result: scores rounded half-away at 4 dp, ordered (score_r desc,
    conv_id, turn_idx), sliced [offset, offset+k). One implementation shared
    by the in-process path (transcripts._search_frame) and the actor batch
    path (QueryActor rounded_topk) so the tie-break rule can never drift
    between them. Columns: (query_id, rank, conv_id, turn_idx, score_r,
    count); empty-but-typed frame when the query matched nothing."""
    import numpy as np
    import pandas as pd

    if r["count"] == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="object"),
                "rank": pd.Series(dtype="int64"),
                "conv_id": pd.Series(dtype="object"),
                "turn_idx": pd.Series(dtype="int32"),
                "score_r": pd.Series(dtype="float64"),
                "count": pd.Series(dtype="int64"),
            }
        )
    s = np.abs(np.asarray(r["score"], dtype=np.float64))
    score_r = np.floor(s * 1e4 + 0.5) / 1e4 * np.sign(r["score"])
    df = pd.DataFrame(
        {
            "conv_id": r["conv_id"],
            "turn_idx": np.asarray(r["turn_idx"]).astype("int32"),
            "score_r": score_r,
        }
    )
    df = df.sort_values(
        ["score_r", "conv_id", "turn_idx"], ascending=[False, True, True], kind="stable"
    )
    df = df.iloc[offset : offset + k].reset_index(drop=True)
    df.insert(0, "rank", (df.index + offset).astype("int64"))
    df.insert(0, "query_id", qid)
    df["count"] = np.int64(r["count"])
    return df
