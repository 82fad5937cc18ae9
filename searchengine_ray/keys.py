"""Document identity: ``(conv_id, turn_idx)`` ↔ int64 docid.

Reference analogue: ``page.id`` surrogate int PK (``model/Page.java:16-33``)
assigned by the database sequence — nondeterministic across runs. The rebuild
instead derives an **order-preserving** 64-bit docid::

    docid = conv_rank << TURN_BITS | turn_idx

where ``conv_rank`` is the dense rank of ``conv_id`` in ascending string
order (from the conversation dictionary built as the first pass of the index
build). Because ``conv_rank`` sorts like ``conv_id`` and the low bits sort by
``turn_idx``, **ascending docid order == ascending (conv_id, turn_idx)
order** — so posting lists are delta-encodable over docids AND the canonical
tie-break ``(score desc, conv_id asc, turn_idx asc)`` reduces to
``(score desc, docid asc)`` with no key hydration during top-k.
"""

from __future__ import annotations

import numpy as np

TURN_BITS = 20  # up to ~1M turns per conversation; 2^43 conversations
TURN_MASK = (1 << TURN_BITS) - 1


def make_docids(conv_ranks: np.ndarray, turn_idx: np.ndarray) -> np.ndarray:
    return (conv_ranks.astype(np.int64) << TURN_BITS) | turn_idx.astype(np.int64)


def split_docids(docids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    d = docids.astype(np.int64)
    return d >> TURN_BITS, d & TURN_MASK


def doc_key(conv_id: str, turn_idx: int) -> str:
    """Serialized scalar doc key (reference ``page.path`` analogue)."""
    return f"{conv_id}:{turn_idx}"
