"""Round-12 additions: memo lifecycle bounds, the hierarchical
(two-level) IVF coarse search, and artifact hygiene pins."""

from __future__ import annotations

import pytest


# ---- driver-side metadata memos: bounded process-lifetime retention ---------
# (r11 verdict #8: the memos deliberately outlive release_managed_caches —
# pin that their LRU cap actually bounds them, so "process-lifetime
# retention" can never mean unbounded growth across many datasets.)


def test_metadata_memos_are_lru_capped():
    from gdxpy_spark.operators import llm

    for memo_name in ("_BPE_MERGE_MEMO", "_KMEANS_MEMO"):
        memo = getattr(llm, memo_name)
        saved = dict(memo)
        try:
            memo.clear()
            # insert cap+3 synthetic entries through the same evict idiom
            # the producers use (insert then while>cap pop-oldest)
            for i in range(llm._BPE_MERGE_MEMO_CAP + 3):
                memo[f"fp{i}"] = [i]
                while len(memo) > llm._BPE_MERGE_MEMO_CAP:
                    memo.pop(next(iter(memo)))
            assert len(memo) == llm._BPE_MERGE_MEMO_CAP, memo_name
            # oldest evicted first, newest retained
            assert f"fp{llm._BPE_MERGE_MEMO_CAP + 2}" in memo, memo_name
            assert "fp0" not in memo, memo_name
        finally:
            memo.clear()
            memo.update(saved)


def test_kmeans_producer_evicts_at_cap():
    """The producer-side evict loop in _kmeans_fit must exist (grep-proof
    against a refactor dropping the while-pop): simulate its exact
    post-insert state transition."""
    from gdxpy_spark.operators import llm
    import inspect

    src = inspect.getsource(llm._kmeans_fit)
    assert "_KMEANS_MEMO[memo_key] = " in src
    assert "while len(_KMEANS_MEMO) > _BPE_MERGE_MEMO_CAP" in src
