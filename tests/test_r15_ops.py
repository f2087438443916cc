"""r15 optimization-round pins: adaptive mm_e2e_dedup tier overlap and
the fan-out long-tail sites (see OPTIMIZATION_r15.md)."""

from __future__ import annotations

from gdxpy_spark import registry
from tests.conftest import SF_DIR

registry.load_all()
ALL = registry.all_queries()


def test_mm_e2e_adaptive_overlap_sequential_path_matches(spark, monkeypatch):
    """r15 (VERDICT #3): mm_e2e_dedup degrades to a SEQUENTIAL tier
    schedule when the session offers fewer than ~2 task slots per tier
    (defaultParallelism < 6) — on the local[4] test session the
    default path IS the sequential one. Pin that the sequential
    schedule and a forced-concurrent schedule produce the identical
    funnel (schedule-independence in the other direction from the r14
    pin, which forces 3 workers)."""
    fn = ALL["mm_e2e_dedup"].fn

    monkeypatch.delenv("GDXPS_E2E_WORKERS", raising=False)
    seq = {r["stage"]: r["n_docs"] for r in fn(spark, SF_DIR).collect()}

    monkeypatch.setenv("GDXPS_E2E_WORKERS", "3")
    thr = {r["stage"]: r["n_docs"] for r in fn(spark, SF_DIR).collect()}

    assert seq == thr
    assert set(seq) == {"raw", "exact", "perceptual", "semantic"}


def test_mm_e2e_workers_env_override_validates(spark, monkeypatch):
    """GDXPS_E2E_WORKERS=1 must run the exact same funnel on one
    worker (the loaded-box posture an operator could pin manually)."""
    fn = ALL["mm_e2e_dedup"].fn
    monkeypatch.setenv("GDXPS_E2E_WORKERS", "1")
    one = {r["stage"]: r["n_docs"] for r in fn(spark, SF_DIR).collect()}
    assert one["raw"] >= one["exact"] >= one["perceptual"] >= one["semantic"]
