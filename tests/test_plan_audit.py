"""Physical-plan regression gate (VERDICT r3 #6).

Runs every assertion from ``tools/plan_audit.py`` under pytest so a plan
regression — a new cartesian, a lost broadcast, a partitionless window, a
quantile sort over raw rows — fails the suite, not just the out-of-band
PLANS.md report. The audit builds (and for two fixtures, executes) real
query plans at sf0.01 against the shared session.
"""


def test_all_plan_properties_hold(spark):
    from tools.plan_audit import run_audit

    report, failures = run_audit(spark)
    assert failures == [], "\n".join(failures)
    # sanity: the audit actually covered the named plans (incl. the two
    # round-4 additions) rather than silently skipping sections
    text = "\n".join(report)
    for section in ("tile_range_scan", "spatial_join_rects",
                    "embedding_near_dup", "ann_lsh_topk", "ngram_jaccard",
                    "q5_local_supplier_volume", "assign_tiles",
                    "text_quality", "corpus_clean", "ivf_probe_index",
                    "vocab_topk", "corpus_stats",
                    "spatial_distance_join", "events_asof_join",
                    "corpus_weighted_sample", "tile_pyramid"):
        assert f"## {section}" in text, section
