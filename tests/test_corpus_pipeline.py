"""Corpus-cleaning staged pipeline: annotate → exact dedup → near dedup →
quality filter, with resume."""

from pyspark.sql import functions as F


def test_corpus_pipeline(spark, tmp_path):
    from quadtree_block_compression_spark.plans.corpus_pipeline import (
        run_corpus_pipeline)
    rows = [
        (0, "the cat sat on the mat and looked at the dog and the bird today"),
        (1, "the cat sat on the mat and looked at the dog and the bird today"),   # exact dup
        (2, "the cat sat on the mat and looked at the dog and the bird however"), # near dup
        (3, "a completely different document about trains and planes in the city"),
        (4, "zzz qqq www"),                                                        # junk (short, no stopwords)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = run_corpus_pipeline(spark, docs, str(tmp_path / "corpus"),
                              jaccard_threshold=0.5, min_quality=0.5)
    assert out["annotated"].count() == 5
    # exact dedup dropped doc 1
    ids2 = {r.doc_id for r in out["exact_deduped"].select("doc_id").collect()}
    assert ids2 == {0, 2, 3, 4}
    # near dedup dropped doc 2 (jaccard vs doc 0 above threshold)
    ids3 = {r.doc_id for r in out["near_deduped"].select("doc_id").collect()}
    assert ids3 == {0, 3, 4}
    # quality filter dropped the junk doc
    ids4 = {r.doc_id for r in out["clean"].select("doc_id").collect()}
    assert ids4 == {0, 3}
    # resumable: second run with identical fingerprint reads checkpoints
    out2 = run_corpus_pipeline(spark, docs.limit(0), str(tmp_path / "corpus"),
                               jaccard_threshold=0.5, min_quality=0.5)
    assert {r.doc_id for r in out2["clean"].select("doc_id").collect()} == {0, 3}
    # lineage recorded for all four stages
    stages = {r.stage for r in out["pipeline"].lineage().select("stage").distinct().collect()}
    assert {"s1_annotate", "s2_exact_dedup", "s3_near_dedup",
            "s4_quality_filter"} <= stages
