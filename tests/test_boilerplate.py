"""Cross-document line dedup semantics (operators/boilerplate.py)."""

from pyspark.sql import functions as F

from quadtree_block_compression_spark.operators.boilerplate import (
    boilerplate_lines, doc_lines, remove_boilerplate_lines)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, "\n".join(lines)) for d, lines in rows],
        "doc_id long, text string")


def test_boilerplate_edge_semantics(spark):
    docs = _docs(spark, [
        (0, ["keep me zero", "FOOTER TEXT", "twice local", "twice local"]),
        (1, ["keep me one", "footer text  ", ""]),
        (2, ["  Footer Text", "keep me two"]),
        (3, ["FOOTER TEXT"]),                      # all boilerplate
        (4, ["", ""]),                             # only blanks
    ])
    out = {r.doc_id: r for r in
           remove_boilerplate_lines(docs, min_df=2).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    # normalization merges case/padding variants; originals are removed
    assert out[0].clean_text == "keep me zero\ntwice local\ntwice local"
    assert (out[0].n_lines, out[0].n_removed) == (4, 1)
    # blank lines are kept verbatim (trailing empty survives)
    assert out[1].clean_text == "keep me one\n"
    assert out[2].clean_text == "keep me two"
    # all-boilerplate doc → empty string, not null, counts intact
    assert out[3].clean_text == "" and out[3].n_removed == 1
    # blank-only doc: blanks are never boilerplate even at df>=2
    assert out[4].clean_text == "\n" and out[4].n_removed == 0
    # in-doc repetition has df=1 (distinct docs) — content, not boilerplate
    assert "twice local" in out[0].clean_text


def test_boilerplate_min_df_threshold(spark):
    docs = _docs(spark, [(d, [f"unique {d}", "shared footer"])
                         for d in range(3)])
    lines = doc_lines(docs)
    assert [r.nline for r in
            boilerplate_lines(lines, min_df=3).collect()] == ["shared footer"]
    assert boilerplate_lines(lines, min_df=4).count() == 0
    # below threshold nothing is removed
    out = remove_boilerplate_lines(docs, min_df=4).collect()
    assert all(r.n_removed == 0 for r in out)


def _py_boilerplate(rows, min_df):
    """Pure-Python reference semantics: df = distinct docs per normalized
    non-blank line; removal preserves order; blanks always kept."""
    df = {}
    for d, lines in rows:
        for ln in lines:
            n = ln.strip().lower()
            if n:
                df.setdefault(n, set()).add(d)
    boiler = {n for n, s in df.items() if len(s) >= min_df}
    out = {}
    for d, lines in rows:
        kept = [ln for ln in lines
                if not (ln.strip().lower() and ln.strip().lower() in boiler)]
        out[d] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    return out


def test_boilerplate_randomized_equivalence(spark):
    """Seeded random corpora (shared/unique/blank/padded/case-variant/
    unicode lines) must match the pure-Python reference exactly."""
    import numpy as np

    alphabet = ["", "  ", "Shared Footer", "shared footer", " SHARED FOOTER ",
                "cookie banner", "Cookie Banner", "café menu déjà vu",
                "semi rare line", "tail note"]
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        rows = []
        for d in range(40):
            n_lines = int(rng.integers(1, 7))
            lines = []
            for i in range(n_lines):
                if rng.random() < 0.55:
                    lines.append(alphabet[int(rng.integers(len(alphabet)))])
                else:
                    lines.append(f"unique {d}-{i} body")
            rows.append((d, lines))
        min_df = int(rng.integers(2, 5))
        want = _py_boilerplate(rows, min_df)
        got = {r.doc_id: (r.n_lines, r.n_removed, r.clean_text) for r in
               remove_boilerplate_lines(_docs(spark, rows),
                                        min_df=min_df).collect()}
        assert got == want, f"seed={seed} min_df={min_df}"


def test_boilerplate_noop_on_distinct_corpus(spark):
    """The real documents table (single-line, all-distinct word soup) must
    pass through unchanged — a false positive here means df counting or
    reassembly is wrong."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    out = remove_boilerplate_lines(docs, min_df=2)
    assert out.where("n_removed != 0").count() == 0
    joined = docs.join(out, "doc_id")
    assert joined.where(F.col("text") != F.col("clean_text")).count() == 0
    assert out.count() == docs.count()
