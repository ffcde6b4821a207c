from __future__ import annotations

from twinspect_spark.queries import q_weighted_jaccard_pairs


def test_weighted_vs_set_jaccard(spark, tmp_path):
    # doc 0 == doc 1 (identical): both measures 1.0
    # doc 2 = doc 0's text doubled: shingle SET nearly identical
    #   (set jaccard ~1) but multiset counts differ 2x -> weighted ~0.5
    t = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, t, "en", "s", len(t)),
        (1, t, "en", "s", len(t)),
        (2, t + " " + t, "en", "s", 2 * len(t) + 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["a"], r["b"]): (r["w_jaccard"], r["jaccard"])
        for r in q_weighted_jaccard_pairs(spark, str(tmp_path)).collect()
    }
    assert out[(0, 1)] == (1.0, 1.0)
    w, j = out[(0, 2)]
    assert j >= 0.9  # set measure blind to repetition
    assert w < 0.62  # weighted measure sees the 2x count mismatch
    assert 0.0 < w <= 1.0
