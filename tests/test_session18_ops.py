from __future__ import annotations

import datetime as dt

from twinspect_spark.queries import (
    q_hybrid_rank_fusion,
    q_quality_pareto_frontier,
    q_user_retention_cohorts,
)

SF = "/root/testdata/sf0.001"


def test_rrf_fusion_invariants(spark):
    rows = q_hybrid_rank_fusion(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == set(range(10))
    scale = 10**12
    for q, rs in by_q.items():
        assert len(rs) == 5
        for r in rs:
            assert r["rrf_score"] == scale // (60 + r["rank_cos"]) + scale // (
                60 + r["rank_l2"]
            )
        # output is the top-5 by score: scores non-increasing in rank order
        scores = sorted((r["rrf_score"] for r in rs), reverse=True)
        assert scores == [r["rrf_score"] for r in sorted(
            rs, key=lambda r: (-r["rrf_score"], r["neighbor_id"])
        )]


def test_rrf_disagreeing_modalities(spark, tmp_path):
    # q=0. neighbor 1: same direction, tiny magnitude (cosine rank 1,
    # L2 rank 2). neighbor 2: same magnitude, slightly rotated (L2
    # rank 1, cosine rank 2). RRF must rank them by the tie-broken sum.
    emb = spark.createDataFrame(
        [
            (0, [10.0, 0.0], "q"),
            (1, [0.1, 0.0], "tiny-parallel"),
            (2, [9.0, 4.0], "close-rotated"),
        ],
        "vec_id long, embedding array<float>, label string",
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["neighbor_id"]: r
        for r in q_hybrid_rank_fusion(spark, str(tmp_path)).collect()
        if r["q_id"] == 0
    }
    assert out[1]["rank_cos"] == 1 and out[1]["rank_l2"] == 2
    assert out[2]["rank_l2"] == 1 and out[2]["rank_cos"] == 2
    assert out[1]["rrf_score"] == out[2]["rrf_score"]  # symmetric ranks


def test_retention_offset0_is_cohort_size(spark):
    rows = q_user_retention_cohorts(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_active"] <= r["cohort_size"]
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retention_ppm"] == 1_000_000
        assert r["week_offset"] >= 0


def test_pareto_frontier_hand_computed(spark, tmp_path):
    # lang en, quality == 1.0 - punct/len (no stopwords/digits used):
    #   doc 0: 3 tokens, clean        -> frontier
    #   doc 1: 2 tokens, clean        -> dominated by 0 (fewer tokens,
    #                                    same quality)
    #   doc 2: 5 tokens, punctuated   -> frontier (longest)
    #   doc 3: 5 tokens, MORE punct   -> dominated by 2 (same tokens)
    rows = [
        (0, "alpha beta gamma", "en"),
        (1, "alpha beta", "en"),
        (2, "alpha beta gamma delta. epsilon", "en"),
        (3, "alpha beta. gamma. delta. epsilon", "en"),
    ]
    docs = spark.createDataFrame(
        [(i, t, l, "s", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"] for r in q_quality_pareto_frontier(spark, str(tmp_path)).collect()}
    assert out == {0, 2}


def test_props_stats_json_parsing(spark, tmp_path):
    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 5}'),
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, '{"k": 7}'),
        (2, dt.datetime(2024, 1, 1), 2, "view", 1.0, '{"other": 1}'),
        (3, dt.datetime(2024, 1, 1), 2, "click", 1.0, "not json"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from twinspect_spark.queries import q_events_props_stats

    out = {r["event_type"]: r for r in q_events_props_stats(spark, str(tmp_path)).collect()}
    assert out["view"]["n_events"] == 3
    assert out["view"]["n_missing_k"] == 1  # {"other": 1}
    assert out["view"]["sum_k"] == 12
    assert out["view"]["avg_k"] == 6.0
    assert out["click"]["n_missing_k"] == 1  # malformed json -> null


def test_phrase_search_adjacency(spark, tmp_path):
    # "table value" twice in doc 0 (incl. wrap-around NOT counted across
    # the repeated word boundary), absent in doc 1 despite both words
    rows = [
        (0, "table value x table value", "en"),
        (1, "value table x value y table", "en"),
        (2, "fast sort", "en"),
    ]
    docs = spark.createDataFrame(
        [(i, t, l, "s", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from twinspect_spark.queries import q_phrase_search

    out = {
        (r["phrase"], r["doc_id"]): r["n_occurrences"]
        for r in q_phrase_search(spark, str(tmp_path)).collect()
    }
    assert out[("table value", 0)] == 2
    assert ("table value", 1) not in out
    assert out[("fast sort", 2)] == 1
