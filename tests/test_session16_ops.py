"""Session-16 query-family invariants: DSIR importance weights,
CCNet paragraph dedup, Count-Min heavy hitters, vendored-dir
detection. The value-level truth is the DuckDB oracle gate
(tools/check_oracle.py); these tests pin the SEMANTIC invariants the
gate can't express — one-sided CMS error, paragraph-count
conservation, direction of the DSIR separation, flag placement."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from twinspect_spark.queries import (
    CMS_TOPK,
    q_cms_heavy_hitters,
    q_dsir_importance_weights,
    q_paragraph_dedup_stats,
    q_vendored_dir_detect,
)

SF = "/root/testdata/sf0.001"


def test_cms_estimate_is_one_sided(spark):
    rows = q_cms_heavy_hitters(spark, SF).collect()
    assert len(rows) == CMS_TOPK
    # Count-Min's guarantee: never underestimates
    assert all(r.cms_est >= r.exact_cnt for r in rows)
    assert all(r.overest == r.cms_est - r.exact_cnt for r in rows)
    # the sketch is deliberately undersized vs the vocabulary, so real
    # collisions must appear (otherwise the calibration readout is vacuous)
    assert any(r.overest > 0 for r in rows)


def test_paragraph_dedup_conservation_and_planted_branch(spark):
    out = q_paragraph_dedup_stats(spark, SF)
    rows = out.collect()
    assert all(0 <= r.n_dup_paras <= r.n_paras for r in rows)
    assert all(0.0 <= r.dup_para_frac <= 1.0 for r in rows)
    assert all(0.0 <= r.dropped_char_frac <= 1.0 for r in rows)
    # planted intra-doc branch: doc_id % 37 == 3 appends a copy of its
    # own first paragraph -> the copy is never the first occurrence
    planted = [r for r in rows if r.doc_id % 37 == 3]
    assert planted and all(r.n_dup_paras >= 1 for r in planted)
    # global conservation: kept paragraphs == distinct paragraph hashes
    # (each hash keeps exactly its first occurrence)
    tot_paras = sum(r.n_paras for r in rows)
    tot_dup = sum(r.n_dup_paras for r in rows)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from twinspect_spark.queries import _WRAP_RE

    wrapped = F.regexp_replace("text", _WRAP_RE, "$1\n")
    line1 = F.substring_index(wrapped, "\n", 1)
    content = F.concat(
        wrapped,
        F.when(
            F.col("doc_id") % 37 == 3, F.concat(F.lit("\n"), line1)
        ).otherwise(F.lit("")),
    )
    n_distinct = (
        docs.select(
            F.explode(F.split(content, "\n")).alias("p")
        )
        .select(
            F.sha2(
                F.translate(F.lower("p"), "0123456789", ""), 256
            ).alias("h")
        )
        .distinct()
        .count()
    )
    assert tot_paras - tot_dup == n_distinct


def test_paragraph_dedup_untouched_doc_sha_roundtrip(spark):
    """A doc with zero dropped paragraphs must emit the sha256 of its
    wrapped text verbatim (reassembly is byte-exact)."""
    out = {r.doc_id: r for r in q_paragraph_dedup_stats(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from twinspect_spark.queries import _WRAP_RE

    wrapped = {
        r.doc_id: r.w
        for r in docs.select(
            "doc_id",
            F.regexp_replace("text", _WRAP_RE, "$1\n").alias("w"),
        ).collect()
    }
    untouched = [
        d
        for d, r in out.items()
        if r.n_dup_paras == 0 and d % 37 != 3
    ]
    assert untouched, "corpus has no fully-unique doc?"
    for d in untouched[:20]:
        want = hashlib.sha256(wrapped[d].encode()).hexdigest()
        assert out[d].sha_scrubbed == want


def test_dsir_separates_target_from_raw(spark):
    rows = q_dsir_importance_weights(spark, SF).collect()
    docs = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    tgt = [r.logw_per_feat for r in rows if docs[r.doc_id] == "src0"]
    raw = [r.logw_per_feat for r in rows if docs[r.doc_id] != "src0"]
    assert tgt and raw
    # importance weights must rank the target slice above the rest on
    # average (that's the whole point of the estimator); per-doc
    # overlap is expected, the MEANS must separate
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)
    # keep flag consistent with the reported weight
    assert all((r.logw > 0) == r.dsir_keep for r in rows)


def test_vendored_dirs_flagged_src_clean(spark):
    rows = q_vendored_dir_detect(spark, SF).collect()
    by = {(r.repo, r.dir1): r for r in rows}
    vend = [r for r in rows if r.dir1 in ("vendor", "node_modules")]
    src = [r for r in rows if r.dir1 == "src"]
    assert vend and src
    # every vendored dir shares its payloads across repos (3 payloads
    # replicated into every repo) -> flagged wherever n_files >= 3
    for r in vend:
        assert r.n_shared == r.n_files
        if r.n_files >= 3:
            assert r.vendored_flag
    # src dirs hold (near-)unique content: share fraction far below the
    # vendored ones, and never flagged at sf0.001
    for r in src:
        assert r.shared_frac < 0.5
        assert not r.vendored_flag
    assert len(by) == len(rows)  # (repo, dir1) is a key


def test_quantile_sketch_bounds_and_merge_algebra(spark):
    from twinspect_spark.queries import q_length_quantile_sketch

    rows = q_length_quantile_sketch(spark, SF).collect()
    assert rows
    bylang = {}
    for r in rows:
        # log-spaced buckets: estimate and truth share a factor-2 octave
        assert 0.0 <= r.rel_err < 1.0
        assert r.est_q > 0
        bylang.setdefault(r.lang, []).append((r.q, r.est_q))
    # estimates monotone in q within each language
    for qs in bylang.values():
        qs.sort()
        assert all(a[1] <= b[1] for a, b in zip(qs, qs[1:]))
    # merge algebra: the histogram of a union is the cell-wise sum of
    # the shard histograms (what makes the sketch a sketch)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n"),
    )
    b = F.length(F.bin("n")).cast("long").alias("b")
    full = {
        (r.lang, r.b): r.c
        for r in docs.groupBy("lang", b).agg(F.count("*").alias("c")).collect()
    }
    sh = [
        {
            (r.lang, r.b): r.c
            for r in docs.where(F.col("doc_id") % 2 == k)
            .groupBy("lang", b)
            .agg(F.count("*").alias("c"))
            .collect()
        }
        for k in (0, 1)
    ]
    merged = {}
    for d in sh:
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_compaction_plan_conservation_and_dense_bins(spark):
    from twinspect_spark.queries import q_compaction_plan

    rows = q_compaction_plan(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tot = docs.agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("b")
    ).collect()[0]
    # every file lands in exactly one bin; every byte is planned
    assert sum(r.n_files for r in rows) == tot.n
    assert sum(r.bin_bytes for r in rows) == tot.b
    # bin ids dense 0..max within each partition (no empty output files)
    bins = {}
    for r in rows:
        bins.setdefault(r.lang, []).append(r.bin_id)
    for ids in bins.values():
        assert sorted(ids) == list(range(len(ids)))


def test_scale_shapes_use_broadcast_joins(spark):
    """The bounded side of each new query must broadcast — a shuffle
    there is the 100x-scale regression these ops were shaped to avoid."""
    from twinspect_spark.queries import (
        q_compaction_plan,
        q_local_supplier_volume,
    )

    for fn in (
        q_dsir_importance_weights,
        q_cms_heavy_hitters,
        q_vendored_dir_detect,
        q_local_supplier_volume,
        q_compaction_plan,
    ):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__


def test_semantic_contamination_matches_brute_force_pairs(spark):
    from twinspect_spark.queries import (
        q_embedding_cosine_dup,
        q_eval_semantic_contamination,
    )

    got = {
        r.vec_id: r.n_eval_matches
        for r in q_eval_semantic_contamination(spark, SF).collect()
    }
    assert all(v % 20 != 0 for v in got), "eval ids leaked into output"
    # cross-check against the brute-force pair oracle at the same
    # threshold: the flagged train set == train ids with a cross-split
    # partner among the (a < b) dup pairs
    pairs = q_embedding_cosine_dup(spark, SF).collect()
    want = {}
    for p in pairs:
        for t, e in ((p.a, p.b), (p.b, p.a)):
            if t % 20 != 0 and e % 20 == 0:
                want[t] = want.get(t, 0) + 1
    assert got == want
