"""Training-data export ops (twinspect_spark/training.py): deterministic
stratified sampling, distributed-prefix-sum token-budget export, PII
scrubbing. The distributed prefix sum is property-tested against the
naive global window; PII patterns are exercised on PLANTED PII (the
synthetic corpus contains none)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from twinspect_spark.training import (
    SAMPLE_HASH_MOD,
    SAMPLE_HASH_MULT,
    pii_scrub,
    sample_hash,
    stratified_sample,
    token_budget_export,
)


def _docs(spark, n=200, n_strata=5):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_strata).cast("string")).alias(
            "lang"
        ),
        # deterministic pseudo-token count 5..54
        (F.pmod(F.col("id") * 37, F.lit(50)) + 5).alias("n_tokens"),
    )


def test_sample_hash_matches_python(spark):
    got = (
        spark.range(100)
        .select(sample_hash(F.col("id")).alias("h"), "id")
        .collect()
    )
    for r in got:
        assert r.h == (r.id * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD


def test_stratified_sample_quota_and_determinism(spark):
    docs = _docs(spark)
    out1 = stratified_sample(docs, "lang", "doc_id", 7)
    rows1 = {(r.doc_id, r.lang, r.rank_in_stratum) for r in out1.collect()}
    # exactly 7 per stratum, ranks dense 1..7
    per = out1.groupBy("lang").agg(
        F.count("*").alias("n"), F.max("rank_in_stratum").alias("mx")
    )
    for r in per.collect():
        assert r.n == 7 and r.mx == 7
    # invariant to partitioning
    out2 = stratified_sample(
        docs.repartition(13, "doc_id"), "lang", "doc_id", 7
    )
    assert {(r.doc_id, r.lang, r.rank_in_stratum)
            for r in out2.collect()} == rows1
    # membership = quota hash-smallest ids per stratum (pure function)
    all_rows = docs.collect()
    for stratum in {r.lang for r in all_rows}:
        ids = [r.doc_id for r in all_rows if r.lang == stratum]
        want = set(
            sorted(ids, key=lambda i: ((i * SAMPLE_HASH_MULT) %
                                       SAMPLE_HASH_MOD, i))[:7]
        )
        assert {d for d, s, _ in rows1 if s == stratum} == want


def test_token_budget_export_equals_global_window(spark):
    docs = _docs(spark, n=500)
    budget = 3000
    out = token_budget_export(docs, "doc_id", "n_tokens", budget)
    got = {(r.doc_id, r.cum_tokens) for r in out.collect()}
    # naive single-task global window (the oracle construction)
    naive = (
        docs.withColumn("_h", sample_hash(F.col("doc_id")))
        .withColumn(
            "cum",
            F.sum("n_tokens").over(Window.orderBy("_h", "doc_id")),
        )
        .where(F.col("cum") <= budget)
    )
    want = {(r.doc_id, r.cum) for r in naive.collect()}
    assert got == want
    assert len(got) > 10  # budget actually cuts mid-corpus
    assert len(got) < 500


def test_token_budget_bucket_pruning(spark):
    # a tiny budget keeps only the first bucket(s); plan must still be
    # correct when most buckets are pruned pre-sort
    docs = _docs(spark, n=300)
    out = token_budget_export(docs, "doc_id", "n_tokens", 40)
    rows = sorted(out.collect(), key=lambda r: r.cum_tokens)
    assert rows, "at least one doc fits a 40-token budget"
    assert rows[-1].cum_tokens <= 40
    # cum_tokens strictly increasing and consistent with n_tokens
    prev = 0
    for r in rows:
        assert r.cum_tokens == prev + r.n_tokens
        prev = r.cum_tokens


def test_shard_assignment_stable_and_balanced(spark):
    from twinspect_spark.training import shard_assignment

    docs = _docs(spark, n=400)
    out = shard_assignment(docs, "doc_id", 8)
    rows = {r.doc_id: r.shard for r in out.collect()}
    assert len(rows) == 400
    for d, s in rows.items():
        assert s == ((d * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD) % 8
    # appending more docs never reassigns existing ones
    bigger = shard_assignment(_docs(spark, n=800), "doc_id", 8)
    for r in bigger.collect():
        if r.doc_id in rows:
            assert rows[r.doc_id] == r.shard
    # rough balance: every shard populated, none >2x the mean
    per = out.groupBy("shard").count().collect()
    assert len(per) == 8
    assert max(r["count"] for r in per) <= 2 * 400 / 8


def test_pack_sequences_tiles_the_token_stream(spark):
    from twinspect_spark.training import pack_sequences

    docs = _docs(spark, n=400)
    seq_len = 64
    out = pack_sequences(docs, "doc_id", "n_tokens", seq_len)
    rows = sorted(out.collect(), key=lambda r: r.pack_start)
    assert len(rows) == 400
    # the concatenated stream tiles exactly: doc i starts where i-1 ended
    pos = 0
    for r in rows:
        assert r.pack_start == pos
        pos += r.n_tokens
        assert r.first_seq == r.pack_start // seq_len
        assert r.last_seq == (r.pack_start + r.n_tokens - 1) // seq_len
        assert r.n_seqs == r.last_seq - r.first_seq + 1
    # order is the deterministic hash order (same as budget export)
    want = sorted(
        [(r.doc_id, r.n_tokens) for r in docs.collect()],
        key=lambda t: ((t[0] * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD, t[0]),
    )
    assert [(r.doc_id, r.n_tokens) for r in rows] == want
    # invariant to partitioning
    out2 = pack_sequences(
        docs.repartition(11, "doc_id"), "doc_id", "n_tokens", seq_len
    )
    assert {(r.doc_id, r.pack_start, r.first_seq, r.last_seq)
            for r in out2.collect()} == {
        (r.doc_id, r.pack_start, r.first_seq, r.last_seq) for r in rows
    }


def test_pack_sequences_boundary_spans(spark):
    from twinspect_spark.training import pack_sequences

    # hand-built stream: lengths 10, 10, 10 with seq_len 16 — doc order
    # by hash determines who crosses the 16- and 32-token boundaries
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], ["doc_id", "n_tokens"]
    )
    rows = {r.doc_id: r for r in
            pack_sequences(df, "doc_id", "n_tokens", 16).collect()}
    order = sorted(
        [1, 2, 3],
        key=lambda i: ((i * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD, i),
    )
    starts = {order[0]: 0, order[1]: 10, order[2]: 20}
    for d, s in starts.items():
        assert rows[d].pack_start == s
        assert rows[d].first_seq == s // 16
        assert rows[d].last_seq == (s + 9) // 16
    # middle doc spans tokens 10..19 → sequences 0 and 1
    assert rows[order[1]].n_seqs == 2
    # zero-token docs are dropped
    df0 = spark.createDataFrame([(1, 5), (2, 0)], ["doc_id", "n_tokens"])
    got = pack_sequences(df0, "doc_id", "n_tokens", 16).collect()
    assert [r.doc_id for r in got] == [1]


def test_boilerplate_headers_planted(spark, tmp_path):
    import twinspect_spark.queries as Q

    header = "Copyright (c) 2024 Example Corp. All rights reserved. " \
             "Licensed under the Apache License, Version 2.0 extra"
    rows = [
        # 3 docs sharing the header (case/extra-whitespace variants)
        (1, "a", header + " body one with sufficient tail words"),
        (2, "b", header.upper() + "  body   two entirely different"),
        (3, "a", header + " third body"),
        # unique docs
        (4, "a", "totally unrelated first document having at least a "
                 "dozen words to pass the length gate fine"),
        (5, "b", "second distinct filler text whose opening words differ "
                 "completely from every other row here"),
        # too short to have a header
        (6, "a", "short doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    p = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(p)

    # q_boilerplate_headers reads <sf_dir>/documents.parquet
    out = Q.q_boilerplate_headers(spark, str(tmp_path)).collect()
    assert len(out) == 1
    g = out[0]
    assert g.n_docs == 3
    assert g.n_sources == 2
    assert g.exemplar_doc_id == 1


def test_pii_scrub_planted(spark):
    txt = (
        "contact me at alice.smith+x@example.co.uk or via "
        "https://evil.example.com/path?a=1&b=2 host 192.168.001.255 "
        "card 12345678901234 and a short 1234 stays"
    )
    df = spark.createDataFrame([(1, txt), (2, "clean text, no pii 99")],
                               ["doc_id", "text"])
    out = {r.doc_id: r for r in pii_scrub(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1.n_url == 1 and r1.n_email == 1
    assert r1.n_ip == 1 and r1.n_idnum == 1
    redacted = (
        "contact me at <EMAIL> or via <URL> host <IP> "
        "card <ID> and a short 1234 stays"
    )
    assert r1.redacted_sha256 == hashlib.sha256(
        redacted.encode()
    ).hexdigest()
    r2 = out[2]
    assert (r2.n_url, r2.n_email, r2.n_ip, r2.n_idnum) == (0, 0, 0, 0)
    assert r2.redacted_sha256 == hashlib.sha256(
        b"clean text, no pii 99"
    ).hexdigest()


def test_pii_no_double_count(spark):
    # an email inside a URL counts once, as URL; digits inside the
    # already-redacted URL don't count as idnum
    df = spark.createDataFrame(
        [(1, "see https://x.io/mail?to=bob@x.io&id=123456789 end")],
        ["doc_id", "text"],
    )
    r = pii_scrub(df, "doc_id", "text").collect()[0]
    assert r.n_url == 1
    assert r.n_email == 0
    assert r.n_idnum == 0
