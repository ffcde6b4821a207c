from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from twinspect_spark.queries import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    PAD_SEQ_LENS,
    q_lang_id_confusion,
    q_padding_waste_report,
    q_prefix_dup_groups,
    q_rag_chunking_stats,
)

SF = "/root/testdata/sf0.001"


def test_chunking_hand_recomputation(spark):
    rows = q_rag_chunking_stats(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .limit(20)
        .collect()
    }
    by_id = {r["doc_id"]: r for r in rows}
    for did, text in docs.items():
        r = by_id[did]
        n = len(text)
        if n <= CHUNK_LEN:
            want_chunks = 1
        else:
            want_chunks = 1 + math.ceil((n - CHUNK_LEN) / CHUNK_STRIDE)
        assert r["n_chunks"] == want_chunks
        # chunks tile the doc: last chunk must reach the end
        assert (want_chunks - 1) * CHUNK_STRIDE + CHUNK_LEN >= n
        first = text[:CHUNK_LEN]
        last = text[(want_chunks - 1) * CHUNK_STRIDE:][:CHUNK_LEN]
        assert r["first_chunk_sha"] == hashlib.sha256(
            first.encode()
        ).hexdigest()
        assert r["last_chunk_sha"] == hashlib.sha256(
            last.encode()
        ).hexdigest()
        assert r["chunk_chars"] == (want_chunks - 1) * CHUNK_LEN + len(last)


def test_prefix_groups_are_real_collisions(spark):
    rows = q_prefix_dup_groups(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for d in docs:
        t = d["text"]
        if len(t) >= 64:
            groups[t[:64].lower()].append(d)
    want = {k: v for k, v in groups.items() if len(v) >= 2}
    assert len(rows) == len(want)
    by_canon = {r["canonical_id"]: r for r in rows}
    for k, members in want.items():
        canon = min(m["doc_id"] for m in members)
        r = by_canon[canon]
        assert r["n_docs"] == len(members)
        shas = {hashlib.sha256(m["text"].encode()).hexdigest() for m in members}
        assert r["n_variants"] == len(shas)
        assert r["near_not_exact"] == (len(shas) > 1)


def test_confusion_matrix_matches_direct_recount(spark):
    # this synthetic corpus is pure ASCII for every lang label, so the
    # char-class heuristic predicts 'en' across the board — the matrix
    # must report exactly that failure mode, not hide it
    rows = q_lang_id_confusion(spark, SF).collect()
    from twinspect_spark.queries import q_lang_id

    direct = (
        q_lang_id(spark, SF)
        .groupBy("lang", "pred_lang")
        .count()
        .collect()
    )
    want = {(r["lang"], r["pred_lang"]): r["count"] for r in direct}
    got = {(r["lang"], r["pred_lang"]): r["n"] for r in rows}
    assert got == want
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        tot = sum(r["n"] for r in rs)
        for r in rs:
            assert r["frac_ppm"] == (r["n"] * 1_000_000) // tot
    # every row collapses onto 'en' on this ASCII corpus
    assert {r["pred_lang"] for r in rows} == {"en"}


def test_padding_waste_decreasing_in_doccount_sense(spark):
    rows = {r["seq_len"]: r for r in q_padding_waste_report(spark, SF).collect()}
    assert set(rows) == set(PAD_SEQ_LENS)
    for l, r in rows.items():
        assert r["padded_tokens"] >= r["total_tokens"]
        assert r["padded_tokens"] % l == 0
        assert 0 <= r["waste_ppm"] < 1_000_000
    # larger L can only pad more per doc
    assert (
        rows[2048]["padded_tokens"]
        >= rows[512]["padded_tokens"]
        >= rows[128]["padded_tokens"]
    )
