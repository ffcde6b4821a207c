"""The ANSI-SQL replication of the signature kernels (queries.py
_SIMHASH_CTE / _MINHASH_LANES_CTE) must match the Python reference
kernels (functions/hashing.py *_py twins) bit-exactly — a third
independent implementation of the same spec, so a divergence in the
HUGEINT mod-2^64 arithmetic can't hide behind the driver's small corpus.

DuckDB-only (no Spark session): runs in milliseconds.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from twinspect_spark.functions import hashing as H
from twinspect_spark.queries import (
    _MINHASH_LANES_CTE,
    _SIMHASH_CTE,
    _sql_splitmix64_expr,
    DOCS_CFG,
    DOCS_SIM_CFG,
    SHINGLE_K,
)

MASK64 = (1 << 64) - 1


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_sql_splitmix64_matches_python(con):
    rng = random.Random(7)
    vals = [0, 1, MASK64, 1 << 63] + [rng.getrandbits(64) for _ in range(40)]
    exprs = ", ".join(
        f"({_sql_splitmix64_expr(f'{v}::HUGEINT')})" for v in vals
    )
    got = con.sql(f"SELECT {exprs}").fetchone()
    for v, g in zip(vals, got):
        assert int(g) == H.splitmix64_py(v), f"splitmix64({v})"


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "ab",  # shorter than k: whole text is the one shingle
    "aaaaaaaaaaaa",  # single repeated shingle
    "hello world hello world xyz",
    "",  # empty: FNV offset fold, densification from a single bin
    "x" * 3,  # exactly k-1
    "abcd",  # exactly k
    "Zebra QUilt 0123 zebra quilt 0123",
]


def _docs_relation(texts: list[str]) -> str:
    rows = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    return f"(SELECT doc_id, lower(t) AS text FROM (VALUES {rows}) v(doc_id, t))"


def _with_docs(cte: str, texts: list[str]) -> str:
    """The CTEs open with `docs AS (SELECT ... FROM documents)`; point the
    `documents` name at an inline VALUES relation."""
    return f"WITH documents AS {_docs_relation(texts)}, {cte}"


def test_sql_simhash_matches_python(con):
    q = (
        _with_docs(_SIMHASH_CTE, TEXTS)
        + " SELECT doc_id, simhash FROM sim ORDER BY doc_id"
    )
    rows = con.sql(q).fetchall()
    assert len(rows) == len(TEXTS)
    for doc_id, simhash in rows:
        text = TEXTS[doc_id].lower()
        want = H.to_signed64(
            H.simhash64_py(
                H.shingle_hashes_py(text, SHINGLE_K), DOCS_SIM_CFG.seed
            )
        )
        assert simhash == want, f"simhash doc {doc_id!r}"


def test_sql_minhash_lanes_match_python(con):
    q = (
        _with_docs(_MINHASH_LANES_CTE, TEXTS)
        + " SELECT doc_id, list(lane ORDER BY bin) FROM lanes"
        " GROUP BY doc_id ORDER BY doc_id"
    )
    rows = con.sql(q).fetchall()
    assert len(rows) == len(TEXTS)
    for doc_id, lanes in rows:
        text = TEXTS[doc_id].lower()
        want = H.minhash_py(
            H.shingle_hashes_py(text, SHINGLE_K),
            DOCS_CFG.num_perm,
            DOCS_CFG.seed,
        )
        assert [int(x) & MASK64 for x in lanes] == want, f"minhash doc {doc_id}"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # lowercase-stable alphabet (lower() is identity in BOTH engines, so
    # the property isolates the hash kernels, not Unicode case folding);
    # includes multibyte, combining-mark and astral codepoints — DuckDB
    # string_split('') must agree with Python ord() per codepoint
    _ALPHA = "abcxyz0189 .,\n\t éßλ中🎉́"

    @given(
        st.lists(
            st.text(alphabet=_ALPHA, min_size=0, max_size=120),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=15, deadline=None)
    def test_sql_kernels_hypothesis_unicode(texts):
        c = duckdb.connect()
        q = (
            _with_docs(_MINHASH_LANES_CTE, texts)
            + " SELECT doc_id, list(lane ORDER BY bin) FROM lanes"
            " GROUP BY doc_id ORDER BY doc_id"
        )
        for doc_id, lanes in c.sql(q).fetchall():
            want = H.minhash_py(
                H.shingle_hashes_py(texts[doc_id].lower(), SHINGLE_K),
                DOCS_CFG.num_perm,
                DOCS_CFG.seed,
            )
            assert [int(x) & MASK64 for x in lanes] == want

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_sql_minhash_random_texts_property(con):
    rng = random.Random(99)
    alphabet = "abcdefg h\nij.,"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 120)))
        for _ in range(12)
    ]
    # escape single quotes not needed for this alphabet
    q = (
        _with_docs(_MINHASH_LANES_CTE, texts)
        + " SELECT doc_id, list(lane ORDER BY bin) FROM lanes"
        " GROUP BY doc_id ORDER BY doc_id"
    )
    for doc_id, lanes in con.sql(q).fetchall():
        want = H.minhash_py(
            H.shingle_hashes_py(texts[doc_id].lower(), SHINGLE_K),
            DOCS_CFG.num_perm,
            DOCS_CFG.seed,
        )
        assert [int(x) & MASK64 for x in lanes] == want


def test_sql_cdc_chunks_random_texts_property(con):
    """The CDC SQL replay (queries._CDC_CTE) must reproduce the Python
    scalar twin's chunking exactly — boundary positions AND chunk text,
    in document order (the `seg` CTE exposes the cut offsets)."""
    import re

    from twinspect_spark.operators.cdc import cdc_chunks_py, cdc_key
    from twinspect_spark.queries import CDC_D, CDC_K, _CDC_CTE

    key = cdc_key(DOCS_CFG.seed)
    rng = random.Random(23)
    alphabet = "abcdefg h\nij.,"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 400)))
        for _ in range(12)
    ] + ["", " ", "a", "spark " * 40]
    q = (
        _with_docs(_CDC_CTE, texts)
        + """ SELECT n.doc_id,
               list(substr(n.t, g.s,
                           coalesce(g.nxt, length(n.t) + 1) - g.s)
                    ORDER BY g.s) AS cl
          FROM seg g JOIN norm n USING (doc_id)
          GROUP BY n.doc_id ORDER BY n.doc_id"""
    )
    got = {doc_id: list(cl) for doc_id, cl in con.sql(q).fetchall()}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        want = cdc_chunks_py(norm, CDC_K, CDC_D, key)
        assert got.get(i, []) == want, f"doc {i}"
