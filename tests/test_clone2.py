"""Type-2 clone detection (alpha-canonical forms): rename invariance,
type-1 separation, boilerplate-class cap, planted-pair completeness."""

from __future__ import annotations

import pytest

from twinspect_spark.queries import (
    CLONE2_MAX_CLASS,
    CLONE2_RENAME_OFFSET,
    q_clone_type2_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pairs(spark):
    return q_clone_type2_pairs(spark, SF_DIR).collect()


def test_every_planted_rename_found(spark, pairs):
    """The vowel-permutation rename is a bijection on identifiers, so
    every planted partner MUST land in its base doc's clone class —
    unless the base doc's class blew past the boilerplate cap, which
    would drop base and partner together (checked: none do here)."""
    n_planted = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where("doc_id % 5 = 0")
        .count()
    )
    found = {
        (a, b)
        for a, b, *_ in ((r.doc_a, r.doc_b) + (r.n_tokens,) for r in pairs)
        if b - a == CLONE2_RENAME_OFFSET
    }
    assert len(found) == n_planted


def test_type2_pairs_invisible_to_type1(pairs):
    """The point of the tier: clone pairs the content-hash tier cannot
    see. Planted renames always change text (every doc contains a
    vowel), so each must report same_text=false."""
    planted = [r for r in pairs if r.doc_b - r.doc_a == CLONE2_RENAME_OFFSET]
    assert planted and all(not r.same_text for r in planted)


def test_class_cap_bounds_pair_degree(pairs):
    """No doc may appear in more than cap-1 pairs (class size <= cap)."""
    from collections import Counter

    deg = Counter()
    for r in pairs:
        deg[r.doc_a] += 1
        deg[r.doc_b] += 1
    assert max(deg.values()) <= CLONE2_MAX_CLASS - 1


def test_alpha_form_invariant_under_any_bijective_rename(spark):
    """Property: an arbitrary word-level bijective rename (not the
    planted vowel permutation) of one real doc collides with the
    original's canonical class."""
    from pyspark.sql import functions as F

    doc = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where("doc_id = 1")
        .select("text")
        .first()
        .text
    )
    words = doc.split(" ")
    vocab = {w: f"tok{i}x" for i, w in enumerate(dict.fromkeys(words))}
    renamed = " ".join(vocab[w] for w in words)

    def canon(t):
        # first-occurrence POSITION form (1-based, matching the engine)
        ws = t.split(" ")[:256]
        return [ws.index(w) + 1 for w in ws]

    assert canon(doc) == canon(renamed)
    # and the engine-side expression agrees with the Python twin
    row = (
        spark.createDataFrame([(doc,), (renamed,)], ["text"])
        .select(F.slice(F.split("text", " "), 1, 256).alias("ws"))
        .select(
            F.expr(
                "transform(ws, w -> cast(array_position(ws, w) as int))"
            ).alias("alpha")
        )
        .collect()
    )
    assert row[0].alpha == row[1].alpha == canon(doc)


# ---------------------------------------------------------------------------
# pure-kernel properties (no Spark): hypothesis over alpha_canon_key
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from twinspect_spark.queries import alpha_canon_key

_tokens = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(_tokens, st.randoms(use_true_random=False))
def test_bijective_rename_invariance(toks, rng):
    """Any bijective vocabulary rename maps to the SAME class key."""
    vocab = list(dict.fromkeys(toks))
    shuffled = vocab[:]
    rng.shuffle(shuffled)
    ren = dict(zip(vocab, (f"r{i}u{s}" for i, s in enumerate(shuffled))))
    assert alpha_canon_key(" ".join(toks)) == alpha_canon_key(
        " ".join(ren[w] for w in toks)
    )


@settings(max_examples=200, deadline=None)
@given(_tokens)
def test_merging_two_tokens_changes_the_key(toks):
    """A NON-bijective rename (two distinct identifiers collapsed into
    one) changes the position partition, hence the key."""
    vocab = list(dict.fromkeys(toks))
    if len(vocab) < 2:
        return
    merged = [vocab[0] if w == vocab[1] else w for w in toks]
    assert alpha_canon_key(" ".join(toks)) != alpha_canon_key(
        " ".join(merged)
    )


@settings(max_examples=100, deadline=None)
@given(_tokens)
def test_key_matches_sql_oracle_semantics(toks):
    """The dict pass equals the oracle's transform/array_position form
    (1-based first-occurrence position per token)."""
    import hashlib

    ws = " ".join(toks).split(" ")[:256]
    alpha = [str(ws.index(w) + 1) for w in ws]
    assert (
        alpha_canon_key(" ".join(toks))
        == hashlib.sha256(",".join(alpha).encode()).hexdigest()
    )
