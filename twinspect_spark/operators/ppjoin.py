"""Prefix-filter set-similarity join (AllPairs / PPJoin family).

EXACT Jaccard similarity join without the all-pairs blowup and without
LSH's probabilistic recall: under a global token order (rarest first),
two sets with Jaccard >= t MUST share a token within each set's first
``n - ceil(t*n) + 1`` tokens (Chaudhuri et al. ICDE'06 prefix filter;
Bayardo et al. WWW'07 All-Pairs). Candidate generation therefore joins
only PREFIX tokens against PREFIX tokens — an equi-join a shuffled
hash join can execute — and the exact verify runs on candidates only.
Complementary to MinHash-LSH (operators/lsh.py): LSH trades recall for
speed at any threshold; the prefix filter is LOSSLESS. The
ppjoin_similar_pairs oracle is the NAIVE all-pairs shingle join, so
the correctness gate literally proves zero false negatives.

Why the filter works: if |x ∩ y| / |x ∪ y| >= t then
|x ∩ y| >= t·|x|, so fewer than |x| - t·|x| + 1 tokens of x can be
outside the intersection; ordering both sets identically, the first
``|x| - ceil(t·|x|) + 1`` tokens of x must hit the intersection — and
symmetrically for y — so the two prefixes intersect.

Reference analog: the candidate-generation role of twinspect's Hamming
index (/root/reference/twinspect/metrics/hamming.py:187-215 brute-force
baseline vs indexed search) — the same generate-then-verify contract,
re-expressed as set-overlap algebra instead of binary codes.

Scale shape (100 TB lens):
- token doc-frequencies: one map-side-combinable groupBy over the
  token relation (vocabulary-sized result);
- the global order is (doc_freq ASC, token ASC) used ONLY inside
  per-document windows — no global rank materialization, no
  vocabulary-wide sort in the data path;
- per-doc position/size: ONE window shuffle on doc id;
- candidate join: equi-join on the token value restricted to prefixes,
  with the standard length filter fused into the join condition
  (J >= t forces t·max(|x|,|y|) <= min(|x|,|y|) — an integer
  predicate, no extra pass). Rarest-first ordering puts LOW-frequency
  tokens in prefixes, so bucket sizes are anti-correlated with token
  popularity — a stopword/boilerplate shingle can never be a prefix
  token of a large set, bounding join skew by construction;
- verify: exact intersection counting semi-joined down to candidate
  pairs (same restriction idiom as queries._exact_jaccard_pairs).

Applicability domain — HIGH-entropy vocabularies. The selectivity of
the prefix filter is the rarity of prefix tokens; on a low-entropy
corpus it degenerates (measured on this synthetic corpus at sf0.1:
4-gram vocab 985 → 11.0M of 12.5M possible pairs survive; even 8-gram
vocab 13k → 6.5M), which is precisely the regime
operators/containment.py documents and routes to its dense packed-
bitmap tier instead. ppjoin_similar_pairs therefore sits in the
ORACLE-tier of the battery on this corpus (gate-proves losslessness);
on a real code/text lake with ~2^30+ distinct shingles the same plan
is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_tokens(
    tok: DataFrame, id_col: str, t_num: int, t_den: int
) -> DataFrame:
    """Restrict a distinct (id, tok) relation to each set's prefix
    under the rarest-first global order. Prefix length for a set of n
    tokens at threshold t = t_num/t_den is ``n - ceil(t*n) + 1``,
    computed in exact integer arithmetic
    (``(t_num*n + t_den - 1) div t_den``) so Spark and the SQL oracle
    can never disagree on a boundary."""
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("dfq"))
    w = Window.partitionBy(id_col).orderBy("dfq", "tok")
    wn = Window.partitionBy(id_col)
    pos = tok.join(dfreq, "tok").select(
        F.col(id_col),
        "tok",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(wn).alias("n"),
    )
    plen = (
        F.col("n")
        - F.expr(f"({t_num} * n + {t_den} - 1) div {t_den}")
        + F.lit(1)
    )
    return pos.where(F.col("pos") <= plen).select(id_col, "tok")


def ppjoin_pairs(
    tok: DataFrame, id_col: str, t_num: int, t_den: int
) -> DataFrame:
    """Exact Jaccard >= t_num/t_den pairs over a distinct (id, tok)
    set relation, via prefix-filter candidates + exact verify.
    Returns (a, b, jaccard) with a < b, jaccard rounded to 6 dp (the
    cross-engine comparison convention)."""
    sizes = tok.groupBy(id_col).agg(F.count("*").alias("n"))
    pref = prefix_tokens(tok, id_col, t_num, t_den).join(sizes, id_col)
    cands = (
        pref.alias("x")
        .join(pref.alias("y"), "tok")
        .where(
            (F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            # length filter: J >= t ⇒ t·max(|x|,|y|) <= min(|x|,|y|)
            & (
                F.lit(t_num) * F.greatest("x.n", "y.n")
                <= F.lit(t_den) * F.least("x.n", "y.n")
            )
        )
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )
    ids = (
        cands.select(F.col("a").alias(id_col))
        .unionByName(cands.select(F.col("b").alias(id_col)))
        .distinct()
    )
    vtok = tok.join(F.broadcast(ids), id_col, "left_semi")
    inter = (
        vtok.alias("x")
        .join(vtok.alias("y"), "tok")
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .groupBy(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .agg(F.count("*").alias("i"))
        .join(cands, ["a", "b"], "left_semi")
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    # Output predicate in EXACT integer arithmetic: i/(na+nb-i) >= t
    # ⇔ i*t_den >= t_num*(na+nb-i). Filtering on the 6-dp ROUNDED
    # jaccard would admit pairs with exact J in [t-5e-7, t) that round
    # up — pairs the (lossless-for-J>=t) prefix filter is not
    # guaranteed to generate, i.e. a boundary false negative vs the
    # naive oracle. The rounded value is an output column only.
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .where(
            F.col("i") * F.lit(t_den)
            >= F.lit(t_num) * (F.col("na") + F.col("nb") - F.col("i"))
        )
        .select(
            "a",
            "b",
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6
            ).alias("jaccard"),
        )
    )
