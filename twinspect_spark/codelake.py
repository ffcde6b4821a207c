"""Code-lake gating operators: per-file quality flags, license
classification, secret scrubbing, and import-dependency profiling.

These are the file-level gates a source-code pretraining pipeline runs
between snapshot isolation (queries.q_commit_latest_snapshot) and dedup
(pipeline.run_dedup): drop vendored/generated/minified files, classify
the license a file ships under, strip credentials, and take the
dependency census that decides which ecosystems the corpus covers.
Public precedents for the filter family: The Stack / StarCoder data
pipeline line-statistic gates (max/avg line length, alphanumeric
fraction), SPDX license identifiers, and detect-secrets-style
credential regexes. Reference analog: twinspect's per-file filter
predicates (/root/reference/twinspect/datasets/download.py min-size /
extension gates) — the same pure-function-of-the-row shape, widened to
the gates a code corpus actually needs.

Scale shape: every operator here is a pure column projection or a
regexp chain — whole-stage codegen, zero shuffles, zero UDFs. At
10^12 files these run fused into the ingest scan; nothing in this
module adds an exchange. All regex syntax is restricted to the
Java-regex ∩ RE2 common subset (character classes, bounded repetition,
word boundaries, (?i) flags — no lookaround, no backrefs) so every
operator replays verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# generic progressive-redaction scrub (shared by PII and secret scans)
# ---------------------------------------------------------------------------


def scrub_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: tuple[tuple[str, str, str], ...],
) -> DataFrame:
    """Per-row match counts + sha256 of the fully redacted text for an
    ordered ``(name, regex, replacement)`` pattern table.

    Counting happens on the PROGRESSIVELY redacted text so one span is
    never double-counted by two patterns (training.pii_scrub's
    contract, generalized). Pure regexp_count / regexp_replace chain —
    whole-stage codegen, no Python on the data path.
    """
    red = F.col(text_col)
    cols: list[Column] = [F.col(id_col)]
    for name, pat, token in patterns:
        cols.append(
            F.regexp_count(red, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        red = F.regexp_replace(red, F.lit(pat), F.lit(token))
    cols.append(F.sha2(red, 256).alias("redacted_sha256"))
    return df.select(*cols)


# Credential patterns a code lake scrubs before export (detect-secrets /
# trufflehog regex family, public). Order is fixed and load-bearing only
# in that earlier redactions can never create later matches (disjoint
# charsets/prefixes; the ghp_ token's 36-char tail cannot contain a
# 40-char hex run because 'g'/'p'/'_' break it).
SECRET_PATTERNS = (
    ("aws_key", r"AKIA[0-9A-Z]{16}", "<AWSKEY>"),
    ("gh_token", r"ghp_[A-Za-z0-9]{36}", "<GHTOKEN>"),
    ("pem_block", r"-----BEGIN [A-Z ]*PRIVATE KEY-----", "<PEMKEY>"),
    ("hex40", r"\b[0-9a-f]{40}\b", "<HEX40>"),
)


def secret_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Credential scan + redaction fingerprint (code-lake sibling of
    training.pii_scrub)."""
    return scrub_stats(df, id_col, text_col, SECRET_PATTERNS)


# ---------------------------------------------------------------------------
# quality flags (The Stack / StarCoder line-statistic gate family)
# ---------------------------------------------------------------------------

# Thresholds are the published StarCoder gates scaled to this corpus's
# document lengths (the published values are 1000/100/0.25 on real
# source files; the synthetic docs are shorter so the scaled analogs
# keep both branches of every predicate exercised at sf0.01).
MAX_LINE_LEN = 200
AVG_LINE_LEN = 120
MIN_ALNUM_FRAC = 0.5

GENERATED_MARKER = r"(?i)auto-generated|do not edit|@generated"
VENDORED_PREFIX = r"^(vendor|node_modules|third_party)/"


def code_quality_flags(
    df: DataFrame, id_col: str, path_col: str, content_col: str
) -> DataFrame:
    """Per-file keep/drop gate from line statistics + path + marker
    heuristics.

    Emits the raw statistics (auditable) and the individual flags, not
    just the verdict — a pipeline owner re-tunes thresholds from the
    stats table without rescanning content. avg_line_len is computed
    arithmetically from (total length, newline count) rather than a
    per-line list aggregate: same value, no array materialization.
    """
    c = F.col(content_col)
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("long")
    max_line = F.array_max(F.transform(lines, F.length)).cast("long")
    total = F.length(c).cast("long")
    avg_line = (total - n_lines + F.lit(1)) / n_lines
    alnum = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", "")).cast("long")
    alnum_frac = alnum / total
    f_long = (max_line > MAX_LINE_LEN) | (avg_line > AVG_LINE_LEN)
    f_alnum = alnum_frac < MIN_ALNUM_FRAC
    f_gen = c.rlike(GENERATED_MARKER)
    f_vend = F.col(path_col).rlike(VENDORED_PREFIX)
    return df.select(
        F.col(id_col),
        F.col(path_col),
        n_lines.alias("n_lines"),
        max_line.alias("max_line_len"),
        F.round(avg_line, 6).alias("avg_line_len"),
        F.round(alnum_frac, 6).alias("alnum_frac"),
        f_long.alias("flag_long_lines"),
        f_alnum.alias("flag_low_alnum"),
        f_gen.alias("flag_generated"),
        f_vend.alias("flag_vendored"),
        (~(f_long | f_alnum | f_gen | f_vend)).alias("keep"),
    )


# Full-line comment starters across the hash/slash/star/dash families
# (Python/shell, C/JS, block-comment bodies, SQL/Lua). Line-granular by
# design: inline trailing comments need a language-aware lexer, and the
# gate's published form (StarCoder comment-to-code ratio) is line-based.
COMMENT_LINE_RE = r"^[ \t]*(#|//|/\*|\*|--)"
MAX_COMMENT_FRAC = 0.8  # mostly-comment files: license stubs, generated docs
MIN_COMMENT_FRAC = 0.01  # comment-free big files: minified/generated signal
NO_COMMENT_MIN_LINES = 8


def comment_stats(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """Comment-to-code ratio gate (StarCoder data-pipeline family):
    per-file full-comment-line count, line fraction, and character
    fraction, plus flags — ``flag_high_comment`` (> MAX_COMMENT_FRAC of
    lines are comments: license stubs / generated API docs; the keep
    verdict drops these) and ``flag_no_comment`` (big file with
    < MIN_COMMENT_FRAC comment lines — a minification/generation
    signal, informational only).

    Pure higher-order column expressions (split → filter(rlike) →
    size/aggregate): no explode, no shuffle, no UDF — fuses into the
    ingest scan like the rest of the gate family.
    """
    c = F.col(content_col)
    lines = F.split(c, "\n")
    cl = F.filter(lines, lambda x: x.rlike(COMMENT_LINE_RE))
    n_lines = F.size(lines).cast("long")
    n_comment = F.size(cl).cast("long")
    total = F.length(c).cast("long")
    cchars = F.aggregate(
        cl, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
    )
    frac = n_comment / n_lines
    f_high = frac > MAX_COMMENT_FRAC
    f_none = (n_lines >= NO_COMMENT_MIN_LINES) & (frac < MIN_COMMENT_FRAC)
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_comment.alias("n_comment_lines"),
        F.round(frac, 6).alias("comment_line_frac"),
        F.round(cchars / total, 6).alias("comment_char_frac"),
        f_high.alias("flag_high_comment"),
        f_none.alias("flag_no_comment"),
        (~f_high).alias("keep"),
    )


# ---------------------------------------------------------------------------
# license classification (SPDX tag first, phrase heuristics second)
# ---------------------------------------------------------------------------

SPDX_RE = r"SPDX-License-Identifier: ([A-Za-z0-9.+-]+)"

# (license id, detection regex) in precedence order; first match wins.
# Phrase signatures are the canonical first lines of each license text
# (public SPDX corpus).
LICENSE_PHRASES = (
    ("MIT", r"Permission is hereby granted, free of charge"),
    ("Apache-2.0", r"Licensed under the Apache License"),
    ("GPL-3.0", r"GNU General Public License"),
    ("Proprietary", r"(?i)all rights reserved"),
)

PERMISSIVE = ("MIT", "Apache-2.0", "BSD-3-Clause", "ISC", "Unlicense")


def license_detect(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """Per-file license classification: an explicit SPDX tag wins, then
    license-text phrase signatures in precedence order, else unknown.
    Emits the detection channel (spdx/phrase/none) so a compliance
    audit can weight tag-backed rows above heuristic ones, and a
    ``permissive`` verdict against a fixed allowlist — the gate a
    permissively-licensed-only training corpus filters on.
    """
    c = F.col(content_col)
    spdx = F.regexp_extract(c, SPDX_RE, 1)
    lic = F.when(spdx != "", spdx)
    for name, pat in LICENSE_PHRASES:
        lic = lic.when(c.rlike(pat), F.lit(name))
    lic = lic.otherwise(F.lit("Unknown"))
    via = (
        F.when(spdx != "", F.lit("spdx"))
        .when(lic != "Unknown", F.lit("phrase"))
        .otherwise(F.lit("none"))
    )
    return df.select(
        F.col(id_col),
        lic.alias("license"),
        via.alias("via"),
        lic.isin(*PERMISSIVE).alias("permissive"),
    )


def curation_gate(
    content: Column,
    min_words: int | None = None,
    max_dup_bigram: float | None = None,
) -> Column:
    """Boolean keep-predicate for the pre-dedup curation gates the
    entrypoint exposes (--min-words / --max-dup-bigram): length floor
    and within-document bigram-repetition ceiling — the same natural
    gates queries.q_curated_export_stats pins under the oracle. Pure
    column expressions; with no thresholds set it is literally TRUE
    and Catalyst folds it away."""
    words = F.split(F.trim(content), r"\s+")
    cond = F.lit(True)
    if min_words is not None:
        cond = cond & (F.size(words) >= min_words)
    if max_dup_bigram is not None:
        cnt = F.size(words) - 1
        idx = F.when(cnt > 0, F.sequence(F.lit(1), cnt)).otherwise(
            F.array().cast("array<int>")
        )
        grams = F.transform(
            idx, lambda i: F.array_join(F.slice(words, i, 2), " ")
        )
        dupbi = F.when(
            F.size(grams) > 0,
            1.0 - F.size(F.array_distinct(grams)) / F.size(grams),
        ).otherwise(F.lit(0.0))
        cond = cond & (dupbi <= max_dup_bigram)
    return cond


# ---------------------------------------------------------------------------
# function-span extraction + function-granular dedup census
# ---------------------------------------------------------------------------

# Function-head starters across the def/function/func families, anchored
# to line starts via the preceding newline (callers \n-prefix the content
# so a head at offset 0 is matched too). Alternation order is leftmost-
# preferred in both Java regex and RE2, so 'function ' wins over 'func '
# at the same position in both engines.
FUNC_HEAD_RE = "\n(def |function |func )"
_SPAN_SENTINEL = ""


def function_spans(
    df: DataFrame, id_col: str, content_col: str
) -> DataFrame:
    """(id, fn_idx, span): syntax-aligned function spans — the text from
    each function head to the next head (or EOF). fn_idx 0 is the file
    preamble (imports/constants before the first function); census
    consumers filter it out.

    File-level dedup misses the dominant unit of code reuse — the
    copied FUNCTION inside an otherwise-novel file (utility snippets,
    StackOverflow idioms) — and fixed-width chunking splits functions
    mid-body; this operator aligns the dedup unit to syntax with one
    regexp pass + one split (sentinel-insert then split, because the
    Java-regex ∩ RE2 subset the oracle replays has no lookahead).
    Whole-stage codegen; the explode is the only row amplification.
    """
    c = F.concat(F.lit("\n"), F.col(content_col))
    marked = F.regexp_replace(
        c, FUNC_HEAD_RE, _SPAN_SENTINEL + "\n$1"
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(marked, _SPAN_SENTINEL)).alias(
            "fn_idx", "span"
        ),
    )


def function_dup_census(spans: DataFrame, id_col: str) -> DataFrame:
    """Duplicated-function table over function_spans output: spans
    (fn_idx >= 1, i.e. real functions) that appear byte-identical more
    than once, with occurrence/document counts and a canonical first
    location. One map-side-combinable groupBy on the span hash — the
    chunk_dup_spans shape, aligned to function boundaries.
    """
    fns = spans.where(F.col("fn_idx") >= 1)
    return (
        fns.groupBy(F.sha2("span", 256).alias("fn_hash"))
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.min(id_col).alias("first_doc"),
            F.min(F.length("span")).cast("long").alias("span_chars"),
        )
        .where(F.col("n_occurrences") > 1)
    )


# ---------------------------------------------------------------------------
# import-dependency census
# ---------------------------------------------------------------------------

IMPORT_RE = r"import ([a-z_][a-z0-9_]*)"


def import_deps(
    df: DataFrame, repo_col: str, id_col: str, content_col: str
) -> DataFrame:
    """Exploded (repo, file, dependency) edge list from import
    statements — one row per DISTINCT dependency per file (a file
    importing a module twice is one edge; array_distinct runs before
    the explode so the generator never amplifies duplicates).
    """
    deps = F.array_distinct(
        F.regexp_extract_all(F.col(content_col), F.lit(IMPORT_RE), 1)
    )
    return df.select(
        F.col(repo_col).alias("repo"),
        F.col(id_col),
        F.explode(deps).alias("dep"),
    )


def dep_profile(edges: DataFrame) -> DataFrame:
    """Dependency census over the edge list: per-dependency file count,
    repo fan-in, and a deterministic popularity rank. One map-side-
    combinable aggregation on ``dep`` (count + count-distinct repo over
    a bounded repo set) and a window over the ~|vocabulary| rollup —
    the per-file relation is never sorted.
    """
    from pyspark.sql import Window

    roll = edges.groupBy("dep").agg(
        F.count("*").cast("long").alias("n_files"),
        F.countDistinct("repo").cast("long").alias("n_repos"),
    )
    w = Window.orderBy(F.desc("n_files"), F.asc("dep"))
    return roll.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def dep_cooccurrence(
    edges: DataFrame, id_col: str, min_sup_pct: int
) -> DataFrame:
    """Frequent dependency PAIRS (market-basket census over import
    statements): which modules are imported together, with exact
    support and integer-ppm lift. The co-occurrence signal feeds
    ecosystem clustering and "files importing X usually import Y"
    curation rules.

    Apriori pruning keeps the pair join safe at scale: a pair can only
    reach ``min_sup`` if BOTH members do, so edges are semi-joined to
    frequent modules (vocabulary-sized, broadcast) BEFORE the per-file
    self-join — a hub file importing thousands of rare modules
    contributes no quadratic work. The self-join is per-file
    (equi-join on the id), support a map-side-combinable pair count.
    Lift stays exact: ``(support * n_files * 1e6) div (c1 * c2)``
    BIGINT arithmetic, floats never enter. Exactness bound: the
    numerator is exact while support * n_files < 2^63 / 1e6 ≈ 9.2e12
    (support ≤ n_files, so any lake under ~3M distinct files is safe
    unconditionally; larger lakes are safe while the product holds).
    Beyond it the BIGINT product wraps silently under Spark's
    non-ANSI mode — for such lakes compute lift on a stratified file
    sample or drop to DECIMAL(38,0) (one-line change, ~2× slower
    aggregate), rather than reordering into staged division, which
    changes low-order digits and breaks the cross-engine oracle
    contract. The corpus size and the
    derived support floor are IN-PLAN one-row aggregates broadcast into
    the filters — no driver-side action gates the plan (the round-1
    ``gt.count()`` lesson)."""
    tot = edges.agg(
        F.countDistinct(id_col).cast("long").alias("n_files")
    ).withColumn(
        "min_sup", F.expr(f"({min_sup_pct} * n_files) div 100")
    )
    counts = edges.groupBy("dep").agg(F.count("*").cast("long").alias("c"))
    freq = counts.crossJoin(F.broadcast(tot)).where(
        F.col("c") >= F.col("min_sup")
    )
    pruned = edges.join(
        F.broadcast(freq.select("dep")), "dep", "left_semi"
    )
    pairs = (
        pruned.alias("x")
        .join(pruned.alias("y"), id_col)
        .where(F.col("x.dep") < F.col("y.dep"))
        .groupBy(
            F.col("x.dep").alias("m1"), F.col("y.dep").alias("m2")
        )
        .agg(F.count("*").cast("long").alias("support"))
    )
    c1 = freq.select(
        F.col("dep").alias("m1"),
        F.col("c").alias("n_m1"),
        "n_files",
        "min_sup",
    )
    c2 = freq.select(F.col("dep").alias("m2"), F.col("c").alias("n_m2"))
    return (
        pairs.join(F.broadcast(c1), "m1")
        .join(F.broadcast(c2), "m2")
        .where(F.col("support") >= F.col("min_sup"))
        .select(
            "m1",
            "m2",
            "support",
            "n_m1",
            "n_m2",
            F.expr("(support * n_files * 1000000) div (n_m1 * n_m2)")
            .cast("long")
            .alias("lift_ppm"),
        )
    )
