"""Shared JVM-side expression builders (SURVEY §2B scalar surface).

The single home for column-expression helpers reused across operator
modules, so every operator that tokenizes, shingles, or scores vectors
does it with byte-identical semantics (and therefore one shared DuckDB
oracle encoding).  Everything here is built-in `pyspark.sql.functions`
composition — whole-stage-codegen'd, no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- tokenization canon ------------------------------------------------------

def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens of trimmed, lowercased text — the tokenization
    canon shared by the text-analysis and dedup operators."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def shingle_array(tok_col: str, n: int = 3) -> Column:
    """All n-word shingles of a token-array column (map-side, no
    explode); empty when the document has fewer than ``n`` tokens.

    The short-document guard is load-bearing: without it,
    ``sequence(0, size - n)`` DESCENDS for size < n (Spark defaults to
    step -1 when start > stop) and ``element_at(col, 0)`` throws."""
    parts = ", ".join(f"element_at({tok_col}, i+{j + 1})" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"transform(sequence(0, size({tok_col}) - {n}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE CAST(array() AS array<string>) END")


# -- fingerprint canon -------------------------------------------------------

def norm_text(col: str | Column = "text") -> Column:
    """Normalized text: lowercase, strip everything but [a-z0-9 ], trim.
    SQL twin: trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""))


def fingerprint(col: str | Column = "text") -> Column:
    """md5 of the normalized text — THE dedup fingerprint canon shared
    by dedup_fingerprint, text_fingerprint, pipeline_clean_corpus and
    streaming_corpus_dedup.  Every site must use this helper (not an
    inline copy) so cross-operator dedup equivalence cannot drift."""
    return F.md5(norm_text(col))


# -- vector math over array columns -----------------------------------------

def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns as a left-to-right fold — the
    fold order matches DuckDB's list_sum, so doubles compare bit-exact."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column) -> Column:
    """Squared L2 norm of an array column (same fold-order guarantee)."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine similarity rounded for cross-engine float parity.

    On a ZERO-NORM vector this is 0/0 — Spark (non-ANSI) yields NULL
    while DuckDB's IEEE path yields NaN, and the engines then sort those
    opposite ways.  Use ``guarded_cosine`` for corpora that may contain
    degenerate (all-zero / NULL) embeddings; this unguarded form is for
    paths whose inputs are known non-degenerate (the ann_*/sim_* demo
    corpus) where the extra CASE would be dead weight per comparison."""
    return F.round(dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b))), digits)


def moment_partials(v: Column) -> list:
    """``[n, Σx, Σx²]`` aggregate columns with EXACT decimal
    accumulation — THE moment canon shared by the batch z-score
    operator and the streaming mergeable-stats bridge.  Decimal
    addition is associative, so partials folded across any batching
    reproduce the one-shot sums bit-exactly; every site must use this
    helper (not an inline copy) so the bit-identity contract between
    batch and streaming can never drift."""
    return [F.count("*").alias("n"),
            F.sum(v.cast("decimal(28,6)")).alias("sx"),
            F.sum((v * v).cast("decimal(28,6)")).alias("sxx")]


def moment_stats() -> tuple:
    """``(mean, std)`` Columns over folded ``n/sx/sxx`` partials.
    Variance uses m·m MULTIPLICATION (pow(x,2) may differ from x*x by
    an ulp and break engine parity) and a greatest(...,0) clamp so
    catastrophic cancellation on near-constant groups can never sqrt
    into NaN (NaN compares greater on both engines, defeating a bare
    std>0 guard).  SQL twin:
    sqrt(greatest(sxx/n - (sx/n)*(sx/n), 0))."""
    m = F.col("sx").cast("double") / F.col("n")
    var = F.greatest(F.col("sxx").cast("double") / F.col("n") - m * m,
                     F.lit(0.0))
    return m.alias("mean"), F.sqrt(var).alias("std")


def guarded_cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """``cosine`` with a -2.0 sentinel when either norm is 0: both
    engines agree on degenerate vectors (below any real cosine, so they
    can never win an argmax or pass a similarity threshold).  SQL twin:
    CASE WHEN na > 0 AND nb > 0 THEN round(dot/(sqrt(na)*sqrt(nb)), d)
    ELSE -2.0 END."""
    na, nb = norm2(a), norm2(b)
    return F.when((na > 0) & (nb > 0),
                  F.round(dot(a, b) / (F.sqrt(na) * F.sqrt(nb)), digits)
                  ).otherwise(F.lit(-2.0))
