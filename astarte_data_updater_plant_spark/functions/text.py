"""Text primitives shared by the text-analysis and dedup operators.

Everything here compiles to Catalyst higher-order functions
(``split`` / ``transform`` / ``filter`` / ``aggregate``) so per-document
work happens inside whole-stage codegen with no shuffle and no Python.
Tokenization is single-space split — the synthetic corpus is
space-joined words — and MUST stay in lockstep with the DuckDB oracle
(``string_split(text, ' ')``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword list for quality scoring / language ID. Order matters for
#: deterministic tie-breaks; keep in sync with oracle SQL literals.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Language marker words (n-gram heuristic in word form). The corpus is
#: synthetic spark-vocabulary text, so scores are mostly 0 — the point
#: is the deterministic argmax machinery, not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "et", "de"),
    "de": ("der", "die", "und", "das"),
    "zh": ("de", "le", "he", "shi"),
}


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def n_tokens(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column) -> Column:
    toks = tokens(col)
    return F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a pre-materialized token array.

    Pass a column REFERENCE to an already-projected token array —
    inlining ``split(...)`` here makes Catalyst re-evaluate the split
    for every element_at inside the lambda (measured 3-4x slowdown).

    ``transform(sequence(1, n-k+1), i -> concat(tok[i..i+k-1]))`` —
    1-indexed to match DuckDB list semantics exactly.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))

    def build(i: Column) -> Column:
        parts = [F.element_at(toks, i + j) for j in range(k)]
        return F.concat_ws(" ", *parts)

    return F.transform(idx, build)


def shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles of a text column (prefer shingles_from_tokens
    over a projected token array in hot paths)."""
    return shingles_from_tokens(tokens(col), k)


def shingle_hashes(col: Column, k: int = 3) -> Column:
    return F.transform(shingles(col, k), lambda s: F.md5(s))


def minhash_expr(token_col: Column, seed: int) -> Column:
    """One MinHash coordinate: min(md5(seed || ':' || token)).

    md5 is the shared deterministic hash family between Spark and the
    DuckDB oracle; lexicographic min over hex digests is a valid
    min-wise hash. Use as an aggregate: F.min(minhash_expr(...)).
    """
    return F.md5(F.concat(F.lit(f"{seed}:"), token_col))
