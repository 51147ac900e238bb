"""Text column expressions: tokenization, shingles, fingerprints, MinHash.

All built-in ``pyspark.sql.functions`` (JVM-side): tokenize -> shingle ->
md5-based MinHash. The MinHash family is ``min(md5(seed || token))`` —
md5 output compared lexicographically is a uniform hash family, and the
same expression is computable in ANSI SQL on any engine (the DuckDB
oracle mirrors it verbatim), unlike engine-specific xxhash seeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/punct splitter; ASCII-simple so the Java and
# DuckDB (RE2-ish) regex dialects agree token-for-token — the same
# pattern ``regexp_extract_all`` extracts on the oracle side.
BPE_PATTERN = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]"


def tokens(text: Column, basis: str = "whitespace") -> Column:
    """Tokenize ``text``.

    ``basis="whitespace"`` (default): split on single spaces — the
    corpus basis. ``basis="regex"``: BPE-ish subword units via
    ``regexp_extract_all(BPE_PATTERN)`` — the basis that matches how a
    real training tokenizer fragments text, so dedup/decontamination
    n-grams align with what a model actually sees.
    """
    if basis == "whitespace":
        return F.split(text, " ")
    if basis == "regex":
        return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)
    raise ValueError(f"unknown tokenizer basis: {basis!r}")


def distinct_tokens(text: Column, basis: str = "whitespace") -> Column:
    return F.array_distinct(tokens(text, basis))


def ngrams(text: Column, n: int = 3, basis: str = "whitespace") -> Column:
    """ALL token n-grams in order (duplicates preserved — the basis for
    repetition statistics, where multiplicity is the signal).

    ``transform(sequence(0, len-n), i -> concat_ws(' ', slice(toks, i+1, n)))``
    — pure codegen, no explode until the caller wants one.
    """
    toks = tokens(text, basis)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def shingles(text: Column, n: int = 3, basis: str = "whitespace") -> Column:
    """Distinct token n-gram shingles over the chosen tokenizer basis
    (the set view of :func:`ngrams` — what Jaccard/MinHash consume)."""
    return F.array_distinct(ngrams(text, n, basis))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def minhash_signature(token: Column, n_hashes: int) -> list[Column]:
    """Per-token hash columns; aggregate with ``F.min`` per document to
    obtain the MinHash signature. ``h_s(t) = md5('<s>|' || t)``."""
    return [
        F.md5(F.concat(F.lit(f"{s}|"), token)).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
