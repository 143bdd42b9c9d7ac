"""Text-analysis column expressions (north-star operators).

Pure built-in-function expressions (split / higher-order array
functions / regexp) so the hot path stays JVM-side and codegen'd —
no Python UDFs. Tokenization is single-space split, chosen because it
is bit-identical across Spark and the DuckDB oracle (`string_split`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword list; mirrored verbatim in oracle SQL.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split, empty strings preserved —
    identical semantics to DuckDB string_split)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, n: int) -> Column:
    """Distinct word n-grams as space-joined strings.

    Built as ``arrays_zip`` of n shifted ``slice``s so the lambda only
    reads the zipped element. The naive form — ``transform(sequence(...),
    i -> concat_ws(element_at(toks, i), ...))`` — re-evaluates the
    ``toks`` expression (a ``split``) on every ``element_at`` call,
    because higher-order-function lambdas are interpreted without
    common-subexpression elimination: O(tokens²) per document, measured
    at ~40 ms/doc vs <1 ms for this shape.

    ``greatest(..., 0)`` guards short documents (slice length must be
    non-negative), which then yield an empty shingle array.
    """
    return F.array_distinct(word_shingles_all(toks, n))


def hashed_word_shingles(toks: Column, n: int) -> Column:
    """Distinct word n-grams as xxhash64 LONGS, hashed straight from
    the token tuple — no concatenated shingle string is ever
    materialized.

    Value contract vs ``xxhash64(word_shingles(...))``: tokens are
    space-free (single-space split), so the n-tuple and the
    space-joined string are bijective — grouping/joining on this hash
    is equivalent to grouping on the string shingle up to 64-bit hash
    collisions, the same caveat the string-hash form already carries.
    Multi-argument ``xxhash64`` chains the running hash as the seed of
    the next field, so ("ab","c") and ("a","bc") do NOT collide the
    way raw byte concatenation would.

    Why it exists (r10 floor work on dd_containment_capped): the
    shingle SCAN — explode + hash of every n-gram — dominated the
    entry's wall-clock, and building per-doc arrays of ~n_tokens
    strings just to hash them measured 2× slower than hashing the
    zipped token slices directly (0.72 s vs 1.45 s for the sf0.1
    corpus pass). Use this wherever the shingle's only job is to be a
    join/dedup key; keep ``word_shingles`` where the string itself is
    needed (decontamination reports, winnowing output)."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, length) for j in range(n)])
    return F.array_distinct(
        F.transform(
            zipped, lambda s: F.xxhash64(*[s[str(j)] for j in range(n)])
        )
    )


def word_shingles_all(toks: Column, n: int) -> Column:
    """ALL positional word n-grams, duplicates preserved.

    Use this where position matters (content-defined chunking counts a
    boundary at every qualifying shingle occurrence); ``word_shingles``
    dedups, which is correct for set semantics (Jaccard, MinHash,
    decontamination) but silently drops repeated n-grams.
    """
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, length) for j in range(n)])
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
    )


def stopword_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks).cast("double")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric-or-space."""
    stripped = F.regexp_replace(text, "[a-zA-Z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(text).cast("double")


def doc_fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercased text with all
    non-[a-z0-9] removed. Deterministic and engine-portable (md5 is
    identical in Spark and DuckDB)."""
    return F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))


def token_run_counts(s: Column) -> Column:
    """Per-document (token, count) pairs as array<struct<tok,n>> —
    run-length encoding of an ALREADY-SORTED, ALREADY-MATERIALIZED
    token array.

    CONTRACT: ``s`` must be an attribute reference to a column that a
    *prior* projection computed (``.select(array_sort(tokens(...))
    .alias("s"))``), not an inline expression. HOF lambdas are
    interpreted without common-subexpression elimination, so an inline
    ``array_sort(split(...))`` here is re-evaluated on every
    ``element_at`` call — O(n²·log n) per document (measured 4×
    slower than the corpus-level shuffle it was meant to remove).
    Against a materialized array the lookups are O(1) and the whole
    encoding is O(n) after the sort.
    """
    n = F.size(s)
    ends = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == n) | (F.element_at(s, i) != F.element_at(s, i + 1)),
    )
    prev = F.concat(
        F.array(F.lit(0)),
        F.slice(ends, 1, F.greatest(F.size(ends) - 1, F.lit(0))),
    )
    return F.when(n == 0, F.array()).otherwise(
        F.zip_with(
            ends,
            prev,
            lambda e, p: F.struct(
                F.element_at(s, e).alias("tok"), (e - p).alias("n")
            ),
        )
    )
