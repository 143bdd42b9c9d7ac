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

    Guarded so short documents yield an empty array (Spark's
    ``sequence(1, 0)`` would otherwise produce a *descending* range).
    """
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


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
