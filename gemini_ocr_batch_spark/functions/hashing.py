"""Engine-portable deterministic hashing.

Dedup/LSH operators need hashes that an independent oracle (DuckDB) can
reproduce exactly, so everything routes through md5 hex strings:

- ``h_hex(col)``      — md5 hex digest (identical in any engine).
- ``h60(col)``        — first 15 hex chars as a non-negative 60-bit bigint.
  Spark:  cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
  DuckDB: cast(('0x' || substr(md5(x), 1, 15)) as bigint)
- lexicographic MIN over md5 hex strings is a valid min-hash (a uniform
  permutation of the shingle space), portable with zero numeric edge cases.

Spark's native xxhash64/hash are faster but engine-private; they are used
only where no oracle must match (e.g. salting in operators/extract.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h_hex(col: Column | str) -> Column:
    return F.md5(F.col(col) if isinstance(col, str) else col)


def h60(col: Column | str) -> Column:
    return F.conv(F.substring(h_hex(col), 1, 15), 16, 10).cast("bigint")


def h60_sql_duckdb(expr: str) -> str:
    """The DuckDB-side twin of ``h60`` for oracle queries."""
    return f"cast(('0x' || substr(md5({expr}), 1, 15)) as bigint)"


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization, shared definition for all text operators.

    DuckDB twin: ``regexp_split_to_array(trim(lower(x)), '\\s+')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def shingles(token_col: Column, n: int) -> Column:
    """Word n-gram shingles from a token array (order-preserving).

    DuckDB twin: join against generate_series(1, len(tokens)-n+1) and
    array_to_string(tokens[i : i+n-1], ' ').

    Built as n-1 chained ``zip_with``s against shifted copies of the
    array, NOT as ``transform(sequence(1, len), i -> slice(tokens, i, n))``:
    an outer expression captured inside a higher-order-function lambda is
    RE-EVALUATED per element (the token split ran once per position —
    O(len²) per document; measured 28 s for a single 16k-token page,
    0.3 s with this construction). ``zip_with``'s array operands are
    evaluated once. The zip extends the shorter (shifted) side with
    nulls, which ``concat_ws`` skips — the final slice trims those
    partial tail grams.

    NULL token arrays (NULL text upstream) yield an EMPTY shingle array,
    not NULL — matching the short-input case and every DuckDB oracle
    (whose generate_series joins simply produce zero gram rows), so a
    null-text row never propagates NULL through gram counts or minhash
    signatures.
    """
    size = F.size(token_col)
    acc = token_col
    for k in range(1, n):
        shifted = F.slice(
            token_col, k + 1, F.greatest(size - k, F.lit(0))
        )
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.coalesce(
        F.slice(acc, 1, F.greatest(size - (n - 1), F.lit(0))),
        F.array().cast("array<string>"),
    )
