"""Shared text primitives with exact Spark↔DuckDB parity.

Every hash here is derived from md5 hex (both engines produce identical
md5), so candidate generation in the dedup/similarity operators is
bit-identical across engines — the DuckDB oracle then checks the whole
pipeline, not just the final verify step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007  # all integer hash arithmetic happens mod this


def tokens(c: Column) -> Column:
    r"""Lowercased \w+ tokens (reference word rule, seo_extractor.py:33)."""
    return F.regexp_extract_all(F.lower(c), F.lit(r"\w+"), 0)


TOKENS_SQL = "regexp_extract_all(lower({c}), '\\w+')"


def md5int(c: Column) -> Column:
    """First 15 hex chars of md5 as int64 (fits in 2^60; same in DuckDB)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


MD5INT_SQL = "(('0x' || substr(md5({c}), 1, 15))::BIGINT)"


def shingles(tok: Column, n: int = 3) -> Column:
    """n-gram shingles over a token array; [] when fewer than n tokens.
    (sequence() reverses when start>stop — hence the size guard.)"""
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(tok, i + j) for j in range(n)]
    )
    return F.when(F.size(tok) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(tok_col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles`; ``tok_col`` is a column NAME
    (put the token array in a CTE first)."""
    parts = " || ' ' || ".join(f"{tok_col}[i+{j}]" if j else f"{tok_col}[i]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({tok_col}) - {n - 2}, 1)), "
        f"i -> {parts})"
    )


# BPE-ish pre-tokenizer rule (word runs + single non-space punctuation)
# — ONE definition shared by token_counts and mixture_allocation so the
# two can never disagree on what a token is
BPE_RE = r"\w+|[^\w\s]"
BPE_SQL = "regexp_extract_all({c}, '\\w+|[^\\w\\s]')"
