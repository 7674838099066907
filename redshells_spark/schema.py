"""Schema validation + deterministic pseudo-random helpers.

The reference validates schemas dynamically at load time
(``load_data_frame(required_columns={...})``, e.g.
reference ``app/word_item_similarity/make_click_train_data.py:30``).
Here: a cheap column-set assertion (``require_columns``) that runs on
the driver against DataFrame metadata only — no job is triggered.

Determinism: the reference shuffles with unseeded RNG in several spots
(``data/data_frame_utils.py:180``, ``train/train_word2vec.py:26``).
We replace RNG-order semantics with a *portable* multiplicative hash
(`Knuth's 2654435761 <https://en.wikipedia.org/wiki/Hash_function>`_)
expressible identically in Spark and ANSI SQL, so sampling/shuffle
operators stay oracle-checkable and reproducible across engines and
cluster sizes (no partition-order dependence).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 2**32


class MissingColumnsError(ValueError):
    pass


def require_columns(df: DataFrame, required: Iterable[str]) -> DataFrame:
    """Assert ``required`` ⊆ df.columns; returns df for chaining."""
    missing = set(required) - set(df.columns)
    if missing:
        raise MissingColumnsError(
            f"missing required columns {sorted(missing)}; have {df.columns}"
        )
    return df


def portable_hash(col: Column | str, seed: int = 0) -> Column:
    """Deterministic pseudo-random long in [0, 2^32) from an integer column.

    ``(col * 2654435761 + seed) mod 2^32`` — identical arithmetic in
    Spark and DuckDB (both use 64-bit ints; product of two < 2^32
    values fits in 63 bits, no overflow). Used as a portable stand-in
    for ``F.rand(seed)`` wherever the reference shuffles/samples, so
    results are engine- and partitioning-independent.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("long") * F.lit(KNUTH) + F.lit(seed)) % F.lit(MOD)


def portable_hash_sql(expr: str, seed: int = 0) -> str:
    """ANSI-SQL rendering of :func:`portable_hash` for DuckDB oracles."""
    return f"(CAST({expr} AS BIGINT) * {KNUTH} + {seed}) % {MOD}"


def portable_hash_str(col: Column | str, seed: int = 0) -> Column:
    """Portable deterministic hash for any column rendered as a string.

    ``md5(concat(cast(col as string), seed))`` — md5 over UTF-8 bytes
    is identical in Spark and DuckDB, so hex-string ordering matches
    across engines. Engine-internal uses (bucketing, salting) should
    prefer ``F.xxhash64`` (cheaper, JVM-side, no oracle required).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(c.cast("string"), F.lit(str(seed))))


def portable_hash_str_sql(expr: str, seed: int = 0) -> str:
    """DuckDB rendering of :func:`portable_hash_str`."""
    return f"md5(CAST({expr} AS VARCHAR) || '{seed}')"
