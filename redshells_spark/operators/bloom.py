"""Portable Bloom-filter runtime semi-join.

At 100 TB the dominant cost of a selective join is scanning and
shuffling the big fact side; engines (Spark's own runtime filters,
Trino's dynamic filtering) fix this by building a Bloom filter over the
small side's join keys and pushing the membership test into the fact
scan so non-matching rows die before the exchange. Spark's built-in
runtime filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`) uses
an engine-private hash, so results of an *explicit* bloom pre-filter
would not be reproducible elsewhere. This module instead builds the
filter from **portable arithmetic** — md5 (identical bytes in every
engine) folded to a 60-bit int, then Kirsch-Mitzenmacher double hashing
``g_j = (h%P * A_j + B_j) % P % m`` with published constants — so an
independent engine (the DuckDB oracle) reconstructs the *identical*
bitmap and the *identical* false-positive set. Determinism is what
makes an approximate operator testable.

Shape at scale:

- build: one distributed ``groupBy(word).agg(bit_or(mask))`` over the
  small side's keys — the only shuffle, over at most ``num_words``
  groups;
- the bitmap (``num_words`` int64 words, e.g. 256 words = 2 KB for
  8 Kbit) is collected and inlined as a literal array — exactly how a
  real runtime filter ships to scan tasks, and the collect is bounded
  by construction, not by data;
- probe: a pure codegen conjunction of ``k`` bit tests against the
  literal array — the fact side is never shuffled, never joined; rows
  are dropped inside the scan stage.

False positives are inherent (tune ``num_words`` per expected key
count: m/n = 8 bits/key with k=3 gives ~3% FP); false negatives are
impossible, which the tests pin. Reference parity: the reference has no
bloom operator — this belongs to the beyond-reference scale tier, like
`similarity/ann.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1, same modulus as dedup/minhash.py
WORD_BITS = 32  # bitmaps live in int64 words but only the low 32 bits
# are used, so ``1 << bit`` never touches the sign bit in either engine


def _hash_consts(num_hashes: int) -> list[tuple[int, int]]:
    """(A_j, B_j) for the double-hash family — same scheme as
    dedup/minhash.py:_perm_params so the constants are already
    exercised for portability."""
    return [((j * 2654435761 + 1) % P, (j * 40503 + 17) % P) for j in range(num_hashes)]


def _h60_sql(key_sql: str) -> str:
    """Engine-portable 60-bit hash of a key rendered as a string:
    first 15 hex digits of md5, as an int64 (cf. dedup/simhash.py)."""
    return f"cast(conv(substring(md5(cast({key_sql} as string)), 1, 15), 16, 10) as bigint)"


def _base_h_sql(key_sql: str, numeric: bool) -> str:
    """Base hash reduced mod P. Numeric keys skip md5 entirely: the
    Kirsch-Mitzenmacher multipliers (A_j ~ Knuth's 2654435761) do the
    mixing, and the whole probe stays integer codegen — md5-per-row was
    the entire probe cost (~6 digest evaluations per row, one per
    word/bit index of each of k probes). String keys keep the md5 fold.
    Both variants are reproduced verbatim by the DuckDB oracle."""
    if numeric:
        return f"(cast({key_sql} as bigint) % {P})"
    return f"({_h60_sql(key_sql)} % {P})"


def _bitpos_sql(key_sql: str, a: int, b: int, num_bits: int, numeric: bool) -> str:
    # base hash < P and A < P, so the product stays inside int64
    return f"(({_base_h_sql(key_sql, numeric)} * {a} + {b}) % {P}) % {num_bits}"


_INT_DTYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long"}


@dataclass(frozen=True)
class BloomFilter:
    words: tuple[int, ...]  # dense bitmap, words[i] holds bits [32i, 32i+32)
    num_hashes: int
    numeric_key: bool  # build-side key kind; probe keys must match it

    @property
    def num_bits(self) -> int:
        return len(self.words) * WORD_BITS


def build_bloom(
    keys: DataFrame,
    key_column: str,
    num_words: int = 256,
    num_hashes: int = 3,
) -> BloomFilter:
    """Build the bitmap distributed, then collect the (bounded,
    ``num_words``-row) dense word table to the driver.

    The build is ONE aggregation: explode each key into its k bit
    positions (a k-element literal array — no join against a params
    table), then ``groupBy(word).agg(bit_or(mask))``. Map-side partial
    bit_or means the shuffle carries at most ``num_words`` rows per
    input partition regardless of key count.
    """
    num_bits = num_words * WORD_BITS
    numeric = dict(keys.dtypes)[key_column] in _INT_DTYPES
    pos_cols = [
        F.expr(_bitpos_sql(f"`{key_column}`", a, b, num_bits, numeric))
        for a, b in _hash_consts(num_hashes)
    ]
    # pyspark's F.shiftleft only takes a literal shift amount, so the
    # per-row shift goes through a SQL expr (still codegen'd JVM-side)
    sparse = (
        keys.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .select(
            F.expr(f"pos div {WORD_BITS}").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {WORD_BITS} as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * num_words
    for row in sparse:
        dense[row["word"]] = row["bits"]
    return BloomFilter(words=tuple(dense), num_hashes=num_hashes, numeric_key=numeric)


def bloom_contains(bloom: BloomFilter, key_column: str) -> Column:
    """Membership test as a pure-codegen conjunction of k bit probes
    against the literal word array. No shuffle, no join, no Python.

    The probe key's dtype kind must match the build side's
    (``bloom.numeric_key``) — a numeric build probed with strings would
    silently hash differently."""
    arr_sql = "array(" + ", ".join(f"cast({w} as bigint)" for w in bloom.words) + ")"
    conds = None
    for a, b in _hash_consts(bloom.num_hashes):
        pos = _bitpos_sql(f"`{key_column}`", a, b, bloom.num_bits, bloom.numeric_key)
        term = F.expr(
            f"(element_at({arr_sql}, cast(({pos}) div {WORD_BITS} as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({pos}) % {WORD_BITS} as int))) != 0"
        )
        conds = term if conds is None else conds & term
    return conds


def bloom_semi_join(
    big: DataFrame,
    small_keys: DataFrame,
    big_key: str,
    small_key: str,
    num_words: int = 256,
    num_hashes: int = 3,
    exact: bool = False,
) -> DataFrame:
    """Filter ``big`` to rows whose key is (probably) in ``small_keys``.

    With ``exact=False`` this is the raw runtime-filter output —
    deterministic superset of the true semi-join (false positives only).
    With ``exact=True`` the bloom pass is followed by a broadcast
    semi-join that removes the false positives: the bloom still does its
    job (the scan emits ~FP-rate extra rows instead of everything), and
    the exact join only sees the survivors.
    """
    bloom = build_bloom(small_keys.select(small_key).dropDuplicates(), small_key, num_words, num_hashes)
    if (dict(big.dtypes)[big_key] in _INT_DTYPES) != bloom.numeric_key:
        raise ValueError(
            f"bloom_semi_join: key dtype kind mismatch — build side "
            f"numeric={bloom.numeric_key}, probe column {big_key!r} is "
            f"{dict(big.dtypes)[big_key]}; hashes would disagree silently"
        )
    passed = big.filter(bloom_contains(bloom, big_key))
    if not exact:
        return passed
    return passed.join(
        F.broadcast(small_keys.select(F.col(small_key).alias(big_key)).dropDuplicates()),
        on=big_key,
        how="left_semi",
    )
