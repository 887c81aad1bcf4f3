"""Bloom-filter join pruning — cut the big side of a selective join BEFORE
its shuffle.

The reference joins child tables to ``shifts`` by FK after filtering
(`/root/reference/etl/app/shift_data_processor.py` joins are all
FK→filtered-PK shapes); at 100 TB the expensive part of that shape is
shuffling the big fact side when only a small fraction of its keys
survive. Spark's own runtime row-group filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) fires only for some
shapes; this operator makes the pattern explicit and controllable.

Mechanics (all JVM-side, zero Python in the row path):

1. **Build** — one distributed pass over the small side's keys: each key
   sets ``num_hashes`` bit positions (``pmod(xxhash64(key, i), num_bits)``);
   positions fold into (word, mask) pairs and ``bit_or`` aggregates them
   per 64-bit word (map-side combinable, shuffle ≤ #words·#partitions).
   The ≤ num_bits/8-byte bitset is collected to the driver.
2. **Prune** — the bitset is embedded in the plan as an array<long>
   literal (the same ship-with-the-plan mechanism Spark's injected runtime
   bloom uses); each big-side row tests its ``num_hashes`` bits with
   element_at + bitwiseAND. The filter sits directly above the scan, so
   everything downstream (shuffle, join) sees only surviving rows.
3. **No false negatives** — a bloom filter can pass strangers but never
   drops a true key, so following the prune with an exact join/semi-join
   returns exactly the unpruned result; the prune only shrinks the shuffle.

Sizing: ~10 bits per distinct key at num_hashes=5 gives ≲1% false
positives. The bitset travels inside the serialized plan, so keep it ≤ a
few MB; for dimension sides beyond ~10M distinct keys prefer a plain
broadcast semi-join or Spark's built-in runtime filter.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class BloomFilter:
    """Driver-side bitset: ``words[i]`` holds bits [64i, 64i+64)."""

    words: tuple[int, ...]
    num_bits: int
    num_hashes: int


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # hash the STRING form: xxhash64 is type-sensitive (int 7 and bigint 7
    # hash differently), and a build/test type mismatch would create false
    # negatives — the one failure mode that breaks bloom_semi_join's
    # exactness. String form makes equal values hash equal across widths.
    k = key.cast("string")
    return [
        F.pmod(F.xxhash64(k, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    small: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> BloomFilter:
    """One distributed pass over ``small[key_col]`` → driver-side bitset.

    Eager (runs a job): explode the k bit positions per key, fold each into
    (word_index, single-bit mask), ``bit_or`` per word. The shuffle after
    map-side combine is at most num_bits/64 rows per input partition.
    """
    assert num_bits % 64 == 0
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    rows = (
        small.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.shiftrightunsigned("pos", 6).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("pos", F.lit(64))
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    return BloomFilter(tuple(words), num_bits, num_hashes)


def might_contain(bf: BloomFilter, key: Column) -> Column:
    """JVM-side membership test: AND over the k bit probes. NULL keys test
    a fixed position (xxhash64 skips NULL input) — harmless for join
    pruning since NULL never equi-joins anyway."""
    arr = F.lit(list(bf.words))
    tests = []
    for pos in _positions(key, bf.num_bits, bf.num_hashes):
        word = F.element_at(arr, F.shiftrightunsigned(pos, 6).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64))
        )
        tests.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, tests)


def bloom_prune(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``big`` to rows whose ``key`` might appear in
    ``small[small_key]``. Superset of the true matches (bounded false
    positives, zero false negatives)."""
    bf = build_bloom(small, small_key or key, num_bits, num_hashes)
    return big.where(might_contain(bf, F.col(key)))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT left-semi join, executed as bloom prune → semi join: identical
    rows to ``big.join(small, key, "left_semi")``, but the semi-join's
    big-side shuffle only carries rows that passed the bitset (at 1%
    selectivity that is a ~100× smaller exchange). The exact join's
    strategy is left to Catalyst/AQE — the bloom matters precisely when
    the small side is too large to broadcast, where both sides shuffle."""
    sk = small_key or key
    pruned = bloom_prune(big, small, key, sk, num_bits, num_hashes)
    keys = small.select(F.col(sk).alias(key))
    return pruned.join(keys, key, "left_semi")
