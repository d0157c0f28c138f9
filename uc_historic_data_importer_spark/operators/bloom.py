"""Deterministic Bloom filter — the scale path for the exists-filter (F4).

The reference checks record existence with batched HBase ``existsAll``
RPCs (reference ``app/batch/HbaseClient.kt:43-52``, applied per put batch
at ``app/batch/HBaseWriter.kt:549-552``). The rebuild's exact operator is
a ``left_anti`` join (``operators/filters.py::anti_join_existing``), but
at 100 TB the anti-join shuffles the FULL record stream on the key. This
module adds the standard pre-shuffle accelerator: build a Bloom filter
over the existing-key snapshot, embed it in the plan as a constant array
(m = 2^16 bits = 8 KB), and reject definitely-new records MAP-SIDE, so
only the maybe-existing sliver (true positives + ~2% false positives)
pays the exact anti-join shuffle.

Unlike the sketches in ``operators/sketches.py`` (whose ESTIMATES must
hash-match the DuckDB oracle, forcing the shared engine-portable md5),
the Bloom stage is hash-invariant in the result: any hash yields zero
false negatives, so ``bloom_anti_join`` equals a plain SQL ANTI JOIN
bit-for-bit regardless — which is exactly what the driver's value-hash
compare proves. That frees the hot path to use ``xxhash64``, the
cheapest JVM-side hash (measured ~5x cheaper than one md5+conv at
sf0.1; the md5 chain cost ~0.6 s per probe conjunct on 600 k rows
because codegen does not CSE across filter conjuncts — three md5
evaluations, not one).

Why not Spark's built-in ``DataFrameStatFunctions.bloomFilter``: it
returns an opaque JVM object, not a plan-visible constant the word-merge
/ probe tests (and a future DataFrame-persisted filter) can reason
about.

Layout: k disjoint log2(m)-bit windows of the 64-bit xxhash (same
disjoint-window trick as the count-min sketch — a small-multiplier
permutation family would preserve low-bit collisions across all k
probes). Windows are taken with an unsigned shift (xxhash64 is signed);
words are 32-bit so ``1 << bit`` never touches the int64 sign bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 64
WORD_BITS = 32


def _hash64(value: Column) -> Column:
    # cast to string so build and probe sides hash the same bytes for
    # the same value (xxhash64 hashes ints and strings differently).
    # CONTRACT: both sides must be the SAME TYPE — different numeric
    # types can render differently ('1' vs '1.50' for values an
    # equi-join would compare EQUAL under implicit casts), which would
    # be a Bloom false NEGATIVE; bloom_anti_join enforces the type
    # equality up front
    return F.xxhash64(value.cast("string"))


def _check_params(k: int, m: int) -> int:
    if k < 1:
        # k = 0 probes an empty conjunction: maybe_contains returns
        # None and BOTH bloom_anti_join branch filters drop every row —
        # silent total data loss (the m-mismatch failure mode)
        raise ValueError(f"bloom k (hash count) must be >= 1: {k}")
    bits = (m - 1).bit_length()
    if m != 1 << bits:
        raise ValueError("bloom m (bits) must be a power of two")
    if m < WORD_BITS:
        # m below one word makes the dense table EMPTY (m // WORD_BITS
        # == 0): the probe of an empty bitmap literal evaluates NULL, so
        # BOTH branch filters drop every row — silent total data loss,
        # the exact mode the residual-join guard exists to prevent (and
        # bloom_build would IndexError on any non-empty snapshot first)
        raise ValueError(f"bloom m must be >= {WORD_BITS} (one word)")
    if k * bits > HASH_BITS:
        raise ValueError("k * log2(m) exceeds the 64-bit hash")
    return bits


def _positions(h: Column, k: int, m: int) -> list[Column]:
    bits = _check_params(k, m)
    return [
        F.shiftrightunsigned(h, j * bits).bitwiseAND(F.lit(m - 1))
        for j in range(k)
    ]


def bloom_build(
    existing: DataFrame, value_col: str, k: int = 3, m: int = 1 << 16
) -> list[int]:
    """Build the filter driver-side: a dense list of m/32 words.

    One scan of the existing snapshot, one map-side-combined shuffle of
    at most m/32 = 2048 (word_idx, partial-or) groups, then a 2048-row
    collect. The result is small enough (8 KB) to inline into the probe
    plan as a literal — the probe stage then needs no join at all. Word
    tables MERGE across snapshots with elementwise OR.
    """
    _check_params(k, m)
    h = _hash64(F.col(value_col))
    pos = F.explode(F.array(*_positions(h, k, m))).alias("pos")
    words = (
        existing.select(pos)
        .select(
            # log2(WORD_BITS) derived, not a magic 5: a future word-size
            # change must move build and probe addressing TOGETHER
            F.shiftright(F.col("pos"), WORD_BITS.bit_length() - 1).alias("word_idx"),
            # python-side shiftleft only takes a literal shift; the SQL
            # builtin accepts a column
            F.call_function(
                "shiftleft",
                F.lit(1),
                F.col("pos").bitwiseAND(F.lit(WORD_BITS - 1)).cast("int"),
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (m // WORD_BITS)
    for r in words:
        dense[r["word_idx"]] = r["word"]
    return dense


def pack_bitmap(words: list[int]) -> bytes:
    """Little-endian byte packing: global bit b lives at byte b//8,
    in-byte position b%8 — so a 32-bit word's bits land contiguously."""
    # words arrive as signed 32-bit ints (bit 31 = sign bit in the agg)
    mask = (1 << WORD_BITS) - 1
    return b"".join(
        (w & mask).to_bytes(WORD_BITS // 8, "little") for w in words
    )


def maybe_contains(
    value: Column, words: list[int], k: int = 3, m: int = 1 << 16
) -> Column:
    """Boolean column: value possibly in the set (never a false negative).

    Pure whole-stage-codegen expression over a SINGLE binary literal —
    the 100 TB probe is map-only: no shuffle, no join, no Python. (A
    2048-element ``array(lit, ...)`` expression tree works too but costs
    seconds of analysis + codegen per query; one 8 KB BinaryType literal
    is one plan node.)
    """
    _check_params(k, m)
    if len(words) != m // WORD_BITS:
        # an m/words mismatch indexes past the bitmap: substring
        # returns empty binary, conv('') is NULL, and the NULL
        # conjunction silently drops rows from BOTH bloom_anti_join
        # branches — data loss with no exception
        raise ValueError(
            f"bitmap has {len(words)} words but m={m} needs "
            f"{m // WORD_BITS}: build and probe must share m"
        )
    bitmap = F.lit(bytearray(pack_bitmap(words)))
    h = _hash64(value)
    cond = None
    for p in _positions(h, k, m):
        byte = F.conv(
            F.hex(F.substring(bitmap, (F.shiftright(p, 3) + 1).cast("int"), 1)),
            16,
            10,
        ).cast("int")
        # python-side shiftright/getbit only take literal positions; the
        # SQL builtin accepts a column
        bit_set = F.call_function(
            "shiftright", byte, p.bitwiseAND(F.lit(7)).cast("int")
        ).bitwiseAND(F.lit(1)) == F.lit(1)
        cond = bit_set if cond is None else (cond & bit_set)
    return cond


_BUILD_CACHE: dict[str, list[int]] = {}
_BUILD_CACHE_MAX = 32


def _snapshot_fingerprint(df: DataFrame) -> str:
    """Cheap content fingerprint of the files backing a DataFrame: the
    sorted input-file listing (parquet/ORC files are immutable once
    written, so the listing names the snapshot). Falls back to empty for
    non-file-backed frames (in-memory test data), where the caller's
    explicit key is the only identity."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive; API is stable
        return ""
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def bloom_build_cached(
    existing: DataFrame,
    value_col: str,
    cache_key: str,
    k: int = 3,
    m: int = 1 << 16,
) -> list[int]:
    """bloom_build memoized by snapshot key + backing-file fingerprint.

    A filter describes an immutable existing-keys snapshot; production
    builds it once per snapshot and reuses it across every import run
    against that snapshot (rebuilding per query would charge the full
    build scan to each of them). The caller names the snapshot
    (path + predicate) via cache_key; the input-file fingerprint guards
    against the snapshot under the same name changing within a driver
    process (ADVICE r1) — a grown snapshot re-keys and rebuilds instead
    of serving a stale filter that would pass new keys as definitely-new.
    The cache is FIFO-bounded so long-lived drivers cannot leak filters.
    """
    kk = f"{cache_key}|{_snapshot_fingerprint(existing)}|{value_col}|{k}|{m}"
    if kk not in _BUILD_CACHE:
        if len(_BUILD_CACHE) >= _BUILD_CACHE_MAX:
            _BUILD_CACHE.pop(next(iter(_BUILD_CACHE)))
        _BUILD_CACHE[kk] = bloom_build(existing, value_col, k, m)
    return _BUILD_CACHE[kk]


def bloom_cache_clear() -> None:
    """Explicit invalidation hook for callers that mutate snapshots
    in-place (discouraged; prefer immutable snapshot paths)."""
    _BUILD_CACHE.clear()


def bloom_anti_join(
    records: DataFrame,
    existing: DataFrame,
    record_key: str,
    existing_key: str | None = None,
    k: int = 3,
    m: int = 1 << 16,
    cache_key: str | None = None,
    n_existing: int | None = None,
    broadcast_max_existing: int = 4_000_000,
) -> DataFrame:
    """Exact anti-join with a Bloom pre-filter on the records side.

    Result is IDENTICAL to ``records.join(existing, ..., "left_anti")``
    (Bloom filters have no false negatives): definitely-new rows pass
    map-side; only maybe-existing rows (true hits + ~(1-e^{-kn/m})^k
    false positives) reach the shuffle for the exact check.

    DETERMINISM PRECONDITION: the two output branches are independent
    scans of ``records`` — a NON-deterministic records plan (sample(),
    rand()-derived columns, a directory mutating between scans) can
    lose or duplicate rows across the branches, which a single-scan
    left_anti cannot. Persist ``records`` first (or pass a
    deterministic plan) when that applies; the pipeline's caller does
    (the F4 path probes the persisted normalized frame).

    Cost honesty: the two filter branches are independent subtrees
    under the union, so an UNCACHED records input is SCANNED TWICE.
    The win is avoiding the anti-join SHUFFLE of the definitely-new
    majority — for shuffle-bound pipelines (wide rows, most records
    new) that dominates; for a scan-bound narrow input, cache/persist
    the records first or use the plain left_anti. Key columns must be
    the same type on both sides (see _hash64) — enforced here.

    Size dispatch (r15 opt round, guide §3.1 — pick the strategy
    deliberately): when the caller declares the existing side small
    enough to broadcast (``n_existing`` <= ``broadcast_max_existing``,
    default 4M keys ~ 32 MB of longs), the Bloom filter buys nothing —
    a broadcast anti-join already shuffles zero records bytes, and the
    per-row hash-table lookup costs about what the k-probe does, while
    scanning records ONCE instead of twice (measured 1.16 -> 0.40 s on
    the 600k-row catalog query). The Bloom two-branch shape remains the
    route for existing sides past broadcast size — the regime it
    exists for (guide §3.2). Both routes return the same rows (Bloom
    filters have no false negatives and the branch union IS the
    anti-join); pinned by the dispatch-equality test.
    """
    ek = existing_key or record_key
    rt = records.schema[record_key].dataType
    et = existing.schema[ek].dataType
    if rt != et:
        raise ValueError(
            f"bloom_anti_join key types must match: records.{record_key} "
            f"is {rt.simpleString()}, existing.{ek} is {et.simpleString()} "
            "— different types can string-render the same value "
            "differently and turn a Bloom hit into a false negative"
        )
    if n_existing is not None and int(n_existing) <= int(
        broadcast_max_existing
    ):
        return records.join(
            F.broadcast(
                existing.select(F.col(ek).alias(record_key)).distinct()
            ),
            on=record_key,
            how="left_anti",
        )
    if cache_key is not None:
        words = bloom_build_cached(existing, ek, cache_key, k, m)
    else:
        words = bloom_build(existing, ek, k, m)
    maybe = maybe_contains(F.col(record_key), words, k, m)
    definite_new = records.filter(~maybe)
    needs_check = records.filter(maybe).join(
        existing.select(F.col(ek).alias(record_key)).distinct(),
        on=record_key,
        how="left_anti",
    )
    return definite_new.unionByName(needs_check)
