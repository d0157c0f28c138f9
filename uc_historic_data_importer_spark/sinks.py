"""W1-W7: sinks (SURVEY.md §2.5).

The test environment has no HBase; the default sink is the KV-parquet
layout: one row per versioned cell `(table, key, key_hex, version, body)`,
partitioned by `table` — the direct analogue of the reference's versioned
HBase cells (HbaseClient.kt:25-41, maxVersions unbounded). A "latest-wins"
current-state view is a query over it (operators/latest.py).

Byte-bounded batching (W1, HBaseWriter.kt:214-233) has no Spark
equivalent/need: `df.write` sizes files via partitioning; for a real HBase
cluster the `foreachPartition` putter below applies the same size-bounded
flush inside each task.

Manifest CSV (W5): pipe-separated, commons-text `escapeCsv` semantics
(quote only when the value contains a quote or comma; embedded quotes
doubled — StreamingManifestWriter.kt:58-63), one file per input dump file
named `db.<db>.<uncoalesced-collection>-%06d.csv` (HBaseWriter.kt:124-127).
"""

from __future__ import annotations

import contextlib
import os
import struct
import sys

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kv_sink(df: DataFrame, path: str, mode: str = "append") -> None:
    """W2/W3 analogue: versioned-cell parquet table partitioned by `table`.

    Partitioning by table = the namespace/DDL step (W3); parquet row
    groups give the GZ-compressed cell storage. At 100 TB add bucketing on
    key_hex (saveAsTable with bucketBy) so latest-per-key and the exists
    anti-join become shuffle-free; plain path-partitioned parquet keeps
    the local test hermetic."""
    (
        df.select("table", "key", "key_hex", "version", F.col("envelope").alias("body"))
        .write.mode(mode)
        .partitionBy("table")
        .parquet(path)
    )


def read_kv(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def kv_sink_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int = 32,
) -> None:
    """W2 alternative for repeat-query workloads: the versioned-cell
    table bucketed (and sorted) on key_hex via saveAsTable.

    Bucketing pre-shuffles ONCE at write time; every subsequent
    latest-per-key aggregation, (key, version) exists anti-join, or
    key-equi self-join reads bucket-local data and plans WITHOUT an
    Exchange (verified in tests/test_sinks.py::test_bucketed_latest_has_no_shuffle).
    At 100 TB that converts the hottest recurring query from a full
    shuffle into a scan."""
    (
        df.select("table", "key", "key_hex", "version", F.col("envelope").alias("body"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "key_hex")
        .sortBy("key_hex", "version")
        .option("path", path)
        .saveAsTable(table_name)
    )


def compact_kv(
    spark,
    path: str,
    out_path: str,
    keep_versions: int = 1,
) -> None:
    """Major compaction for the versioned-cell table: rewrite keeping only
    the newest `keep_versions` VERSIONS per (table, key_hex), one cell per
    version.

    The reference's HBase tables keep maxVersions=MAX_INT and delegate
    cleanup to HBase compactions (HbaseClient.kt:83-92); an analytics
    engine owns that lifecycle itself. Semantics per HBase's cell model:
    a (key, version) pair holds ONE cell — duplicate appends in the KV
    log collapse (deterministically: max body wins, standing in for
    last-write-wins which an append log cannot order); keep_versions
    counts distinct versions via dense_rank. Both windows share the
    (table, key_hex) hash partitioning, so the whole compaction is ONE
    skew-free shuffle (CRC-prefixed keys) + a partitioned rewrite. Run
    periodically: afterwards every latest-per-key query scans
    keep_versions cells per key instead of the full history — at 100 TB
    the difference between reading the table and reading the live set."""
    from pyspark.sql.window import Window

    kv = spark.read.parquet(path)
    by_key = Window.partitionBy("table", "key_hex")
    version_rank = F.dense_rank().over(
        by_key.orderBy(F.desc("version"))
    )
    cell_pick = F.row_number().over(
        Window.partitionBy("table", "key_hex", "version").orderBy(F.desc("body"))
    )
    compacted = (
        kv.withColumn("_vr", version_rank)
        .withColumn("_cp", cell_pick)
        .filter((F.col("_vr") <= keep_versions) & (F.col("_cp") == 1))
        .drop("_vr", "_cp")
    )
    (
        compacted.write.mode("overwrite")
        .partitionBy("table")
        .parquet(out_path)
    )


def kv_put_sink(
    df: DataFrame,
    putter_factory,
    max_batch_bytes: int = 100_000_000,
) -> None:
    """W1+W2 for a real KV cluster (HBase & co.): per-partition putter
    with the reference's byte-bounded flush (HBaseWriter.kt:105-107,
    214-233: accumulate until adding the next record would reach
    max.batch.size.bytes, flush, plus a trailing under-size flush).

    `putter_factory()` runs once per partition ON THE EXECUTOR and must
    return an object with `put_batch(table, records)` (records =
    list of (key: bytes, version: int, body: str)) and `close()`.
    Retries/backoff (HBaseWriter.putBatch :543-573) belong inside the
    putter, where the client owns connection state; Spark task retry
    covers whole-partition failure (sink must be idempotent on
    (key, version) — HBase puts are).
    """
    if max_batch_bytes < 1:
        # pre-guard (r13 review): 0/negative made the flush condition
        # true before EVERY record — one-record RPC batches, silently
        # defeating the byte-bounded batching this sink exists for
        raise ValueError(f"max_batch_bytes must be >= 1 (got {max_batch_bytes})")
    cols = df.select("table", "key", "version", F.col("envelope").alias("body"))

    def _write_partition(rows):
        putter = putter_factory()
        try:
            batch: list[tuple[bytes, int, str]] = []
            batch_table: str | None = None
            batch_bytes = 0
            for r in rows:
                body = r["body"]
                # UTF-8 bytes, not characters: multi-byte text (CJK,
                # emoji) accounted at 1/char would let a flush exceed
                # the byte budget ~4x — the reference's limit exists to
                # keep put RPCs under the server's size cap
                n_bytes = len(body.encode("utf-8"))
                if batch and (
                    batch_table != r["table"]
                    or batch_bytes + n_bytes >= max_batch_bytes
                ):
                    putter.put_batch(batch_table, batch)
                    batch, batch_bytes = [], 0
                batch_table = r["table"]
                batch.append((bytes(r["key"]), int(r["version"]), body))
                batch_bytes += n_bytes
            if batch:
                putter.put_batch(batch_table, batch)
        finally:
            putter.close()

    cols.foreachPartition(_write_partition)


# HBaseWriter.kt:543-573 putBatch policy (SURVEY W2: retry x5,
# backoff 10 s x2 — a 1 s schedule would exhaust all attempts in ~15 s
# and hammer a struggling store 10x faster than the reference)
PUT_MAX_ATTEMPTS = 5
PUT_INITIAL_BACKOFF_S = 10.0
PUT_BACKOFF_MULTIPLIER = 2.0


class RetryingPutter:
    """Concrete putter for ``kv_put_sink`` wrapping any KV store client.

    Reproduces the reference's putBatch retry loop
    (HBaseWriter.kt:543-573) including its load-bearing detail: the
    exists-filter (F4) runs INSIDE the retry loop, so a batch that
    failed halfway re-filters against the store before the next attempt
    and never re-puts the cells that landed. Backoff matches the
    reference: ``initial`` on the first retry, then
    ``initial * attempts * multiplier``.

    ``store`` needs ``put_batch(table, records)``, ``close()``, and an
    exists check: ``exists_batch(table, pairs) -> list[bool]`` when the
    backend supports it (HBase existsAll — ONE round trip per batch,
    the reference's F4 shape) with ``exists(table, key, version) ->
    bool`` as the per-row fallback for minimal adapters; a batch of a
    million cells against a per-row-only store would otherwise issue a
    million sequential RPCs per attempt. ``InMemoryKVStore`` below is
    the reference implementation used by the tests."""

    def __init__(
        self,
        store,
        max_attempts: int = PUT_MAX_ATTEMPTS,
        initial_backoff_s: float = PUT_INITIAL_BACKOFF_S,
        backoff_multiplier: float = PUT_BACKOFF_MULTIPLIER,
        sleep=None,
    ):
        import time

        if max_attempts < 1:
            # pre-guard (r13 review): 0 made put_batch's retry loop
            # never run and crash on the terminal `assert last is not
            # None` — a bare AssertionError instead of naming the
            # misconfiguration
            raise ValueError(f"max_attempts must be >= 1 (got {max_attempts})")
        self.store = store
        self.max_attempts = max_attempts
        self.initial_backoff_s = initial_backoff_s
        self.backoff_multiplier = backoff_multiplier
        self.sleep = sleep if sleep is not None else time.sleep

    def put_batch(self, table: str, records) -> None:
        attempts = 0
        last: Exception | None = None
        while attempts < self.max_attempts:
            try:
                # F4 inside the loop: drop cells that already exist
                # (including ones a previous failed attempt wrote) —
                # batched when the store supports it (existsAll parity)
                exists_batch = getattr(self.store, "exists_batch", None)
                if exists_batch is not None:
                    flags = exists_batch(
                        table, [(r[0], r[1]) for r in records]
                    )
                    filtered = [
                        r for r, ex in zip(records, flags) if not ex
                    ]
                else:
                    filtered = [
                        r
                        for r in records
                        if not self.store.exists(table, r[0], r[1])
                    ]
                self.store.put_batch(table, filtered)
                return
            except Exception as ex:  # noqa: BLE001 - client errors vary
                last = ex
                attempts += 1
                if attempts >= self.max_attempts:
                    break  # terminal: raise immediately, don't sleep
                delay = (
                    self.initial_backoff_s
                    if attempts == 1
                    else self.initial_backoff_s
                    * (attempts - 1)
                    * self.backoff_multiplier
                )
                self.sleep(delay)
        assert last is not None
        raise last

    def close(self) -> None:
        self.store.close()


class InMemoryKVStore:
    """Dict-backed versioned-cell store: the minimal store contract for
    RetryingPutter (and a template for real client adapters)."""

    def __init__(self):
        self.cells: dict[tuple[str, bytes, int], str] = {}
        self.put_log: list[tuple[str, bytes, int]] = []

    def exists(self, table: str, key: bytes, version: int) -> bool:
        return (table, key, version) in self.cells

    def exists_batch(self, table: str, pairs) -> list[bool]:
        return [(table, k, v) in self.cells for k, v in pairs]

    def put_batch(self, table: str, records) -> None:
        for key, version, body in records:
            self.cells[(table, key, version)] = body
            self.put_log.append((table, key, version))

    def close(self) -> None:
        pass


def csv_escape(col: Column) -> Column:
    """commons-text StringEscapeUtils.escapeCsv: wrap in double quotes iff
    the value contains comma, quote, CR or LF; double embedded quotes."""
    needs = col.rlike('[",\n\r]')
    escaped = F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(needs, escaped).otherwise(col)


def manifest_rows(df: DataFrame) -> DataFrame:
    """W5: project normalized records to manifest rows
    (HBaseWriter.kt:250-258; column order id|timestamp|db|collection|
    source|outerType|originalId|innerType per StreamingManifestWriter.kt:58-59).

    outerType is the envelope's @type — always "HDI" for produced
    envelopes (MessageProducer.kt:45)."""
    return df.select(
        F.col("manifest_id").alias("id"),
        F.col("version").alias("timestamp"),
        F.col("db"),
        F.col("collection_out").alias("collection"),
        F.lit("IMPORT").alias("source"),
        F.lit("HDI").alias("outer_type"),
        F.col("original_id").alias("original_id"),
        F.col("inner_type").alias("inner_type"),
        F.col("collection").alias("_uncoalesced_collection"),
        F.col("file_number").alias("_file_number"),
        F.col("line_no").alias("_line_no"),
    )


def manifest_lines(df: DataFrame) -> DataFrame:
    """Render manifest rows to the exact pipe-delimited line format."""
    cols = [
        "id",
        "timestamp",
        "db",
        "collection",
        "source",
        "outer_type",
        "original_id",
        "inner_type",
    ]
    line = F.concat_ws(
        "|", *[csv_escape(F.col(c).cast("string")) for c in cols]
    )
    return df.select(
        F.col("db").alias("_db"),
        F.col("_uncoalesced_collection"),
        F.col("_file_number"),
        F.col("_line_no"),
        line.alias("line"),
    )


def manifest_sink(df: DataFrame, out_dir: str) -> list[str]:
    """W5/W6: write one CSV per (db, uncoalesced collection, file number),
    named `db.<db>.<collection>-%06d.csv`.

    At the reference's own scale (thousands of input files, each modest),
    a per-file single-writer is correct and parallel across files: we
    repartition by the file identity so each task writes its own manifest.
    Returns written file paths.

    Each file is written to an ATTEMPT-UNIQUE temp name and atomically
    os.replace()d into place when the task's iterator is exhausted: the
    repartition guarantees one PARTITION owns a given file, but task
    RETRIES and speculative execution can run two attempts of that
    partition concurrently — a shared truncate-on-open path would let a
    zombie prior attempt interleave writes into the live attempt's
    file. With rename-on-complete each attempt builds its own complete
    temp file and the last rename wins atomically (both attempts render
    identical content — the partition is deterministic after
    sortWithinPartitions — so winner identity is irrelevant). A killed
    attempt leaves only a `.tmp-*` orphan, which the final listing
    ignores and which the NEXT run into the same out_dir deletes up
    front (same owned-directory pre-clean as write_hfiles — without it
    zombie-attempt orphans accumulate forever). CONTRACT: out_dir must
    be a filesystem visible to both the
    driver and the executors (local mode, NFS, or a fuse mount) — the
    python open()/os.listdir pair does not speak Hadoop FS URIs; a
    production S3 manifest store routes through df.write.csv instead
    (see the module docstring's W6 note)."""
    os.makedirs(out_dir, exist_ok=True)
    # owned-directory pre-clean, final CSVs INCLUDED (same contract as
    # write_hfiles): file names are input-derived, so a re-run that
    # processes fewer inputs would otherwise return — and upload — a
    # previous run's leftover manifests as if they were current output
    for f in os.listdir(out_dir):
        if f.endswith(".csv") or ".csv.tmp-" in f:
            os.remove(os.path.join(out_dir, f))
    rows = manifest_lines(df)

    def _write(partition_rows):
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = (
            str(ctx.taskAttemptId()) if ctx is not None else uuid.uuid4().hex
        )
        # final path -> (temp path, handle)
        handles: dict[str, tuple[str, object]] = {}
        try:
            for r in partition_rows:
                name = f"db.{r['_db']}.{r['_uncoalesced_collection']}-{int(r['_file_number']):06d}.csv"
                path = os.path.join(out_dir, name)
                ent = handles.get(path)
                if ent is None:
                    tmp = f"{path}.tmp-{attempt}"
                    ent = (tmp, open(tmp, "w", encoding="utf-8"))
                    handles[path] = ent
                ent[1].write(r["line"] + "\n")
        finally:
            # close EVERY handle even if one close raises (ENOSPC on
            # flush): a first-failure-aborts loop would leak the
            # remaining fds for the executor's lifetime
            errs = []
            for _, fh in handles.values():
                try:
                    fh.close()
                except Exception as e:  # noqa: BLE001 — re-raised below
                    errs.append(e)
            if errs and sys.exc_info()[0] is None:
                # raise ONLY when the body succeeded — raising while an
                # exception is already propagating would mask it
                raise errs[0]
        # only a fully-written attempt reaches the renames; a crashed
        # attempt's temp files are orphaned, never visible
        for path, (tmp, _) in handles.items():
            os.replace(tmp, path)
        return iter(())

    (
        rows.repartition("_db", "_uncoalesced_collection", "_file_number")
        # line order within each file matches the reference's sequential
        # writer (rows appended as the stream is read)
        .sortWithinPartitions(
            "_db", "_uncoalesced_collection", "_file_number", "_line_no"
        )
        .rdd.mapPartitions(_write)
        .count()
    )
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".csv")
    )


def hbase_bulkload_layout(
    df: DataFrame,
    n_regions: int = 32,
    family: str = "cf",
    qualifier: str = "record",
    region_split_keys: list[bytes] | None = None,
    table: str | None = None,
) -> DataFrame:
    """W2 at bulk scale: the exact DataFrame layout HBase HFile bulk
    load requires, as a plan (no HBase needed to produce or test it).

    The reference puts cells one batch at a time through the region
    servers' write path (HbaseClient.kt:25-41, with SKIP_WAL as its
    bulk-speed concession — Config.kt:27). The idiomatic 100 TB route
    bypasses region servers entirely: write HFiles and hand them to
    LoadIncrementalHFiles, which is WAL-free by design (the reference's
    skipWal flag taken to its conclusion). That requires the input
    KeyValues TOTALLY ORDERED by (rowkey, family, qualifier, timestamp
    DESC) with partition boundaries aligned to regions. Two alignment
    modes:

    - ``region_split_keys=None`` (default): repartitionByRange(
      n_regions) on the row key — Spark SAMPLES split points, giving
      contiguous, balanced key ranges. Right for a fresh/empty table
      (create it pre-split at these boundaries).
    - ``region_split_keys=[...]`` — the EXISTING table's region start
      keys (what `RegionLocator.getStartKeys()[1:]` returns, sorted,
      first region's implicit empty start key excluded). Each row's
      region id is the count of split keys <= its key — a pure
      size(filter(literal array)) expression, no join, no UDF — and the
      shuffle targets exactly one partition per region. This is the
      LoadIncrementalHFiles contract: a file crossing a region boundary
      triggers the load-time split slow path; aligned files are pure
      renames. At 100 TB the split-key list is region-count-sized
      (thousands) — a broadcast-literal, not a data-sized structure.
      Region boundaries are PER TABLE: a multi-table frame must pass a
      ``dict`` of ``table -> split keys`` (one CASE branch per table in
      the plan); a bare list with more than one table present raises,
      because bucketing table B by table A's boundaries silently
      produces boundary-crossing files — exactly the load-time split
      slow path this mode exists to avoid. With a bare list, pass
      ``table=`` to make that single-table check a lazy plan-side
      raise_error guard; without it the check is an eager probe that
      executes the upstream lineage once at plan-construction time.

    sortWithinPartitions orders cells within each prospective HFile.
    Family/qualifier mirror Config.kt:10-11. Feed the result to
    ``write_hfiles`` (pure-Python HFile v3 container) or to any
    connector that wants region-sorted cells."""
    cells = df.select(
        F.col("key"),
        F.lit(family).alias("family"),
        F.lit(qualifier).alias("qualifier"),
        F.col("version"),
        F.col("envelope").alias("body"),
        F.col("table"),
    )
    if table is not None:
        # `table=` declares "this frame holds exactly this one table" in
        # EVERY mode (previously it was silently ignored unless
        # region_split_keys was a bare list): a lazy map-side
        # raise_error branch on the table column itself — no eager
        # probe, nothing executes at plan time, and every downstream
        # consumer of `table` (partitioning, sort, write_hfiles dirs)
        # flows through the guard.
        cells = cells.withColumn(
            "table",
            F.when(F.col("table") == F.lit(table), F.col("table")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "hbase_bulkload_layout declared for table "
                            f"{table!r} but frame holds table "
                        ),
                        F.col("table"),
                    )
                )
            ),
        )
    # `table` leads both the partitioning and the within-partition sort:
    # the kv model carries multiple HBase tables in one DataFrame, and a
    # bulk-load file must never mix tables (each table gets its own
    # LoadIncrementalHFiles directory in write_hfiles). With a
    # single-table layout the leading constant changes nothing.
    if region_split_keys is not None:

        def rid_for(splits: list[bytes]):
            """Region id = count of split keys <= row key, as a BALANCED
            binary-search CASE tree: O(log n) byte comparisons per row.
            The previous size(filter(literal array)) form was O(n) per
            row — immaterial at 32 regions, but a real 100 TB table has
            THOUSANDS of regions and that put thousands of byte
            comparisons on every cell's map path (HBase's own
            getStartKeys() lookup is a binary search for the same
            reason). Semantics identical to the filter-count, including
            key == split (counts) and NULL/empty keys (region 0);
            parity is property-pinned in tests/test_hfile.py."""
            srt = sorted(splits)

            def tree(lo: int, hi: int) -> F.Column:
                # invariant: splits[:lo] <= key, splits[hi:] > key
                if lo == hi:
                    return F.lit(lo)
                mid = (lo + hi) // 2
                return F.when(
                    F.lit(srt[mid]) <= F.col("key"), tree(mid + 1, hi)
                ).otherwise(tree(lo, mid))

            return tree(0, len(srt))

        if isinstance(region_split_keys, dict):
            if not region_split_keys:
                # an empty dict would leave the CASE expression with no
                # branches (region_id None -> AttributeError) and pass
                # repartition(0); fail with the actual misuse instead
                raise ValueError(
                    "region_split_keys dict must be non-empty; pass "
                    "None to let repartitionByRange sample split points"
                )
            region_id = None
            n_parts = 0
            for tbl, splits in sorted(region_split_keys.items()):
                branch = rid_for(list(splits))
                cond = F.col("table") == F.lit(tbl)
                region_id = (
                    F.when(cond, branch)
                    if region_id is None
                    else region_id.when(cond, branch)
                )
                n_parts += len(splits) + 1
            # a table absent from the dict has no known boundaries —
            # fail the job rather than guess (raise_error surfaces the
            # first offending table name)
            region_id = region_id.otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("no region_split_keys entry for table "),
                        F.col("table"),
                    )
                ).cast("int")
            )
        else:
            splits = sorted(region_split_keys)
            if table is not None:
                # single-table already guaranteed by the lazy table
                # guard above (raise_error on any other table name)
                region_id = rid_for(splits)
            else:
                # no declared table: the single-table check needs an
                # EAGER probe that executes the full (typically
                # unpersisted) upstream lineage once — including the
                # normalization UDF — just to validate. Fine for tests
                # and small frames; at scale pass ``table=`` (lazy
                # branch above) or persist upstream first.
                tables = [
                    r["table"]
                    for r in cells.select("table").distinct().limit(2).collect()
                ]
                if len(tables) > 1:
                    raise ValueError(
                        "a bare region_split_keys list is single-table "
                        "(region boundaries are per table); pass a dict "
                        "of table -> split keys for a multi-table frame"
                    )
                region_id = rid_for(splits)
            n_parts = len(splits) + 1
        return (
            cells.withColumn("_region_id", region_id)
            # hash-partition on (table, region id): every row of a
            # table's region lands in ONE partition (n_partitions ==
            # n_regions keeps ids collision-free in expectation;
            # collisions only co-locate two regions in one task, never
            # split one — write_hfiles splits files per (table, region))
            .repartition(n_parts, "table", "_region_id")
            .sortWithinPartitions(
                "table", "key", "family", "qualifier", F.desc("version")
            )
        )
    return cells.repartitionByRange(
        n_regions, "table", "key"
    ).sortWithinPartitions(
        "table", "key", "family", "qualifier", F.desc("version")
    )


# --- HBase KeyValue wire format (public Apache HBase cell layout) ---
# These are the exact bytes HFileOutputFormat2 writes per cell for the
# Put the reference performs in HbaseClient.kt:25-41 (addColumn(family,
# qualifier, version-as-timestamp, body)). Serializing them here makes
# the bulk-load write path testable to the byte without HBase jars:
# an HFile's cell stream is these KeyValues in CellComparator order.
KEYVALUE_TYPE_PUT = 4


def keyvalue_bytes(
    row: bytes,
    family: bytes,
    qualifier: bytes,
    timestamp: int,
    value: bytes,
    key_type: int = KEYVALUE_TYPE_PUT,
) -> bytes:
    """Serialize one cell in the HBase KeyValue wire layout:
    keyLen(i32) valueLen(i32) | rowLen(i16) row famLen(u8) family
    qualifier ts(i64) type(u8) | value."""
    key = (
        struct.pack(">H", len(row))
        + row
        + struct.pack(">B", len(family))
        + family
        + qualifier
        + struct.pack(">q", timestamp)
        + struct.pack(">B", key_type)
    )
    return struct.pack(">ii", len(key), len(value)) + key + value


def keyvalue_sort_key(
    row: bytes,
    family: bytes,
    qualifier: bytes,
    timestamp: int,
    key_type: int = KEYVALUE_TYPE_PUT,
) -> tuple:
    """HBase CellComparator total order: row, family, qualifier all
    ascending unsigned-byte-lexicographic (Python bytes compare IS
    unsigned memcmp), then timestamp DESCENDING, then type DESCENDING
    (so deletes sort before puts at the same timestamp)."""
    return (row, family, qualifier, -timestamp, 0xFF - key_type)


def serialize_layout_cells(layout: DataFrame) -> DataFrame:
    """Executable slice of the HFile write: map each
    ``hbase_bulkload_layout`` row to its KeyValue bytes, preserving the
    layout's partition-local order — per partition, exactly the cell
    stream an HFile for that region would contain. Pure projection, no
    shuffle; a connector appends the HFile block/index framing."""
    import pandas as pd

    def _ser(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "table": pdf["table"],
                    "cell": [
                        keyvalue_bytes(
                            bytes(r.key),
                            r.family.encode(),
                            r.qualifier.encode(),
                            int(r.version),
                            r.body.encode()
                            if isinstance(r.body, str)
                            else bytes(r.body),
                        )
                        for r in pdf.itertuples(index=False)
                    ],
                }
            )

    return layout.mapInPandas(_ser, schema="table string, cell binary")


def write_hfiles(
    layout: DataFrame,
    out_dir: str,
    block_size: int = 64 * 1024,
    create_time_ms: int = 0,
    compression: str = "gz",
    bloom: str = "row",
) -> list[str]:
    """Write ``hbase_bulkload_layout`` output as REAL HFile v3 files —
    one per (table, region) per partition, under
    ``<out_dir>/<table>/<family>/``: each ``<out_dir>/<table>`` is
    exactly the bulk-load directory LoadIncrementalHFiles expects for
    that table (bulk load is a per-table operation, so a multi-table kv
    layout must never mix tables in one file or one directory).

    The container is the pure-Python writer in hfile.py (public Apache
    block/index/trailer format, CRC32-checksummed, single-level index);
    the cells are the byte-pinned KeyValue wire layout
    (tests/test_sinks.py::TestKeyValueWireParity vs HbaseClient.kt:25-41).
    Each task streams its partition's already-CellComparator-sorted
    cells straight into one file at O(block) memory — a region's HFile
    costs one pass regardless of cell count, which is the property that
    makes this the 100 TB route (region servers never see the load; the
    reference's SKIP_WAL concession taken to its conclusion).

    Files are written to attempt-unique temp names and os.replace()d on
    task completion (same speculative-execution-safe contract as
    manifest_sink; out_dir must be executor-visible — local, NFS, or
    fuse). ``out_dir`` is OWNED by this writer: stale ``*.hfile`` /
    temp files from a previous run into the same directory are removed
    up front, because file names are partition-derived — a re-run that
    produces fewer partitions would otherwise leave the extra old
    files visible in the returned listing and in the bulk load.
    On a jar-equipped cluster HFileOutputFormat2 remains the
    alternative; this writer removes that classpath dependency.
    ``compression`` is ``"gz"`` (default — the reference table's column
    family is GZ for both flush and compaction, HbaseClient.kt:88-89,
    so bulk-loaded files match the table codec and skip the 3-5x
    rewrite IO a compaction re-compress would cost at 100 TB) or
    ``"none"``. ``bloom`` is ``"row"`` (default — the reference table
    inherits HColumnDescriptor's BloomType.ROW default, so cluster
    files carry one) or ``"none"``. Returns the written file paths."""
    from uc_historic_data_importer_spark.hfile import (
        COMPRESSION_GZ,
        COMPRESSION_NONE,
        HFileWriter,
    )

    codecs = {"gz": COMPRESSION_GZ, "none": COMPRESSION_NONE}
    if compression not in codecs:
        raise ValueError(f"unsupported compression {compression!r}")
    if bloom not in ("row", "none"):
        raise ValueError(f"unsupported bloom type {bloom!r}")
    codec = codecs[compression]
    if os.path.isdir(out_dir):
        for dirpath, _dirs, files in os.walk(out_dir):
            for f in files:
                if f.endswith(".hfile") or ".hfile.tmp-" in f:
                    os.remove(os.path.join(dirpath, f))
    has_region = "_region_id" in layout.columns

    def _write(partition_rows):
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        attempt = (
            str(ctx.taskAttemptId()) if ctx is not None else uuid.uuid4().hex
        )
        writers: dict[tuple, tuple[str, str, object, HFileWriter]] = {}
        try:
            for r in partition_rows:
                fam = r["family"]
                tbl = r["table"]
                # explicit-split layouts carry _region_id: one file PER
                # REGION even when hash partitioning co-locates two
                # regions in one task — a file must never span a region
                # boundary (LoadIncrementalHFiles' split slow path)
                region = r["_region_id"] if has_region else None
                ent = writers.get((tbl, fam, region))
                if ent is None:
                    stem = (
                        f"part-{part:05d}"
                        if region is None
                        else f"part-{part:05d}-r{int(region):05d}"
                    )
                    fam_dir = os.path.join(out_dir, tbl, fam)
                    # executor-side mkdir at first use: a driver-side
                    # distinct() over the table/family columns would
                    # execute the entire upstream plan a second time
                    os.makedirs(fam_dir, exist_ok=True)
                    final = os.path.join(fam_dir, f"{stem}.hfile")
                    tmp = f"{final}.tmp-{attempt}"
                    fh = open(tmp, "wb")
                    ent = (tmp, final, fh, HFileWriter(
                        fh, block_size=block_size,
                        create_time_ms=create_time_ms,
                        compression=codec,
                        bloom=bloom,
                    ))
                    writers[(tbl, fam, region)] = ent
                ent[3].append_keyvalue(
                    keyvalue_bytes(
                        bytes(r["key"]),
                        r["family"].encode(),
                        r["qualifier"].encode(),
                        int(r["version"]),
                        r["body"].encode()
                        if isinstance(r["body"], str)
                        else bytes(r["body"]),
                    )
                )
        finally:
            # close EVERY writer+handle even if one close raises
            # (HFileWriter.close writes index/trailer and can hit
            # ENOSPC): aborting on the first failure would leak the
            # remaining open fds in the executor
            errs = []
            for _tmp, _final, fh, w in writers.values():
                try:
                    w.close()
                except Exception as e:  # noqa: BLE001 — re-raised below
                    errs.append(e)
                finally:
                    try:
                        fh.close()
                    except Exception as e:  # noqa: BLE001
                        errs.append(e)
            if errs and sys.exc_info()[0] is None:
                # raise ONLY when the body succeeded — raising while an
                # exception is already propagating would mask it
                raise errs[0]
        for tmp, final, _fh, _w in writers.values():
            os.replace(tmp, final)
        return iter(())

    layout.rdd.mapPartitions(_write).count()
    return sorted(
        os.path.join(dirpath, f)
        for dirpath, _dirs, files in os.walk(out_dir)
        for f in files
        if f.endswith(".hfile")
    )


# StreamingManifestWriter.kt:14-49 upload policy
MANIFEST_MAX_ATTEMPTS = 10
MANIFEST_CONTENT_TYPE = "text/plain"


def send_manifest(
    uploader,
    manifest_path: str,
    bucket: str,
    prefix: str,
    max_attempts: int = MANIFEST_MAX_ATTEMPTS,
    backoff_s: float = 1.0,
    sleep=None,
) -> bool:
    """W6: upload one manifest file with the reference's exact policy
    (StreamingManifestWriter.kt:14-49): retry up to ``max_attempts``
    (default 10, HBaseWriter.kt:54-55), skip zero-byte manifests
    entirely (no upload, no delete), content-type text/plain with an
    x-amz-meta-title user-metadata entry, and delete the local file
    only after a successful put. Exhausting attempts logs-and-gives-up
    rather than raising — the reference treats a lost manifest as
    degraded, not fatal, because the importer can re-run in
    manifest-only mode (W7).

    ``uploader`` needs one method:
    ``put_object(bucket, key, data: bytes, content_type, metadata)``
    — a boto3 adapter is two lines; tests use a counting fake.
    Returns True when the manifest was uploaded or legitimately
    skipped, False when attempts were exhausted.

    A missing local file is a PERMANENT condition (already uploaded by
    a previous call — the post-upload delete — or removed out of band):
    it returns True immediately instead of burning all ten attempts and
    mislabeling the outcome as an exhausted upload. Transient failures
    back off ``backoff_s * attempt`` between tries (``sleep``
    injectable) rather than hammering the store back-to-back."""
    import time

    sleep = sleep if sleep is not None else time.sleep
    name = os.path.basename(manifest_path)
    attempts = 0

    def backoff() -> None:
        # single accounting point for a failed attempt (local read OR
        # upload): count it, then back off linearly if tries remain
        nonlocal attempts
        attempts += 1
        if attempts < max_attempts:
            sleep(backoff_s * attempts)

    while attempts < max_attempts:
        # the missing-LOCAL-file check wraps only the local reads: a
        # FileNotFoundError raised by uploader.put_object itself (a
        # missing cert/config file on the client) must NOT be
        # mislabeled "already uploaded" — it falls through to the
        # retry loop like any other client error
        try:
            size = os.path.getsize(manifest_path)
            if size == 0:
                return True  # zero-byte manifests are never uploaded
            with open(manifest_path, "rb") as fh:
                data = fh.read()
        except FileNotFoundError:
            # already uploaded-and-deleted (or removed out of band):
            # nothing to do, and retrying cannot change that
            return True
        except Exception:  # noqa: BLE001 - EIO/ESTALE/permission races
            # any OTHER local read failure is retryable like a client
            # error (give-up-not-raise: a lost manifest is degraded,
            # not fatal — the manifest-only re-run mode recovers it)
            backoff()
            continue
        try:
            uploader.put_object(
                bucket,
                f"{prefix}/{name}",
                data,
                content_type=MANIFEST_CONTENT_TYPE,
                metadata={"x-amz-meta-title": name},
            )
            with contextlib.suppress(FileNotFoundError):
                os.remove(manifest_path)  # raced removal = already gone
            return True
        except Exception:  # noqa: BLE001 - client errors vary
            backoff()
    return False


def upload_manifests(
    paths: list[str],
    uploader,
    bucket: str,
    prefix: str,
    max_attempts: int = MANIFEST_MAX_ATTEMPTS,
) -> dict[str, bool]:
    """Upload every manifest written by ``manifest_sink`` (driver-side:
    manifests are per-input-file and small — the reference uploads them
    sequentially from its writer thread too). Returns path -> outcome."""
    return {
        p: send_manifest(uploader, p, bucket, prefix, max_attempts)
        for p in paths
    }


def kv_backfill(df: DataFrame, path: str) -> None:
    """Partition-scoped re-import (W7's re-run mode done right at
    scale): dynamic partition overwrite replaces ONLY the `table=`
    partitions present in this batch — re-importing one collection
    never touches (or rewrites) any other collection's cells, and a
    crashed backfill leaves untouched partitions readable.

    This is the idempotent fix-one-collection operation the reference
    performs by re-running the whole job against a table it truncates
    (`docs/running.md` re-run guidance); with dynamic overwrite the
    blast radius is exactly the collections being re-imported."""
    (
        df.select("table", "key", "key_hex", "version", F.col("envelope").alias("body"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("table")
        .parquet(path)
    )
