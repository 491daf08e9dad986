"""Sequence packing: the concat-and-chunk layout LLM training uses.

Documents are laid end-to-end in deterministic key order and cut into
fixed-length training sequences; a document can straddle a boundary.
``sequence_pack_spans`` computes, per sequence, which documents land in
it and how many of their tokens — WITHOUT exploding tokens and WITHOUT
a single-partition window.

Scale shape (the point): the global offset of each document is a prefix
sum over the total key order. The naive Spark expression — a window
over ``ORDER BY key`` with no partition — collapses to ONE task at any
scale. Here it is the textbook two-phase distributed prefix sum:

1. range-partition + sort by key (the one shuffle);
2. per-partition totals → driver cumsum (``num_partitions`` longs — the
   only driver state) → broadcast map;
3. within-partition running sum (window PARTITIONED by the physical
   partition id — parallel) + the partition's base offset.

The result depends only on the total key order, not on where partition
boundaries fall, so Spark's nondeterministic range sampling does not
affect the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_offsets(df: DataFrame, key_col: str, len_col: str,
                num_partitions: int | None = None) -> DataFrame:
    """(key, n, off): each row's exclusive prefix sum of ``len_col`` in
    global ``key_col`` order, via the distributed two-phase prefix sum
    described in the module docstring.

    The pinned (localCheckpoint'ed) projection backing the result stays
    in executor storage until the returned plan is garbage-collected;
    callers that materialize the result and are done with it can free
    the blocks immediately via ``_doc_offsets_pinned`` (as
    ``sequence_pack_spans`` does)."""
    return _doc_offsets_pinned(df, key_col, len_col, num_partitions)[0]


def _doc_offsets_pinned(df: DataFrame, key_col: str, len_col: str,
                        num_partitions: int | None = None):
    """doc_offsets plus the pinned projection DataFrame, so the caller
    can ``unpersist()`` it once the offsets have been consumed."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # offsets are exact-integer arithmetic: a float length column would
    # silently diverge between the driver-cumsum'd partition bases
    # (int-truncated) and the fractional window sums
    ltype = dict(df.dtypes).get(len_col)
    if ltype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"doc_offsets requires an integral length column; {len_col!r} "
            f"is {ltype!r}"
        )
    parts = (
        df.select(key_col, len_col)
        .repartitionByRange(num_partitions, key_col)
        .sortWithinPartitions(key_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # localCheckpoint pins the (nondeterministically sampled) range
    # partitioning: the totals job and the downstream job must see the
    # SAME partition boundaries or base offsets would mismatch rows
    parts = parts.localCheckpoint(eager=True)
    totals = {
        r["__pid"]: r["t"]
        for r in parts.groupBy("__pid").agg(F.sum(len_col).alias("t")).collect()
    }
    base = {}
    acc = 0
    for pid in sorted(totals):
        base[pid] = acc
        # SUM over an all-NULL partition is NULL — contributes nothing
        acc += int(totals[pid] or 0)
    # base offsets ride as a literal map expression — 2·P literals, fine
    # for the partition counts this targets (≤ thousands); past ~10^4
    # partitions a broadcast join on __pid would be the better carrier
    base_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in base.items() for x in kv]),
        F.col("__pid"),
    ) if base else F.lit(0)
    w = (
        Window.partitionBy("__pid")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        parts.withColumn("__run", F.sum(len_col).over(w))
        .withColumn("off", (base_expr + F.col("__run") - F.col(len_col)).cast("bigint"))
        .select(F.col(key_col), F.col(len_col).alias("n"), "off")
    )
    return out, parts


def sequence_pack_spans(df: DataFrame, seq_len: int, key_col: str,
                        len_col: str, num_partitions: int | None = None) -> DataFrame:
    """Per-sequence packing summary for fixed-length sequences of
    ``seq_len`` units: (seq_id, n_docs, n_units, first_doc, last_doc).

    A document at global offset ``off`` with length ``n`` overlaps
    sequences floor(off/L) .. floor((off+n-1)/L); the per-sequence unit
    count sums each overlap ``min((s+1)L, off+n) - max(sL, off)``.
    Every sequence is exactly ``seq_len`` units except the last.
    Zero-length documents are dropped (they occupy no sequence). The
    result is MATERIALIZED (small: one row per sequence) so the pinned
    offsets projection can be freed before returning."""
    offs, pinned = _doc_offsets_pinned(df, key_col, len_col, num_partitions)
    offs = offs.filter(F.col("n") > 0)
    L = F.lit(seq_len)
    spans = (
        # integer DIV, not floor(double /): double division loses
        # exactness once offsets approach 2^53 and can misassign a
        # boundary doc to the neighboring sequence (the DuckDB oracle
        # uses integer // — these must agree at any scale)
        offs.withColumn("s_first", F.expr(f"off DIV {seq_len}"))
        .withColumn("s_last", F.expr(f"(off + n - 1) DIV {seq_len}"))
        # a doc spans (n/L + 2) sequences at most — the explode is tiny
        .select(
            key_col, "n", "off",
            F.explode(F.sequence("s_first", "s_last")).alias("seq_id"),
        )
        .withColumn(
            "overlap",
            F.least((F.col("seq_id") + 1) * L, F.col("off") + F.col("n"))
            - F.greatest(F.col("seq_id") * L, F.col("off")),
        )
    )
    res = (
        spans.groupBy("seq_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("overlap").cast("bigint").alias("n_units"),
            F.min(key_col).alias("first_doc"),
            F.max(key_col).alias("last_doc"),
        )
        .withColumn("seq_id", F.col("seq_id").cast("bigint"))
        .select("seq_id", "n_docs", "n_units", "first_doc", "last_doc")
        .localCheckpoint(eager=True)
    )
    pinned.unpersist()  # free the offsets projection's storage blocks
    return res
