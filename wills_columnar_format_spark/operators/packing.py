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

# Base offsets ride as a literal create_map expression up to this many
# partitions (2·P literals in the plan — cheap, no extra join). Past it
# the literal plan itself bloats (10^5 partitions = 2·10^5 expression
# nodes shipped with every task binary), so the carrier switches to a
# broadcast join on __pid: plan size O(1), data size P rows.
BASE_CARRIER_MAX_LITERALS = 4096


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
                        num_partitions: int | None = None,
                        carry: list[str] | None = None):
    """doc_offsets plus the pinned projection DataFrame, so the caller
    can ``unpersist()`` it once the offsets have been consumed.

    ``carry`` names extra payload columns to thread through the range
    shuffle alongside (key, len) — ``sequence_pack_tokens`` carries the
    token arrays this way so the payload rides the ONE shuffle instead
    of joining back on the key afterwards (a second full-data shuffle)."""
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
        df.select(key_col, len_col, *(carry or []))
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
    if carry:
        # Payload case: a Window(partitionBy __pid) would force an
        # Exchange on __pid and move the carried payload through a
        # SECOND shuffle. The rows are already sorted by key within
        # their pinned partitions, so the running sum is a per-partition
        # Arrow pass instead: one cumsum per task, zero extra shuffle.
        out = _offsets_arrow_pass(parts, base, key_col, len_col, carry)
        return out, parts
    if not base:
        withbase = parts.withColumn("__base", F.lit(0).cast("bigint"))
    elif len(base) <= BASE_CARRIER_MAX_LITERALS:
        # small partition counts: 2·P literals inline in the plan
        base_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in base.items() for x in kv]),
            F.col("__pid"),
        )
        withbase = parts.withColumn("__base", base_expr.cast("bigint"))
    else:
        # large partition counts: the literal map would bloat every task
        # binary; carry the P bases as a broadcast-joined relation
        # instead (plan stays O(1); BroadcastHashJoin streams the probe
        # side so within-partition row order — which the window below
        # re-sorts anyway — is preserved)
        bdf = spark.createDataFrame(
            [(int(p), int(b)) for p, b in base.items()],
            "__pid int, __base bigint",
        )
        withbase = parts.join(F.broadcast(bdf), "__pid", "left")
    w = (
        Window.partitionBy("__pid")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        withbase.withColumn("__run", F.sum(len_col).over(w))
        .withColumn("off", (F.col("__base") + F.col("__run") - F.col(len_col)).cast("bigint"))
        .select(F.col(key_col), F.col(len_col).alias("n"), "off", *(carry or []))
    )
    return out, parts


def _offsets_arrow_pass(parts: DataFrame, base: dict, key_col: str,
                        len_col: str, carry: list[str]) -> DataFrame:
    """Per-partition running sum as one Arrow pass: rows arrive sorted
    by ``key_col`` within their pinned partition (each tagged with a
    constant ``__pid``), so each task accumulates a cumulative sum
    starting at its partition's precomputed base offset. No Exchange —
    the carried payload columns stream through untouched."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema

    in_schema = to_arrow_schema(parts.schema)
    out_fields = [
        in_schema.field(key_col),
        pa.field("n", pa.int64()),
        pa.field("off", pa.int64()),
        *[in_schema.field(c) for c in carry],
    ]
    out_schema = pa.schema(out_fields)

    def fn(batches):
        acc = None
        for b in batches:
            if b.num_rows == 0:
                continue
            if acc is None:
                pid = b.column("__pid")[0].as_py()
                acc = int(base.get(pid, 0))
            n = b.column(len_col).to_numpy(zero_copy_only=False).astype(np.int64)
            run = np.cumsum(n)
            off = acc + run - n
            acc += int(run[-1]) if len(run) else 0
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(key_col),
                    pa.array(n, type=pa.int64()),
                    pa.array(off, type=pa.int64()),
                    *[b.column(c) for c in carry],
                ],
                schema=out_schema,
            )

    return parts.mapInArrow(
        fn, schema=from_arrow_schema(out_schema, prefer_timestamp_ntz=True)
    )


def shuffle_order(df: DataFrame, key_col: str, seed,
                  num_partitions: int | None = None) -> DataFrame:
    """Deterministic global training-data shuffle: every row gets a
    dense 0-based ``pos`` in the order of ``md5(key:seed)`` — the
    epoch-reshuffle an LLM training job applies to its packed
    sequences (a different ``seed`` per epoch yields an independent,
    reproducible permutation).

    Scale shape: the naive Spark expression — ``row_number() OVER
    (ORDER BY hash)`` — collapses to ONE task. This reuses the
    two-phase distributed prefix sum (``_doc_offsets_pinned`` with a
    constant length of 1): one range shuffle on the hash, a
    per-partition Arrow cumsum, and ``num_partitions`` longs of driver
    state. The md5 is suffixed with the key itself so the sort key is
    unique (ties would otherwise order partition-dependently): md5 hex
    is fixed-width, so comparing the concatenation equals ordering by
    ``(md5, key)``.

    Returns ``(key_col, pos)``; positions are exactly 0..n-1."""
    work = df.select(
        F.concat_ws(
            ":",
            F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                              F.lit(str(seed)))),
            F.col(key_col).cast("string"),
        ).alias("__h"),
        F.lit(1).cast("bigint").alias("__one"),
        F.col(key_col),
    )
    offs, pinned = _doc_offsets_pinned(
        work, "__h", "__one", num_partitions, carry=[key_col]
    )
    out = offs.select(F.col(key_col), F.col("off").alias("pos")) \
        .localCheckpoint(eager=True)
    pinned.unpersist()
    return out


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


def sequence_pack_tokens(df: DataFrame, seq_len: int, key_col: str,
                         tokens_col: str,
                         num_partitions: int | None = None) -> DataFrame:
    """The packed training sequences THEMSELVES: (seq_id, n_tokens,
    tokens), where ``tokens`` is every document's token array laid
    end-to-end in global ``key_col`` order and cut into exact
    ``seq_len``-token sequences (the last one short). The payload
    companion to ``sequence_pack_spans`` — spans pin the geometry, this
    emits the data an LLM training job actually reads.

    Scale shape: the token arrays ride the ONE range shuffle of the
    two-phase prefix sum (``carry=`` threading — no join-back of the
    payload), per-row offsets are a per-partition Arrow cumsum (no
    Window Exchange), and each document is sliced into at most
    ``n/seq_len + 2`` pieces which shuffle ONCE on ``seq_id`` for
    reassembly. Total movement ≈ 2× the token payload, independent of
    document count; per-sequence state is bounded by ``seq_len``.

    Zero-length documents are dropped (they occupy no sequence).
    Element type of ``tokens`` is preserved from the input arrays.
    """
    work = df.select(
        F.col(key_col),
        F.col(tokens_col).alias("__toks"),
    ).withColumn("__n", F.coalesce(F.size("__toks"), F.lit(0)).cast("bigint"))
    offs, _pinned = _doc_offsets_pinned(
        work, key_col, "__n", num_partitions, carry=["__toks"]
    )
    # NOTE: the pinned projection stays in executor storage until the
    # returned plan is garbage-collected — the result is the full data,
    # so there is nothing small to materialize-and-free here (unlike
    # sequence_pack_spans).
    offs = offs.filter(F.col("n") > 0)
    L = F.lit(seq_len)
    pieces = (
        # integer DIV for 2^53 exactness (same reasoning as the spans)
        offs.withColumn("s_first", F.expr(f"off DIV {seq_len}"))
        .withColumn("s_last", F.expr(f"(off + n - 1) DIV {seq_len}"))
        .select(
            "n", "off", "__toks",
            F.explode(F.sequence("s_first", "s_last")).alias("seq_id"),
        )
        # where this piece starts inside the sequence, and which slice
        # of the document it carries (1-based slice; within-doc
        # positions fit int32 — a single document larger than 2^31
        # tokens would have failed collection upstream long before)
        .withColumn(
            "pos_in_seq",
            F.greatest(F.col("off") - F.col("seq_id") * L, F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "start_in_doc",
            F.greatest(F.col("seq_id") * L - F.col("off"), F.lit(0)),
        )
        .withColumn(
            "take",
            F.least((F.col("seq_id") + 1) * L, F.col("off") + F.col("n"))
            - F.greatest(F.col("seq_id") * L, F.col("off")),
        )
        .select(
            "seq_id",
            "pos_in_seq",
            F.slice(
                "__toks",
                (F.col("start_in_doc") + 1).cast("int"),
                F.col("take").cast("int"),
            ).alias("piece"),
        )
    )
    return (
        pieces.groupBy("seq_id")
        # pieces of one sequence tile it without overlap, so pos_in_seq
        # is unique within the group and array_sort's struct ordering
        # (first field first) reassembles deterministically despite
        # collect_list's nondeterministic arrival order
        .agg(F.collect_list(F.struct("pos_in_seq", "piece")).alias("__ps"))
        .withColumn(
            "tokens",
            F.flatten(F.transform(F.array_sort("__ps"), lambda x: x["piece"])),
        )
        .select(
            F.col("seq_id").cast("bigint").alias("seq_id"),
            F.size("tokens").cast("bigint").alias("n_tokens"),
            "tokens",
        )
    )
