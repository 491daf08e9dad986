"""Distributed as-of (temporal) join: for each left row, the single
most recent right row with ``right.ts <= left.ts`` within the same key.

Spark has no ASOF JOIN operator (DuckDB and Pandas do), and the naive
formulations are scale-killers:

* the range-join ``ON l.key = r.key AND r.ts <= l.ts`` + row_number
  materializes every (left, PRIOR right) pair before picking one —
  O(n·m) per key, quadratic on active keys;
* a per-row correlated subquery is a driver loop.

The standard distributed formulation used here is UNION + RUNNING LAST:
tag both sides, union them (right rows carry their payload, left rows
carry nulls), and take ``last(payload, ignorenulls=True)`` over
``PARTITION BY key ORDER BY (ts, side)`` with side ordering right rows
FIRST at an equal timestamp (so ``<=``, not ``<``, semantics — flip via
``strict=True``). Left rows then read the most recent right payload in
O((n+m) log) with exactly ONE shuffle of each side on the key, no pair
explosion, and linear per-key memory.

Scale shape (100 TB): the union shuffles each side once on the key —
the same cost as the equi-join any formulation needs. All rows of one
key land in one task via the window partition; per-key work is a sort +
single pass, so only a single pathological key (≫ one task's rows)
would hot-spot, and such a key would break ANY per-key ordered
semantics. Ties WITHIN a side at the same (key, ts) are broken by the
right side's ordering columns deterministically (``right_order``).

Reference parity: not in the reference (batch columnar codec only,
SURVEY.md §2.2 — no joins at all); this is an engine extension from the
task brief's custom-operator list, matching DuckDB ASOF JOIN semantics
(the correctness oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the
    latest ``right`` row at-or-before it (``strict=True``: strictly
    before) on ``ts_col`` within the same ``key_col``; nulls where no
    prior right row exists.

    ``payload_cols`` — right columns to carry (default: all but key/ts);
    emitted as ``<name><suffix>`` plus ``<ts_col><suffix>`` (the matched
    right timestamp). Right-side ties at one (key, ts) resolve to the
    row greatest by ``payload_cols`` order (deterministic).

    Null handling (SQL join semantics, matching the DuckDB ASOF oracle):
    right rows with a null ``ts_col`` OR a null ``key_col`` are dropped
    (NULL never equals NULL in a join, and a row with no timestamp is
    never "the most recent at t" — without the key filter the window
    partition would group the NULL keys together and match them); left
    rows with a null key or null ts are preserved with a null match.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key_col, ts_col)]
    right = right.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
    out_names = [f"{ts_col}{suffix}"] + [f"{c}{suffix}" for c in payload_cols]

    # one struct per right row: ordered by (ts, payload...) so the
    # running MAX of the struct IS "latest right row so far" — max()
    # needs no ignorenulls gymnastics and breaks equal-ts ties
    # deterministically by the payload ordering
    rstruct = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    # side: right rows order BEFORE left rows at an equal timestamp for
    # <= semantics (the right row is already visible), AFTER them for <
    side_right = 0 if not strict else 2
    r = right.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.lit(side_right).alias("__side"),
        rstruct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(key_col),
        F.col(ts_col).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # struct max is lexicographic on (__ts, payload...): exactly "the
    # right row with the greatest timestamp seen so far" (nulls sort
    # low, so any real right row beats the left rows' null struct)
    joined = (
        l.unionByName(r)
        .withColumn("__best", F.max("__r").over(w))
        .filter(F.col("__side") == 1)
    )
    sel = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    sel.append(F.col("__best.__ts").alias(out_names[0]))
    sel += [F.col(f"__best.{c}").alias(n) for c, n in zip(payload_cols, out_names[1:])]
    return joined.select(*sel)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    lower,
    upper,
    suffix: str = "_right",
) -> DataFrame:
    """Bounded time-range join: every (left, right) pair within the key
    where ``left.ts + lower <= right.ts <= left.ts + upper`` (inner;
    bounds inclusive; ``lower``/``upper`` in the units of ``ts_col`` —
    pass microseconds for timestamps, see below). Right columns are
    emitted with ``suffix``.

    The naive ``ON l.k = r.k AND r.ts BETWEEN ...`` plans as an equi-join
    whose per-key output is all-pairs FILTERED AFTERWARD — every (l, r)
    pair of a key is materialized in the join before the range predicate
    runs, O(n·m) per key. This operator buckets both sides into
    fixed-width time BINS of width w = upper - lower: a right row joins
    on its own bin; each left row probes the (at most two) bins its
    window overlaps. The equi-join key becomes (key, bin), so the join
    only materializes candidates from overlapping bins (≤ 2 bins' worth
    per left row), then applies the exact range filter. One shuffle per
    side on (key, bin); hot bins are ordinary join skew (AQE splits
    them). Timestamp columns are binned on their epoch micros
    (``unix_micros``), so pass ``lower``/``upper`` in MICROSECONDS for
    timestamp ``ts_col``; integer columns bin on their raw value.

    Reference parity: n/a (the reference has no joins, SURVEY.md §2.2) —
    task-brief range-join extension; oracle = the plain inequality join
    in DuckDB (exact at oracle scale).
    """
    if not upper > lower:
        raise ValueError(f"interval_join needs upper > lower, got [{lower}, {upper}]")
    from pyspark.sql.types import TimestampNTZType, TimestampType

    def epoch(df):
        t = df.schema[ts_col].dataType
        if isinstance(t, (TimestampType, TimestampNTZType)):
            return F.unix_micros(F.col(ts_col).cast("timestamp"))
        return F.col(ts_col).cast("long")

    w = int(upper - lower)
    # bins via exact int64 arithmetic, not float64 division (doubles
    # would misbin values >= 2^53, silently dropping pairs): pmod makes
    # the numerator an exact non-negative-remainder multiple of w, so
    # the truncating `div` equals the floor for any sign
    r = right.select(
        F.col(key_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c != key_col],
        epoch(right).alias("__rts"),
    ).withColumn(
        "__bin", F.expr(f"(__rts - pmod(__rts, {w}L)) div {w}L")
    )
    lo, hi = F.col("__lts") + F.lit(int(lower)), F.col("__lts") + F.lit(int(upper))
    l = (
        left.withColumn("__lts", epoch(left))
        .withColumn("__blo", lo)
        .withColumn("__bhi", hi)
        .withColumn(
            "__bin",
            F.explode(F.array_distinct(F.array(
                F.expr(f"(__blo - pmod(__blo, {w}L)) div {w}L"),
                F.expr(f"(__bhi - pmod(__bhi, {w}L)) div {w}L"),
            ))),
        )
        .drop("__blo", "__bhi")
    )
    out = (
        l.join(r, [key_col, "__bin"], "inner")
        .filter((F.col("__rts") >= lo) & (F.col("__rts") <= hi))
        .drop("__bin", "__lts", "__rts")
    )
    return out
