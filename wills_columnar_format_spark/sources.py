"""Source adapter: Iceberg table (with snapshot lineage) or parquet path.

The north rule targets Iceberg tables of pre-tokenized sequences; the
sandbox has no Iceberg jars, so the adapter resolves what's available
and degrades cleanly (SURVEY.md §7.0): an Iceberg identifier yields the
DataFrame plus its CURRENT SNAPSHOT ID (pinned into every manifest row
for lineage/resume identity); a parquet path yields snapshot_id=None.

At 100 TB the snapshot id is what makes resume sound: a re-run against a
moved table must NOT silently mix chunks from two snapshots —
``load_table`` + ``encode_table_resumable(snapshot_id=...)`` give each
chunk row its input version.
"""

from __future__ import annotations


def load_table(spark, source: str):
    """Resolve ``source`` to (DataFrame, snapshot_id, kind).

    ``source`` may be an Iceberg/catalog table identifier (``db.tbl`` or
    ``catalog.db.tbl``) or a filesystem path to parquet.
    """
    if "/" not in source and _looks_like_table(source):
        try:
            df = spark.read.table(source)
            snap = _iceberg_snapshot_id(spark, source)
            return df, snap, "iceberg" if snap is not None else "catalog"
        except Exception:
            pass  # fall through to parquet
    return spark.read.parquet(source), None, "parquet"


def _looks_like_table(source: str) -> bool:
    parts = source.split(".")
    return 1 <= len(parts) <= 3 and all(p.isidentifier() for p in parts)


def _iceberg_snapshot_id(spark, table: str) -> str | None:
    """Current snapshot id via the Iceberg metadata table; None when the
    catalog isn't Iceberg-backed (e.g. plain Hive/in-memory catalog)."""
    try:
        row = (
            spark.sql(f"SELECT snapshot_id FROM {table}.snapshots "
                      f"ORDER BY committed_at DESC LIMIT 1")
            .collect()
        )
        return str(row[0].snapshot_id) if row else None
    except Exception:
        return None
