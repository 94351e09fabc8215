"""Change data feed over versioned tables: row-level deltas between versions.

Delta's CDF answers "what changed between version i and j?" without the
consumer diffing snapshots itself. The versioned format's manifests make
the common case FREE: any range whose end-version file set is a superset
of the start's (pure appends — every streaming-sink microbatch, every
plain append, every dedup-index ingest) has its delta sitting verbatim in
the added files; ``table_changes`` just reads them and tags inserts. Zero
joins, zero scans of pre-existing data — at 100 TB this is the difference
between a CDC read costing O(new rows) and one costing O(table).

Ranges that include overwrites / merges / rollbacks fall back to a keyed
``snapshot_diff`` (operators/cdc.py) of the two endpoint snapshots — the
general, always-correct path (one full-outer join). OPTIMIZE rewrites are
recognized by row-identity, not file-identity: the fallback diff returns
the correct empty changelog.

Output schema matches snapshot_diff: ``key_cols, old_<c>…, new_<c>…,
change_type`` — downstream consumers (incremental refreshers, audit
sinks) cannot tell which path produced the feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.cdc import snapshot_diff
from procurement_data_pipeline_spark.operators.versioning import (
    _read_manifest,
    _resolve_manifest,
    latest_version,
    read_table,
)


def table_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int | None = None,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
    from_timestamp=None,
    to_timestamp=None,
) -> DataFrame:
    """Row-level changelog from ``from_version`` (exclusive) to
    ``to_version`` (inclusive, default latest).

    ``key_cols`` is required only when the range is not pure-append (an
    overwrite / merge / rollback needs a keyed diff); the pure-append fast
    path works without keys and reads ONLY the added files.

    ``from_timestamp`` / ``to_timestamp`` are the Delta CDF timestamp
    forms: each resolves to the greatest version committed at or before
    it (``version_as_of_timestamp``), then the version semantics above
    apply — so "changes since instant T" means changes AFTER the version
    that was current at T, exactly Delta's reading.
    """
    from procurement_data_pipeline_spark.operators.versioning import (
        version_as_of_timestamp,
    )

    if from_timestamp is not None:
        if from_version is not None:
            raise ValueError("pass from_version OR from_timestamp, not both")
        from_version = version_as_of_timestamp(
            spark, table_path, from_timestamp
        )
    if from_version is None:
        raise ValueError("table_changes needs from_version or from_timestamp")
    if to_timestamp is not None:
        if to_version is not None:
            raise ValueError("pass to_version OR to_timestamp, not both")
        to_version = version_as_of_timestamp(spark, table_path, to_timestamp)
    if to_version is None:
        to_version = latest_version(spark, table_path)
        if to_version is None:
            raise ValueError(f"no versions published at {table_path}")
    if not 0 <= from_version <= to_version:
        raise ValueError(
            f"need 0 <= from_version <= to_version, got {from_version}..{to_version}"
        )
    added: list[str] | None = None
    if from_version > 0:
        # delta-manifest fast path: when every commit in (from, to] is an
        # append DELTA, the changed files are exactly the union of their
        # adds — O(changed versions) raw manifest reads, never a full
        # file-list materialization + set diff (which is O(table files)
        # of driver work on a million-file table)
        adds: list[str] = []
        fast = True
        for v in range(from_version + 1, to_version + 1):
            raw = _read_manifest(spark, table_path, v)
            if (
                raw.get("op") != "append"
                or "delta_of" not in raw
                or raw.get("removes")
                or raw.get("deletes_adds")  # merge-on-read: rows removed
            ):
                fast = False
                break
            adds.extend(raw["adds"])
        if fast:
            added = sorted(adds)
    bootstrap = from_version == 0
    if added is None and not bootstrap:
        old_man = _resolve_manifest(spark, table_path, from_version)
        old_files = set(old_man["files"])
        new_man = _resolve_manifest(spark, table_path, to_version)
        new_files = set(new_man["files"])
        # a merge-on-read delete changes NO data file — the file-subset
        # test alone would report an empty insert feed for a range that
        # DELETED rows. Equal delete-entry lists are required for the
        # pure-append fast path.
        if old_files <= new_files and old_man.get("deletes", []) == new_man.get(
            "deletes", []
        ):
            added = sorted(new_files - old_files)

    if added is not None or bootstrap:
        to_df = read_table(spark, table_path, version=to_version)
        cols = [c for c in to_df.columns]
        keys = key_cols or []
        compare = [c for c in cols if c not in keys]
        if bootstrap:
            # from version 0 the feed is EVERY row of the snapshot as an
            # insert — read_table, not raw files, so merge-on-read delete
            # entries are applied (code-review r9: the raw-file path
            # emitted masked rows as inserts and the delete-equality check
            # wrongly demanded key_cols for a keyless bootstrap)
            base = to_df
        elif not added:
            base = to_df.limit(0)
        else:
            # pure-append range WITH UNCHANGED delete entries: files added
            # after from_version were born after every live entry's
            # version, so a raw read is exact
            base = spark.read.schema(to_df.schema).parquet(*added)
        return base.select(
            *keys,
            *[F.lit(None).cast(base.schema[c].dataType).alias(f"old_{c}") for c in compare],
            *[F.col(c).alias(f"new_{c}") for c in compare],
            F.lit("insert").alias("change_type"),
        )

    if not key_cols:
        raise ValueError(
            f"versions {from_version}..{to_version} include a rewrite "
            "(overwrite/merge/rollback/optimize) — key_cols are required "
            "for the snapshot diff"
        )
    old_df = (
        read_table(spark, table_path, version=from_version)
        if from_version > 0
        else read_table(spark, table_path, version=to_version).limit(0)
    )
    return snapshot_diff(
        old_df, read_table(spark, table_path, version=to_version), key_cols
    )


__all__ = ["table_changes"]
