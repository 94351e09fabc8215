"""Targeted GDPR erasure: pruning really prunes, rows really vanish,
untouched files stay byte-identical, and the committed swap replays."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from procurement_data_pipeline_spark.operators.erasure import (
    _MANIFEST,
    _TMP_SUFFIX,
    erase_users,
    recover_erasure,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def _file_digests(path: str) -> dict[str, str]:
    out = {}
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            with open(os.path.join(path, name), "rb") as f:
                out[name] = hashlib.sha256(f.read()).hexdigest()
    return out


@pytest.fixture()
def clustered_events(spark, sf_dir, tmp_path):
    """events written range-clustered on user_id into 4 files, so the
    footer index can prune erase targets to one file."""
    dst = str(tmp_path / "events_tbl")
    ev = load_table(spark, sf_dir, "events")
    (
        ev.repartitionByRange(4, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(dst)
    )
    return dst


def test_erase_targets_only_their_files(spark, sf_dir, clustered_events):
    dst = clustered_events
    before = spark.read.parquet(dst)
    total_before = before.count()
    # pick two existing adjacent user ids from the low range
    ids = [r["user_id"] for r in before.select("user_id").distinct().orderBy("user_id").limit(2).collect()]
    victim_rows = before.filter(before.user_id.isin(ids)).count()
    assert victim_rows > 0
    digests_before = _file_digests(dst)

    audit = erase_users(spark, dst, ids)
    assert audit["rows_deleted"] == victim_rows
    assert audit["rows_before"] - audit["rows_after"] == victim_rows
    # range clustering → at most half the files admit two adjacent low ids
    assert 1 <= audit["files_rewritten"] < audit["files_total"]

    after = spark.read.parquet(dst)
    assert after.filter(after.user_id.isin(ids)).count() == 0
    assert after.count() == total_before - victim_rows
    # files the pruner skipped are byte-identical
    digests_after = _file_digests(dst)
    untouched = set(digests_before) & set(digests_after)
    assert untouched, "pruning should have left some files in place"
    for name in untouched:
        assert digests_before[name] == digests_after[name]
    # no scratch directories left behind
    parent = os.path.dirname(dst)
    assert [d for d in os.listdir(parent) if "__erase" in d] == []


def test_erase_is_idempotent_on_rows(spark, clustered_events):
    dst = clustered_events
    ids = [r["user_id"] for r in spark.read.parquet(dst).select("user_id").distinct().limit(1).collect()]
    first = erase_users(spark, dst, ids)
    assert first["rows_deleted"] > 0
    second = erase_users(spark, dst, ids)
    assert second["rows_deleted"] == 0
    assert not second["recovered"]


def test_committed_swap_replays_after_crash(spark, clustered_events, tmp_path):
    """Simulate a crash one instruction after the commit point: the
    manifest exists, replacements are staged, nothing promoted yet.
    recover_erasure must finish the swap exactly as the live run would."""
    dst = clustered_events
    df = spark.read.parquet(dst)
    ids = [r["user_id"] for r in df.select("user_id").distinct().orderBy("user_id").limit(1).collect()]
    total_before = df.count()
    victims = df.filter(df.user_id.isin(ids)).count()

    # stage replacements by hand, exactly like erase_users pre-commit
    files = sorted(
        os.path.join(dst, f) for f in os.listdir(dst) if f.endswith(".parquet")
    )
    lo_file = files[0]  # range-clustered: the lowest ids live in one file
    tmp = dst + _TMP_SUFFIX
    from pyspark.sql import functions as F

    kept = spark.read.parquet(lo_file).filter(~F.col("user_id").isin(ids))
    kept.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _MANIFEST), "w") as f:
        json.dump([lo_file], f)

    assert recover_erasure(spark, dst)
    after = spark.read.parquet(dst)
    assert after.filter(after.user_id.isin(ids)).count() == 0
    assert after.count() == total_before - victims
    assert not os.path.exists(tmp)
    assert not os.path.exists(dst + "__erase_parked")


def test_uncommitted_scratch_rolls_back(spark, clustered_events):
    """Before the manifest exists the live table was never touched — a
    leftover tmp directory is just dropped."""
    dst = clustered_events
    tmp = dst + _TMP_SUFFIX
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "junk.txt"), "w") as f:
        f.write("partial")
    before = _file_digests(dst)
    assert recover_erasure(spark, dst)
    assert not os.path.exists(tmp)
    assert _file_digests(dst) == before


def test_erase_rejects_empty_request(spark, clustered_events):
    with pytest.raises(ValueError):
        erase_users(spark, clustered_events, [])


def test_erase_survives_float_rounded_footer_stats(spark, tmp_path):
    """Ids above 2^53 lose precision when footer stats round to float64;
    the pruner must widen the envelope so rounding can only KEEP files,
    never skip one holding a target (a skipped file would be a silent
    right-to-be-forgotten violation)."""
    dst = str(tmp_path / "big_ids")
    base = 2**53
    spark.createDataFrame(
        [(base - 10,), (base + 1,), (base + 3,)], "user_id long"
    ).coalesce(1).write.mode("overwrite").parquet(dst)
    target = base + 3  # rounds DOWN to 2^53 in float64 (the max stat)
    audit = erase_users(spark, dst, [target])
    assert audit["files_rewritten"] == 1
    assert audit["rows_deleted"] == 1
    left = {r["user_id"] for r in spark.read.parquet(dst).collect()}
    assert left == {base - 10, base + 1}


def test_erase_preserves_null_keyed_rows(spark, tmp_path):
    """Code-review r8: ~isin over NULL is NULL (falsy) — without the
    explicit isNull() guard, NULL-keyed rows in any rewritten file were
    silently deleted alongside the targets."""
    from procurement_data_pipeline_spark.operators.erasure import erase_users

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (None, "keepme"), (2, "b"), (None, "metoo")],
        "user_id long, payload string",
    ).coalesce(1).write.parquet(path)
    audit = erase_users(spark, path, [1])
    got = spark.read.parquet(path).collect()
    assert sorted(r["payload"] for r in got) == ["b", "keepme", "metoo"]
    assert audit["rows_deleted"] == 1


def test_erase_refuses_hive_partitioned_layout(spark, tmp_path):
    """Code-review r8: replacements promote into the table ROOT by
    basename and the partition column cannot be recovered from leaf
    files — a nested layout must be refused, not corrupted."""
    import pytest as _pytest

    from procurement_data_pipeline_spark.operators.erasure import erase_users

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "2020-01-01"), (2, "2020-01-02")], "user_id long, d string"
    ).write.partitionBy("d").parquet(path)
    with _pytest.raises(ValueError, match="FLAT parquet directory"):
        erase_users(spark, path, [1])
    # nothing was touched: the partitioned table still reads intact
    assert spark.read.parquet(path).count() == 2
