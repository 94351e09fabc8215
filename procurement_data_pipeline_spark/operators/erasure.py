"""Right-to-be-forgotten: targeted row erasure over plain parquet.

GDPR/CCPA deletion requests are the operational case where "rewrite the
table" is not an answer: at 100 TB a single user's rows live in a handful
of files, and the erase job must touch ONLY those. Table formats
(Delta/Iceberg) get this from their manifest layer; this operator
recovers the same behavior for plain parquet directories by composing the
repo's footer-stats index (:mod:`.fileindex`) with a manifest-committed
file swap:

1. **Prune** — read every file's ``[min, max]`` envelope for the id
   column from footers only (O(files), no data pages) and keep the files
   whose envelope admits at least one target id (NULL stats always keep —
   pruning must never prove too much). With range-clustered layout (see
   ``catalog.z_order_write`` / sorted writes) this is a tiny fraction of
   the table; with random layout it degrades to a full rewrite, which is
   the true cost of that layout, reported honestly in the audit.
2. **Rewrite** — ONE distributed job reads just the candidate files,
   anti-filters the targets, and writes replacements to a side directory.
3. **Commit** — a manifest file listing the candidate originals is
   written into the side directory; its existence is the commit point.
   Then candidates are parked (per-file Hadoop-FS rename), replacements
   move in, and the parked copies are dropped.

Every crash point is recoverable by :func:`recover_erasure` (called
automatically at the start of :func:`erase_users`): before the manifest
exists the live table was never touched (roll the side directory back);
after it exists the swap replays forward — renames of already-moved
files skip, so replay is idempotent. At no point can both the original
and replacement version of a file be live simultaneously, and at no
point is a row lost: the parked copies survive until the last step.

The deletion audit a DPO needs is returned: files pruned vs rewritten
and exact row counts before/after (both read from footers, not scans).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.fileindex import (
    _list_parquet_files,
    footer_stats,
)

_TMP_SUFFIX = "__erase_tmp"
_PARK_SUFFIX = "__erase_parked"
_MANIFEST = "_ERASE_MANIFEST.json"


def _fs_path(spark: SparkSession, p: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(p)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path, jvm


def _write_text(spark: SparkSession, uri: str, text: str) -> None:
    fs, path, _ = _fs_path(spark, uri)
    out = fs.create(path, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, uri: str) -> str:
    # NB: a py4j byte[] argument is copied, not shared — stream.read(buf)
    # can never fill a Python bytearray. Drain the stream JVM-side.
    fs, path, jvm = _fs_path(spark, uri)
    stream = fs.open(path)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _replay_commit(spark: SparkSession, path: str) -> None:
    """Forward-replay a committed swap: park manifest sources still live,
    promote remaining replacement files, drop parked + tmp. Idempotent."""
    tmp, park = path.rstrip("/") + _TMP_SUFFIX, path.rstrip("/") + _PARK_SUFFIX
    fs, live_p, jvm = _fs_path(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    park_p = hpath(park)
    fs.mkdirs(park_p)
    sources = json.loads(_read_text(spark, tmp.rstrip("/") + "/" + _MANIFEST))
    for uri in sources:
        src = hpath(uri)
        if fs.exists(src):
            if not fs.rename(src, hpath(park_p, src.getName())):
                raise IOError(f"failed to park {uri}")
    for f in _list_parquet_files(spark, tmp):
        src = hpath(f)
        dst = hpath(live_p, src.getName())
        if fs.exists(dst):
            continue  # already promoted by the crashed run
        if not fs.rename(src, dst):
            raise IOError(f"failed to promote {f}")
    fs.delete(park_p, True)
    fs.delete(hpath(tmp), True)


def recover_erasure(spark: SparkSession, path: str) -> bool:
    """Finish or roll back an interrupted :func:`erase_users`.

    Returns True if there was anything to recover. Safe to call any time;
    :func:`erase_users` calls it first, so a crashed erase heals on the
    next attempt (or on an explicit call from an ops runbook).
    """
    tmp, park = path.rstrip("/") + _TMP_SUFFIX, path.rstrip("/") + _PARK_SUFFIX
    fs, _, jvm = _fs_path(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    tmp_exists = fs.exists(hpath(tmp))
    park_exists = fs.exists(hpath(park))
    if not tmp_exists and not park_exists:
        return False
    if tmp_exists and fs.exists(hpath(tmp.rstrip("/") + "/" + _MANIFEST)):
        _replay_commit(spark, path)  # committed → forward
        return True
    # Not committed: the live directory was never modified. Restore any
    # parked strays (defensive — pre-commit runs never park), drop tmp.
    if park_exists:
        _, live_p, _ = _fs_path(spark, path)
        for f in _list_parquet_files(spark, park):
            src = hpath(f)
            dst = hpath(live_p, src.getName())
            if not fs.exists(dst):
                fs.rename(src, dst)
        fs.delete(hpath(park), True)
    if tmp_exists:
        fs.delete(hpath(tmp), True)
    return True


def erase_users(
    spark: SparkSession,
    path: str,
    user_ids: Sequence[int],
    id_col: str = "user_id",
) -> dict:
    """Erase every row whose ``id_col`` is in ``user_ids`` from the parquet
    directory at ``path``, rewriting only the files that can contain them.

    Returns the deletion audit::

        {files_total, files_rewritten, rows_before, rows_after,
         rows_deleted, recovered}

    ``user_ids`` is a bounded request list (deletion requests arrive in
    batches of at most thousands); it travels to executors as a broadcast
    literal. For larger sets, run in chunks — the swap is per-call atomic.
    """
    targets = sorted(set(int(u) for u in user_ids))
    if not targets:
        raise ValueError("user_ids must be non-empty")
    recovered = recover_erasure(spark, path)

    stats = footer_stats(spark, path, [id_col]).collect()
    import bisect
    import math

    def admits(r) -> bool:
        lo, hi = r[f"min_{id_col}"], r[f"max_{id_col}"]
        if lo is None or hi is None:
            return True  # no stats → cannot prune
        # footer_stats rounds int64 stats to float64 (error ≤ ½ ulp, which
        # is ~1024 at 2^63 scale). For an ERASE, pruning too much is a
        # silent right-to-be-forgotten violation — widen the envelope by a
        # full ulp each way so rounding can only ever keep extra files.
        lo = lo - math.ulp(lo)
        hi = hi + math.ulp(hi)
        i = bisect.bisect_left(targets, lo)
        return i < len(targets) and targets[i] <= hi

    candidates = [r for r in stats if admits(r)]
    # Flat-layout guard (code-review r8): replacements are promoted into
    # the table ROOT by basename, and spark.read.parquet(*leaf_files)
    # cannot recover hive partition-column values (no basePath) — on a
    # nested/hive layout the rewrite would drop the partition columns and
    # strand replacements in the wrong directory (same-basename files
    # could even collide mid-swap). Refuse loudly instead of corrupting;
    # erase partitioned tables partition-by-partition at the leaf dirs.
    fs, _live_p, jvm = _fs_path(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    live_dir = fs.makeQualified(hpath(path)).toUri().getPath().rstrip("/")
    nested = [
        r["file"]
        for r in candidates
        if fs.makeQualified(hpath(r["file"]))
        .getParent()
        .toUri()
        .getPath()
        .rstrip("/")
        != live_dir
    ]
    if nested:
        raise ValueError(
            f"erase_users requires a FLAT parquet directory; {len(nested)} "
            f"candidate file(s) sit in subdirectories (e.g. {nested[0]}) — "
            "a hive-partitioned table must be erased per leaf directory"
        )
    audit = {
        "files_total": len(stats),
        "files_rewritten": len(candidates),
        "rows_before": sum(r["n_rows"] for r in candidates),
        "rows_after": 0,
        "rows_deleted": 0,
        "recovered": recovered,
    }
    if not candidates:
        return audit

    tmp = path.rstrip("/") + _TMP_SUFFIX
    fs, _, jvm = _fs_path(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)  # stale pre-commit junk
    # NULL-keyed rows are never erasure targets: ~isin over NULL is NULL
    # (falsy) and would silently DELETE them — the same guard merge_into's
    # isin path carries (code-review r8: this was a real data-loss hole)
    kept = spark.read.parquet(*[r["file"] for r in candidates]).filter(
        F.col(id_col).isNull() | ~F.col(id_col).isin(targets)
    )
    kept.write.mode("overwrite").parquet(tmp)

    rows_after = sum(
        r["n_rows"] for r in footer_stats(spark, tmp, [id_col]).collect()
    )
    # Commit point: manifest in place → the swap below (or any future
    # recover_erasure) completes exactly once.
    _write_text(
        spark,
        tmp.rstrip("/") + "/" + _MANIFEST,
        json.dumps([r["file"] for r in candidates]),
    )
    _replay_commit(spark, path)
    audit["rows_after"] = rows_after
    audit["rows_deleted"] = audit["rows_before"] - rows_after
    return audit


__all__ = ["erase_users", "recover_erasure"]
