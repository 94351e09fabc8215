"""Exactly-once streaming appends onto the versioned table format.

``foreachBatch`` gives AT-LEAST-ONCE batch delivery: after a crash between
a sink write and the checkpoint commit, Structured Streaming re-runs the
same (batch_id, data). Plain parquet appends would duplicate those rows.
Landing each microbatch as a VERSION of operators/versioning.py's table
closes the gap with the classic idempotent-sink recipe:

* every committed version carries the STREAM IDENTITY (the checkpoint
  location — stable across restarts of the same query) plus the
  ``batch_id`` it came from, the Delta ``txnAppId``/``txnVersion`` recipe;
* a replayed batch is detected by ``batch_id <= max committed batch_id``
  FOR THE SAME stream identity (Structured Streaming batch ids are
  monotonically increasing per checkpoint, but reset to 0 under a NEW
  checkpoint) and skipped BEFORE any write — the replay is a no-op, so
  the table holds each batch exactly once;
* a DIFFERENT stream identity writing to an already-streamed table raises
  loudly instead of silently skipping its batches as "replays" — a
  restarted-with-fresh-checkpoint query or a second concurrent query must
  be an explicit operator decision (new table, or reuse the checkpoint),
  never quiet data loss;
* the version publish is atomic (create-no-overwrite manifest rename), so
  the failure window "data written, manifest missing" leaves an invisible
  orphan the next replay supersedes — identical to the batch-writer story.

Durability of the replay guard (code-review r8): manifests EXPIRE —
vacuum after a couple of OPTIMIZE passes can retire every stream-tagged
manifest, after which a manifest-only check would re-admit a replayed
batch as new. Each commit therefore also advances a tiny append-only
batch CURSOR under ``{table}/_stream_state/{hash(stream_id)}/`` (the same
crash-atomic rename-committed file scheme as the CDF consumer's cursor),
which vacuum never touches. ``last_committed_batch`` consults both and
trusts the newer; the one remaining window — crash between the manifest
publish and the cursor write, AND a vacuum that expires that very
manifest before the restart — requires running vacuum while the stream is
down mid-crash, which the vacuum contract (no concurrent maintenance)
already forbids.

Stream identity is the FULLY-QUALIFIED checkpoint path (Hadoop
``makeQualified``), so ``/tmp/ckpt`` and ``file:///tmp/ckpt`` name the
same stream across restarts instead of wedging the query with a false
StreamIdentityError; identities recorded by older versions are qualified
before comparison for the same reason.

Bonus the plain-parquet sink can't offer: every microbatch is a time-
travel point. ``read_table(path, version=k)`` reproduces the table as of
any past trigger — reprocessing audits without any reprocessing.

100 TB shape: per trigger this is one manifest read (the latest), one
append of the batch's files, one manifest publish and one cursor-file
rename — O(batch), never O(table).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession

from procurement_data_pipeline_spark.operators.cdf_consumer import (
    _advance_cursor,
    _cursor_versions,
)
from procurement_data_pipeline_spark.operators.erasure import (
    _read_text,
    _write_text,
)
from procurement_data_pipeline_spark.operators.versioning import (
    _fs_path,
    _list_versions,
    _read_manifest,
    versioned_write,
)

_STREAM_OP_KEY = "stream_batch_id"
_STREAM_ID_KEY = "stream_id"
_STATE_DIRNAME = "_stream_state"


class StreamIdentityError(RuntimeError):
    """A different stream identity (checkpoint location) is writing to a
    table another stream already committed to. Skipping would silently
    drop every batch (fresh checkpoints restart batch ids at 0); appending
    would duplicate under replay. The operator must choose: reuse the
    original checkpoint, or target a fresh table."""


def _qualify(spark: SparkSession, path: str) -> str:
    """Fully-qualified form of ``path`` — one spelling per physical
    location, so restarts with equivalent URIs keep the same identity."""
    fs, p, _ = _fs_path(spark, path)
    return fs.makeQualified(p).toString().rstrip("/")


def _state_root(table_path: str) -> str:
    return table_path.rstrip("/") + "/" + _STATE_DIRNAME


def _state_dir(table_path: str, stream_id: str) -> str:
    tag = hashlib.md5(stream_id.encode("utf-8")).hexdigest()[:16]
    return _state_root(table_path) + "/" + tag


def _stream_states(
    spark: SparkSession, table_path: str
) -> list[tuple[str | None, int]]:
    """Every stream's durable ``(stream_id, last_batch)`` marker state.
    An empty cursor dir (crash before the first cursor rename) reports
    nothing — batch 0 must not be mistaken for already-committed."""
    fs, root, _jvm = _fs_path(spark, _state_root(table_path))
    if not fs.exists(root):
        return []
    out: list[tuple[str | None, int]] = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        d = st.getPath().toString()
        vs = _cursor_versions(spark, d)
        if not vs:
            continue
        id_file = d.rstrip("/") + "/id.json"
        sid = None
        if fs.exists(_fs_path(spark, id_file)[1]):
            # a torn id.json (crash mid-write under a non-atomic writer,
            # advice r9) must degrade to sid=None — the legacy-identity
            # path already handles it — not wedge every future commit
            # with a JSONDecodeError
            try:
                sid = json.loads(_read_text(spark, id_file))["stream_id"]
            except (ValueError, KeyError):
                sid = None
        # cursor content is name-determined: the max name IS the batch
        out.append((sid, vs[-1]))
    return out


def last_committed_batch(
    spark: SparkSession, table_path: str
) -> tuple[str | None, int] | None:
    """The newest committed ``(stream_id, batch_id)``: the durable state
    cursor when present (survives vacuum), else the newest stream-tagged
    manifest (pre-cursor tables); None for a table no stream has written.
    ``stream_id`` is None only for pre-identity legacy manifests."""
    best: tuple[str | None, int] | None = None
    for sid, b in _stream_states(spark, table_path):
        if best is None or b > best[1]:
            best = (sid, b)
    for v in reversed(_list_versions(spark, table_path)):
        man = _read_manifest(spark, table_path, v)
        if _STREAM_OP_KEY in man:
            if best is None or man[_STREAM_OP_KEY] > best[1]:
                best = (man.get(_STREAM_ID_KEY), man[_STREAM_OP_KEY])
            break
    return best


def stream_to_versioned_table(
    stream: DataFrame, table_path: str, checkpoint_dir: str
):
    """Return a started-ready writeStream that appends each microbatch as
    one table version, exactly once under replay. Caller starts it with
    ``.trigger(...)``/``.start()`` of their choice via the returned
    DataStreamWriter."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stream_id = _qualify(spark, checkpoint_dir)
        last = last_committed_batch(spark, table_path)
        if last is not None:
            last_id, last_batch = last
            # qualify legacy recorded identities so an equivalent URI
            # spelling never wedges the same physical checkpoint
            if (
                last_id is not None
                and _qualify(spark, last_id) != stream_id
            ):
                raise StreamIdentityError(
                    f"table {table_path} was last streamed to by "
                    f"checkpoint {last_id!r}; this query uses "
                    f"{stream_id!r} — its batch ids are not comparable, "
                    "so neither skip nor append is safe"
                )
            if batch_id <= last_batch:
                return  # replayed batch: already a committed version
        versioned_write(
            spark,
            batch_df,
            table_path,
            mode="append",
            extra={_STREAM_OP_KEY: batch_id, _STREAM_ID_KEY: stream_id},
        )
        # durable replay guard: survives manifest expiry (vacuum). The
        # raw stream id is recorded write-once beside the cursor so the
        # identity error can name the foreign checkpoint.
        sdir = _state_dir(table_path, stream_id)
        id_file = sdir.rstrip("/") + "/id.json"
        fs, id_p, jvm = _fs_path(spark, id_file)
        _advance_cursor(spark, sdir, batch_id)
        if not fs.exists(id_p):
            # tmp + rename so a crash mid-write can never leave a torn
            # id.json (advice r9); the reader also tolerates one, but a
            # torn file would downgrade this stream to legacy identity
            tmp_file = sdir.rstrip("/") + "/.id.json.tmp"
            _write_text(spark, tmp_file, json.dumps({"stream_id": stream_id}))
            hpath = jvm.org.apache.hadoop.fs.Path
            if not fs.rename(hpath(tmp_file), id_p):
                # lost to a concurrent commit of the SAME stream id
                # (content is identity-determined) — success either way
                fs.delete(hpath(tmp_file), False)

    return stream.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )


__all__ = [
    "stream_to_versioned_table",
    "last_committed_batch",
    "StreamIdentityError",
]
