"""Structured Streaming + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.multimodal import (
    documents_as_media,
    extract_image_features,
    sample_frames,
)
from procurement_data_pipeline_spark.sources.tables import load_table
from procurement_data_pipeline_spark.streaming.pipeline import (
    click_attribution_join,
    dedup_events,
    hourly_rollup,
    read_event_stream,
    run_to_completion,
    session_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Materialize the events table as a multi-file parquet directory with a
    normal (microsecond) timestamp column, as a stream source."""
    out = str(tmp_path_factory.mktemp("events_src"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def test_stream_hourly_rollup_matches_batch(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    got = run_to_completion(
        hourly_rollup(stream),
        str(tmp_path / "ckpt1"),
        query_name="rollup_stream",
    )
    # append mode only emits windows the terminal watermark has closed:
    # window.end <= max(ts) - 2h. Compare against the batch result limited
    # the same way (the held-back tail is correct streaming semantics).
    ev = spark.read.parquet(events_dir)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(
            F.col("win.end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
        .select(F.col("win.start").alias("hour_start"), "event_type", "n_events")
    ).collect()
    got_key = {(r.hour_start, r.event_type): r.n_events for r in got}
    batch_key = {(r.hour_start, r.event_type): r.n_events for r in batch}
    assert got_key == batch_key


def test_stream_dedup_bounded(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    got = run_to_completion(
        dedup_events(stream), str(tmp_path / "ckpt2"), query_name="dedup_stream"
    )
    n_distinct = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert len(got) == n_distinct


def test_stream_session_counts_runs(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    got = run_to_completion(
        session_counts(stream), str(tmp_path / "ckpt3"), query_name="session_stream"
    )
    assert len(got) > 0
    assert all(r.n_events >= 1 for r in got)
    assert all(r.session_end >= r.session_start for r in got)


def test_stream_stream_join_matches_batch_range_join(
    spark, sf_dir, events_dir, tmp_path
):
    """The watermarked stream-stream interval join must produce exactly the
    batch inner range join's pairs (availableNow drains everything, so no
    rows are lost to the watermark horizon here)."""
    stream = read_event_stream(spark, events_dir)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    got = {
        (r.purchase_id, r.click_ts)
        for r in run_to_completion(
            click_attribution_join(purchases, clicks),
            str(tmp_path / "ckpt_ss"),
            query_name="attrib_stream",
        )
    }
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
    )
    want = {
        (r.purchase_id, r.click_ts)
        for r in p.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("click_ts") <= F.col("ts")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_documents_as_media_schema(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    row = media.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert len(row.meta.checksum) == 32
    assert row.meta.mime == "text/plain"


def test_extract_image_features_real_path_rejects_undecodable(spark, sf_dir):
    """Without fake=True the decode stage is REAL: text payloads have no
    shipped decoder and must raise (worker-side) rather than fabricate."""
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(3)
    with pytest.raises(Exception, match="no shipped decoder"):
        extract_image_features(media).collect()


def test_extract_image_features_real_png_decode(spark):
    """Real pixel decode: handcraft PNGs with known pixel content via the
    stdlib codec, run them through the Spark decode stage, and check exact
    dimensions/channels and the Rec.601 luma."""
    import numpy as np

    from procurement_data_pipeline_spark.llm_ops.codecs import encode_png

    white = np.full((8, 6, 3), 255, dtype=np.uint8)
    black = np.zeros((4, 4, 1), dtype=np.uint8)
    half = np.zeros((10, 10, 3), dtype=np.uint8)
    half[:5] = 255  # top half white -> luma 0.5
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(white))),
         (2, bytearray(encode_png(black))),
         (3, bytearray(encode_png(half)))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in extract_image_features(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_channels) == (6, 8, 3)
    assert abs(rows[1].mean_luma - 1.0) < 1e-9
    assert (rows[2].width, rows[2].height, rows[2].n_channels) == (4, 4, 1)
    assert rows[2].mean_luma == 0.0
    assert abs(rows[3].mean_luma - 0.5) < 1e-9


def test_resize_images_real_png_roundtrip(spark):
    """Real resize: PNG in, smaller valid PNG out, pixels = nearest-neighbor
    of the source (verified by decoding the output payload)."""
    import numpy as np

    from procurement_data_pipeline_spark.llm_ops.codecs import decode_png, encode_png
    from procurement_data_pipeline_spark.llm_ops.multimodal import resize_images

    src = np.zeros((4, 4, 3), dtype=np.uint8)
    src[:, 2:] = 255  # left black / right white
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(src)))], "media_id long, payload binary"
    )
    out = resize_images(df, 2, 2).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (2, 2)
    img = decode_png(bytes(out[0].payload))
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] == 0 and img[0, 1, 0] == 255


def test_extract_audio_features_real_wav(spark):
    """Real WAV decode via stdlib wave: a generated 440 Hz half-amplitude
    sine must come back with exact rate/duration and RMS ~ 0.5/sqrt(2)."""
    import io
    import wave as wave_mod

    import numpy as np

    from procurement_data_pipeline_spark.llm_ops.multimodal import (
        extract_audio_features,
    )

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        t = np.arange(8000)
        wv.writeframes(
            (np.sin(2 * np.pi * 440 * t / 8000) * 16384).astype("<i2").tobytes()
        )
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    row = extract_audio_features(df).collect()[0]
    assert row.sample_rate == 8000 and row.n_channels == 1
    assert abs(row.duration_s - 1.0) < 1e-9
    assert abs(row.rms - 0.5 / 2**0.5) < 0.01


def test_extract_image_features_fake_deterministic(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(50)
    a = {r.media_id: r for r in extract_image_features(media, fake=True).collect()}
    b = {r.media_id: r for r in extract_image_features(media, fake=True).collect()}
    assert len(a) == 50
    for mid in a:
        assert (a[mid].width, a[mid].height, a[mid].n_channels) == (
            b[mid].width,
            b[mid].height,
            b[mid].n_channels,
        )
        assert 64 <= a[mid].width < 256
        assert 0.0 <= a[mid].mean_luma <= 1.0


def test_sample_frames_slices_payload(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(5)
    frames = sample_frames(media, every_n_bytes=100, max_frames=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rows in by_media.items():
        assert len(rows) <= 3
        assert [r.frame_idx for r in sorted(rows, key=lambda x: x.frame_idx)] == list(
            range(len(rows))
        )
        assert all(len(r.frame_bytes) <= 100 for r in rows)


def test_stateful_running_user_stats_accumulates_across_batches(
    spark, events_dir, tmp_path
):
    from procurement_data_pipeline_spark.streaming.stateful import (
        running_user_stats,
    )

    # maxFilesPerTrigger=1 over a 4-file source → 4 microbatches, so totals
    # only come out right if GroupState survives between batches.
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    got = run_to_completion(
        running_user_stats(stream),
        str(tmp_path / "ckpt4"),
        query_name="stateful_stream",
        output_mode="update",
        # NoTimeout stateful query: the post-drain cleanup trigger emits
        # nothing — safe to treat it as drained (its state-store commit
        # grinds for minutes under co-tenant load; see _await_drained)
        stop_on_state_cleanup=True,
    )
    # memory sink in update mode keeps every emitted row; the final emission
    # per user is the one with the highest running count.
    final: dict[int, object] = {}
    for r in got:
        if (
            r.user_id not in final
            or r.n_events_total > final[r.user_id].n_events_total
        ):
            final[r.user_id] = r

    ev = spark.read.parquet(events_dir)
    expected = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("vm"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        assert final[uid].n_events_total == exp.n
        assert abs(final[uid].value_total - exp.vm / 1e6) < 1e-9


def test_stream_to_warehouse_exactly_once_across_restarts(
    spark, events_dir, tmp_path
):
    from procurement_data_pipeline_spark.streaming.pipeline import (
        stream_to_warehouse,
    )

    out = str(tmp_path / "wh_events")
    ckpt = str(tmp_path / "ckpt5")
    stream_to_warehouse(
        dedup_events(read_event_stream(spark, events_dir)), out, ckpt
    )
    n_distinct = (
        spark.read.parquet(events_dir).select("event_id").distinct().count()
    )
    assert spark.read.parquet(out).count() == n_distinct
    # restart with the same checkpoint: no new source files → no new rows
    stream_to_warehouse(
        dedup_events(read_event_stream(spark, events_dir)), out, ckpt
    )
    assert spark.read.parquet(out).count() == n_distinct


def test_resize_images_requires_explicit_fake_and_is_deterministic(spark, sf_dir):
    import pytest as _pytest

    from procurement_data_pipeline_spark.llm_ops.multimodal import (
        documents_as_media,
        resize_images,
    )

    media = documents_as_media(
        load_table(spark, sf_dir, "documents").limit(20)
    )
    # real path: text payloads have no shipped resampler
    with _pytest.raises(Exception, match="no shipped resampler"):
        resize_images(media, 32, 32).collect()

    out = resize_images(media, 32, 32, fake=True).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 32 * 32 for r in out)
    assert all((r.width, r.height) == (32, 32) for r in out)
    again = resize_images(media, 32, 32, fake=True).collect()
    assert sorted(r.payload for r in again) == sorted(r.payload for r in out)


def test_detect_media_type_and_dimensions_from_real_headers(spark):
    """Magic-byte sniffing and header dimension parsing against REAL format
    headers built byte-for-byte to spec (PNG sig+IHDR, GIF89a logical screen
    descriptor, JPEG SOI, RIFF/WAVE, RIFF/WEBP) — this path needs no codec
    and must be exact."""
    import struct

    from procurement_data_pipeline_spark.llm_ops.multimodal import (
        detect_media_type,
        image_dimensions,
    )

    png = (
        b"\x89PNG\r\n\x1a\n"                      # signature
        + struct.pack(">I", 13) + b"IHDR"          # IHDR length + tag
        + struct.pack(">II", 640, 480)             # width, height (BE u32)
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4    # bit depth.. + crc pad
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    wav = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"\x00" * 8
    webp = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"\x00" * 8
    blob = b"\x00\x01\x02\x03unstructured"

    df = spark.createDataFrame(
        [(1, png), (2, gif), (3, jpeg), (4, wav), (5, webp), (6, blob)],
        ["media_id", "payload"],
    )
    rows = {
        r["media_id"]: r
        for r in df.select(
            "media_id",
            detect_media_type().alias("mime"),
            image_dimensions().alias("dims"),
        ).collect()
    }
    assert rows[1]["mime"] == "image/png"
    assert (rows[1]["dims"]["width"], rows[1]["dims"]["height"]) == (640, 480)
    assert rows[2]["mime"] == "image/gif"
    assert (rows[2]["dims"]["width"], rows[2]["dims"]["height"]) == (320, 200)
    assert rows[3]["mime"] == "image/jpeg"
    assert rows[3]["dims"]["width"] is None  # SOF segment needs the decoder
    assert rows[4]["mime"] == "audio/wav"
    assert rows[5]["mime"] == "image/webp"
    assert rows[6]["mime"] == "application/octet-stream"


def test_stream_corpus_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    """The curation tier composes with Structured Streaming: the
    (now shuffle-free) repetition metrics are a narrow projection, so the
    quality gate runs stateless in append mode and must admit exactly the
    same documents as the batch gate. Streaming exact-dedup rides
    dropDuplicates on the content fingerprint in the same query."""
    from procurement_data_pipeline_spark.llm_ops.curation import repetition_metrics
    from procurement_data_pipeline_spark.llm_ops.text import fingerprint
    from procurement_data_pipeline_spark.streaming.pipeline import run_to_completion

    docs_dir = str(tmp_path / "docs_src")
    load_table(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema

    def gate(df):
        return (
            repetition_metrics(df, top_threshold=0.15)
            .filter(~F.col("repetitive"))
            .select("doc_id", "dup_word_frac", "top_word_frac")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    got = run_to_completion(
        gate(stream), str(tmp_path / "ckpt_gate"), query_name="quality_gate"
    )
    batch = gate(spark.read.parquet(docs_dir)).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in batch}
    assert 0 < len(batch) < spark.read.parquet(docs_dir).count()

    # Streaming exact dedup: one survivor per content fingerprint (which
    # survivor is trigger-order-dependent — assert the invariant, not rows).
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    deduped = run_to_completion(
        stream2.withColumn("fp", fingerprint("text")).dropDuplicates(["fp"]),
        str(tmp_path / "ckpt_dedup"),
        query_name="stream_dedup",
    )
    n_distinct = (
        spark.read.parquet(docs_dir)
        .select(fingerprint("text").alias("fp"))
        .distinct()
        .count()
    )
    assert len(deduped) == n_distinct
    assert len({r["fp"] for r in deduped}) == n_distinct


def test_extract_image_features_real_gif_decode(spark):
    """GIF joins PNG on the real-decode path: palette-resolved first-frame
    pixels with exact dimensions and Rec.601 luma."""
    import numpy as np

    from procurement_data_pipeline_spark.llm_ops.codecs import encode_gif

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    half = np.zeros((10, 6), dtype=np.uint8)
    half[:5] = 1  # top half white -> luma 0.5
    solid = np.ones((4, 8), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(half, pal))),
         (2, bytearray(encode_gif(solid, pal)))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in extract_image_features(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_channels) == (6, 10, 3)
    assert abs(rows[1].mean_luma - 0.5) < 1e-9
    assert (rows[2].width, rows[2].height, rows[2].n_channels) == (8, 4, 3)
    assert abs(rows[2].mean_luma - 1.0) < 1e-9


def test_transform_with_state_capability_probe():
    """pyspark 4.1 ships transformWithStateInPandas (the successor to
    applyInPandasWithState), but its Python state-server protocol needs
    google.protobuf, which this container does not ship (probed
    2026-08-14: the TWS driver worker crashes with ImportError on
    google.protobuf.descriptor). The streaming operators therefore stay on
    applyInPandasWithState. If this probe ever starts skipping, the
    migration is unblocked."""
    import pyspark.sql.group as g

    assert hasattr(g.GroupedData, "transformWithStateInPandas")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return  # the documented container state
    import pytest

    pytest.skip("protobuf now available — transformWithState usable")
