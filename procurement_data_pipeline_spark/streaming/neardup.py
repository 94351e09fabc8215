"""Streaming near-duplicate detection: MinHash-LSH over a document stream.

Batch near-dedup (llm_ops/dedup.py) buckets docs by LSH band hashes and
self-joins within buckets. Streaming cannot self-join an unbounded corpus —
but it doesn't need to: the bucket IS the state. Each (band_idx, band_hash)
key remembers the first document that ever landed in it (the anchor); every
later arrival emits a candidate pair (doc, anchor) immediately. That is the
online formulation of LSH dedup: O(1) state per occupied bucket, one row of
output per collision, and the admission decision available at ingest time —
the shape a 100 TB ingest pipeline needs (dedup BEFORE paying storage).

Two design points make it equivalent to the batch operator:

* The signature is the ROW-WISE expression ``minhash_signature_expr`` —
  pytest-pinned bit-equal to the batch ``minhash_signatures`` — so it is a
  stateless projection (no shuffle before the stateful step).
* Bucket keys come from the SAME ``band_hashes`` expression the batch
  banding uses, so a streamed collision is exactly a batch-candidate
  collision: for every bucket, {anchor} ∪ {emitted docs} equals the batch
  bucket membership, and the pair count is (bucket size − 1).

Anchor choice is arrival-order-dependent across triggers (first trigger
wins; ties within a trigger break by doc_id) — the same survivor contract as
the streaming exact-dedup path. Downstream near-dup verification (exact
Jaccard of candidate pairs) is a stateless map over this operator's output.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, IntegerType, StructField, StructType

NEARDUP_SCHEMA = StructType(
    [
        StructField("band_idx", IntegerType()),
        StructField("band_hash", LongType()),
        StructField("doc_id", LongType()),
        StructField("anchor_id", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("anchor_id", LongType())])


def _update_bucket(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    band_idx, band_hash = key
    anchor = state.get[0] if state.exists else None
    docs: list[int] = []
    anchors: list[int] = []
    for pdf in batches:
        # doc_id sort makes the within-trigger anchor choice deterministic.
        for d in sorted(int(x) for x in pdf["doc_id"]):
            if anchor is None:
                anchor = d
            elif d != anchor:
                docs.append(d)
                anchors.append(anchor)
    state.update((anchor,))
    if docs:
        yield pd.DataFrame(
            {
                "band_idx": band_idx,
                "band_hash": band_hash,
                "doc_id": docs,
                "anchor_id": anchors,
            }
        )


def streaming_neardup_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs from a document STREAM (append mode).

    Emits (band_idx, band_hash, doc_id, anchor_id) per band collision; a
    doc colliding with the same anchor in several bands emits several rows
    (consumers distinct on (doc_id, anchor_id), exactly like the batch
    candidate distinct). State: one long per occupied bucket, partitioned
    by bucket key across executors.
    """
    from procurement_data_pipeline_spark.llm_ops.dedup import (
        band_hashes,
        minhash_signature_expr,
    )

    sig = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        minhash_signature_expr(text_col, n=n, num_hashes=num_hashes).alias("sig"),
    ).filter(
        # docs shorter than n words have no shingles → NULL signature:
        # excluded, exactly as the batch pipeline drops them (they cannot
        # near-dup by shingle overlap; without this filter they all landed
        # in one hot state bucket — code-review r8)
        F.col("sig").isNotNull()
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(band_hashes(F.col("sig"), bands)).alias("band_idx", "band_hash"),
    )
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _update_bucket,
        outputStructType=NEARDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
