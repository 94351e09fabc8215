"""Lossless blocked fuzzy matching (edit-distance similarity join).

Entity resolution over master data (supplier/part/customer names) needs
"which values are within edit distance d" — a similarity self-join. The
naive form is a cross join (every pair), which is the canonical scale-killer.
This operator gets the exact same answer through an EQUI-join:

* Dedupe to DISTINCT values first (master-data linkage operates on the value
  domain, which is orders of magnitude smaller than the fact rows referencing
  it).
* Length banding: levenshtein(a, b) <= d implies |len(a) - len(b)| <= d, so
  side A emits one row per candidate length ``len(a) + k`` (k in -d..+d) and
  joins side B on B's EXACT length. Every surviving pair matches on exactly
  one key (B's length), so no dedup pass is needed — and the join is a plain
  hash equi-join Catalyst can shuffle or broadcast.
* Verify: the surviving candidates (a tiny superset) are checked with the
  built-in ``levenshtein`` — JVM codegen, exact integer, portable across
  engines (DuckDB's levenshtein agrees, which is what makes the oracle
  comparison bit-exact).

The band fan-out is (2d+1)x on the distinct-value relation — constant and
tiny. For long-string domains where length banding is weak, compose with the
q-gram prefix filtering already shipped for documents (llm_ops/dedup.py
PPJoin); this module is the short-string master-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(df: DataFrame, col: str, max_dist: int) -> DataFrame:
    """All unordered pairs of DISTINCT ``col`` values within levenshtein
    ``max_dist``. Returns (name_a, name_b, edit_dist) with name_a < name_b.

    Plan: distinct -> (2·max_dist+1)-way band explode on the left ->
    equi-join on banded length -> levenshtein verify. Never a cross join.
    """
    vals = df.select(F.col(col).alias("name")).filter(F.col("name").isNotNull()).distinct()
    left = vals.select(
        F.col("name").alias("name_a"),
        F.explode(
            F.array(
                *[F.length("name") + F.lit(k) for k in range(-max_dist, max_dist + 1)]
            )
        ).alias("_band"),
    )
    right = vals.select(F.col("name").alias("name_b"), F.length("name").alias("_len_b"))
    return (
        left.join(right, left["_band"] == right["_len_b"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("name_a", "name_b", "edit_dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
) -> DataFrame:
    """Two-table fuzzy equi-match: rows of ``left`` paired with the distinct
    ``right`` values within ``max_dist`` of their ``left_col``. The right
    value domain is deduped and length-banded exactly as in
    :func:`fuzzy_self_pairs`; ``left`` streams through unchanged (one
    shuffle on the banded length, broadcast when the domain is small)."""
    rvals = (
        right.select(F.col(right_col).alias("_rval"))
        .filter(F.col("_rval").isNotNull())
        .distinct()
        .select("_rval", F.length("_rval").alias("_len_r"))
    )
    banded = left.withColumn(
        "_band",
        F.explode(
            F.array(
                *[F.length(left_col) + F.lit(k) for k in range(-max_dist, max_dist + 1)]
            )
        ),
    )
    return (
        banded.join(rvals, banded["_band"] == rvals["_len_r"])
        .withColumn("edit_dist", F.levenshtein(left_col, "_rval").cast("int"))
        .filter(F.col("edit_dist") <= max_dist)
        .drop("_band", "_len_r")
        .withColumnRenamed("_rval", "matched_value")
    )
