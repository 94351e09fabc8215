"""Declarative data-quality expectations with quarantine routing.

The reference hard-codes two quality checks (orphan products, missing
inventory — operators/quality.py carries that parity). Real pipelines need
the generic form: declare column expectations once, evaluate them ALL in a
single pass, and split the input into clean rows vs quarantined rows with
per-row violation labels — Great-Expectations-style checks as pure Spark
expressions (no UDFs, one scan, map-side only until the summary).

Expectations (each a named constructor returning a Column predicate):

* ``not_null(col)``
* ``unique(col)`` — the one non-row-local check; counts per key via a
  window on the key (one shuffle) and flags every row of a duplicated key
* ``in_range(col, lo, hi)``
* ``isin(col, values)``
* ``matches(col, regex)``

``check`` returns (clean_df, quarantine_df, summary_df): quarantine rows
carry ``_violations`` (array of failed expectation names); the summary is
one row per expectation with its violation count — the audit artifact a
scheduler gates on.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


@dataclass(frozen=True)
class Expectation:
    name: str
    # Thunk, not a Column: expression construction needs an active session,
    # and expectation suites are typically declared at module import time.
    predicate: Callable[[], Column]  # () -> True ⇒ row passes
    needs_key_count: str | None = None  # column name for uniqueness checks


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", lambda: F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col},{lo},{hi})",
        lambda: F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi),
    )


def isin(col: str, values: list) -> Expectation:
    return Expectation(
        f"isin({col})", lambda: F.col(col).isNotNull() & F.col(col).isin(values)
    )


def matches(col: str, regex: str) -> Expectation:
    return Expectation(
        f"matches({col})",
        lambda: F.col(col).isNotNull() & F.col(col).rlike(regex),
    )


def unique(col: str) -> Expectation:
    # Predicate placeholder; check() swaps in the windowed per-key count.
    return Expectation(f"unique({col})", lambda: F.lit(True), needs_key_count=col)


# In a quality GATE an expectation must resolve to pass-or-quarantine —
# never SQL's third value. A bare `F.col(x) > 0` is NULL for a NULL x,
# and `~NULL` is NULL, which F.when drops and array_compact erases: the
# row would land in clean_df (code-review r8). Unknown ⇒ quarantine.
def _violates(pred: Column) -> Column:
    return ~F.coalesce(pred, F.lit(False))


def check(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Evaluate every expectation in one pass; see module docstring.

    Row-local expectations are pure projections; each ``unique`` adds one
    count-over-key window (a shuffle on that key). The clean/quarantine
    split and the summary all derive from the same labeled relation, so
    callers persisting it pay the scan once.
    """
    if not expectations:
        raise ValueError("no expectations declared")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")

    labeled = df
    flags = []
    for e in expectations:
        if e.needs_key_count is not None:
            # SQL unique-constraint semantics: NULL keys never duplicate
            # EACH OTHER (NULL != NULL) — only non-null keys are counted;
            # pair with not_null(col) to also quarantine the NULLs
            # (code-review r8: the bare window grouped all NULL keys into
            # one partition and flagged every one as a duplicate).
            k = e.needs_key_count
            w = Window.partitionBy(k)
            pred = F.col(k).isNull() | (F.count(F.col(k)).over(w) == 1)
        else:
            pred = e.predicate()
        flags.append(F.when(_violates(pred), F.lit(e.name)))
    labeled = labeled.withColumn(
        "_violations",
        F.array_compact(F.array(*flags)),
    )
    clean = labeled.filter(F.size("_violations") == 0).drop("_violations")
    quarantine = labeled.filter(F.size("_violations") > 0)
    summary = (
        quarantine.select(F.explode("_violations").alias("expectation"))
        .groupBy("expectation")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .unionByName(
            # expectations with zero violations still appear in the audit
            labeled.sparkSession.createDataFrame(
                [(n,) for n in names], "expectation string"
            ).withColumn("n_violations", F.lit(0).cast("long"))
        )
        .groupBy("expectation")
        .agg(F.max("n_violations").alias("n_violations"))
    )
    return clean, quarantine, summary


__all__ = ["Expectation", "check", "not_null", "unique", "in_range", "isin", "matches"]


# ------------------------------------------------------------ data contracts


def schema_diff(before: StructType, after: StructType) -> dict:
    """Structural diff between two schema versions.

    Returns ``{"added": [...], "removed": [...], "retyped": [(name,
    from_type, to_type)], "nullability": [(name, from, to)]}`` — the
    inputs a data-contract gate needs. Field ORDER changes are ignored
    (parquet reads by name; order is presentation).
    """
    b = {f.name: f for f in before.fields}
    a = {f.name: f for f in after.fields}
    added = sorted(set(a) - set(b))
    removed = sorted(set(b) - set(a))
    retyped = sorted(
        (n, b[n].dataType.simpleString(), a[n].dataType.simpleString())
        for n in set(a) & set(b)
        if b[n].dataType != a[n].dataType
    )
    nullability = sorted(
        (n, b[n].nullable, a[n].nullable)
        for n in set(a) & set(b)
        if b[n].dataType == a[n].dataType and b[n].nullable != a[n].nullable
    )
    return {
        "added": added,
        "removed": removed,
        "retyped": retyped,
        "nullability": nullability,
    }


def assert_contract(
    before: StructType,
    after: StructType,
    allow_added: bool = True,
) -> dict:
    """Gate a schema change the way a consumer contract would.

    BACKWARD-compatible changes (new nullable columns, nullable→required
    tightening is NOT one) pass; anything a downstream reader written
    against ``before`` could break on raises ``SchemaContractError`` with
    the full diff. Policy:

    * removed column → breaking (reader selects it: AnalysisException)
    * retyped column → breaking (silent value reinterpretation is worse
      than failure)
    * required→nullable → breaking (reader assumes non-null)
    * added column → allowed iff ``allow_added`` (mergeSchema handles it;
      strict mode for sinks with fixed DDL)
    """
    d = schema_diff(before, after)
    breaking: list[str] = []
    breaking += [f"removed: {n}" for n in d["removed"]]
    breaking += [f"retyped: {n} {f}->{t}" for n, f, t in d["retyped"]]
    breaking += [
        f"nullability loosened: {n}" for n, was, now in d["nullability"]
        if (not was) and now
    ]
    if not allow_added:
        breaking += [f"added (strict mode): {n}" for n in d["added"]]
    if breaking:
        raise SchemaContractError("; ".join(breaking), diff=d)
    return d


class SchemaContractError(ValueError):
    def __init__(self, msg: str, diff: dict):
        super().__init__(msg)
        self.diff = diff
