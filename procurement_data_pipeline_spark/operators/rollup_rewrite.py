"""Aggregate-rollup query rewrite — answer fact aggregates from a rollup.

The warehouse "aggregate navigator" pattern: a rollup table materialized at
grain G (by :mod:`operators.incremental` or a plain write) can answer ANY
aggregate query whose group-by columns are a subset of G and whose measures
are derivable from the stored partials — without touching the facts. At
100 TB the rollup is typically 3-6 orders of magnitude smaller than the
fact table, so routing eligible queries through it is the single biggest
scan saver an engine has after partition pruning.

Derivability is the algebra of distributive/algebraic aggregates
(Gray et al., "Data Cube", 1997):

* ``sum``/``count``/``min``/``max`` re-aggregate with themselves
  (count re-aggregates with SUM of stored counts);
* ``avg`` is algebraic: derivable iff the rollup stores the (sum, count)
  pair — never by averaging stored averages;
* holistic aggregates (``count_distinct``, medians) are NOT derivable from
  plain partials and are rejected loudly (the engine's HLL/KMV sketch
  rollups — queries/cardinality.py — are the scale path for those).

:func:`build_rollup` materializes the partials for a measure set;
:func:`answer_from_rollup` checks containment and emits the rewritten
plan, raising :class:`RollupMismatch` when the rollup cannot answer — the
caller falls back to the fact table, so a wrong rollup choice can never
produce a wrong answer, only a slower one.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: measure kinds the rewrite understands
_DISTRIBUTIVE = ("sum", "count", "min", "max")
_SUPPORTED = _DISTRIBUTIVE + ("avg",)


class RollupMismatch(ValueError):
    """The rollup cannot answer this query; fall back to the facts."""


@dataclass(frozen=True)
class RollupSpec:
    """What a materialized rollup contains.

    ``grain``: the group-by columns the rollup was aggregated to.
    ``measures``: measure name -> (kind, fact column). ``count`` measures
    use fact column ``"*"``. For ``avg`` measures the builder stores the
    (sum, count) pair; for the distributive kinds, one partial column
    named ``{name}__{kind}``.
    """

    grain: tuple[str, ...]
    measures: dict[str, tuple[str, str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        for name, (kind, _col) in self.measures.items():
            if kind not in _SUPPORTED:
                raise ValueError(
                    f"measure {name!r}: unsupported kind {kind!r} "
                    f"(supported: {_SUPPORTED})"
                )


def _partial_cols(name: str, kind: str, col: str) -> list[tuple[str, Column]]:
    if kind == "sum":
        return [(f"{name}__sum", F.sum(col))]
    if kind == "count":
        return [(f"{name}__count", F.count(F.lit(1)))]
    if kind == "min":
        return [(f"{name}__min", F.min(col))]
    if kind == "max":
        return [(f"{name}__max", F.max(col))]
    # avg: algebraic — store the (sum, count) pair
    return [
        (f"{name}__sum", F.sum(col)),
        (f"{name}__count", F.count(F.when(F.col(col).isNotNull(), 1))),
    ]


def build_rollup(facts: DataFrame, spec: RollupSpec) -> DataFrame:
    """Aggregate ``facts`` to ``spec.grain`` storing re-aggregable partials.

    One map-combinable hash aggregation — the partials (sum/count/min/max)
    all combine map-side, so the shuffle carries grain-grain rows only.
    """
    aggs: list[Column] = []
    seen: set[str] = set()
    for name, (kind, col) in spec.measures.items():
        for cname, expr in _partial_cols(name, kind, col):
            if cname in seen:  # avg + sum of the same column share partials
                continue
            seen.add(cname)
            aggs.append(expr.alias(cname))
    if not aggs:
        raise ValueError("RollupSpec declares no measures")
    return facts.groupBy(*spec.grain).agg(*aggs)


def answer_from_rollup(
    rollup: DataFrame,
    spec: RollupSpec,
    group_cols: list[str],
    wanted: dict[str, tuple[str, str]],
    grain_filter: Column | None = None,
) -> DataFrame:
    """Rewrite an aggregate query to run over ``rollup`` instead of facts.

    ``wanted``: output name -> (kind, measure name declared in the spec).
    ``grain_filter``: optional predicate over GRAIN columns only (callers
    pass e.g. ``F.col("day") >= "2024-01-01"``; a predicate on a
    non-grain column would change which fact rows aggregate into each
    stored partial, so it cannot be applied post-hoc — declare the filter
    column as part of the grain instead).

    Raises :class:`RollupMismatch` unless (a) every requested group column
    is in the rollup grain and (b) every requested measure re-aggregates
    from the stored partials.
    """
    missing = [c for c in group_cols if c not in spec.grain]
    if missing:
        raise RollupMismatch(
            f"group columns {missing} not in rollup grain {spec.grain}"
        )
    if grain_filter is not None:
        # Resolve the predicate against the grain columns ALONE: a filter
        # touching a fact-only column or a stored partial fails analysis
        # here, loudly, instead of silently changing semantics.
        try:
            rollup.select(*spec.grain).filter(grain_filter).schema
        except Exception as exc:
            raise RollupMismatch(
                f"filter must reference only grain columns {spec.grain}: {exc}"
            ) from exc
    aggs: list[Column] = []
    for out, (kind, mname) in wanted.items():
        if mname not in spec.measures:
            raise RollupMismatch(f"measure {mname!r} not in rollup spec")
        stored_kind = spec.measures[mname][0]
        if kind == "avg":
            if stored_kind != "avg":
                raise RollupMismatch(
                    f"avg({mname}) needs the (sum, count) pair; rollup "
                    f"stores {stored_kind!r}"
                )
            aggs.append(
                (
                    F.sum(f"{mname}__sum").cast("double")
                    / F.sum(f"{mname}__count").cast("double")
                ).alias(out)
            )
            continue
        if kind not in _DISTRIBUTIVE:
            raise RollupMismatch(
                f"{kind}({mname}) is not derivable from stored partials "
                "(holistic aggregates need a sketch rollup)"
            )
        if kind in ("sum", "count"):
            src = f"{mname}__{kind}" if stored_kind == kind else None
            if src is None and stored_kind == "avg" and kind == "sum":
                src = f"{mname}__sum"  # avg pair contains the sum
            if src is None:
                raise RollupMismatch(
                    f"{kind}({mname}) not derivable from stored "
                    f"{stored_kind!r} partials"
                )
            aggs.append(F.sum(src).alias(out))  # count re-aggregates by SUM
        else:  # min / max
            if stored_kind != kind:
                raise RollupMismatch(
                    f"{kind}({mname}) not derivable from stored "
                    f"{stored_kind!r} partials"
                )
            fn = F.min if kind == "min" else F.max
            aggs.append(fn(f"{mname}__{kind}").alias(out))
    out_df = rollup
    if grain_filter is not None:
        out_df = out_df.filter(grain_filter)
    return out_df.groupBy(*group_cols).agg(*aggs)
