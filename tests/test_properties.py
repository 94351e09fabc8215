"""Property-based MRP invariants (SURVEY.md §5 item 4).

Hypothesis generates random small procurement worlds; each run checks the
engine's net-demand output against a pure-Python reference model AND the
reference's documented invariants:

* net_demand > 0 for every emitted row (the filter IS the contract)
* estimated_cost = net_demand * unit_cost for every row
* every emitted (product) uses its rank-1 supplier
* per-supplier export totals equal the sum of their item costs
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from procurement_data_pipeline_spark.operators.export import supplier_orders
from procurement_data_pipeline_spark.operators.net_demand import net_demand

DATE = dt.date(2026, 1, 15)
N_PRODUCTS = 5
N_SUPPLIERS = 3

world = st.fixed_dictionaries(
    {
        # per-product demand rows: (product_id, qty) pairs
        "orders": st.lists(
            st.tuples(
                st.integers(1, N_PRODUCTS), st.integers(1, 100)
            ),
            max_size=30,
        ),
        # per-(product, warehouse) inventory
        "inventory": st.lists(
            st.tuples(
                st.integers(1, N_PRODUCTS),
                st.integers(1, 2),
                st.integers(0, 500),
                st.integers(0, 50),
                st.integers(0, 100),
            ),
            max_size=10,
            unique_by=lambda r: (r[0], r[1]),
        ),
        # per-product (safety_stock_level, active flag)
        "products": st.lists(
            st.tuples(st.integers(0, 100), st.booleans()),
            min_size=N_PRODUCTS,
            max_size=N_PRODUCTS,
        ),
        # (product, supplier, unit_cost_cents, priority) — priority unique
        # per product so ranking is deterministic (SURVEY §4 item 3)
        "mappings": st.lists(
            st.tuples(
                st.integers(1, N_PRODUCTS),
                st.integers(1, N_SUPPLIERS),
                st.integers(100, 9999),
            ),
            min_size=5,
            max_size=12,
            unique_by=lambda r: (r[0], r[1]),
        ),
    }
)


def _python_mrp(w):
    """Pure-Python reference model of net_demand.sql:4-87."""
    demand: dict[int, int] = {}
    for pid, qty in w["orders"]:
        demand[pid] = demand.get(pid, 0) + qty
    inv: dict[int, dict[str, int]] = {}
    for pid, _wh, avail, res, ss in w["inventory"]:
        agg = inv.setdefault(pid, {"a": 0, "r": 0, "s": 0})
        agg["a"] += avail
        agg["r"] += res
        agg["s"] = max(agg["s"], ss)
    ranked: dict[int, tuple] = {}
    by_product: dict[int, list] = {}
    for i, (pid, sid, cost) in enumerate(w["mappings"]):
        by_product.setdefault(pid, []).append((i + 1, cost / 100.0, sid))
    for pid, rows in by_product.items():
        # priority = insertion order (unique); rank by (priority, cost, sid)
        ranked[pid] = sorted(rows)[0]
    out = {}
    for pid in range(1, N_PRODUCTS + 1):
        ss_level, active = w["products"][pid - 1]
        if not active or pid not in ranked:
            continue
        d = demand.get(pid, 0)
        i = inv.get(pid)
        safety = i["s"] if i else ss_level
        avail = i["a"] if i else 0
        res = i["r"] if i else 0
        nd = max(0, d + safety - (avail - res))
        if nd > 0:
            prio, cost, sid = ranked[pid]
            out[pid] = (sid, nd, round(nd * cost, 2))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(world)
def test_mrp_matches_python_model_and_invariants(spark, w):
    orders = spark.createDataFrame(
        [
            (i + 1, pid, qty, DATE)
            for i, (pid, qty) in enumerate(w["orders"])
        ]
        or [(0, 1, 0, dt.date(1970, 1, 1))],
        "order_id long, product_id int, quantity int, order_date date",
    )
    inventory = spark.createDataFrame(
        [(pid, wh, a, r, s, DATE) for pid, wh, a, r, s in w["inventory"]]
        or [(0, 0, 0, 0, 0, dt.date(1970, 1, 1))],
        "product_id int, warehouse_id int, available_qty int,"
        " reserved_qty int, safety_stock int, snapshot_date date",
    )
    products = spark.createDataFrame(
        [
            (pid, f"P{pid}", ss, act)
            for pid, (ss, act) in enumerate(w["products"], start=1)
        ],
        "product_id int, product_name string, safety_stock_level int,"
        " is_active boolean",
    )
    suppliers = spark.createDataFrame(
        [(s, f"S{s}", True) for s in range(1, N_SUPPLIERS + 1)],
        "supplier_id int, supplier_name string, is_active boolean",
    )
    mappings = spark.createDataFrame(
        [
            (pid, sid, cents / 100.0, i + 1)
            for i, (pid, sid, cents) in enumerate(w["mappings"])
        ],
        "product_id int, supplier_id int, unit_cost double, priority int",
    )

    got = net_demand(
        orders,
        inventory,
        products,
        suppliers,
        mappings,
        "2026-01-15",
        "2026-01-16",
        "2026-01-16",
    ).collect()
    expected = _python_mrp(w)

    assert {r.product_id: (r.supplier_id, r.net_demand) for r in got} == {
        p: (sid, nd) for p, (sid, nd, _) in expected.items()
    }
    for r in got:
        assert r.net_demand > 0
        assert r.estimated_cost == Decimal(str(expected[r.product_id][2]))

    # export invariant: supplier totals == sum of their item costs
    nd_df = net_demand(
        orders, inventory, products, suppliers, mappings,
        "2026-01-15", "2026-01-16", "2026-01-16",
    )
    docs = supplier_orders(nd_df, "2026-01-17", "2026-01-15").collect()
    for d in docs:
        assert float(d.total_estimated_cost) == round(
            sum(float(i.total_cost) for i in d.items), 2
        )


# --- as-of / range join vs naive formulations --------------------------------
#
# Hypothesis generates random (key, time) worlds; the operators' windowed /
# bucketed plans must match a brute-force pure-Python evaluation exactly.

joins_world = st.fixed_dictionaries(
    {
        # left side: (key, ts) events
        "left": st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 100)), max_size=15
        ),
        # right side: (key, ts, payload) events
        "right": st.lists(
            st.tuples(
                st.integers(1, 3), st.integers(0, 100), st.integers(0, 999)
            ),
            max_size=15,
        ),
    }
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(w=joins_world)
def test_asof_join_matches_naive_model(spark, w):
    from procurement_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(w["left"])],
        "lid int, k int, ts double",
    )
    right = spark.createDataFrame(
        [(k, float(t), v) for (k, t, v) in w["right"]],
        "k int, ts double, v int",
    )
    got = {
        r.lid: r.ts_asof
        for r in asof_join(left, right, on="k", ts_col="ts").collect()
    }
    for i, (k, t) in enumerate(w["left"]):
        prior = [rt for (rk, rt, _) in w["right"] if rk == k and rt <= t]
        want = float(max(prior)) if prior else None
        assert got[i] == want, (i, k, t, got[i], want)
    assert len(got) == len(w["left"])  # every left row survives


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(w=joins_world, width=st.sampled_from([1, 7, 50, 1000]))
def test_range_join_matches_naive_model(spark, w, width):
    from procurement_data_pipeline_spark.operators.rangejoin import range_join

    # intervals: [ts, ts+10] around each left event
    intervals = spark.createDataFrame(
        [(i, k, float(t), float(t + 10)) for i, (k, t) in enumerate(w["left"])],
        "iid int, k int, s double, e double",
    )
    points = spark.createDataFrame(
        [(k, float(t)) for (k, t, _) in w["right"]], "k int, t double"
    )
    got = sorted(
        (r.iid, r.t)
        for r in range_join(
            intervals, points, ["k"], "s", "e", "t", bucket_seconds=width
        ).collect()
    )
    want = sorted(
        (i, float(rt))
        for i, (k, t) in enumerate(w["left"])
        for (rk, rt, _) in w["right"]
        if rk == k and t <= rt <= t + 10
    )
    assert got == want


# --- curation-operator properties ------------------------------------------

_doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=40).filter(str.strip),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=_doc_texts,
    seq_len=st.integers(8, 64),
    n_buckets=st.sampled_from([1, 4, 4096]),
)
def test_pack_sequences_conservation_property(spark, texts, seq_len, n_buckets):
    """For ANY corpus, budget, and bucket count (including past the old
    256 ceiling): every doc appears exactly once, offsets chain per bucket
    with no gaps, and Σ tok_count is conserved."""
    from procurement_data_pipeline_spark.llm_ops.curation import pack_sequences

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = pack_sequences(df, seq_len=seq_len, n_buckets=n_buckets).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(range(len(texts)))
    assert {r["bucket"] for r in rows} <= set(range(n_buckets))  # honored
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    total = 0
    for brows in by_bucket.values():
        brows.sort(key=lambda r: (r["seq_index"], r["seq_offset"]))
        cum = 0
        for r in brows:
            assert r["seq_index"] == cum // seq_len
            assert r["seq_offset"] == cum % seq_len
            cum += r["tok_count"]
        total += cum
    assert total == sum(r["tok_count"] for r in rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.text(alphabet="xyz", min_size=1, max_size=3),
        st.integers(1, 40),
        min_size=1,
        max_size=30,
    ),
    capacity=st.integers(4, 16),
)
def test_frequent_items_bounds_property(spark, counts, capacity):
    """For ANY stream and capacity: count_lo <= true <= count_hi for every
    reported item (the mergeable space-saving contract)."""
    from procurement_data_pipeline_spark.llm_ops.sketch import frequent_items

    rows = [(item,) for item, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, ["tok"]).repartition(3)
    out = frequent_items(df, "tok", k=min(capacity, 4), capacity=capacity)
    for r in out.collect():
        assert r["count_lo"] <= counts[r["item"]] <= r["count_hi"], (
            r["item"], r["count_lo"], counts[r["item"]], r["count_hi"],
        )


def _norm_words(text: str) -> list[str]:
    """Python mirror of llm_ops.text.words: collapse whitespace, trim,
    lower, split on single space."""
    import re

    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    train=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=2, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=15,
    ),
    evals=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=2, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    ),
)
def test_decontaminate_exact_mirror_property(spark, train, evals):
    """For ANY train/eval corpora: the per-doc contaminated-gram count
    equals a direct Python recomputation — zero missed leaks (recall 1.0)
    and zero false hits, including planted verbatim overlaps (the small
    shared alphabet forces them)."""
    from procurement_data_pipeline_spark.llm_ops.curation import decontaminate

    n = 2
    tdf = spark.createDataFrame(list(enumerate(train)), ["doc_id", "text"])
    edf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(evals)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in decontaminate(tdf, edf, n=n).collect()
    }

    def grams(text):
        ws = _norm_words(text)
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    eval_grams = set().union(*(grams(t) for t in evals))
    for i, t in enumerate(train):
        want = len(grams(t) & eval_grams)
        assert got[i] == want, (i, t, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    spec=st.dictionaries(
        st.text(alphabet="pqr", min_size=1, max_size=2),
        st.tuples(st.integers(30, 300), st.integers(1, 4)),
        min_size=2,
        max_size=5,
    )
)
def test_corpus_mix_proportions_property(spark, spec):
    """For ANY source skew and integer recipe: the scarcest-relative source
    is kept in full, every source's kept count tracks C*w_s within hash-
    sampling noise, and no row is fabricated."""
    from procurement_data_pipeline_spark.llm_ops.curation import corpus_mix

    rows, next_id = [], 0
    for src, (cnt, _w) in sorted(spec.items()):
        for _ in range(cnt):
            rows.append((next_id, src))
            next_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    wts = spark.createDataFrame(
        [(src, w) for src, (_c, w) in sorted(spec.items())], ["source", "weight"]
    )
    kept = corpus_mix(df, wts).groupBy("source").count().collect()
    kept_by_src = {r["source"]: r["count"] for r in kept}

    c = min(cnt / w for cnt, w in spec.values())
    argmin = min(spec, key=lambda s: spec[s][0] / spec[s][1])
    assert kept_by_src.get(argmin) == spec[argmin][0]  # scarcest kept fully
    for src, (cnt, w) in spec.items():
        target = min(cnt, c * w)
        got = kept_by_src.get(src, 0)
        assert got <= cnt  # never upsample
        # md5-prefix sampling ≈ binomial: allow 4.5σ + integer slack
        tol = 4.5 * (target * max(0.0, 1 - target / cnt)) ** 0.5 + 3
        assert abs(got - target) <= tol, (src, got, target, tol)


# ---------------------------------------------------- SCD2 / CDC models

_event_stream = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user_id
        st.integers(min_value=0, max_value=10_000),  # ts offset (dupes ok)
        st.sampled_from(["a", "b", "c"]),  # state value
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(stream=_event_stream)
def test_scd2_matches_itertools_model(spark, stream):
    """Arbitrary streams (duplicate timestamps included): the distributed
    SCD2 run-compaction must equal a pure-Python groupby model over the
    same total order (ts, event_id)."""
    import itertools

    rows = [
        (i, ts, uid, state)
        for i, (uid, ts, state) in enumerate(stream)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = df.withColumn(
        "is_change",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("is_change").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("int"),
    )
    got = {
        (r["user_id"], r["version"]): (r["event_type"], r["n"])
        for r in flagged.groupBy("user_id", "version", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # Python model: sort per user by (ts, event_id), collapse runs.
    by_user: dict[int, list] = {}
    for eid, ts, uid, state in rows:
        by_user.setdefault(uid, []).append((ts, eid, state))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        for v, (state, grp) in enumerate(
            itertools.groupby(evs, key=lambda e: e[2]), start=1
        ):
            want[(uid, v)] = (state, len(list(grp)))
    assert got == want


_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    max_size=10,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(old=_snapshot, new=_snapshot)
def test_snapshot_diff_matches_dict_model(spark, old, new):
    """snapshot_diff over arbitrary keyed snapshots (NULL values included)
    equals the obvious dict-diff model."""
    from procurement_data_pipeline_spark.operators.cdc import snapshot_diff

    old_df = spark.createDataFrame(
        [(k, v) for k, v in old.items()], "k long, v int"
    )
    new_df = spark.createDataFrame(
        [(k, v) for k, v in new.items()], "k long, v int"
    )
    got = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old_df, new_df, ["k"]).collect()
    }
    want = {}
    for k in old.keys() | new.keys():
        if k not in old:
            want[k] = ("insert", None, new[k])
        elif k not in new:
            want[k] = ("delete", old[k], None)
        elif old[k] != new[k]:
            want[k] = ("update", old[k], new[k])
    assert got == want
