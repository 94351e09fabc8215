"""Declarative expectations engine: clean/quarantine split, per-row
violation labels, zero-violation rows in the summary, uniqueness via the
windowed key count."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.expectations import (
    check,
    in_range,
    isin,
    matches,
    not_null,
    unique,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "click", 10.0, "u1@example.com"),
            (2, "view", -5.0, "u2@example.com"),  # range violation
            (3, None, 20.0, "u3@example.com"),  # null violation
            (4, "purchase", 30.0, "not-an-email"),  # regex violation
            (5, "click", 40.0, "u5@example.com"),
            (5, "click", 50.0, "u6@example.com"),  # duplicate key (both rows)
        ],
        "id long, event_type string, value double, email string",
    )


EXPECTATIONS = [
    not_null("event_type"),
    in_range("value", 0.0, 1000.0),
    matches("email", r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    isin("event_type", ["click", "view", "purchase", "signup", "error"]),
    unique("id"),
]


def test_split_and_labels(spark):
    clean, quarantine, summary = check(_fixture(spark), EXPECTATIONS)
    assert [r["id"] for r in clean.collect()] == [1]
    q = {r["id"]: set(r["_violations"]) for r in quarantine.collect()}
    assert q[2] == {"in_range(value,0.0,1000.0)"}
    assert q[3] == {"not_null(event_type)", "isin(event_type)"}
    assert q[4] == {"matches(email)"}
    assert q[5] == {"unique(id)"}  # both rows of the dup key flagged
    assert quarantine.filter(F.col("id") == 5).count() == 2


def test_summary_includes_zero_violation_expectations(spark):
    _, _, summary = check(_fixture(spark), EXPECTATIONS)
    s = {r["expectation"]: r["n_violations"] for r in summary.collect()}
    assert s["unique(id)"] == 2
    assert s["not_null(event_type)"] == 1
    assert len(s) == len(EXPECTATIONS)  # every declared check audited


def test_clean_input_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, "click", 1.0, "a@b.co"), (2, "view", 2.0, "c@d.co")],
        "id long, event_type string, value double, email string",
    )
    clean, quarantine, summary = check(df, EXPECTATIONS)
    assert clean.count() == 2 and quarantine.count() == 0
    assert all(r["n_violations"] == 0 for r in summary.collect())


def test_duplicate_expectation_names_rejected(spark):
    try:
        check(_fixture(spark), [not_null("id"), not_null("id")])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "duplicate" in str(e)


# ------------------------------------------------------------ data contracts


def test_schema_diff_and_contract_gate(spark):
    import pytest

    from procurement_data_pipeline_spark.operators.expectations import (
        SchemaContractError,
        assert_contract,
        schema_diff,
    )

    before = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, v double").schema
    # add nullable col, retype v, drop name
    after = spark.createDataFrame([(1, 2, 5)], "id long, v long, extra int").schema
    d = schema_diff(before, after)
    assert d["added"] == ["extra"]
    assert d["removed"] == ["name"]
    assert d["retyped"] == [("v", "double", "bigint")]

    with pytest.raises(SchemaContractError) as ei:
        assert_contract(before, after)
    assert "removed: name" in str(ei.value)
    assert "retyped: v" in str(ei.value)

    # purely additive change passes by default, fails strict mode
    additive = spark.createDataFrame(
        [(1, "a", 2.0, None)], "id long, name string, v double, extra string"
    ).schema
    assert assert_contract(before, additive)["added"] == ["extra"]
    with pytest.raises(SchemaContractError, match="strict mode"):
        assert_contract(before, additive, allow_added=False)

    # field-order change alone is NOT a diff
    reordered = spark.createDataFrame([(2.0, "a", 1)], "v double, name string, id long").schema
    d2 = schema_diff(before, reordered)
    assert not any([d2["added"], d2["removed"], d2["retyped"]])
