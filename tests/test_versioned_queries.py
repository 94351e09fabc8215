"""The versioned-table declared queries' NON-hash properties: the oracle
certifies values; these tests pin that the fixture actually exercises the
format (multiple versions, a real merge, a real optimize) and that the
pruned scan actually PRUNES (correct results could otherwise hide a
scan-everything plan)."""

from __future__ import annotations

from procurement_data_pipeline_spark.operators.versioning import (
    history,
    latest_version,
    plan_scan,
)
from procurement_data_pipeline_spark.queries.versioned import (
    _SCAN_HI,
    _SCAN_LO,
    _fixture,
)

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_shape_and_scan_pruning(spark):
    path = _fixture(spark, SF_DIR)
    assert latest_version(spark, path) == 4
    assert [h["op"] for h in history(spark, path)] == [
        "append",
        "append",
        "merge",
        "optimize",
    ]
    kept, total = plan_scan(spark, path, "o_orderkey", lo=_SCAN_LO, hi=_SCAN_HI)
    # data skipping must do real work on the z-ordered layout: the key
    # range covers a fraction of the table, so SOME file must be pruned
    assert total >= 2 and len(kept) < total
    # memoized: a second call returns the same fixture without a rebuild
    assert _fixture(spark, SF_DIR) == path
