"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same sf directory, then compares row count, column names, and an
order-insensitive value comparison over the *pandas* frames — the same
conversion path the driver uses (``toPandas()`` vs ``con.execute(...).df()``),
so dtype artifacts surface locally exactly as they do in the driver:

* Spark DECIMAL -> ``Decimal`` objects vs DuckDB DECIMAL -> float64:
  MISMATCH (r1 showed the driver does NOT normalize these — present money
  as ``ROUND(CAST(x AS DOUBLE), 2)`` on both sides).
* Spark BIGINT -> int64 vs DuckDB HUGEINT(SUM) -> float64: MISMATCH
  (cast oracle sums with ``CAST(... AS BIGINT)``).
* Spark DATE -> ``datetime.date`` vs DuckDB DATE -> datetime64: equal
  (the driver normalizes date-likes; r1 date-keyed queries passed).
* Nested array/struct cells: the driver's canonicalizer crashes
  (``unhashable numpy.ndarray``) — reported here as CANON-ERR.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from procurement_data_pipeline_spark.caching import release_cached
from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.session import get_session
from procurement_data_pipeline_spark.sources.tables import TABLES


class CanonError(Exception):
    """The driver's pandas canonicalizer would crash on this output."""


def _norm_cell(v):
    """Canonical, type-sensitive cell token.

    Date-likes collapse to one form (driver-equivalent); numbers stay
    type-distinct (repr) so Decimal-vs-float and int-vs-float mismatch,
    as observed in CORRECTNESS_r01.
    """
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise CanonError(f"nested cell of type {type(v).__name__}")
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if v is pd.NaT:
        return "<null>"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return "ts:" + pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return "ts:" + pd.Timestamp(v).isoformat()
    if isinstance(v, decimal.Decimal):
        return "decimal:" + str(v)
    if isinstance(v, (bool, np.bool_)):
        return "bool:" + str(bool(v))
    if isinstance(v, (int, np.integer)):
        return "int:" + str(int(v))
    if isinstance(v, (float, np.floating)):
        return "float:" + repr(float(v))
    if isinstance(v, (bytes, bytearray)):
        return "bytes:" + bytes(v).hex()
    return "str:" + str(v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Sorted (cols-by-name, then rows) list of normalized row tuples."""
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = load_all()
    spark = get_session("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            release_cached()  # scoped-persist contract: free per-query blocks
        if spec.oracle is None:
            # Driver still canonicalizes rows-only outputs; replicate that.
            try:
                _canon(spdf)
            except CanonError as e:
                failures.append(name)
                print(f"FAIL  {name}: driver canon would error: {e}")
                continue
            print(f"rows  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(spec.oracle).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        msgs = []
        if sorted(spdf.columns) != sorted(opdf.columns):
            ok = False
            msgs.append(
                f"cols spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
            )
        if len(spdf) != len(opdf):
            ok = False
            msgs.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if ok:
            try:
                sk = _canon(spdf)
                okey = _canon(opdf)
            except CanonError as e:
                ok = False
                msgs.append(f"driver canon would error: {e}")
            else:
                if sk != okey:
                    ok = False
                    diff = [(a, b) for a, b in zip(sk, okey) if a != b][:3]
                    msgs.append(f"values differ, first diffs: {diff}")
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(
            f"{status}  {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]"
            + ("" if ok else " | " + " | ".join(msgs))
        )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
