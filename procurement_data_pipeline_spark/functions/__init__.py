"""Engine scalar-function surface (SURVEY.md §2.8).

The reference's entire SQL scalar surface is `SUM, COUNT(DISTINCT), MAX,
ROW_NUMBER, COALESCE, GREATEST, CAST, DATE literal`, arithmetic, and
comparisons — all stock Spark. What this package adds are the *engine-owned*
helpers built on top of them:

* :mod:`money` — exact integer-cents / basis-point arithmetic so money
  aggregation is order-insensitive and bit-identical across engines
  (Spark's and DuckDB's double→decimal rounding differ at half-way points;
  integer math sidesteps the divergence entirely).
* :mod:`dates` — the reference's execution-date calendar arithmetic
  (procurement_dag.py:348-375) and id-synthesis/formatting scalars
  (hdfs_upload_data_dag.py:61,81,93) as pure, unit-testable functions.
"""

from procurement_data_pipeline_spark.functions.dates import (
    exec_date_for_interval_end,
    iso_date,
    shift_date,
    supplier_order_date,
    synth_order_id,
)
from procurement_data_pipeline_spark.functions.money import (
    basis_points,
    cents,
    dollars,
    micros,
    mrp_net_demand,
)

__all__ = [
    "basis_points",
    "cents",
    "dollars",
    "exec_date_for_interval_end",
    "iso_date",
    "micros",
    "mrp_net_demand",
    "shift_date",
    "supplier_order_date",
    "synth_order_id",
]
