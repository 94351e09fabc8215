"""Execution-date calendar arithmetic and id/format scalars.

The reference computes its dates with Airflow Jinja macros
(procurement_dag.py:348-375): the execution date is the schedule-interval
end + 1 day, and the supplier order date is + 2 days (next business day by
the reference's convention). Those off-by-one-prone templates become pure
functions here (SURVEY.md §7.5 risk 3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def shift_date(date: str, days: int) -> str:
    """ISO date string + N days → ISO date string (pure, driver-side)."""
    return (dt.date.fromisoformat(date) + dt.timedelta(days=days)).isoformat()


def exec_date_for_interval_end(interval_end: str) -> str:
    """procurement_dag.py:348-357 — data date = interval end + 1 day."""
    return shift_date(interval_end, 1)


def supplier_order_date(interval_end: str) -> str:
    """procurement_dag.py:361-362 — supplier order date = interval end + 2."""
    return shift_date(interval_end, 2)


def synth_order_id(date_col: str | Column, seq_col: str | Column) -> Column:
    """Order-id synthesis ``int(f"{YYYYMMDD}{i:05d}")``
    (hdfs_upload_data_dag.py:93) as a JVM-side expression."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    i = F.col(seq_col) if isinstance(seq_col, str) else seq_col
    return (
        F.concat(F.date_format(d, "yyyyMMdd"), F.lpad(i.cast("string"), 5, "0"))
        .cast("long")
    )


def iso_date(col: str | Column) -> Column:
    """Date column → ISO yyyy-MM-dd string (hdfs_upload_data_dag.py:61,81)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")
