"""X7 SCD2 history derivation — split from the single-module registry_ext (round 6).

Registration order is load-bearing (the __spark_entry__ witness rotation
samples in registration order): registry_ext/__init__.py imports the
block modules in the original file's order and entries within each module
keep their original sequence — append, don't reorder.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ..catalog import load_table  # noqa: F401
from ..operators import dedup, multimodal, sampling, similarity, text  # noqa: F401
from ..registry import query  # noqa: F401
from ._shared import (  # noqa: F401
    _LANG_CASE,
    _LANG_GREATEST,
    _LANG_SCORE_SQL,
    _RT_DIRS,
    _SCD2_FULL_RECOMPUTE_ORACLE,
    _STOP_LIST,
    _marker_list,
    _rt_tmpdir,
    _t,
    _with_synthetic_near_dups,
)

# ===========================================================================
# X7 — SCD2 history derivation (warehouse-history form of the reference's
# CL_STATUS_HISTORY consumption)
# ===========================================================================




@query("x7_scd2_status_intervals", oracle=_SCD2_FULL_RECOMPUTE_ORACLE)
def x7_scd2_status_intervals(spark, sf_dir):
    """X7 SCD2 interval derivation over the status-history event log:
    collapse consecutive same-status events, open/close validity intervals
    with lag/lead over ONE (user_id, ts) partitioning
    (operators/history.py:scd2_intervals)."""
    from ..operators import history

    iv = history.scd2_intervals(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type", tiebreak="event_id"
    )
    return iv.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        "is_current",
    )


