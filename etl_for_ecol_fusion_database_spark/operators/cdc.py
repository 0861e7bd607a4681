"""CDC merge-apply: MERGE INTO semantics as one distributed join pass.

The reference's ETL reloads targets wholesale (truncate-and-load,
``ingest_ecollision_oracle_data.py``); a 100 TB deployment instead applies
a change feed incrementally.  ``merge_apply`` expresses the full MERGE
surface — WHEN MATCHED UPDATE, WHEN MATCHED DELETE, WHEN NOT MATCHED
INSERT — as a single full-outer join:

- one shuffle on the merge key for each side (AQE broadcasts the change
  side when a micro-batch is small, which is the common case);
- per-column ``coalesce(change, base)`` implements partial-row updates
  (a change row carries NULL for columns it does not touch);
- the op-code filter drops deleted keys.

The streaming twin is ``streaming.events_stream.foreach_batch_dedup_sink``:
the same callback shape issues this merge per micro-batch against a keyed
sink.  Registry entry ``x10_cdc_merge`` pins the semantics against a
DuckDB full-join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    op_col: str = "op",
    delete_op: str = "D",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a change set to ``base``.

    ``changes`` must carry every ``base`` column (NULL where untouched)
    plus ``op_col`` ('U' update, 'I' insert, ``delete_op`` delete).  Rows
    of ``base`` with no change survive unchanged; matched non-delete
    changes override column-wise; insert rows (no base match) pass
    through; matched deletes are dropped.

    ``changes`` must hold AT MOST ONE row per key — the same precondition
    SQL MERGE enforces (it errors on multiple matches; this join form
    would instead silently emit one output row PER change row, and a
    delete would not suppress sibling updates).  Real CDC feeds carry
    several ops per key per batch: pass ``seq_col`` (the feed's LSN /
    commit sequence) and the feed is first collapsed to each key's
    highest-sequence op — last-op-wins, the standard CDC compaction — so
    a trailing D deletes and a trailing U updates regardless of what
    preceded it in the batch.
    """
    if seq_col is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    b, c = base.alias("b"), changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != delete_op)
    return joined.filter(keep).select(
        *[
            F.coalesce(F.col(f"c.{col}"), F.col(f"b.{col}")).alias(col)
            for col in base.columns
        ]
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Table diff between two snapshots: one row per changed key with
    change_type I (inserted), D (deleted), or U (any compared column
    differs) — the reverse of ``merge_apply`` (which APPLIES a change
    feed, while this DERIVES one), and the building block of
    snapshot-based CDC when the source has no change log.

    One full-outer join on the key; per-column null-safe equality (<=>)
    detects updates without materializing row hashes, so added compare
    columns cost an expression, not a scan.  Unchanged keys drop out —
    output is |changes|, not |table|."""
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    # empty compare_cols = key-existence-only diff: only I/D rows can emit
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    ctype = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("I"))
        .when(F.col(f"n.{key}").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            ctype.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )
