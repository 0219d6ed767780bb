"""doc_id assignment — the reference's dense, deterministic id scheme
re-expressed for distributed execution (SURVEY.md §1.4, §7.4).

The reference hands each map task a ``doc_id_start`` offset and
increments per URL — dense, contiguous, deterministic given input
order (``master/src/coordinator.py:57,113,135``), including failed
fetches (``mapper/src/processor.py:186-194``).

Two engine strategies with different scale trade-offs:

  * ``assign_dense_ids`` — ``row_number() OVER (ORDER BY key)``:
    exact parity (dense 0..N-1), but a global sort; the single-
    partition window is the known hazard — Spark plans one final
    window task. Right choice when ids must be dense and stable.
  * ``assign_partition_ids`` — the reference's *actual* mechanism
    (per-partition offset + local increment) done Spark-style:
    count rows per partition, prefix-sum the offsets (tiny driver
    array, exactly the master's doc_id_start bookkeeping), add the
    local index. Dense AND scalable; deterministic given a
    deterministic partitioning of a sorted input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_dense_ids", "assign_partition_ids"]


def assign_dense_ids(
    df: DataFrame, order_by: str | list[str], id_name: str = "assigned_id"
) -> DataFrame:
    """Dense 0-based ids by a global ``row_number`` over a stable key.

    Exact reference parity. Pass multiple columns rather than a
    concatenated key — tuple ordering and string ordering diverge
    (``'src1|x' > 'src10'`` lexically, but ``('src1', …) <
    ('src10', …)``). The empty ``partitionBy`` funnels the final
    numbering through one task — fine up to tens of millions of
    rows; beyond that use :func:`assign_partition_ids`.
    """
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*[F.col(c) for c in cols])
    return df.withColumn(id_name, (F.row_number().over(w) - 1).cast("bigint"))


def assign_partition_ids(df: DataFrame, id_name: str = "assigned_id") -> DataFrame:
    """Dense 0-based ids without a global sort: per-partition counts →
    driver-side prefix sums (= the master's ``doc_id_start`` ledger) →
    offset + local row index. One narrow pass + one tiny collect of
    #partitions longs; no shuffle of the data itself.

    Ids are dense and unique always; they follow input order per
    partition (stable when the upstream partitioning is stable, e.g.
    a sorted write). This mirrors the reference exactly: contiguous
    id ranges per task, assigned in task order.
    """
    spark = df.sparkSession
    # Persisted between the two passes: the count pass and the tag
    # pass MUST see the same partitioning, or offsets[pid] would be
    # the wrong ledger entry (a recomputed source could legally change
    # its split count).
    rdd = df.rdd.persist()
    counts = rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)

    schema = df.schema.add(id_name, "long", False)

    def tag(pid: int, it):
        if pid >= len(offsets):
            # Always a partitioning mismatch between the two passes —
            # silently restarting ids at 0 would assign duplicates.
            raise RuntimeError(
                f"assign_partition_ids: partition {pid} appeared after "
                f"counting only {len(offsets)} partitions"
            )
        base = offsets[pid]
        for i, row in enumerate(it):
            yield (*row, base + i)

    return spark.createDataFrame(rdd.mapPartitionsWithIndex(tag), schema)
