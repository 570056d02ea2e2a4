"""Prediction sinks (S5).

``write_predictions_text`` is the literal form of the reference's only
output artifact: one line per sentence of space-joined predicted label
ids (/root/reference/src/FINALMODEL/test_final.py:98-103,
`write_list_to_file`). Spark-side it is one `concat_ws` over the int
array and a text write — no Python hop.

The reference writes a single driver-local file in batch order; a
distributed text sink writes one file per partition with no global
line order. `single_file=True` (sort + repartition(1)) reproduces the
literal artifact for parity-sized outputs; the default keeps the sink
distributed and orders lines only within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_predictions_text(
    preds: DataFrame,
    path: str,
    ids_col: str = "rel_ids",
    order_col: str | None = "sent_id",
    single_file: bool = False,
) -> None:
    lines = preds.select(
        *( [F.col(order_col)] if order_col else [] ),
        F.concat_ws(
            " ", F.transform(F.col(ids_col), lambda x: x.cast("string"))
        ).alias("value"),
    )
    if order_col:
        if single_file:
            # sort, then coalesce(1): partitions merge in index order,
            # so the single output file is globally ordered
            # (repartition(1) would round-robin and lose the order)
            lines = lines.sort(order_col).coalesce(1)
        else:
            lines = lines.sortWithinPartitions(order_col)
        lines = lines.drop(order_col)
    elif single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)
