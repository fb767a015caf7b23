"""Sequence packing — the LLM-training batch-prep step: greedily pack
documents into fixed-capacity context windows ("bins") so training
sees full sequences instead of per-doc padding waste.

Greedy next-fit in deterministic (doc_id) order inside each shard:
a running fill accumulates token counts; a doc that would overflow the
capacity opens the next bin. A doc larger than the capacity occupies a
bin alone (truncation is the trainer's call, not the packer's).

The sequential dependency (bin of doc i depends on docs < i) makes
this non-expressible as a window function — it is exactly the
applyInPandas shape: shard the corpus by a grouping key (here `lang`;
in production a hash shard), sort inside the group, run the O(n)
greedy scan in one Arrow batch stream per group.

Scale posture: parallelism = number of shards; each shard's scan is
linear and memory-bounded by the group (spill-safe: the plan sorts
shard rows before the UDF). Packing quality is per-shard — the
standard trade (global optimal packing is NP-hard and serial; sharded
next-fit is what production pipelines run).
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401  (mirrors sibling operators)

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", StringType()),
        StructField("n_tok", LongType()),
        StructField("bin_id", LongType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tok",
    order_col: str | None = None,
    cursors: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """(doc_id, shard, n_tok, bin_id): greedy next-fit packing of each
    shard's docs into bins of `capacity` tokens. Packing order within a
    shard is `order_col` (ties broken by id) when given — the composed
    release pipeline packs in shuffled training order — else id order.

    `cursors` maps shard → (open_bin_id, open_bin_fill) and CONTINUES a
    prior pack from that state instead of starting at bin 0: because
    next-fit is a left fold over the ordered docs, continuation is
    exact — fold(base ++ batch) == fold_from(fold(base), batch) — which
    is what lets an incremental release APPEND a day's batch and land
    bit-identical to a full repack (plans/release_incremental.py). A
    shard absent from the map starts fresh at (0, 0)."""
    cur = dict(cursors) if cursors else {}

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col, id_col] if order_col else id_col)
        bin_id, fill = cur.get(str(pdf[shard_col].iloc[0]), (0, 0))
        bins = []
        for n in pdf[tokens_col]:
            if fill > 0 and fill + n > capacity:
                bin_id += 1
                fill = 0
            fill += n
            bins.append(bin_id)
        return pd.DataFrame(
            {
                "doc_id": pdf[id_col].to_numpy(),
                "shard": pdf[shard_col].to_numpy(),
                "n_tok": pdf[tokens_col].to_numpy(),
                "bin_id": bins,
            }
        )

    cols = [F.col(id_col), F.col(shard_col), F.col(tokens_col).cast("long")]
    if order_col:
        cols.append(F.col(order_col))
    sel = docs.select(*cols)
    return sel.groupBy(shard_col).applyInPandas(pack, PACK_SCHEMA)
