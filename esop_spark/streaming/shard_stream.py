"""Streaming shard packer: the batch token-budget packer
(:func:`esop_spark.operators.splits.pack_shards`) as a stateful streaming
operator, so a continuously-curated corpus can be laid into fixed-budget
training shards as documents arrive instead of in a terminal batch job.

State is ONE running token total per pack lane, kept via
``applyInPandasWithState`` (checkpoint-backed: a restarted query resumes
the cursor, and the shard ids it assigns are identical to what the batch
packer would produce over the same ordered document sequence — the
restart test asserts bit-equality).

Ordering contract: shard packing is inherently sequential — shard_id(d) =
exclusive-prefix-sum(tokens)//budget depends on every earlier document.
Within a micro-batch rows are sorted by ``order_col``; across batches the
source must deliver non-overlapping, increasing ``order_col`` ranges (a
file source fed curation output in layout order does exactly this — the
same contract the batch packer's unique-order-key requirement encodes).

Scale: one lane = one state key = one task per micro-batch, which is the
price of a globally sequential layout; throughput scales with
``group_col`` (one independent pack lane per corpus split / source
partition, the way large training runs shard per data-mix lane anyway).
The per-batch work is a sort of that batch's rows plus O(rows) integer
math — the state is a single bigint per lane, so checkpoints stay tiny.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_LANE = "_pack_lane"


def pack_shards_stream(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str | None = None,
) -> DataFrame:
    """shard_id = (running token total before the doc) // budget, per lane.

    ``docs`` is a streaming DataFrame with bigint ``order_col`` and
    ``token_col``. With ``group_col`` set, each group packs independently
    (shard ids restart per lane); otherwise a single global lane.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    lane_col = group_col if group_col is not None else _LANE
    out_schema = f"{lane_col} string, {order_col} bigint, {token_col} bigint, shard_id bigint"

    def pack_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (cum,) = state.get if state.exists else (0,)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(order_col)
        shard_ids = []
        for t in pdf[token_col]:
            shard_ids.append(cum // budget)
            cum += int(t)
        state.update((cum,))
        yield pd.DataFrame(
            {
                lane_col: [key[0]] * len(pdf),
                order_col: pdf[order_col].to_numpy(),
                token_col: pdf[token_col].to_numpy(),
                "shard_id": shard_ids,
            }
        )

    lanes = (
        docs
        if group_col is not None
        else docs.withColumn(_LANE, F.lit("all"))
    )
    out = lanes.groupBy(lane_col).applyInPandasWithState(
        pack_fn,
        outputStructType=out_schema,
        stateStructType="cum bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out if group_col is not None else out.drop(_LANE)
