"""Custom stateful streaming operators via applyInPandasWithState.

The engine's incremental-linkage building block: as records stream in, the
pipeline needs to know which blocking keys are NEW (trigger candidate
generation against the keyed store) vs already-seen. That first-seen
detection is a keyed stateful operator — per-key state is one counter, so
state size is O(distinct keys) regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["first_seen_keys"]

_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("first_ts", TimestampType()),
        StructField("n_in_first_batch", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen_count", LongType())])


def first_seen_keys(
    df: DataFrame, key_col: str = "block_key", ts_col: str = "ts"
) -> DataFrame:
    """Emit one row per key the FIRST time it appears on the stream
    (key, earliest timestamp in the first micro-batch, row count then);
    subsequent arrivals only bump the keyed state.

    Batch inputs get the equivalent one-shot form (groupBy + min) — same
    output contract, so pipelines can be developed in batch and deployed
    streaming unchanged.
    """
    if not df.isStreaming:
        return (
            df.groupBy(F.col(key_col).alias("key"))
            .agg(
                F.min(ts_col).alias("first_ts"),
                F.count("*").alias("n_in_first_batch"),
            )
        )

    def handle(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        first_ts = None
        for pdf in pdfs:
            n += len(pdf)
            batch_min = pdf[ts_col].min()
            if first_ts is None or batch_min < first_ts:
                first_ts = batch_min
        (seen,) = state.get if state.exists else (0,)
        state.update((seen + n,))
        if seen == 0 and n > 0:
            yield pd.DataFrame(
                {"key": [key[0]], "first_ts": [first_ts], "n_in_first_batch": [n]}
            )

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(
            handle,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
