"""Custom stateful streaming operators via ``applyInPandasWithState``.

``first_seen_pages``: exactly-one-emission per URL across ALL
micro-batches (unbounded lookback), unlike
``dropDuplicatesWithinWatermark`` whose memory of a URL expires with
the watermark.  State is one boolean per URL key, sharded by Spark's
state store — at crawl scale this is the dedup-across-resume register;
the batch pipeline's equivalent is the lineage left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n_occurrences", T.LongType()),
    ]
)


def _first_seen_fn(key, pdfs, state: GroupState):
    import pandas as pd

    n = 0
    first_ts = None
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf) and first_ts is None:
            first_ts = pdf["warc_ts"].min()
    if state.exists:
        # already emitted in an earlier batch → swallow re-crawls
        (seen,) = state.get
        if seen:
            return iter(())
    state.update((True,))
    return iter(
        [pd.DataFrame([(key[0], first_ts, n)], columns=["url", "warc_ts", "n_occurrences"])]
    )


def first_seen_pages(pages: DataFrame) -> DataFrame:
    """Streaming pages → one row per URL, ever (custom stateful op)."""
    return (
        pages.select("url", "warc_ts")
        .groupBy("url")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
