"""Custom stateful streaming operator: first-seen url dedup.

``applyInPandasWithState`` over ``groupBy(url)`` keeps one boolean per url
in the state store; a url's rows are emitted only the first time the key is
seen across the whole stream (within and across microbatches). This is the
streaming form of the batch resume anti-join (operators/pipeline.py:
resume_filter) — use it when documents arrive as a feed and re-crawls must
not re-extract.

State sizing (100 TB): one empty-struct row per distinct url. For 10^12
urls that exceeds any state store — production would put a TTL on the state
(GroupStateTimeout) or fall back to the batch anti-join against the
extracted table per microbatch (streaming/adapter.py already composes with
resume_filter for that shape). Both knobs are deliberate; this operator is
the bounded-keyspace form.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), True)])


def first_seen_filter(docs: DataFrame) -> DataFrame:
    """Streaming documents → only the first-ever row per url.

    Ties within one microbatch resolve to the earliest warc_ts (stable
    deterministic pick, matching the batch `min_by` survivor rule).
    """
    schema = docs.schema

    def emit_first(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            cand = pdf.sort_values("warc_ts", kind="stable").head(1)
            if first is None or cand.iloc[0]["warc_ts"] < first.iloc[0]["warc_ts"]:
                first = cand
        if first is not None:
            state.update((True,))
            yield first

    return docs.groupBy("url").applyInPandasWithState(
        emit_first,
        outputStructType=schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
