"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where built-in windows/aggregations can't express the semantics (running
per-key models, decaying averages, cross-event rules), Structured Streaming
offers arbitrary per-key state with watermark-driven timeout. The canonical
example here is a per-user exponentially-weighted moving average (EWMA) of
event values — not expressible as a windowed aggregate because the weight
of each event depends on the full prior sequence.

The same function body also runs in batch via ``applyInPandas`` (no state
API there, so the batch twin folds each user's full history in one group) —
used by tests to check the incremental result equals the batch result on
bounded input.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUT_SCHEMA = "user_id long, n_events long, ewma double"
EWMA_STATE_SCHEMA = "n long, ewma double"


def _fold_ewma(values: list[float], alpha: float, init: tuple[int, float] | None):
    n, ewma = init if init else (0, None)
    for v in values:
        ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
        n += 1
    return n, ewma


def ewma_stateful(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming per-user EWMA with persistent state.

    Events must be sorted within each micro-batch group for determinism —
    we sort by (ts, event_id) inside the function, which is exact per batch
    and matches the batch twin when the stream is replayed in order
    (availableNow over a static source).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        prior = tuple(state.get) if state.exists else None
        n, ewma = _fold_ewma(rows["value"].tolist(), alpha, prior)
        state.update((n, ewma))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [ewma]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_batch(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Batch twin: same fold over each user's full (ts-ordered) history."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.sort_values(["ts", "event_id"])
        n, ewma = _fold_ewma(rows["value"].tolist(), alpha, None)
        return pd.DataFrame(
            {"user_id": [rows["user_id"].iloc[0]], "n_events": [n], "ewma": [ewma]}
        )

    return events.groupBy("user_id").applyInPandas(fold, EWMA_OUT_SCHEMA)
