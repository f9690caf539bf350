"""transformWithStateInPandas — the Spark 4 arbitrary-stateful API
(successor of applyInPandasWithState, which streaming/windows.py::
user_totals_stateful demonstrates).  Same running per-user totals
operator, expressed against the new StatefulProcessor contract:
explicit ValueState, Arrow-batched input, identical plan in batch and
streaming mode (batch mode processes the whole input as one
micro-batch — which is what makes the operator oracle-checkable).

Totals accumulate in exact CENTS (value is 2dp, so round(value*100)
is an integer): integer addition is associative, so arrival order —
which differs between a stream and a batch scan — is unobservable in
the result.  A double accumulator here would make the stream/batch
equivalence only approximate.

ENVIRONMENT GATE (honest-stub policy, same as the multimodal codecs):
executing transformWithState requires ``google.protobuf`` in the
Python workers (Spark serializes state-server messages with it), and
this container ships neither protobuf nor a way to install it.  The
EXACT dependency: PyPI ``protobuf`` >= 6.33.0 — pyspark 4.1.2's
generated ``pyspark/sql/streaming/proto/StateMessage_pb2.py`` calls
``ValidateProtobufRuntimeVersion(PUBLIC, 6, 33, 0)``, rejecting any
older runtime at import; no wheel exists on disk and the box has no
network, so vendoring is impossible (verified round 8).  Plan
CONSTRUCTION is tested unconditionally; EXECUTION tests skip unless
protobuf imports (tests/test_sources_ext.py).  On a protobuf-equipped
cluster the operator runs as written — nothing here is stubbed.

Two runtime prerequisites for BATCH-mode execution (both satisfied by
``ensure_batch_tws_support``): the RocksDB state store provider needs
the driver's StateStoreCoordinator RPC endpoint, which Spark only
registers when a streaming query starts — batch TWS on a fresh
session otherwise dies with CANNOT_LOAD_STATE_STORE / "Cannot find
endpoint: StateStoreCoordinator" (verified empirically); forcing the
StreamingQueryManager's lazy coordinator fixes it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUT_SCHEMA = "user_id long, n_events long, total_cents long"


def ensure_batch_tws_support(spark) -> None:
    """Make a session able to run transformWithState in BATCH mode:
    touch the StreamingQueryManager's lazy stateStoreCoordinator so
    the driver RPC endpoint exists before RocksDB state stores load."""
    spark._jsparkSession.sessionState().streamingQueryManager(
    ).stateStoreCoordinator()


class UserTotalsProcessor(StatefulProcessor):
    """Running (count, cents-total) per user in explicit ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, cents long"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, cents = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    def close(self) -> None:
        pass


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Apply the processor to a (batch or streaming) events frame."""
    prepared = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
