"""Multi-sink exactly-once streaming fanout.

One stream, one checkpoint, N transactional sinks. Structured
Streaming's foreachBatch is at-least-once PER BATCH: a crash anywhere
inside the batch function replays the whole batch. With several sinks
that replay is the dangerous case — sink 1 may have committed while
sink 2 had not — so each sink must fence ITSELF on (app_id, batch_id)
through its own commit log (txlog ``append_once``, Delta
``append(txn=...)``, Iceberg ``append_once``). The replayed batch then
no-ops on the sinks that already landed and completes the ones that
did not: the PAIRWISE outcome is exactly-once without any cross-sink
coordination or two-phase commit. This is the documented pattern for
"write one stream to two tables" in every lakehouse stack; what makes
it safe is that each format's idempotence ledger is transactional WITH
its own data commit.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def fanout_stream(
    stream_df: DataFrame,
    sinks: Sequence[Callable[[DataFrame, int], None]],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a foreachBatch query applying every sink callable to each
    micro-batch. Each callable MUST be idempotent on its (app_id,
    batch_id) — pass pre-fenced closures like
    ``lambda df, bid: table.append_once(df, app_id, bid)``. The batch
    frame is persisted across sinks so the source is read once per
    batch, not once per sink. Returns the StreamingQuery."""
    sinks = list(sinks)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for sink in sinks:
                sink(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    writer = stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
