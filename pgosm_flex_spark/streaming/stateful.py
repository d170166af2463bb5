"""Custom stateful streaming operator — the applyInPandasWithState surface
(SURVEY.md §2.8 / training-pipeline mandate).

``stream_first_seen`` is streaming exact dedup for continuously arriving
images: keyed by content hash (phash), the FIRST row per key is emitted and
every later duplicate — within a micro-batch or any later one — is dropped.
State is one boolean per key, persisted in the streaming state store, so a
restarted query (same checkpoint) keeps suppressing duplicates it saw before
the restart: the streaming analog of the journal-backed idempotent batch
units in plans/checkpoint.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_first_seen(
    stream: DataFrame,
    key_col: str = "phash",
    id_col: str = "image_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """streaming DataFrame → first occurrence per ``key_col``.

    Within one micro-batch the smallest ``id_col`` wins (deterministic);
    across batches the state store suppresses keys already emitted.
    ``carry_cols`` ride along with the winning row (types taken from the
    input schema) so downstream stages get the full payload, not just the
    key — the streaming import pipes the caption through this way.
    """
    carried = ", ".join(
        f"{c} {stream.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    # key/id types come from the input schema too — a string content-hash
    # key or a long id would otherwise hit an applyInPandasWithState
    # output-schema mismatch at runtime
    key_t = stream.schema[key_col].dataType.simpleString()
    id_t = stream.schema[id_col].dataType.simpleString()
    out_schema = f"{key_col} {key_t}, {id_col} {id_t}" + (f", {carried}" if carried else "")
    state_schema = "seen boolean"

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # drain the iterator (contract) but emit nothing: key already out
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf[id_col].idxmin()]
            if best is None or cand[id_col] < best[id_col]:
                best = cand
        if best is None:
            return
        state.update((True,))
        out = {key_col: [key[0]], id_col: [best[id_col]]}
        for c in carry_cols:
            out[c] = [best[c]]
        yield pd.DataFrame(out)

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_first_seen_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    key_col: str = "phash",
    id_col: str = "image_id",
    key_type: str = "long",
):
    """File-source wrapper: JSON rows (phash, image_id) → first-seen rows
    appended to parquet, availableNow trigger (drains what's there and
    stops — rerun after new files arrive to continue from state).
    ``key_type``: reader type of the key column (a hex-digest content hash
    streams as ``string``)."""
    schema = f"{key_col} {key_type}, {id_col} string"
    stream = spark.readStream.schema(schema).json(input_dir)
    deduped = stream_first_seen(stream, key_col=key_col, id_col=id_col)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        deduped.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
