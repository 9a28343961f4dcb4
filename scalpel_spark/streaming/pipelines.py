"""Structured Streaming tier.

The reference engine is strictly batch-per-document (SURVEY §2.7); these
pipelines are the streaming face our crawl architecture needs:

* ``stream_extract_images`` — continuous ingestion: a file-source stream
  of page batches (micro-batch = one crawl round's fetched pages) runs
  the same Arrow-batched extraction as the batch engine inside
  ``foreachBatch`` and appends image records + per-batch metrics. The
  BSP crawl loop and this stream share the extraction kernel, so
  batch/stream parity is by construction.
* ``stream_event_window_counts`` — watermarked tumbling-window
  aggregation (late data handling) over an event stream — the standard
  stateful-agg shape for crawl telemetry (fetches/sec per host, etc.).

Both are testable offline with ``trigger(availableNow=True)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scraper import Scraper
from ..spark.extract import extract_records
from ..crawl.logic import PAGE_SCRAPER  # shared kernel


def _default_scraper() -> Scraper:
    from .. import any_selector, attr, chroots, sdo

    return chroots("img", sdo(attr("src", any_selector), attr("alt", any_selector)))


def stream_extract_images(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, html string",
    available_now: bool = True,
):
    """File-source page stream → extraction → parquet append.

    ``foreachBatch`` is used (rather than a plain streaming map) so each
    micro-batch goes through the exact batch extraction path — identical
    results to the BSP engine. ``foreachBatch`` alone is only
    at-least-once: a micro-batch retried after a partial append would
    duplicate rows — so the sink is made IDEMPOTENT by partitioning on
    the checkpointed ``batch_id`` and dynamically overwriting exactly
    that partition; a retry replaces its own output instead of appending
    beside it (r1 ADVICE fix). Returns the started StreamingQuery.
    """
    scraper = _default_scraper()
    pages = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_records(
            batch_df,
            scraper,
            "src string, alt string",
            carry_cols=["url"],
            prefilter="img",
        )
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "images"))
        )

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_window_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Watermarked tumbling-window counts per event_type; late rows beyond
    the watermark are dropped, finalized windows append to parquet.

    ``max_files_per_trigger`` splits the backlog into that many files
    per micro-batch — append mode only EMITS a window once the watermark
    (which advances between batches) passes its end, so replays that
    need output (the stream_window_counts_events oracle row) feed ≥ 2
    batches with a final high-ts sentinel batch to flush the rest."""
    events = spark.readStream.schema(schema)
    if max_files_per_trigger:
        events = events.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = events.parquet(input_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
