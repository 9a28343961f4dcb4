"""Structured Streaming tier: file-source micro-batches through the
shared extraction kernel, and watermarked windowed aggregation."""

import os

import pytest
from pyspark.sql import functions as F


def test_stream_extract_images_matches_batch(spark, tmp_path):
    from scalpel_spark.streaming import stream_extract_images

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    rows = [
        (f"http://h/{i}", f"<div><img src='s{i}.png' alt='a{i}'/></div>")
        for i in range(40)
    ] + [("http://h/none", "<p>no images</p>")]
    df = spark.createDataFrame(rows, "url string, html string")
    df.repartition(4).write.mode("overwrite").parquet(in_dir)

    q = stream_extract_images(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out_dir, "images"))
    assert got.count() == 40
    one = got.where(F.col("url") == "http://h/7").collect()[0]
    assert one.src == "s7.png" and one.alt == "a7"

    # exactly-once on restart: availableNow again with no new files adds 0
    q2 = stream_extract_images(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_dir, "images")).count() == 40


def test_stream_event_window_counts(spark, tmp_path):
    from scalpel_spark.streaming import stream_event_window_counts

    in_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "agg_ckpt")
    os.makedirs(in_dir)

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, "click", 1.0),
            (2, "2024-01-01 10:55:00", 1, "click", 2.0),
            (3, "2024-01-01 11:10:00", 2, "view", 3.0),
            (4, "2024-01-01 13:00:00", 2, "view", 4.0),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value"
    )
    df.coalesce(1).write.mode("overwrite").parquet(in_dir)

    q = stream_event_window_counts(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    rows = {
        (str(r.window_start), r.event_type): r.n
        for r in spark.read.parquet(out_dir).collect()
    }
    # watermark (2h past max ts=13:00 → 11:00): the 10:00 window finalized
    assert rows.get(("2024-01-01 10:00:00", "click")) == 2
