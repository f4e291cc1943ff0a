"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9 — no streaming operators), so
batch snapshot resume (lineage.py) is the primary resumability story. This
module adds the engine's streaming ingestion path for continuously-arriving
document files, plus watermarked event metrics — the shapes a production
deployment needs:

  * stream_extract — readStream over a documents directory; each micro-batch
    runs the SAME batch extraction plan inside foreachBatch and appends
    data + lineage via the snapshot layout. Spark's streaming checkpoint
    tracks consumed files (exactly-once file source); the committed-doc
    anti-join inside the batch writer makes replays idempotent on top.
  * stream_metrics — watermark + sliding-window counts over an event stream
    (late data dropped past the watermark), the standard streaming-agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **extract_kwargs,
):
    """Continuous extraction: file-source stream -> foreachBatch(batch
    pipeline + snapshot commit). Returns the started StreamingQuery."""
    from ner_ocr_spark import lineage, pipeline

    docs = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(input_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        todo = lineage.remaining_documents(batch_df, out_dir)
        extracted = pipeline.extract_spans(todo, **extract_kwargs).persist()
        if extracted.count() > 0:
            metric_rows = lineage.partition_metrics(
                extracted, f"epoch{epoch_id}", 0
            ).collect()
            extracted.write.mode("append").parquet(f"{out_dir.rstrip('/')}/data")
            batch_df.sparkSession.createDataFrame(metric_rows).withColumn(
                "wall_ms", F.lit(None).cast("int")
            ).write.mode("append").parquet(f"{out_dir.rstrip('/')}/lineage")
        extracted.unpersist()

    writer = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window metrics over a streaming events table
    (ts, event_type, value): count + sum per (window, event_type)."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    # parquet TIMESTAMP_NTZ is not a valid event-time column; normalize
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "v",
        )
    )
