"""Streaming observability: df.observe() metrics riding on a streaming
query — how a production stream reports row counts / value totals per
micro-batch to monitoring without a second query or sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.streaming.jobs import read_events_stream


def test_observe_metrics_on_stream(spark, sf_dir, tmp_path):
    from pyspark.sql.streaming import StreamingQueryListener

    collected: list = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            row = event.progress.observedMetrics.get("ingest")
            if row is not None:
                collected.append(row)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        e = read_events_stream(spark, sf_dir).observe(
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("total_value"),
        )
        q = (
            e.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; poll briefly
        import time

        for _ in range(40):
            if collected:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)

    assert collected, "observed metrics never reached the listener"
    n_total = sum(r["n_rows"] for r in collected)
    expected = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").count()
    assert n_total == expected
