"""Stream-stream join: time-bound matching between two live streams."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.streaming.joins import stream_stream_join


def test_stream_stream_join_time_bound(spark, tmp_path):
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    clicks = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00", "click"),
            (2, "2026-01-01 10:00:00", "click"),
        ],
        "user_id int, l_ts_s string, action string",
    ).select("user_id", F.to_timestamp("l_ts_s").alias("l_ts"), "action")
    views = spark.createDataFrame(
        [
            (1, "2026-01-01 09:50:00", "home"),   # 10 min before → match
            (1, "2026-01-01 09:00:00", "old"),    # 60 min before → outside
            (2, "2026-01-01 10:10:00", "later"),  # AFTER the click → no match
        ],
        "user_id int, r_ts_s string, page string",
    ).select("user_id", F.to_timestamp("r_ts_s").alias("r_ts"), "page")
    clicks.coalesce(1).write.parquet(l_dir)
    views.coalesce(1).write.parquet(r_dir)

    ls = spark.readStream.schema(clicks.schema).parquet(l_dir)
    rs = spark.readStream.schema(views.schema).parquet(r_dir)
    joined = stream_stream_join(
        ls, rs, "user_id", "l_ts", "r_ts", within="30 minutes"
    ).select("l.user_id", "page")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["user_id"], r["page"]) for r in spark.table("t_ss_join").collect()}
    assert rows == {(1, "home")}
