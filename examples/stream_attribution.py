"""Stream-stream attribution join (engine addition; the reference
framework is strictly batch).

Two live streams — purchases and the click events that may have driven
them — joined inside the attribution window with BOUNDED state:
``ops.streamjoin.interval_join_streams`` watermarks both event-time
columns and adds the time-range join condition, which is exactly what
Structured Streaming needs to evict buffered rows once the other side's
watermark passes them.  State is proportional to the 30-minute window,
never the stream history; pair with
``run_stream(state_store="rocksdb")``-style RocksDB state for
billion-key cardinalities.

Here both streams are file sources derived from the events table
(event_type 'purchase' vs 'click'), drained with ``availableNow`` so
the example terminates.

Run:  python examples/stream_attribution.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import tempfile
import uuid

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phaser_spark.io import normalize_event_time  # noqa: E402
from phaser_spark.ops.streamjoin import interval_join_streams  # noqa: E402
from phaser_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="stream_attribution")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    events = normalize_event_time(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")), "ts"
    )
    work = tempfile.mkdtemp(prefix="phaser_attr_")
    clicks_dir, buys_dir = f"{work}/clicks", f"{work}/purchases"
    events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    ).write.parquet(clicks_dir)
    events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
    ).write.parquet(buys_dir)

    clicks = spark.readStream.schema(
        spark.read.parquet(clicks_dir).schema
    ).parquet(clicks_dir)
    buys = spark.readStream.schema(
        spark.read.parquet(buys_dir).schema
    ).parquet(buys_dir)

    attributed = interval_join_streams(
        buys,
        clicks,
        "purchase_ts",
        "click_ts",
        on=["user_id"],
        lower="0 seconds",
        upper="30 minutes",
        watermark="10 minutes",
    )
    name = f"attr_{uuid.uuid4().hex[:8]}"
    q = (
        attributed.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(name)
    n = out.count()
    per_user = out.groupBy("user_id").count().orderBy(F.desc("count")).limit(5)
    print(f"{n} purchase<-click attributions within 30 minutes")
    per_user.show()


if __name__ == "__main__":
    main()
