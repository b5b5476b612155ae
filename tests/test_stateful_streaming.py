"""applyInPandasWithState: state survives across micro-batches."""

from __future__ import annotations

from pride_spark.streaming import events as ev
from pride_spark.streaming.stateful import running_user_totals


def test_state_accumulates_across_batches(spark, tmp_path):
    d = str(tmp_path)
    b1 = spark.createDataFrame(
        [(1, 10**15, 7, "c", 2.0, "{}"), (2, 10**15, 7, "c", 3.0, "{}"),
         (3, 10**15, 8, "c", 5.0, "{}")],
        ev.EVENTS_SCHEMA,
    )
    b1.write.mode("overwrite").parquet(d + "/in")

    def drain():
        stream = running_user_totals(ev.read_event_stream(spark, d + "/in"))
        q = (
            stream.writeStream.format("json")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # second batch touches user 7 again — state must carry the old totals
    b2 = spark.createDataFrame([(4, 2 * 10**15, 7, "c", 10.0, "{}")], ev.EVENTS_SCHEMA)
    b2.write.mode("append").parquet(d + "/in")
    drain()

    import glob
    import json

    recs = [
        json.loads(line)
        for f in glob.glob(d + "/out/part-*")
        for line in open(f)
        if line.strip()
    ]
    by_user: dict[int, list] = {}
    for r in recs:
        by_user.setdefault(r["user_id"], []).append((r["n"], r["total"]))
    # user 7: batch1 → (2, 5.0); batch2 resumes state → (3, 15.0)
    assert (2, 5.0) in by_user[7] and (3, 15.0) in by_user[7]
    assert by_user[8] == [(1, 5.0)]
