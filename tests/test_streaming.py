"""Structured Streaming tests (SURVEY §2.12): availableNow ingest,
stream dedup, windowed counts, foreachBatch merge, stateful queue
status."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_estate_etl_dev_spark.streaming.ingest import (
    dedup_urls,
    queue_status_stream,
    run_merge_sink,
    stream_source,
    windowed_counts,
)

SCHEMA = "url string, scraped_at timestamp, price long, availability string"


def write_batch(tmp_path, name, rows):
    p = tmp_path / "in"
    p.mkdir(exist_ok=True)
    with open(p / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def run_available_now(stream, checkpoint):
    q = (
        stream.writeStream.format("memory")
        .queryName(f"t_{abs(hash(checkpoint)) % 10**8}")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q.name


def test_ingest_dedup_availablenow(spark, tmp_path):
    path = write_batch(
        tmp_path,
        "b1.json",
        [
            {"url": "u1", "scraped_at": "2026-01-01T00:00:00Z", "price": 1, "availability": "Available"},
            {"url": "u1", "scraped_at": "2026-01-01T00:00:00Z", "price": 1, "availability": "Available"},
            {"url": "u2", "scraped_at": "2026-01-01T01:00:00Z", "price": 2, "availability": "Sold"},
        ],
    )
    stream = dedup_urls(stream_source(spark, path, SCHEMA))
    name = run_available_now(stream, str(tmp_path / "cp1"))
    got = spark.sql(f"SELECT url FROM {name}").collect()
    assert sorted(r["url"] for r in got) == ["u1", "u2"]  # dup dropped


def test_windowed_counts(spark, tmp_path):
    rows = [
        {"url": "a", "scraped_at": "2026-01-01T00:10:00Z", "price": 1, "availability": "x"},
        {"url": "b", "scraped_at": "2026-01-01T00:50:00Z", "price": 1, "availability": "x"},
        {"url": "c", "scraped_at": "2026-01-01T01:10:00Z", "price": 1, "availability": "x"},
    ]
    path = write_batch(tmp_path, "b1.json", rows)
    src = stream_source(spark, path, SCHEMA).withColumn("event_type", F.lit("e"))
    agg = windowed_counts(src, ts_col="scraped_at", window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {str(r["window_start"]): r["n"] for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert list(sorted(got.values())) == [1, 2]  # 2 in hour-0, 1 in hour-1


def test_foreachbatch_merge(spark, tmp_path):
    from tests.test_merge import BASE, SCHEMA as MERGE_SCHEMA, row

    current = spark.createDataFrame([row("u1"), row("u2")], MERGE_SCHEMA)
    staging_rows = [
        {**BASE, "url": "u1", "price": 150000},
        {**BASE, "url": "u3", "price": 999},
    ]
    path = tmp_path / "stg"
    path.mkdir()
    with open(path / "b.json", "w") as f:
        for r in staging_rows:
            f.write(json.dumps({k: v for k, v in r.items() if v is not None}) + "\n")
    stream = spark.readStream.schema(MERGE_SCHEMA).json(str(path))

    results = {}

    def publish(df, batch_id):
        results[batch_id] = {r["url"]: r.asDict() for r in df.collect()}

    q = run_merge_sink(
        stream,
        current_supplier=lambda: current,
        publish=publish,
        run_date="2026-01-31",
        checkpoint=str(tmp_path / "cp3"),
    ).start()
    q.awaitTermination(120)
    merged = results[0]
    assert merged["u1"]["price"] == 150000 and merged["u1"]["n_changes"] == 1
    assert merged["u2"]["n_changes"] == 0          # untouched carry
    assert merged["u3"]["is_new"] and merged["u3"]["price"] == 999


def test_queue_status_state(spark, tmp_path):
    rows = [
        {"url": "u1", "status": "Available"},
        {"url": "u1", "status": "Error"},
        {"url": "u2", "status": "Sold"},
        {"url": "u2", "status": "Available"},
    ]
    path = tmp_path / "q"
    path.mkdir()
    with open(path / "b.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema("url string, status string").json(str(path))
    out = queue_status_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("queue_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["url"]: (r["status"], r["n_events"]) for r in spark.sql("SELECT * FROM queue_state").collect()}
    assert got == {"u1": ("Error", 2), "u2": ("Sold", 2)}  # max-severity wins
