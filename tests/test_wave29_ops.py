"""Wave-29: decision-stump split finder (q235) and the streaming JSD
drift monitor."""

import os

from esop_spark.operators import text as text_ops
from esop_spark.streaming.stateful import jsd_drift_stream


DOC_COLS = ["doc_id", "text", "lang", "source"]


def test_best_split_separates_classes(spark):
    good = " ".join(["a the"] * 20 + ["w%d" % i for i in range(20)])
    bad = "a a a a"
    docs = spark.createDataFrame(
        [(i, good, "en", "s") for i in range(5)]
        + [(10 + i, bad, "en", "s") for i in range(5)],
        DOC_COLS,
    )
    r = text_ops.best_split_stump(docs).collect()[0]
    # bad docs score low, good docs higher; a perfect split exists
    assert r["n_left"] == 5 and r["n_right"] == 5
    # perfect separation: parent gini = 0.5, children = 0
    assert abs(r["gini_gain"] - 0.5) < 1e-6


JSD_SCHEMA = "series_key string, category string"


def _run_jsd(spark, src_dir, ckpt):
    rows: list = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(JSD_SCHEMA).parquet(src_dir)
    q = (
        jsd_drift_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    return rows


def test_jsd_stream_first_batch_zero_then_drift(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        [("k", "x"), ("k", "y")], JSD_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    out1 = _run_jsd(spark, src, ckpt)
    assert out1[0]["prev_n"] == 0 and out1[0]["jsd_milli"] == 0
    # second batch: disjoint categories -> jsd = ln2 ~ 693 milli
    spark.createDataFrame(
        [("k", "z"), ("k", "z")], JSD_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    out2 = _run_jsd(spark, src, ckpt)
    assert out2[0]["prev_n"] == 2 and out2[0]["batch_n"] == 2
    assert out2[0]["jsd_milli"] == 693
