"""Structured Streaming ingest: file-source pages → windowed mention counts."""

from pyspark.sql import functions as F

from kgcompass_spark.sources.datagen import corpus_dataframes
from kgcompass_spark.streaming.ingest import run_stream_to_memory


def test_stream_mention_counts(spark, tmp_path):
    pages, _, _, _ = corpus_dataframes(spark, n_pages=40)
    # two parquet "drops" to exercise multiple micro-batches
    p = str(tmp_path / "drops")
    pages.filter(F.col("url").rlike(r"/([0-9]|1[0-9])$")).write.parquet(p + "/d1")
    pages.filter(~F.col("url").rlike(r"/([0-9]|1[0-9])$")).write.parquet(p + "/d2")
    # streaming source reads the directory tree of both drops
    import shutil, os

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for d in ("d1", "d2"):
        for f in os.listdir(p + "/" + d):
            if f.endswith(".parquet"):
                shutil.copy(f"{p}/{d}/{f}", f"{flat}/{d}_{f}")
                n += 1
    assert n > 0

    run_stream_to_memory(spark, flat, query_name="mc_test")
    out = spark.sql("SELECT * FROM mc_test").collect()
    assert out, "stream produced no windows"
    types = {r["mtype"] for r in out}
    assert "file" in types and "import" in types
    assert all(r["n_mentions"] > 0 for r in out)
