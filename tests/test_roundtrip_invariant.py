"""The north-star per-row invariant: token arrays the engine writes back
equal the input exactly (BASELINE.json input_hint)."""

import numpy as np

from pyspark.sql import functions as F

from stumpy_spark.sources import tokseq


def test_token_array_roundtrip_exact(spark, tmp_path):
    df = tokseq.tokseq_df(spark, 500, partitions=4)
    out = str(tmp_path / "roundtrip")
    # engine write path: partitioned, repartitioned — anything the rollup
    # job does to the base table
    (df.withColumn("day", F.to_date("event_ts"))
     .repartition("day", "source")
     .write.mode("overwrite").partitionBy("day", "source").parquet(out))
    back = spark.read.parquet(out)
    orig = {r.doc_id: (list(r.tokens), r.n_tok) for r in df.collect()}
    got = {r.doc_id: (list(r.tokens), r.n_tok) for r in back.collect()}
    assert set(orig) == set(got)
    for k in orig:
        assert orig[k][0] == got[k][0], k      # exact token equality
        assert orig[k][1] == got[k][1] == len(got[k][0])
    # distributed check of the same invariant (no collect): anti-join on
    # (doc_id, hash(tokens)) must be empty both ways
    a = df.select("doc_id", F.xxhash64("tokens").alias("h"))
    b = back.select("doc_id", F.xxhash64("tokens").alias("h"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
