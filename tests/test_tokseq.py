import numpy as np

from stumpy_spark.sources import tokseq


def test_gen_rows_deterministic():
    a = tokseq._gen_rows(np.array([0, 5, 17]))
    b = tokseq._gen_rows(np.array([5, 0, 17]))
    row_a = a[a.doc_id == "doc00000005"].iloc[0]
    row_b = b[b.doc_id == "doc00000005"].iloc[0]
    assert np.array_equal(row_a.tokens, row_b.tokens)
    assert row_a.source == row_b.source
    assert row_a.event_ts == row_b.event_ts


def test_invariants():
    pdf = tokseq._gen_rows(np.arange(500))
    assert (pdf.n_tok == pdf.tokens.map(len)).all()
    assert pdf.n_tok.between(tokseq.LEN_MIN, tokseq.LEN_MAX).all()
    for toks in pdf.tokens.head(20):
        assert toks.dtype == np.int32
        assert toks.min() >= 0 and toks.max() < tokseq.VOCAB
    # zipf skew: web must dominate
    counts = pdf.source.value_counts()
    assert counts.index[0] == "web"
    assert counts.iloc[0] > 2 * counts.get("paper", 0)


def test_spark_generation_partition_invariant(spark):
    df4 = tokseq.tokseq_df(spark, 200, partitions=4)
    df1 = tokseq.tokseq_df(spark, 200, partitions=1)
    a = {r.doc_id: (list(r.tokens), r.source, r.event_ts)
         for r in df4.collect()}
    b = {r.doc_id: (list(r.tokens), r.source, r.event_ts)
         for r in df1.collect()}
    assert a == b
    assert len(a) == 200
