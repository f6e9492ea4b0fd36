"""Multimodal plumbing tests (real Spark flow, stubbed codecs)."""

import numpy as np
import pytest

from stumpy_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    df = MM.synthetic_media_df(spark, 90).cache()
    df.count()
    return df


def test_decode_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception) as exc:
        MM.decode_features(media, fake=False).count()
    assert "NotImplementedError" in str(exc.value) or \
        isinstance(exc.value, NotImplementedError)


def test_fake_decode_deterministic(spark, media):
    a = MM.decode_features(media, fake=True).toPandas()
    b = MM.decode_features(media.repartition(7), fake=True).toPandas()
    assert len(a) == 90
    am = {r.media_id: np.array(r.feature) for r in a.itertuples()}
    bm = {r.media_id: np.array(r.feature) for r in b.itertuples()}
    for mid in am:
        np.testing.assert_array_equal(am[mid], bm[mid])
    assert all(len(v) == 64 for v in am.values())


def test_frame_sample_plan(spark, media):
    frames = MM.frame_sample_plan(media, every_ms=5000)
    pdf = frames.toPandas()
    assert (pdf.frame_ts_ms % 5000 == 0).all()
    # blob column pruned from the scan
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "blob" not in plan.lower().split("readschema")[-1][:400] \
        if "readschema" in plan.lower() else True


def test_media_stats_metadata_only(spark, media):
    stats = MM.media_stats(media).toPandas().set_index("mime")
    assert stats.loc["image/png"].n_media == 30
    assert stats.loc["video/mp4"].total_bytes > 0


def test_resize_images_fake_deterministic(spark):
    from stumpy_spark.functions.multimodal import (resize_images,
                                                   synthetic_media_df)
    df = synthetic_media_df(spark, 30)
    out = resize_images(df, 256, 128, fake=True).toPandas()
    n_img = df.where("mime like 'image/%'").count()
    assert len(out) == n_img
    assert (out.width == 256).all() and (out.height == 128).all()
    assert (out.n_bytes == out.blob.map(len)).all()
    # partition-invariant: same bytes -> same resized blob
    out2 = resize_images(df.repartition(7), 256, 128,
                         fake=True).toPandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a.media_id == b.media_id).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a.blob, b.blob))


def test_resize_images_stub_raises(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from stumpy_spark.functions.multimodal import (resize_images,
                                                   synthetic_media_df)
    df = synthetic_media_df(spark, 6)
    with _pytest.raises(Exception) as exc:
        resize_images(df, 64, 64).toPandas()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, Py4JJavaError)
