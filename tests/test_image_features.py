"""Image feature extraction (decode → grayscale → resize → luma stats +
average-hash): pinned on synthetic solid-color and gradient PNGs."""

from __future__ import annotations

import pandas as pd


def _blob_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "blob"]))


def test_solid_color_features_exact(spark):
    from dask_ssh_docker_spark.operators.multimodal import (
        _png_codec,
        image_features,
    )

    encode_png, _ = _png_codec()
    # solid gray (L=100 for RGB 100,100,100) and solid white
    df = _blob_df(
        spark,
        [(1, encode_png(32, 20, (100, 100, 100))), (2, encode_png(8, 8, (255, 255, 255)))],
    )
    out = (
        image_features(df, "blob", "doc_id")
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "decode_ok"]) and bool(out.loc[2, "decode_ok"])
    # solid image → every thumbnail pixel equals the mean → std 0, ahash 0
    assert abs(out.loc[1, "mean_luma"] - 100.0) < 1.5  # L-convert rounding
    assert out.loc[1, "std_luma"] == 0.0
    assert int(out.loc[1, "ahash"]) == 0
    assert abs(out.loc[2, "mean_luma"] - 255.0) < 0.001
    assert int(out.loc[2, "ahash"]) == 0


def test_near_dup_images_small_hamming(spark):
    """Identical images → identical ahash; different colors → different."""
    from dask_ssh_docker_spark.operators.multimodal import (
        _png_codec,
        image_features,
    )

    encode_png, _ = _png_codec()
    a = encode_png(40, 40, (10, 200, 30))
    df = _blob_df(spark, [(1, a), (2, a), (3, encode_png(40, 40, (200, 10, 30)))])
    out = (
        image_features(df, "blob", "doc_id")
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert int(out.loc[1, "ahash"]) == int(out.loc[2, "ahash"])
    assert out.loc[1, "mean_luma"] != out.loc[3, "mean_luma"]


def test_bad_blob_rows_not_failures(spark):
    from dask_ssh_docker_spark.operators.multimodal import image_features

    df = _blob_df(spark, [(1, b"not a png")])
    out = image_features(df, "blob", "doc_id").toPandas()
    assert len(out) == 1
    assert not bool(out.loc[0, "decode_ok"])
    assert out.loc[0, "mean_luma"] is None or pd.isna(out.loc[0, "mean_luma"])


def test_plan_is_arrow_not_batch_eval(spark):
    from dask_ssh_docker_spark.operators.multimodal import (
        image_features,
        synthesize_png_blobs,
    )
    from dask_ssh_docker_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        image_features(synthesize_png_blobs(docs, "doc_id"), "blob", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "PythonMapInArrow" in plan
