"""Vector kernels (expression + Pandas-UDF paths agree) and multimodal
mapInPandas plumbing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from retail_sales_etl_spark.catalog import load_table
from retail_sales_etl_spark.functions import vectors
from retail_sales_etl_spark.operators import multimodal


def test_expression_cosine_matches_numpy_udf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    emb = emb.select("vec_id", vectors.as_double_array("embedding").alias("v"))
    query = emb.filter(F.col("vec_id") == 0).first()["v"]

    expr_cos = emb.select(
        "vec_id",
        vectors.cosine(
            F.col("v"), F.array(*[F.lit(x) for x in query])
        ).alias("c"),
    )
    udf_cos = emb.select(
        "vec_id", vectors.cosine_to_query_udf(query)(F.col("v")).alias("c")
    )
    e = {r["vec_id"]: r["c"] for r in expr_cos.collect()}
    u = {r["vec_id"]: r["c"] for r in udf_cos.collect()}
    assert e.keys() == u.keys()
    for k in e:
        assert math.isclose(e[k], u[k], rel_tol=1e-9, abs_tol=1e-12)


def test_media_table_schema(spark, sf_dir):
    media = multimodal.to_media_table(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "payload", "mime_type", "n_bytes",
    ]
    row = media.first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["n_bytes"] == len(row["payload"])


def test_sample_frames_one_to_many(spark, sf_dir):
    media = multimodal.to_media_table(load_table(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media, frame_size=64, stride=256)
    rows = frames.limit(500).collect()
    assert len(rows) > 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    some_doc = next(iter(by_doc.values()))
    idxs = sorted(r["frame_idx"] for r in some_doc)
    assert idxs == list(range(len(idxs)))  # contiguous frame indices
    for r in some_doc:
        assert r["frame_offset"] == r["frame_idx"] * 256
        assert 0 < len(r["frame_bytes"]) <= 64


def test_extract_features_mapinpandas(spark, sf_dir):
    media = multimodal.to_media_table(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, batch_partitions=4)
    rows = feats.collect()
    assert len(rows) == media.count()
    sample = rows[0]
    # deterministic fake decode: re-derive expectations driver-side
    assert sample["width"] == (sample["n_bytes"] % 64) + 1
    assert sample["height"] == (sample["n_bytes"] % 48) + 1
    assert sample["n_frames"] == 1
    assert sample["feature_checksum"] >= 0
