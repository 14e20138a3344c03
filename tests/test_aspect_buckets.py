"""Hand-computed KATs for SDXL-style aspect-ratio bucket assignment
(operators/multimodal.aspect_bucket_assign); the oracle gate proves
Spark==DuckDB over the golden image table, these pin the semantics."""

from __future__ import annotations


def _assign(spark, w, h):
    from colly_spark.operators.multimodal import aspect_bucket_assign

    df = spark.createDataFrame([("x", w, h)], "image_id string, w int, h int")
    return aspect_bucket_assign(df).collect()[0].asDict()


class TestAspectBucketKATs:
    def test_square(self, spark):
        r = _assign(spark, 256, 256)
        assert (r["bucket_w"], r["bucket_h"], r["scale"]) == (256, 256, 1.0)

    def test_wide_landscape_picks_448x128(self, spark):
        # ln(1000/300)=1.204: nearest ladder log-aspect is ln(3.5)=1.253
        r = _assign(spark, 1000, 300)
        assert (r["bucket_w"], r["bucket_h"]) == (448, 128)
        assert r["scale"] == 0.448  # max(448/1000, 128/300)

    def test_extreme_banner_clamps_to_widest(self, spark):
        r = _assign(spark, 2048, 8)
        assert (r["bucket_w"], r["bucket_h"]) == (512, 128)
        assert r["scale"] == 16.0  # 128/8 upscale dominates

    def test_portrait_mirrors_landscape(self, spark):
        a = _assign(spark, 300, 1000)
        assert (a["bucket_w"], a["bucket_h"]) == (128, 448)
