"""Vectorized pandas/Arrow UDF wrappers for the URL kernel.

These are the only Python hops in the admission path; everything
downstream of them (filters, dedup joins, quota windows) is pure
Catalyst. Each UDF is Arrow-batched (``spark.sql.execution.arrow``),
never per-row Python — per ``BASELINE.json`` input_hint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from colly_spark.functions import urlnorm


@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.canonicalize(u) if u is not None else None)


@F.pandas_udf(StringType())
def hostname_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.hostname(u) if u is not None else None)


@F.pandas_udf(StringType())
def resolve_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    return pd.Series(
        [urlnorm.resolve(b, h) if (b is not None and h is not None) else None
         for b, h in zip(bases, hrefs)]
    )


@F.pandas_udf(LongType())
def fnv64a_udf(urls: pd.Series) -> pd.Series:
    """FNV-64a over the (already canonical) URL string → int64 dedup key.
    Reference key semantics: colly.go:1484-1498 (requestHash)."""
    vals = urls.fillna("").tolist()
    return pd.Series(urlnorm.fnv64a_batch(vals))


@F.pandas_udf(LongType())
def fnv64a_body_udf(urls: pd.Series, bodies: pd.Series) -> pd.Series:
    """FNV-64a over URL ‖ body — the POST dedup key (body participates,
    colly.go:1494-1496)."""
    vals = urls.fillna("").tolist()
    return pd.Series(urlnorm.fnv64a_batch(vals, bodies.tolist()))


def canon_host_hash_udf():
    """Fused admission kernel: (url, body) → struct<canon_url, host,
    url_hash>. One Arrow round-trip and one parse per row instead of
    three separate UDF passes — this is the hot map-side stage of the
    10^10-row frontier scan, so the fusion matters.

    Hash semantics = requestHash (colly.go:1484-1498): FNV-64a over
    canonical URL ‖ body, falling back to the raw URL when
    canonicalization fails."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("url_hash", LongType()),
    ])

    def _fused(urls, bodies):
        canon = [urlnorm.canonicalize(u) if u is not None else "" for u in urls]
        hosts = [urlnorm.hostname(c) if c else "" for c in canon]
        keys = [c if c else (u or "") for c, u in zip(canon, urls)]
        hashes = urlnorm.fnv64a_batch(keys, list(bodies))
        return pd.DataFrame({"canon_url": canon, "host": hosts, "url_hash": hashes})

    return F.pandas_udf(_fused, schema)


def with_canonical_url(df, url_col: str = "url"):
    """url → canon_url, host, url_hash in one projection.

    Single Python stage; the three UDFs share one Arrow batch pass per
    column. At 10^10-frontier scale this is the map-side-only stage that
    runs right after the frontier scan, before any shuffle.
    """
    canon = canonicalize_udf(F.col(url_col))
    df = df.withColumn("canon_url", canon)
    df = df.withColumn("host", hostname_udf(F.col("canon_url")))
    df = df.withColumn("url_hash", fnv64a_udf(F.col("canon_url")))
    return df
