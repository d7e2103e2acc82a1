"""Pages generator invariants: Spark generator == numpy twin byte-for-byte
(per-url text identity, BASELINE.json:15) and geotag extraction parity."""

from __future__ import annotations

import hashlib

import numpy as np

from orthority_spark.functions.geotag import with_geotag
from orthority_spark.sources.pages import synthetic_pages, synthetic_pages_pandas

N = 2000


def test_text_byte_identity_per_url(spark):
    got = {r.url: (r.text, bytes(r.html)) for r in synthetic_pages(spark, N).collect()}
    oracle = synthetic_pages_pandas(N)
    assert len(got) == N
    for _, row in oracle.iterrows():
        text, html = got[row.url]
        assert text == row.text, row.url
        assert html == row.html
        # sha256 parity (the BASELINE.md per-url invariant as stated)
        assert hashlib.sha256(text.encode()).hexdigest() == hashlib.sha256(
            row.text.encode()
        ).hexdigest()


def test_geotag_extraction_recovers_generated_coords(spark):
    df = with_geotag(synthetic_pages(spark, N), token="float")
    got = {r.url: (r.lat, r.lon) for r in df.collect()}
    oracle = synthetic_pages_pandas(N)
    for _, row in oracle.iterrows():
        lat, lon = got[row.url]
        # text stores %.6f of udeg/1e6; parsing returns the same double
        assert lat == float(f"{row.lat:.6f}")
        assert lon == float(f"{row.lon:.6f}")


def test_distribution_shape(spark):
    oracle = synthetic_pages_pandas(N)
    mega = (np.arange(N) % 5) == 1
    assert (oracle.lon[mega].nunique()) == 1
    outside = oracle.lon > 24.3
    # ~20% outside
    assert 0.15 < outside.mean() < 0.25


def test_schema(spark):
    df = synthetic_pages(spark, 10)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["html"] == "binary" and kinds["warc_ts"] == "timestamp"
