"""Prometheus remote-read wire protocol (sources/remote_read.py).

Covers the two hand-rolled codecs against their public specifications
(snappy block format; protobuf wire format for the prompb subset) plus the
HTTP round trip: server over a samples frame, stock-client-shaped read
back, parity with a direct DataFrame filter — the wire analog of
src/internal/storage/remote_querier_test.go "connects".
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from metric_store_release_spark.sources.remote_read import (
    MATCH_EQ,
    MATCH_NRE,
    MATCH_RE,
    PbMatcher,
    PbQuery,
    PbReadRequest,
    PbReadResponse,
    PbTimeSeries,
    RemoteReadServer,
    remote_read,
    remote_read_samples,
    snappy_compress,
    snappy_decompress,
)

# ---------------------------------------------------------------------------
# snappy
# ---------------------------------------------------------------------------


def test_snappy_round_trip_random():
    rng = random.Random(7)
    for _ in range(100):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200_000)))
        assert snappy_decompress(snappy_compress(data)) == data


def test_snappy_decodes_copy_elements():
    # hand-assembled per format_description.txt: uncompressed len 8,
    # literal "abcd", then a 1-byte-offset copy (len 4, offset 4)
    blob = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([(0 << 5) | ((4 - 4) << 2) | 1, 4])
    assert snappy_decompress(blob) == b"abcdabcd"
    # overlapping copy: literal "ab", copy len 6 offset 2 -> "abababab"
    blob2 = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([(0 << 5) | ((6 - 4) << 2) | 1, 2])
    assert snappy_decompress(blob2) == b"abababab"
    # 2-byte-offset copy form
    blob3 = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([((4 - 1) << 2) | 2, 4, 0])
    assert snappy_decompress(blob3) == b"abcdabcd"


def test_snappy_rejects_corrupt():
    with pytest.raises(ValueError):
        # copy with offset beyond produced output
        snappy_decompress(bytes([4, (0 << 5) | ((4 - 4) << 2) | 1, 9]))


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------


def test_read_request_golden_bytes():
    """Byte-exact against the protobuf wire spec, computed by hand:
    Query{start=1000 end=2000 matchers=[{EQ,"n","up"}]} inside ReadRequest."""
    matcher = PbMatcher(MATCH_EQ, "n", "up").encode()
    # EQ == 0 -> proto3 default, omitted; field2 "n"; field3 "up"
    assert matcher == bytes([0x12, 0x01]) + b"n" + bytes([0x1A, 0x02]) + b"up"
    query = PbQuery(1000, 2000, [PbMatcher(MATCH_EQ, "n", "up")]).encode()
    assert query == (
        bytes([0x08, 0xE8, 0x07])  # field1 varint 1000
        + bytes([0x10, 0xD0, 0x0F])  # field2 varint 2000
        + bytes([0x1A, len(matcher)])
        + matcher
    )
    req = PbReadRequest([PbQuery(1000, 2000, [PbMatcher(MATCH_EQ, "n", "up")])])
    assert req.encode() == bytes([0x0A, len(query)]) + query


def test_request_round_trip_all_matcher_types():
    q = PbQuery(
        -5, 2**40, [PbMatcher(t, f"l{t}", f"v{t}") for t in range(4)]
    )
    out = PbReadRequest.decode(PbReadRequest([q]).encode()).queries[0]
    assert out.start_ms == -5 and out.end_ms == 2**40
    assert [(m.type, m.name, m.value) for m in out.matchers] == [
        (t, f"l{t}", f"v{t}") for t in range(4)
    ]


def test_response_round_trip_preserves_series_and_empty_results():
    s1 = PbTimeSeries(
        labels=[("__name__", "up"), ("job", "api")],
        samples=[(1.5, 1000), (-0.25, -60_000), (math.inf, 3000)],
    )
    resp = PbReadResponse(results=[[s1], []])
    out = PbReadResponse.decode(resp.encode())
    assert len(out.results) == 2 and out.results[1] == []
    got = out.results[0][0]
    assert got.labels == s1.labels
    assert got.samples == s1.samples


def test_nan_sample_survives():
    s = PbTimeSeries(labels=[("a", "b")], samples=[(math.nan, 7)])
    got = PbReadResponse.decode(PbReadResponse([[s]]).encode()).results[0][0]
    assert math.isnan(got.samples[0][0]) and got.samples[0][1] == 7


# ---------------------------------------------------------------------------
# HTTP round trip over a samples frame
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def served(spark_module_samples):
    spark, samples = spark_module_samples
    srv = RemoteReadServer(lambda: samples).start()
    yield spark, samples, srv
    srv.stop()


@pytest.fixture(scope="module")
def spark_module_samples(request):
    spark = request.getfixturevalue("spark")
    rows = [
        (1_000, "up", 1.0, {"job": "api", "node": "a"}),
        (2_000, "up", 0.0, {"job": "api", "node": "a"}),
        (1_500, "up", 1.0, {"job": "db", "node": "b"}),
        (1_200, "errors", 3.0, {"job": "api", "node": "a"}),
        (9_999_999, "up", 1.0, {"job": "api", "node": "a"}),
    ]
    samples = spark.createDataFrame(
        rows, "ts long, name string, value double, labels map<string,string>"
    )
    return spark, samples


def test_http_read_matches_direct_filter(served):
    spark, samples, srv = served
    series = remote_read(
        srv.url, [PbMatcher(MATCH_EQ, "__name__", "up")], 0, 5_000
    )
    # two series (job=api/node=a, job=db/node=b), ordered by label key
    assert len(series) == 2
    by_job = {dict(s.labels)["job"]: s for s in series}
    assert [t for _, t in by_job["api"].samples] == [1_000, 2_000]
    assert [v for v, _ in by_job["api"].samples] == [1.0, 0.0]
    assert dict(by_job["db"].labels)["__name__"] == "up"
    # time bound excluded the 9_999_999 sample
    direct = samples.filter(
        (F.col("name") == "up") & F.col("ts").between(0, 5_000)
    ).count()
    assert sum(len(s.samples) for s in series) == direct


def test_http_regex_and_negative_matchers(served):
    spark, samples, srv = served
    series = remote_read(
        srv.url,
        [PbMatcher(MATCH_RE, "__name__", "up|errors"), PbMatcher(MATCH_NRE, "job", "db")],
        0,
        5_000,
    )
    names = {dict(s.labels)["__name__"] for s in series}
    assert names == {"up", "errors"}
    assert all(dict(s.labels)["job"] == "api" for s in series)


def test_remote_read_samples_round_trips_to_dataframe(served):
    spark, samples, srv = served
    df = remote_read_samples(
        spark, srv.url, [PbMatcher(MATCH_EQ, "__name__", "up")], 0, 5_000
    )
    got = {(r["ts"], r["name"], r["value"], tuple(sorted(r["labels"].items())))
           for r in df.collect()}
    want = {
        (r["ts"], r["name"], r["value"], tuple(sorted(r["labels"].items())))
        for r in samples.filter(
            (F.col("name") == "up") & F.col("ts").between(0, 5_000)
        ).collect()
    }
    assert got == want


def test_multi_query_request(served):
    spark, samples, srv = served
    req = PbReadRequest(
        queries=[
            PbQuery(0, 5_000, [PbMatcher(MATCH_EQ, "__name__", "up")]),
            PbQuery(0, 5_000, [PbMatcher(MATCH_EQ, "__name__", "nothing")]),
        ]
    )
    import urllib.request

    body = snappy_compress(req.encode())
    http_req = urllib.request.Request(
        srv.url, data=body,
        headers={"Content-Type": "application/x-protobuf",
                 "Content-Encoding": "snappy"},
        method="POST",
    )
    with urllib.request.urlopen(http_req, timeout=10) as resp:
        raw = snappy_decompress(resp.read())
    decoded = PbReadResponse.decode(raw)
    assert len(decoded.results) == 2
    assert len(decoded.results[0]) == 2  # two 'up' series
    assert decoded.results[1] == []  # empty QueryResult still present


def test_snappy_compressor_emits_copies_and_roundtrips():
    """Round 5: the encoder is a real greedy-match compressor, not
    literal-only framing — repetitive payloads must shrink hard and
    round-trip through the independent decoder."""
    import random

    rng = random.Random(7)
    repetitive = b"cpu_seconds_total{instance=\"10.0.0.1\"} " * 2000
    blob = snappy_compress(repetitive)
    assert snappy_decompress(blob) == repetitive
    assert len(blob) < len(repetitive) // 10  # copies, not literals
    # spans a fragment boundary (>64 KiB) with the period not dividing 65536
    long = (b"abcdefg" * 20_000)[:140_003]
    assert snappy_decompress(snappy_compress(long)) == long
    # incompressible data must still be spec-valid (and barely grow)
    noise = bytes(rng.randrange(256) for _ in range(50_000))
    blob2 = snappy_compress(noise)
    assert snappy_decompress(blob2) == noise
    assert len(blob2) <= len(noise) + len(noise) // 1000 + 16
    # RLE shape: offset < length overlapping copy
    # ~3 bytes per 64-byte copy element (the spec's max copy length)
    run = b"x" * 10_000
    blob3 = snappy_compress(run)
    assert snappy_decompress(blob3) == run and len(blob3) < 600


def test_snappy_property_roundtrip_hypothesis():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=5_000))
    def check(data):
        assert snappy_decompress(snappy_compress(data)) == data

    check()

    # structured repetition: random tilings of a small alphabet stress the
    # matcher's copy/literal boundaries harder than uniform bytes
    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.sampled_from([b"ab", b"abc", b"x", b"hello ", b"\x00\x00"]),
            min_size=0,
            max_size=400,
        )
    )
    def check_tiled(parts):
        data = b"".join(parts)
        assert snappy_decompress(snappy_compress(data)) == data

    check_tiled()
