"""WARC reader: synthesized archives round-trip, gzip members, errors."""

import gzip

import pytest

from language_identification_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
)


def _warc_record(rtype: str, url: str, ts: str, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return hdr + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n".encode()
        + b"\r\n"
        + body
    )


BODY1 = "<html><body>hello wörld</body></html>".encode()
BODY2 = b"<html>page two</html>"


def _archive() -> bytes:
    return (
        _warc_record(
            "warcinfo", "urn:warcinfo", "2024-01-01T00:00:00Z", b"info"
        )
        + _warc_record(
            "response", "http://a.com/1", "2024-01-01T00:00:01Z", _http(BODY1)
        )
        + _warc_record(
            "response",
            "http://a.com/2",
            "2024-01-01T00:00:02Z",
            _http(BODY2, status=404),
        )
    )


def test_parse_plain_archive():
    recs = list(parse_warc_bytes("f", _archive()))
    assert [r[1] for r in recs] == ["warcinfo", "response", "response"]
    info, r1, r2 = recs
    assert r1[2] == "http://a.com/1" and r1[4] == 200 and r1[6] == BODY1
    assert r1[5] == "text/html"
    assert r2[2] == "http://a.com/2" and r2[4] == 404 and r2[6] == BODY2
    assert all(r[7] is None for r in recs)


def test_parse_member_per_record_gzip():
    # Common-Crawl shape: one gzip member per record, concatenated
    gz = b"".join(
        gzip.compress(r)
        for r in [
            _warc_record(
                "response",
                "http://b.com/x",
                "2024-02-02T00:00:00Z",
                _http(BODY1),
            ),
            _warc_record(
                "response",
                "http://b.com/y",
                "2024-02-02T00:00:01Z",
                _http(BODY2),
            ),
        ]
    )
    recs = list(parse_warc_bytes("f.gz", gz))
    assert [r[2] for r in recs] == ["http://b.com/x", "http://b.com/y"]
    assert [r[6] for r in recs] == [BODY1, BODY2]


def test_malformed_records_become_error_rows_not_crashes():
    bad_len = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\n"
    recs = list(parse_warc_bytes("f", bad_len))
    assert recs[0][7] == "bad Content-Length"

    bad_http = _warc_record(
        "response", "http://c.com", "2024-01-01T00:00:00Z", b"NOT-HTTP"
    )
    recs = list(parse_warc_bytes("f", bad_http))
    assert recs[0][7] == "bad http payload"
    assert recs[0][2] == "http://c.com"  # metadata still surfaced

    assert list(parse_warc_bytes("f", b"garbage no records")) == []


def test_read_warc_distributed_roundtrip(spark, tmp_path):
    plain = tmp_path / "a.warc"
    plain.write_bytes(_archive())
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(
        gzip.compress(
            _warc_record(
                "response",
                "http://gz.com/1",
                "2024-03-03T00:00:00Z",
                _http(BODY2),
            )
        )
    )
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.filter("record_type = 'response'").collect()
    assert {r.url for r in rows} == {
        "http://a.com/1",
        "http://a.com/2",
        "http://gz.com/1",
    }
    by_url = {r.url: r for r in rows}
    assert bytes(by_url["http://a.com/1"].payload) == BODY1
    assert by_url["http://a.com/2"].http_status == 404
    assert all(r.warc_error is None for r in rows)
    # plan: narrow map over the binaryFile scan — no exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_warc_feeds_the_flagship_pipeline(spark, tmp_path):
    """Wire-to-verdict integration: .warc.gz bytes -> read_warc ->
    warc_to_pages -> quality_filter_plan -> keep/drop labels."""
    from language_identification_spark.fixtures import training_corpus
    from language_identification_spark.oracle.langid import NgramNBModel
    from language_identification_spark.plans.pipeline import (
        quality_filter_plan,
    )
    from language_identification_spark.sources.warc import warc_to_pages

    good = (
        "<html><body>"
        "the quick brown fox jumps over the lazy dog in the morning. "
        "later that afternoon the other animals walked home together. "
        "everyone agreed that the weather had been pleasant all week. "
        "a different sentence about rivers and mountains closes the page."
        "</body></html>"
    ).encode()
    recs = [
        _warc_record(
            "response", "http://ok.com/1", "2024-01-01T00:00:00Z", _http(good)
        ),
        _warc_record(
            "response",
            "http://gone.com/2",
            "2024-01-01T00:00:01Z",
            _http(b"<html>x</html>", status=404),  # non-200: excluded
        ),
        _warc_record(
            "warcinfo", "urn:x", "2024-01-01T00:00:02Z", b"meta"
        ),
        _warc_record(  # 200 but not text/html: excluded by content type
            "response",
            "http://pdf.com/3",
            "2024-01-01T00:00:03Z",
            b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF-fake",
        ),
    ]
    (tmp_path / "c.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )
    pages = warc_to_pages(read_warc(spark, str(tmp_path) + "/*.warc.gz"))
    model = NgramNBModel.train(training_corpus())
    out = quality_filter_plan(pages, model).collect()
    assert [r.url for r in out] == ["http://ok.com/1"]
    r = out[0]
    assert r.lang_pred == "en" and r.keep
    assert "quick brown fox" in r.extracted_text


def test_negative_content_length_cannot_loop():
    """A negative Content-Length must yield one error row and ADVANCE —
    the pre-fix parser re-found the same record forever."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: -50\r\n\r\n"
        + _warc_record(
            "response", "http://after.com", "2024-01-01T00:00:00Z", _http(BODY2)
        )
    )
    recs = list(parse_warc_bytes("f", bad))
    assert recs[0][7] == "bad Content-Length"
    assert recs[1][2] == "http://after.com"  # parsing continued past it


def test_mixed_warc_versions_both_parsed():
    """A 1.1 record before a 1.0 record must not be skipped."""
    r11 = _warc_record(
        "response", "http://v11.com", "2024-01-01T00:00:00Z", _http(BODY1)
    ).replace(b"WARC/1.0", b"WARC/1.1", 1)
    r10 = _warc_record(
        "response", "http://v10.com", "2024-01-01T00:00:01Z", _http(BODY2)
    )
    recs = list(parse_warc_bytes("f", r11 + r10))
    assert [r[2] for r in recs] == ["http://v11.com", "http://v10.com"]


def test_truncated_gzip_member_is_an_error_row():
    full = gzip.compress(
        _warc_record(
            "response", "http://t.com", "2024-01-01T00:00:00Z", _http(BODY1)
        )
    )
    recs = list(parse_warc_bytes("f.gz", full[: len(full) - 8]))
    assert len(recs) == 1 and recs[0][7].startswith("gzip:")
