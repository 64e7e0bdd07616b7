"""Property-based tests (hypothesis) for the codec-level invariants:
WAL encode/decode round-trip over arbitrary inputs, partition-key
consistency with the SQL layer's to_date."""

from __future__ import annotations

import io
from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from lynx_spark.buffer import partition_key
from lynx_spark.model import WriteRequest
from lynx_spark.wal import decode_write_request, encode_write_request

text = st.text(max_size=200)
tag_values = st.one_of(st.text(max_size=50), st.integers(min_value=0, max_value=2**64 - 1))
metadata = st.dictionaries(st.text(max_size=30), tag_values, max_size=8)
# chrono-representable microsecond timestamps (reference panics outside)
timestamps = st.integers(min_value=-(2**55), max_value=2**55)


@given(ns=text, meas=text, value=text, md=metadata, ts=timestamps)
@settings(max_examples=300, deadline=None)
def test_wal_roundtrip_property(ns, meas, value, md, ts):
    req = WriteRequest(ns, meas, value, md, ts)
    out = decode_write_request(io.BytesIO(encode_write_request(req)))
    assert out == req


@given(ns=text, meas=text, value=text, md=metadata, ts=timestamps)
@settings(max_examples=100, deadline=None)
def test_wal_records_are_self_delimiting(ns, meas, value, md, ts):
    """Two concatenated records decode independently — the property the
    segment reader relies on (EOF only at record boundaries)."""
    a = WriteRequest(ns, meas, value, md, ts)
    b = WriteRequest(meas, ns, value, md, ts)
    stream = io.BytesIO(encode_write_request(a) + encode_write_request(b))
    assert decode_write_request(stream) == a
    assert decode_write_request(stream) == b
    assert decode_write_request(stream) is None


@given(ts=st.integers(min_value=-(10**15), max_value=9 * 10**15))
@settings(max_examples=300, deadline=None)
def test_partition_key_matches_utc_date(ts):
    """The buffer's day key equals the UTC calendar date of the
    microsecond timestamp — the invariant that makes the cold tier's
    day= partition column and SQL to_date(timestamp) agree."""
    expected = (
        datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(microseconds=ts)
    ).strftime("%Y-%m-%d")
    assert partition_key(ts) == expected
