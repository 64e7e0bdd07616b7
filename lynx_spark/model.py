"""Core data model: the write request and tag values.

Mirrors the reference's ``WriteRequest`` (``src/wal.rs:18-25``) — the
unit of ingestion, one time-series point:

    namespace:   top-level isolation scope
    measurement: the SQL table name
    value:       the observed value — always a string
    metadata:    tags, key -> string | u64
    timestamp:   microseconds since epoch, UTC
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Union

TagValue = Union[str, int]

U64_MAX = (1 << 64) - 1


def validate_tag_value(v: Any) -> TagValue:
    """Accept the two wire types of ``TagValue`` (wal.rs:158-162):
    a string, or an unsigned 64-bit integer."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):  # bool is an int subclass; reject explicitly
        raise TypeError(f"tag value must be string or u64, got bool: {v!r}")
    if isinstance(v, int):
        if not (0 <= v <= U64_MAX):
            raise ValueError(f"numeric tag value out of u64 range: {v}")
        return v
    raise TypeError(f"tag value must be string or u64, got {type(v).__name__}")


def tag_to_str(v: TagValue) -> str:
    """At the SQL boundary every tag column is stringified, matching
    ``metadata.get(tag_key).map(|v| v.to_string())`` (lynx.rs:128)."""
    return str(v)


@dataclass
class WriteRequest:
    namespace: str
    measurement: str
    value: str
    metadata: dict[str, TagValue] = field(default_factory=dict)
    timestamp: int = 0  # microseconds since epoch, UTC

    @classmethod
    def from_json_dict(cls, payload: Mapping[str, Any]) -> "WriteRequest":
        """Parse the HTTP write body. All five fields are required by
        the reference's serde derive (no defaults — main.rs:55-57),
        though ``metadata`` may be an empty object
        (testdata/write.json:5)."""
        missing = [
            k
            for k in ("namespace", "measurement", "value", "metadata", "timestamp")
            if k not in payload
        ]
        if missing:
            raise ValueError(f"missing field(s): {', '.join(missing)}")
        ns = payload["namespace"]
        meas = payload["measurement"]
        val = payload["value"]
        meta = payload["metadata"]
        ts = payload["timestamp"]
        if not isinstance(ns, str) or not isinstance(meas, str) or not isinstance(val, str):
            raise TypeError("namespace, measurement and value must be strings")
        if not isinstance(meta, Mapping):
            raise TypeError("metadata must be an object")
        if isinstance(ts, bool) or not isinstance(ts, int):
            raise TypeError("timestamp must be an integer (microseconds)")
        metadata = {str(k): validate_tag_value(v) for k, v in meta.items()}
        return cls(namespace=ns, measurement=meas, value=val, metadata=metadata, timestamp=ts)

    def to_json_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "namespace": self.namespace,
            "measurement": self.measurement,
            "value": self.value,
            "timestamp": self.timestamp,
        }
        # serde skips empty metadata on serialization (wal.rs:22)
        if self.metadata:
            out["metadata"] = dict(self.metadata)
        return out
