"""Result sinks: JSON array and ASCII pretty-table.

Matches the reference's ``QueryResponseAdapter`` (src/query.rs:19-34):
JSON via Arrow's ``ArrayWriter`` (rows as a JSON array of objects,
null fields omitted) and the ASCII grid of arrow-rs
``pretty_format_batches`` — the format the reference's golden test
asserts against (src/lynx.rs:337-343):

    +----------------------------+---------------+
    | timestamp                  | value         |
    +----------------------------+---------------+
    | 1970-01-01T00:00:00.000001 | search_button |
    +----------------------------+---------------+

Timestamps render like chrono's AutoSi: no fractional digits when the
sub-second part is zero, 3 digits when it is a whole millisecond,
otherwise 6 (the golden shows ``.000100`` for 100 us).
"""

from __future__ import annotations

import json
import math
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Iterable


def format_timestamp(dt: datetime) -> str:
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    us = dt.microsecond
    if us == 0:
        return base
    if us % 1000 == 0:
        return f"{base}.{us // 1000:03d}"
    return f"{base}.{us:06d}"


def _render_cell(v: Any) -> str:
    """Stringify one value the way arrow-rs pretty printing does."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return format_timestamp(v)
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # Rust {} for f64 always keeps a fractional part
        s = repr(v)
        return s
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_render_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_render_cell(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rows_to_table(columns: list[str], rows: Iterable[tuple]) -> str:
    """ASCII grid in the arrow-rs ``pretty_format_batches`` style
    (query.rs:30-34): ``+--+`` borders, one space padding, left-aligned,
    nulls shown as empty cells."""
    rendered = [[_render_cell(v) for v in row] for row in rows]
    widths = [len(c) for c in columns]
    for row in rendered:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))
    border = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [border]
    out.append("| " + " | ".join(c.ljust(widths[i]) for i, c in enumerate(columns)) + " |")
    out.append(border)
    for row in rendered:
        out.append(
            "| " + " | ".join(cell.ljust(widths[i]) for i, cell in enumerate(row)) + " |"
        )
    out.append(border)
    return "\n".join(out)


def _json_value(v: Any) -> Any:
    if isinstance(v, datetime):
        return format_timestamp(v)
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    return v


def rows_to_json(columns: list[str], rows: Iterable[tuple]) -> str:
    """JSON array of objects; null fields omitted per Arrow
    ``ArrayWriter`` behavior (query.rs:19-28)."""
    out = []
    for row in rows:
        obj = {c: _json_value(v) for c, v in zip(columns, row) if v is not None}
        out.append(obj)
    return json.dumps(out, separators=(",", ":"), default=str)
