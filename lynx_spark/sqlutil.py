"""SQL helpers: FROM-table extraction.

The reference parses the query with sqlparser (GenericDialect), takes
the FIRST factor of the FROM clause, and errors for anything that is
not a plain table — "Queries are only supported in a basic
'SELECT .. FROM' style" (src/lynx.rs:153-172). Leading ``WITH`` and
``INSERT`` are rejected because it calls ``parse_select``
(lynx.rs:161, tests lynx.rs:389-401).

We reproduce those observable behaviors with a small tokenizer —
no SQL parser dependency is available, and only the FROM head matters.
"""

from __future__ import annotations

import re


class TableNameError(ValueError):
    """Raised when the query is not a basic SELECT .. FROM <table>."""


_IDENT = re.compile(r'[A-Za-z_][A-Za-z0-9_$]*|"(?:[^"]|"")+"|`(?:[^`]|``)+`')


def _tokens(sql: str) -> list[str]:
    """Lex into words / quoted identifiers / string literals / symbols,
    enough to find the top-level FROM. Comments are consumed HERE, not
    by a pre-pass, so comment markers inside string literals
    (``SELECT '--x' ...``) are preserved as data."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        if sql.startswith("--", i):  # line comment
            j = sql.find("\n", i)
            i = n if j == -1 else j + 1
            continue
        if sql.startswith("/*", i):  # block comment (non-nested)
            j = sql.find("*/", i + 2)
            i = n if j == -1 else j + 2
            continue
        if c == "'":  # string literal ('' escape)
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _IDENT.match(sql, i)
        if m:
            out.append(m.group(0))
            i = m.end()
            continue
        out.append(c)
        i += 1
    return out


def _unquote(ident: str) -> str:
    if ident.startswith('"') and ident.endswith('"'):
        return ident[1:-1].replace('""', '"')
    if ident.startswith("`") and ident.endswith("`"):
        return ident[1:-1].replace("``", "`")
    return ident


_TS_LITERAL = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d{1,6})?)?)?$"
)


#: top-level keywords that terminate the WHERE clause
_CLAUSE_END = {
    "GROUP", "ORDER", "HAVING", "LIMIT", "WINDOW", "QUALIFY",
    "OFFSET", "FETCH", "UNION", "EXCEPT", "INTERSECT",
}


def extract_time_bounds(sql: str) -> tuple[int | None, int | None]:
    """Best-effort (lo_us, hi_us) bounds on the ``timestamp`` column
    from the **top-level WHERE clause only** — used by the engine to
    prune in-memory day partitions BEFORE materializing them to Arrow
    (the pruning the reference's daily partitions never get,
    lynx.rs:87-91 / SURVEY §4).

    Scoped to WHERE: a timestamp comparison anywhere else (e.g.
    ``SUM(CASE WHEN timestamp >= .. THEN 1 END)`` in the SELECT list,
    or ``HAVING max(timestamp) > ..``) must NOT prune — those do not
    bound the scanned rows.

    Sound-by-conservatism: bounds are returned only when the WHERE
    clause has no OR / NOT / CASE (so every predicate is a plain
    conjunct) and matches ``timestamp <op> [TIMESTAMP] '<literal>'``
    (or reversed), or ``timestamp BETWEEN 'a' AND 'b'``. The column
    may be qualified (``t.timestamp``) because JOINs, comma-joins and
    subqueries all bail out, so one table is in scope. Anything
    else -> (None, None) = no pruning. Equality contributes both
    bounds. Returned bounds are inclusive microsecond limits.
    """
    from datetime import datetime, timezone

    toks = _tokens(sql)
    uppers = [t.upper() for t in toks]
    # global bail-outs (sound = no pruning):
    # - JOIN: a self-join's one-sided time filter must not prune the
    #   shared table materialization
    # - multiple SELECTs: subqueries / set-ops may scan unbounded
    if "JOIN" in uppers or uppers.count("SELECT") > 1:
        return None, None

    # locate top-level FROM and WHERE
    depth = 0
    from_idx: int | None = None
    where_start: int | None = None
    for i, t in enumerate(toks):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            if uppers[i] == "FROM" and from_idx is None:
                from_idx = i
            elif uppers[i] == "WHERE":
                where_start = i + 1
                break
    if where_start is None:
        return None, None
    # implicit comma-join (FROM a, b) -> same hazard as JOIN: bail
    if from_idx is not None:
        depth = 0
        for i in range(from_idx + 1, where_start - 1):
            if toks[i] == "(":
                depth += 1
            elif toks[i] == ")":
                depth -= 1
            elif toks[i] == "," and depth == 0:
                return None, None
    # slice out the WHERE clause: up to the next top-level clause kw
    depth = 0
    where_end = len(toks)
    for i in range(where_start, len(toks)):
        if toks[i] == "(":
            depth += 1
        elif toks[i] == ")":
            depth -= 1
        elif depth == 0 and uppers[i] in _CLAUSE_END:
            where_end = i
            break
    w = toks[where_start:where_end]
    wu = uppers[where_start:where_end]
    # WHERE-local bail-outs: disjunction/negation/conditionals mean a
    # matched comparison may not be a required conjunct. "!" is Spark's
    # prefix negation; "IS" covers the postfix negations IS FALSE /
    # IS UNKNOWN / IS NOT TRUE (bailing on every IS also forgoes
    # pruning for harmless IS [NOT] NULL conjuncts — sound, just
    # conservative). TRUE/FALSE/IF/IIF/XOR catch boolean-wrapper
    # negations like ``(timestamp >= 'a') = false`` and
    # ``if(timestamp >= 'a', false, true)`` whose inner comparison is
    # NOT a required conjunct of the row filter.
    if (
        "OR" in wu
        or "NOT" in wu
        or "CASE" in wu
        or "WHEN" in wu
        or "IS" in wu
        or "TRUE" in wu
        or "FALSE" in wu
        or "IF" in wu
        or "IIF" in wu
        or "XOR" in wu
        or "!" in w
    ):
        return None, None

    def lit_us(tok: str) -> int | None:
        if not (tok.startswith("'") and tok.endswith("'")):
            return None
        raw = tok[1:-1].replace("T", " ")
        if not _TS_LITERAL.match(tok[1:-1]):
            return None
        for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                    "%Y-%m-%d %H:%M", "%Y-%m-%d"):
            try:
                dt = datetime.strptime(raw, fmt).replace(tzinfo=timezone.utc)
                return int(dt.timestamp() * 1_000_000)
            except ValueError:
                continue
        return None

    lo: int | None = None
    hi: int | None = None

    def tighten(op: str, us: int) -> None:
        nonlocal lo, hi
        if op in (">", ">="):
            bound = us + 1 if op == ">" else us
            lo = bound if lo is None else max(lo, bound)
        elif op in ("<", "<="):
            bound = us - 1 if op == "<" else us
            hi = bound if hi is None else min(hi, bound)
        elif op == "=":
            lo = us if lo is None else max(lo, us)
            hi = us if hi is None else min(hi, us)

    n = len(w)
    # paren depth of every WHERE token: comparisons are tightened only
    # at depth 0 (top-level AND conjuncts). A parenthesized comparison
    # may be an argument of some enclosing expression that inverts it,
    # so it is not necessarily a required conjunct.
    wdepth: list[int] = []
    d = 0
    for t in w:
        if t == "(":
            wdepth.append(d)
            d += 1
        elif t == ")":
            d -= 1
            wdepth.append(d)
        else:
            wdepth.append(d)
    def whole_conjunct(s: int, e: int) -> bool:
        """True iff tokens [s..e] span a WHOLE top-level conjunct:
        bounded by clause start/end or AND on both sides. Guards
        against chained-comparison wrappers like
        ``timestamp >= 'lit' = (1 > 2)`` (r3 review: parses
        left-associatively as a boolean EQUALITY whose inner
        comparison is not a required conjunct, yet contains no
        TRUE/FALSE/NOT token to bail on)."""
        return (s == 0 or wu[s - 1] == "AND") and (
            e == n - 1 or wu[e + 1] == "AND"
        )

    for i in range(n):
        if wu[i] != "TIMESTAMP" or wdepth[i] != 0:
            continue
        if i + 1 < n and w[i + 1] == ".":
            continue  # 'timestamp' is a qualifier here, not the column
        # a TIMESTAMP keyword right before a literal is a type prefix,
        # not a column occurrence ("timestamp >= TIMESTAMP '..'")
        if i + 1 < n and w[i + 1].startswith("'"):
            continue
        # conjunct start: include a "t." qualifier before the column
        start = i - 2 if (i >= 2 and w[i - 1] == ".") else i
        # forward: timestamp <op> [TIMESTAMP] 'lit'
        #          timestamp BETWEEN ['TIMESTAMP'] 'a' AND ['TIMESTAMP'] 'b'
        j = i + 1
        if j < n and wu[j] == "BETWEEN":
            k = j + 1
            if k < n and wu[k] == "TIMESTAMP":
                k += 1
            if k + 1 < n and wu[k + 1] == "AND":
                m = k + 2
                if m < n and wu[m] == "TIMESTAMP":
                    m += 1
                if m < n and whole_conjunct(start, m):
                    a, b = lit_us(w[k]), lit_us(w[m])
                    if a is not None and b is not None:
                        tighten(">=", a)
                        tighten("<=", b)
            continue
        if j < n:
            op = (
                w[j] + "="
                if w[j] in "<>" and j + 1 < n and w[j + 1] == "="
                else w[j]
            )
            if op in (">", ">=", "<", "<=", "="):
                k = j + len(op)
                if k < n and wu[k] == "TIMESTAMP":
                    k += 1
                if k < n and whole_conjunct(start, k):
                    us = lit_us(w[k])
                    if us is not None:
                        tighten(op, us)
        # reversed: 'lit' <op> [qualifier.]timestamp — look behind
        j = i - 1
        if j >= 1 and w[j] == "." :
            j -= 2  # skip the qualifier ident + dot
        if j >= 1:
            if w[j] == "=" and j - 1 >= 0 and w[j - 1] in "<>":
                op_r, litpos = w[j - 1] + "=", j - 2
            else:
                op_r, litpos = w[j], j - 1
            if (
                op_r in (">", ">=", "<", "<=", "=")
                and litpos >= 0
                and whole_conjunct(litpos, i)
            ):
                us = lit_us(w[litpos])
                if us is not None:
                    flipped = {">": "<", ">=": "<=", "<": ">", "<=": ">=", "=": "="}
                    tighten(flipped[op_r], us)
    return lo, hi


def is_select_like(sql: str) -> bool:
    """True for statements that READ (SELECT / WITH ... SELECT) — the
    shapes multi-table mode relaxes the reference's parse_select
    restriction for. Writes (INSERT etc.) stay rejected in every
    mode."""
    toks = _tokens(sql)
    return bool(toks) and toks[0].upper() in ("SELECT", "WITH")


def referenced_tables(sql: str, candidates: set[str]) -> set[str]:
    """Candidate table names that appear anywhere in the query — the
    registration set for multi-table query mode. Over-approximate by
    design (a column named like a table registers the table too —
    harmless); never under-approximates because every reference is an
    identifier token."""
    out: set[str] = set()
    for tok in _tokens(sql):
        if _IDENT.fullmatch(tok):
            name = _unquote(tok)
            if name in candidates:
                out.add(name)
    return out


def parse_table_name(sql: str) -> str:
    """Extract the first FROM table of a basic SELECT (lynx.rs:153-172).

    Raises TableNameError for non-SELECT statements (INSERT, WITH, ...),
    a SELECT without FROM, or a non-plain-table first FROM factor
    (derived table / VALUES) — the same rejection set as the reference.
    """
    toks = _tokens(sql)
    if not toks:
        raise TableNameError("empty query")
    head = toks[0].upper()
    if head != "SELECT":
        # parse_select rejects WITH/INSERT/etc. (lynx.rs:161,166-168)
        raise TableNameError(
            "Queries are only supported in a basic 'SELECT .. FROM' style"
        )
    depth = 0
    from_idx = None
    for i, t in enumerate(toks):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and t.upper() == "FROM":
            from_idx = i
            break
    if from_idx is None or from_idx + 1 >= len(toks):
        raise TableNameError("query has no FROM clause")
    nxt = toks[from_idx + 1]
    if nxt == "(" or nxt.upper() in {"VALUES", "UNNEST", "LATERAL"}:
        raise TableNameError(
            "Queries are only supported in a basic 'SELECT .. FROM' style"
        )
    if not _IDENT.fullmatch(nxt):
        raise TableNameError(f"invalid FROM factor: {nxt}")
    # compound name a.b.c — keep the full ObjectName string like the
    # reference (lynx.rs:163): the buffer lookup with the dotted string
    # misses -> 404 for the common case; a measurement that literally
    # contains '.' fails at registration, as it fails at plan time in
    # the reference.
    parts = [_unquote(nxt)]
    j = from_idx + 2
    while j + 1 < len(toks) and toks[j] == ".":
        parts.append(_unquote(toks[j + 1]))
        j += 2
    return ".".join(parts)
