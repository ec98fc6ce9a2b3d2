"""Filesystem Iceberg warehouse behind the reference's full SQL
surface — the end-to-end answer to "live Iceberg execution" in a
container with no runtime jar and no network (sources/iceberg.py
keeps the dated retry log): every statement the reference's
QueryManager accepts (QueryManager.py:20-159 — LIST NAMESPACES/
TABLES, DESCRIBE, CREATE, INSERT, SELECT, UPDATE, DELETE, plus MERGE
which the reference routes to DuckDB) executes here against REAL
Iceberg v1 tables (sources/iceberg_fs.py: metadata JSON + Avro
manifests + partitioned parquet) laid out as
``<warehouse>/<namespace>/<table>/``.

Design choices vs the reference:

- NO hand-rolled value parsing: INSERT ... VALUES delegates to Spark
  SQL's own VALUES parser (the reference hand-parses tuples,
  QueryManager.py:94-140, and breaks on nested commas).
- NO in-literal table-name rewriting: SELECT rewriting substitutes
  table identifiers only OUTSIDE single-quoted string literals (the
  reference string-replaces everywhere, IcebergConnection.py:115 —
  documented bug).
- Multi-table SELECT/joins work: every warehouse table referenced is
  registered as a temp view over its manifest-pruned Iceberg scan
  (the reference is single-table, README.md:6).
- DML is a real Iceberg copy-on-write commit: UPDATE/DELETE extract a
  conservative (col, op, literal) conjunction from the WHERE clause
  purely to BOUND the rewrite set via manifest pruning; row-level
  correctness always comes from evaluating the full predicate with
  F.expr inside Spark. MERGE maps to iceberg_fs.merge_into (bounds-
  pruned upsert).

At 100 TB: identical plans to the underlying iceberg_fs ops —
manifest pruning before file listing, pushdown inside the scan,
pruning-bounded rewrites, and snapshot isolation for readers.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, functions as F

from mcp_iceberg_duckdb_spark.sources import iceberg_fs as ice

_IDENT = r"[A-Za-z_]\w*"
# a table-part identifier, optionally backtick-quoted (Spark's
# quoting form); statement-head regexes accept either
_QIDENT = rf"(?:`[^`\n]+`|{_IDENT})"
_TBL = rf"(?:{_QIDENT}\.)?{_QIDENT}"

_CREATE_NS = re.compile(
    rf"^\s*CREATE\s+NAMESPACE\s+(?:IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*;?\s*$",
    re.I,
)
_DROP_NS = re.compile(rf"^\s*DROP\s+NAMESPACE\s+({_IDENT})\s*;?\s*$", re.I)
_CREATE_TBL = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_TBL})\s*\((.*?)\)"
    rf"\s*(?:PARTITIONED\s+BY\s*\((.*)\))?\s*;?\s*$",
    re.I | re.S,
)
_DROP_TBL = re.compile(rf"^\s*DROP\s+TABLE\s+({_TBL})\s*;?\s*$", re.I)
_INSERT = re.compile(
    rf"^\s*INSERT\s+INTO\s+({_TBL})\s*(?:\(([^)]*)\)\s*)?"
    rf"(VALUES\s+.+|SELECT\s+.+?)\s*;?\s*$",
    re.I | re.S,
)
_INSERT_OVER = re.compile(
    rf"^\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?({_TBL})\s*"
    rf"(?:\(([^)]*)\)\s*)?(VALUES\s+.+|SELECT\s+.+?)\s*;?\s*$",
    re.I | re.S,
)
_TRUNCATE = re.compile(
    rf"^\s*TRUNCATE\s+TABLE\s+({_TBL})\s*;?\s*$", re.I
)
_CTAS = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_TBL})\s*"
    rf"(?:PARTITIONED\s+BY\s*\((.*?)\)\s*)?AS\s+((?:SELECT|WITH)\b.+)"
    rf"\s*;?\s*$",
    re.I | re.S,
)
_UPDATE = re.compile(
    rf"^\s*UPDATE\s+({_TBL})\s+SET\s+(.+?)\s*;?\s*$",
    re.I | re.S,
)
_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+({_TBL})(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.I | re.S,
)
_MERGE = re.compile(
    rf"^\s*MERGE\s+INTO\s+({_TBL})\s+(?:AS\s+)?({_IDENT})\s+"
    rf"USING\s+(?:\((.+)\)|({_TBL}))\s+(?:AS\s+)?({_IDENT})\s+"
    rf"ON\s+(.+?)\s+"
    rf"WHEN\s+MATCHED\s+THEN\s+(.+?)\s*;?\s*$",
    re.I | re.S,
)
# the MATCHED action tail: full upsert (SET * or explicit
# col = src.col assignments) or a pure key-tombstone DELETE
_MERGE_UPSERT_TAIL = re.compile(
    r"^UPDATE\s+SET\s+(.+?)\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*"
    r"(?:\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+"
    r"(DELETE|UPDATE\s+SET\s+.+?))?\s*$",
    re.I | re.S,
)
_DESCRIBE = re.compile(rf"^\s*DESCRIBE\s+TABLE\s+({_TBL})\s*;?\s*$", re.I)
# a DDL type: bare word, decimal(P,S)-style args, or array<elem>
_SQLTYPE = r"[A-Za-z_]\w*(?:\s*\(\s*\d+\s*,\s*\d+\s*\)|\s*<\s*[A-Za-z_]\w*\s*>)?"
_ALTER_ADD = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+ADD\s+COLUMN\s+({_IDENT})\s+"
    rf"({_SQLTYPE})\s*;?\s*$",
    re.I,
)
_ALTER_TYPE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+ALTER\s+COLUMN\s+"
    rf"({_IDENT})\s+TYPE\s+({_SQLTYPE})\s*;?\s*$",
    re.I,
)
_ALTER_RENAME = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+RENAME\s+COLUMN\s+({_IDENT})\s+"
    rf"TO\s+({_IDENT})\s*;?\s*$",
    re.I,
)
_ALTER_DROP = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+DROP\s+COLUMN\s+({_IDENT})\s*;?\s*$",
    re.I,
)
_ALTER_ADD_PART = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+ADD\s+PARTITION\s+FIELD\s+"
    rf"(?:({_IDENT})\s*\(\s*(?:(\d+)\s*,\s*)?({_IDENT})\s*\)|({_IDENT}))"
    r"\s*;?\s*$",
    re.I,
)
_ALTER_DROP_PART = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+DROP\s+PARTITION\s+FIELD\s+"
    rf"({_IDENT})\s*;?\s*$",
    re.I,
)
_ALTER_PROPS = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+SET\s+TBLPROPERTIES\s*\(\s*"
    r"'((?:[^']|'')+)'\s*=\s*'((?:[^']|'')*)'\s*\)\s*;?\s*$",
    re.I,
)
_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+({_TBL})"
    rf"(?:\s+SORT\s+BY\s+({_IDENT}))?"
    # SLICES no longer requires SORT BY: a table default sort order
    # (WRITE ORDERED BY) supplies the clustering key
    rf"(?:\s+SLICES\s+(\d+))?"
    rf"(?:\s+TARGET\s+SIZE\s+(\d+))?\s*;?\s*$",
    re.I,
)
_EXPIRE = re.compile(
    rf"^\s*EXPIRE\s+SNAPSHOTS\s+(?:IN\s+)?({_TBL})"
    rf"(?:\s+KEEP\s+(\d+))?\s*;?\s*$",
    re.I,
)
_REWRITE_DELETES = re.compile(
    rf"^\s*REWRITE\s+DELETES\s+(?:IN\s+)?({_TBL})\s*;?\s*$", re.I
)
_CONVERT_DELETES = re.compile(
    rf"^\s*CONVERT\s+DELETES\s+(?:IN\s+)?({_TBL})\s*;?\s*$", re.I
)
_VERSION_AS_OF = re.compile(
    rf"({_TBL})\s+VERSION\s+AS\s+OF\s+(\d+)", re.I
)
# quoted-ref form: after the literal split the ref name sits in the
# NEXT odd chunk, so this matches an even chunk's TAIL
_VERSION_AS_OF_REF = re.compile(
    rf"({_TBL})\s+VERSION\s+AS\s+OF\s*$", re.I
)
_CREATE_REF = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+CREATE\s+(TAG|BRANCH)\s+"
    rf"({_IDENT})(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
    re.I,
)
_DROP_REF = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+DROP\s+(?:TAG|BRANCH)\s+"
    rf"({_IDENT})\s*;?\s*$",
    re.I,
)
_SHOW_REFS = re.compile(
    rf"^\s*SHOW\s+REFS\s+(?:IN\s+)?({_TBL})\s*;?\s*$", re.I
)
_WRITE_ORDERED = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+WRITE\s+ORDERED\s+BY\s+"
    rf"\(?\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)?\s*;?\s*$",
    re.I,
)
_WRITE_UNORDERED = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+WRITE\s+UNORDERED\s*;?\s*$",
    re.I,
)
_WRITE_BRANCH = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+WRITE\s+TO\s+BRANCH\s+"
    rf"({_IDENT})\s*;?\s*$",
    re.I,
)
_FAST_FORWARD = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+FAST\s+FORWARD\s+"
    rf"({_IDENT})\s+({_IDENT})\s*;?\s*$",
    re.I,
)
_LIST_NS = re.compile(r"^\s*LIST\s+NAMESPACES\s*;?\s*$", re.I)
_LIST_TBLS = re.compile(
    rf"^\s*LIST\s+TABLES(?:\s+(?:IN\s+)?({_IDENT}))?\s*;?\s*$", re.I
)
_SNAPSHOTS = re.compile(
    rf"^\s*SHOW\s+SNAPSHOTS\s+(?:IN\s+)?({_TBL})\s*;?\s*$", re.I
)
_SHOW_PROPS = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+({_TBL})\s*;?\s*$", re.I
)
_SELECT = re.compile(r"^\s*(SELECT|WITH)\b", re.I)

# conservative comparison extraction for rewrite-set pruning only
_SIMPLE_CMP = re.compile(
    rf"^\s*({_IDENT})\s*(=|<=|>=|<|>)\s*"
    r"((?:-?\d+(?:\.\d+)?)|'(?:[^']|'')*')\s*$"
)

# SELECT-path variant: an optional single-identifier qualifier
# (table alias or bare default-namespace table name) is captured so
# `o.region = 'eu'` can prune once the qualifier resolves to one
# used table (VERDICT r11 item 8)
_QUAL_CMP = re.compile(
    rf"^\s*(?:({_IDENT})\.)?({_IDENT})\s*(=|<=|>=|<|>)\s*"
    r"((?:-?\d+(?:\.\d+)?)|'(?:[^']|'')*')\s*$"
)


def _part_pat(p: str) -> str:
    """Regex for one table-part identifier as it may appear in SQL:
    bare or backtick-quoted (matched case-insensitively by callers —
    unquoted SQL identifiers are case-insensitive)."""
    e = re.escape(p)
    return rf"(?:`{e}`|{e})"


def _used_ci(used) -> dict:
    """(ns_lower, tbl_lower) -> canonical (ns, tbl) for used tables —
    the case-insensitive resolution every identifier-matching helper
    must share with the view rewrite (a mixed-case self-join must
    count as TWO references of ONE table, or pruning re-opens the
    shared-view bug)."""
    return {(n.lower(), t.lower()): (n, t) for n, t in used}


def _split_and(s: str):
    """Split a predicate on top-level AND, but never inside a string
    literal: ``note = 'x AND y'`` is ONE conjunct (hypothesis-found —
    the naive split cut the comparison in half and voided pruning for
    any literal containing the word AND)."""
    chunks = re.split(r"('(?:[^']|'')*')", s)
    parts, cur = [], ""
    for i, ch in enumerate(chunks):
        if i % 2 == 1:  # odd chunks are string literals
            cur += ch
            continue
        pieces = re.split(r"\bAND\b", ch, flags=re.I)
        cur += pieces[0]
        for p in pieces[1:]:
            parts.append(cur)
            cur = p
    parts.append(cur)
    return parts


def _qualified_filters(where: str | None):
    """(qualifier_or_None, col, op, literal) tuples for a WHERE that
    is a bare conjunction of comparisons with literals — the SELECT
    pruning twin of _simple_filters, with the same all-or-nothing
    rule (any non-simple conjunct voids the whole extraction: it may
    be the arm of an OR)."""
    if not where:
        return ()
    out = []
    for part in _split_and(where):
        m = _QUAL_CMP.match(part)
        if not m:
            return ()
        qual, col, op, lit = m.groups()
        if lit.startswith("'"):
            val = lit[1:-1].replace("''", "'")
        elif "." in lit:
            val = float(lit)
        else:
            val = int(lit)
        out.append((qual, col, op, val))
    return tuple(out)


_PRUNE_UNSAFE_KW = re.compile(
    r"\b(?:WITH|OVER|WINDOW|QUALIFY)\b", re.I
)
_NESTED_SELECT = re.compile(r"\(\s*SELECT\b", re.I)


def _single_block_select(sql: str) -> bool:
    """True only for a single-block SELECT: no CTE (WITH), no window
    function (OVER / named WINDOW / QUALIFY), no nested (SELECT ...)
    subquery — checked OUTSIDE single-quoted literals. Top-level
    WHERE conjuncts provably commute to the base-table scan only in
    this shape; a window, scalar subquery, or CTE over the same table
    legitimately reads rows the WHERE excludes, so manifest-pruning
    them would silently change results (ADVICE r11 item 1)."""
    chunks = re.split(r"('(?:[^']|'')*')", sql)
    for i in range(0, len(chunks), 2):
        c = chunks[i]
        if _PRUNE_UNSAFE_KW.search(c) or _NESTED_SELECT.search(c):
            return False
    return True


def _simple_filters(where: str | None, meta: dict | None = None):
    """Extract (col, op, literal) pruning hints from a WHERE clause
    that is a bare conjunction of comparisons with literals; anything
    fancier returns () — the full predicate is still evaluated
    row-level, pruning just degrades to all-files.

    With ``meta`` (the table's Iceberg metadata) each literal is TYPED
    against the column's schema type before it may prune: ISO date
    strings become epoch days (matching the bound encoding), and any
    filter whose literal type cannot match its column (string vs
    numeric, unparseable date, unknown column) is dropped — dropping
    a conjunct only widens the candidate set, so the degradation the
    docstring promises actually holds instead of plan_files comparing
    int epoch-days against str (round-10 ADVICE.md item 1)."""
    if not where:
        return ()
    out = []
    for part in _split_and(where):
        m = _SIMPLE_CMP.match(part)
        if not m:
            # all-or-nothing: a non-simple part may be the right arm
            # of an OR, under which keeping the simple conjuncts
            # would prune rows the OR admits
            return ()
        col, op, lit = m.groups()
        if lit.startswith("'"):
            val = lit[1:-1].replace("''", "'")
        elif "." in lit:
            val = float(lit)
        else:
            val = int(lit)
        out.append((col, op, val))
    if meta is None:
        return tuple(out)
    return _type_filters(out, meta)


def _type_filters(filters, meta: dict):
    """Type a simple-conjunction filter list against a table schema
    (see _simple_filters): coerce date literals, drop mismatches."""
    types = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
    typed = []
    for col, op, val in filters:
        t = types.get(col)
        if t == "date" and isinstance(val, str):
            import datetime

            try:
                d = datetime.date.fromisoformat(val)
            except ValueError:
                continue
            val = (d - datetime.date(1970, 1, 1)).days
        elif t in ("timestamp", "timestamptz") and isinstance(val, str):
            # ISO timestamp literal -> epoch micros (the bound and
            # partition-tuple encoding for Iceberg timestamps)
            import datetime

            try:
                dt = datetime.datetime.fromisoformat(val)
            except ValueError:
                continue
            if (dt.tzinfo is not None) != (t == "timestamptz"):
                # prune only when literal and column agree on zone
                # semantics: a NAIVE literal against a timestamptz
                # column is parsed by Spark's residual filter in the
                # SESSION zone — pruning in UTC could disagree and
                # drop matching files. Zoned literal + tz column is
                # an unambiguous instant; naive + ntz is zone-free.
                continue
            if dt.tzinfo is not None:
                dt = dt.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            # EXACT integer micros: total_seconds() is a float and
            # truncates ~1.25% of microsecond values one low, which
            # would mis-prune boundary equality/range filters
            td = dt - datetime.datetime(1970, 1, 1)
            val = (
                td.days * 86_400_000_000
                + td.seconds * 1_000_000
                + td.microseconds
            )
        elif t == "string" and isinstance(val, str):
            pass
        elif t in ("int", "long") and isinstance(val, int):
            pass
        elif t in ("float", "double") and isinstance(val, (int, float)):
            pass
        elif (
            t
            and isinstance(t, str)
            and t.startswith("decimal(")
            and isinstance(val, (int, float))
        ):
            # compare in the Decimal domain the bounds decode to
            from decimal import Decimal

            val = Decimal(str(val))
        else:
            continue  # unknown column or literal/column type mismatch
        typed.append((col, op, val))
    return tuple(typed)


def _find_top_level(s: str, words):
    """Index of the first occurrence of any keyword in ``words`` at
    paren/quote depth 0 (word-bounded, case-insensitive), or -1."""
    words = tuple(w.upper() for w in words)
    depth, i, in_str = 0, 0, False
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            for w in words:
                if s[i : i + len(w)].upper() != w:
                    continue
                before_ok = i == 0 or not (
                    s[i - 1].isalnum() or s[i - 1] == "_"
                )
                j = i + len(w)
                after_ok = j >= len(s) or not (
                    s[j].isalnum() or s[j] == "_"
                )
                if before_ok and after_ok:
                    return i
        i += 1
    return -1


def _split_where(s: str):
    """Split ``s`` on the first top-level WHERE keyword — outside
    single-quoted literals and parens (same scanner state as
    _split_top_level), so ``SET note = 'x where y'`` is not mis-split
    (round-10 ADVICE.md item 4). Returns (before, after_or_None)."""
    i = _find_top_level(s, ("WHERE",))
    if i < 0:
        return s, None
    return s[:i].rstrip(), s[i + 5 :].strip() or None


_CLAUSE_AFTER_WHERE = (
    "GROUP", "ORDER", "LIMIT", "HAVING", "WINDOW",
    "UNION", "INTERSECT", "EXCEPT", "QUALIFY", "OFFSET",
)


def _select_where_clause(sql: str) -> str | None:
    """The statement's top-level WHERE text (pruning-hint source), or
    None when extraction cannot be trusted: statements containing a
    top-level set operator share one registered view across branches
    with DIFFERENT predicates, so per-branch pruning would drop rows
    from the other branch — skip pruning entirely there."""
    if _find_top_level(sql, ("UNION", "INTERSECT", "EXCEPT")) >= 0:
        return None
    _, where = _split_where(sql)
    if where is None:
        return None
    cut = _find_top_level(where, _CLAUSE_AFTER_WHERE)
    return (where[:cut] if cut >= 0 else where).strip() or None


def _write_branch(loc: str):
    """The table's routed write branch (the ``write.branch``
    property set by ALTER TABLE ... WRITE TO BRANCH), or None when
    writes go to the table head."""
    props = ice.read_table_meta(loc).get("properties") or {}
    b = props.get("write.branch")
    return b if b and b != "main" else None


def _no_write_branch(loc: str, verb: str) -> None:
    """Row-mutating verbs other than INSERT are not branch-routed:
    refuse rather than silently mutate MAIN while the user believes
    they are staging on a branch (WAP safety)."""
    b = _write_branch(loc)
    if b:
        raise ValueError(
            f"{verb} is unsupported while write.branch={b!r} is set"
            " — FAST FORWARD to publish or WRITE TO BRANCH main to"
            " clear it first"
        )


def _sql_type_to_ice(spelled: str, next_id=None):
    """DDL type spelling -> Iceberg type. TIMESTAMP means the
    Iceberg timestamp (micros, no zone = Spark timestamp_ntz);
    TIMESTAMPTZ / TIMESTAMP_LTZ the zoned timestamptz. Accepts
    decimal(P,S), binary, and array<primitive>."""
    s = spelled.lower().replace(" ", "")
    if s == "timestamp":
        s = "timestamp_ntz"
    elif s in ("timestamptz", "timestamp_ltz"):
        s = "timestamp"
    try:
        return ice.spark_to_ice_type(s, next_id=next_id)
    except ValueError:
        raise ValueError(f"unsupported column type {spelled!r}") from None


def _split_top_level(s: str, sep: str = ","):
    """Split on ``sep`` at paren/quote depth 0 (SET lists, column
    defs)."""
    out, depth, start, i, in_str = [], 0, 0, 0, False
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


_ALIAS_STOP = frozenset(
    w.lower()
    for w in (
        "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET",
        "UNION", "INTERSECT", "EXCEPT", "QUALIFY", "WINDOW",
        "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ON",
        "USING", "AS", "VERSION",
    )
)

_FROM_ALIAS = re.compile(
    rf"\b(?:FROM|JOIN)\s+({_TBL})(?:\s+(?:AS\s+)?({_IDENT}))?", re.I
)

_FROM_KW = re.compile(r"\bFROM\b", re.I)
_DOTTED_IDENT = re.compile(rf"{_IDENT}(?:\.{_IDENT})?")


def _normalize_from_commas(chunk: str) -> str:
    """Rewrite ``FROM a [x], b [y], ...`` comma cross-join lists into
    explicit CROSS JOINs (semantically identical per the SQL
    standard) so bare default-namespace names in comma lists resolve
    through the same FROM/JOIN table-position matching as everything
    else (ADVICE r11 item 4). Operates on a code chunk (string
    literals already split away). Only commas DIRECTLY separating
    FROM-list items rewrite; commas inside parens (subqueries,
    function arguments, ``AS t(a, b)`` column aliases) and in SELECT
    lists are untouched — the scanner walks item (paren group or
    dotted identifier) + optional alias and stops at the first token
    that is neither."""
    commas: list[int] = []
    n = len(chunk)
    for m in _FROM_KW.finditer(chunk):
        i = m.end()
        while True:
            while i < n and chunk[i].isspace():
                i += 1
            if i < n and chunk[i] == "(":
                depth, i = 1, i + 1
                while i < n and depth:
                    if chunk[i] == "(":
                        depth += 1
                    elif chunk[i] == ")":
                        depth -= 1
                    i += 1
                if depth:
                    break  # unbalanced (split mid-chunk): bail out
            else:
                mm = _DOTTED_IDENT.match(chunk, i)
                if not mm:
                    break  # not a table item (e.g. extract(.. FROM 1))
                i = mm.end()
            save = i
            while i < n and chunk[i].isspace():
                i += 1
            ma = re.match(rf"(?:AS\s+)?({_IDENT})", chunk[i:], re.I)
            if ma and ma.group(1).lower() not in _ALIAS_STOP:
                i += ma.end()
            else:
                i = save
            while i < n and chunk[i].isspace():
                i += 1
            if i < n and chunk[i] == ",":
                commas.append(i)
                i += 1
                continue
            break
    if not commas:
        return chunk
    parts, last = [], 0
    for c in commas:
        parts.append(chunk[last:c])
        parts.append(" CROSS JOIN ")
        last = c + 1
    parts.append(chunk[last:])
    return "".join(parts)


def _strict_cast(df, pairs):
    """Cast DML-source columns to the table's types LOUDLY: try_cast
    each ``(source_col, out_name, spark_type)``, then raise if any
    NON-NULL input produced a NULL — the ANSI semantics Spark/Iceberg
    MERGE and INSERT enforce. Plain cast() would silently turn an
    un-castable value (string 'abc' into an int column) into NULL and
    commit it as data corruption (ADVICE r11 item 2). Costs one extra
    limit-1 job over the (small) DML source."""
    bad = None
    for src, _, typ in pairs:
        cond = F.col(src).isNotNull() & F.col(src).try_cast(typ).isNull()
        bad = cond if bad is None else (bad | cond)
    offenders = df.filter(bad).limit(1).collect()
    if offenders:
        raise ValueError(
            "DML source value cannot be cast to the table schema "
            f"(ANSI cast would fail): {offenders[0].asDict()!r}"
        )
    return df.select(
        *[F.col(src).try_cast(typ).alias(name) for src, name, typ in pairs]
    )


def _parse_part_cols(part_sql, names):
    """PARTITIONED BY clause items -> create_table/add_partition_field
    shorthand: bare column (identity), bucket(N, c), truncate(N, c),
    year/month/day/hour(c). Shared by CREATE TABLE and CTAS."""
    part_cols = []
    for item in _split_top_level(part_sql) if part_sql else []:
        m2 = re.match(
            rf"^(bucket|truncate)\s*\(\s*(\d+)\s*,\s*({_IDENT})\s*\)$",
            item,
            re.I,
        )
        m3 = re.match(
            rf"^(year|month|day|hour)\s*\(\s*({_IDENT})\s*\)$",
            item,
            re.I,
        )
        if m2:
            kind, n, col = m2.groups()
            part_cols.append((col, kind.lower(), int(n)))
        elif m3:
            kind, col = m3.groups()
            part_cols.append((col, kind.lower()))
        else:
            col = item
            part_cols.append(col)
        if col not in names:
            raise ValueError(f"partition column {col!r} not in schema")
    return part_cols


def _from_positions(sql: str, used):
    """One walk over the statement's FROM/JOIN table positions
    (outside string literals, commas normalized to CROSS JOIN first —
    a comma-form self-join ``FROM t a, t b`` must count as TWO
    references or the multi-ref prune guard does not engage).
    Returns (aliases, counts): alias_lower -> canonical (ns, tbl) for
    aliased positions, and (ns, tbl) -> reference count. Each table
    registers ONE temp view, so a table referenced more than once
    (self-join) can never take a per-alias pruning filter — it would
    row-filter BOTH references."""
    aliases: dict = {}
    counts: dict = {}
    ci = _used_ci(used)
    chunks = re.split(r"('(?:[^']|'')*')", sql)
    for i in range(0, len(chunks), 2):
        code = _normalize_from_commas(chunks[i])
        for m in _FROM_ALIAS.finditer(code):
            name, alias = m.group(1), m.group(2)
            ns, _, tbl = name.replace("`", "").rpartition(".")
            key = ci.get(((ns or "default").lower(), tbl.lower()))
            if key is None:
                continue
            counts[key] = counts.get(key, 0) + 1
            if alias and alias.lower() not in _ALIAS_STOP:
                aliases[alias.lower()] = key
    return aliases, counts


class FsCatalog:
    """A namespace/table tree of vendored Iceberg v1 tables under one
    warehouse directory, with a one-call SQL entry point
    (``execute``)."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        # per-SELECT manifest-pruning stats: "ns.tbl" ->
        # {files_planned, files_total, filters} for the last statement
        self.last_scan_plan: dict = {}
        os.makedirs(warehouse, exist_ok=True)

    # ---- catalog structure ----

    def list_namespaces(self):
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def list_tables(self, ns: str | None = None):
        spaces = [ns] if ns else self.list_namespaces()
        out = []
        for s in spaces:
            root = os.path.join(self.warehouse, s)
            if not os.path.isdir(root):
                raise ValueError(f"namespace {s!r} does not exist")
            for t in sorted(os.listdir(root)):
                if os.path.isdir(os.path.join(root, t, "metadata")):
                    out.append((s, t))
        return out

    def _resolve(self, ident: str, must_exist: bool = True):
        # Split namespace.table on a dot OUTSIDE backticks (a quoted
        # `a.b` is ONE default-namespace table named 'a.b' — Spark
        # semantics), then strip the quoting. Unquoted SQL
        # identifiers are case-INSENSITIVE, so when the exact
        # directory is absent fall back to a case-insensitive match
        # scoped to the target namespace (hostile-probe r13:
        # `SELECT k FROM default.t1` against a table created as T1
        # used to fail TABLE_OR_VIEW_NOT_FOUND).
        m = re.match(rf"^\s*(?:({_QIDENT})\.)?({_QIDENT})\s*$", ident)
        if m:
            unq = lambda p: p[1:-1] if p.startswith("`") else p  # noqa: E731
            ns = unq(m.group(1)) if m.group(1) else "default"
            tbl = unq(m.group(2))
        elif "." in ident:
            ns, tbl = ident.replace("`", "").split(".", 1)
        else:
            ns, tbl = "default", ident.replace("`", "")
        # A quoted identifier may contain almost any character, but a
        # table/namespace part must stay a single path component under
        # the warehouse: reject separators and dot-dirs so
        # ``DROP TABLE `../../x` `` can never resolve (and rmtree)
        # outside the warehouse root (r13 ADVICE high — traversal via
        # backtick quoting).
        for part in (ns, tbl):
            if (
                os.sep in part
                or "/" in part
                or "\\" in part
                or part in (".", "..")
                or not part
            ):
                raise ValueError(
                    f"invalid table identifier part: {part!r}"
                )
        loc = os.path.join(self.warehouse, ns, tbl)
        real_wh = os.path.realpath(self.warehouse)
        if not os.path.realpath(loc).startswith(real_wh + os.sep):
            raise ValueError(f"identifier resolves outside warehouse: {ident!r}")
        exists = os.path.isdir(os.path.join(loc, "metadata"))
        if not exists:
            nsl, tbll = ns.lower(), tbl.lower()
            for n2 in os.listdir(self.warehouse):
                if n2.lower() != nsl or not os.path.isdir(
                    os.path.join(self.warehouse, n2)
                ):
                    continue
                for t2 in os.listdir(os.path.join(self.warehouse, n2)):
                    if t2.lower() == tbll and os.path.isdir(
                        os.path.join(self.warehouse, n2, t2, "metadata")
                    ):
                        ns, tbl = n2, t2
                        loc = os.path.join(self.warehouse, ns, tbl)
                        exists = True
                        break
                if exists:
                    break
        if must_exist and not exists:
            raise ValueError(f"table {ns}.{tbl} does not exist")
        return ns, tbl, loc, exists

    # ---- SELECT support: temp views + literal-safe substitution ----

    def _view_name(self, ns: str, tbl: str) -> str:
        base = f"__fs_{ns}__{tbl}"
        if re.fullmatch(r"\w+", base):
            return base
        # names with non-identifier characters (quoted `a.b` tables)
        # sanitize plus a digest so distinct tables never collide
        import hashlib as _hl

        return (
            "__fs_"
            + re.sub(r"[^0-9A-Za-z_]", "_", f"{ns}__{tbl}")
            + "_"
            + _hl.md5(f"{ns}.{tbl}".encode()).hexdigest()[:8]
        )

    def _rewrite_select(self, spark, sql: str) -> str:
        """Register every referenced warehouse table as a temp view
        over its MANIFEST-PRUNED Iceberg scan and substitute
        identifiers — only outside single-quoted literals (the
        reference's in-literal replace bug, IcebergConnection.py:115,
        is the counterexample pinned in tests).

        Substitution positions (round-10 ADVICE item 3 / VERDICT
        item 4): namespace-qualified names (``ns.t``) are rewritten
        anywhere outside literals, INCLUDING column-qualifier
        prefixes (``ns.t.col`` -> ``<view>.col`` — aliases cannot
        contain dots, so this is unambiguous). Bare default-namespace
        names are rewritten only in FROM/JOIN table positions (plus
        their ``t.col`` qualifiers once the table position matched),
        so a table named like a query alias no longer captures the
        alias definition. Comma cross-join lists (``FROM t1, t2``)
        are first normalized to explicit CROSS JOINs, so bare names
        in them resolve too (ADVICE r11 item 4).

        Pruning (VERDICT r10 item 1): the statement's top-level WHERE
        is mined for the same conservative typed (col, op, literal)
        conjunction the DML path uses, each conjunct applied to the
        one used table whose schema uniquely carries that column —
        the view then scans only manifest-surviving files, while the
        full WHERE still runs row-level inside Spark. Anything
        non-conjunctive degrades to all-files (the reference's
        IcebergConnection.py:109-116 always full-scans). Per-table
        plan stats land in ``self.last_scan_plan``."""
        chunks = re.split(r"('(?:[^']|'')*')", sql)
        # time travel first: `ns.t VERSION AS OF <id>` becomes a view
        # over the snapshot-pinned scan before plain-name substitution
        for i in range(0, len(chunks), 2):
            def _tt(m):
                ns, tbl, loc, _ = self._resolve(m.group(1))
                snap = int(m.group(2))
                view = f"{self._view_name(ns, tbl)}__v{snap}"
                ice.read_iceberg(
                    spark, loc, snapshot_id=snap
                ).createOrReplaceTempView(view)
                return view

            chunks[i] = _VERSION_AS_OF.sub(_tt, chunks[i])
            # `t VERSION AS OF 'ref'`: the quoted ref NAME is the
            # following odd (string-literal) chunk
            m = _VERSION_AS_OF_REF.search(chunks[i])
            if m and i + 1 < len(chunks) and chunks[i + 1]:
                ns, tbl, loc, _ = self._resolve(m.group(1))
                ref = chunks[i + 1][1:-1].replace("''", "'")
                # digest suffix: two refs differing only in
                # punctuation ('v1.0' vs 'v1-0') must not collide on
                # one sanitized view name (review r13)
                import hashlib as _hl

                view = (
                    f"{self._view_name(ns, tbl)}__ref_"
                    f"{re.sub(r'[^A-Za-z0-9_]', '_', ref)}_"
                    f"{_hl.md5(ref.encode()).hexdigest()[:8]}"
                )
                ice.read_iceberg(
                    spark, loc, snapshot_id=ref
                ).createOrReplaceTempView(view)
                chunks[i] = chunks[i][: m.start(1)] + view
                chunks[i + 1] = ""
        # comma cross-join lists become explicit CROSS JOINs so the
        # bare-name FROM/JOIN pattern below resolves every member
        for i in range(0, len(chunks), 2):
            chunks[i] = _normalize_from_commas(chunks[i])
        qualified = {
            f"{ns}.{tbl}": (ns, tbl) for ns, tbl in self.list_tables()
        }
        bare = {
            tbl: (ns, tbl)
            for ns, tbl in qualified.values()
            if ns == "default"
        }
        used = set()
        for name in sorted(qualified, key=len, reverse=True):
            ns, tbl = qualified[name]
            # (?!\w) — NOT (?![\w.]) — so `ns.t.col` qualifier
            # prefixes rewrite along with table positions. Unquoted
            # SQL identifiers are case-insensitive, and either part
            # may be backtick-quoted (hostile-probe r13).
            pat = re.compile(
                rf"(?<![\w.`]){_part_pat(ns)}\.{_part_pat(tbl)}(?!\w)",
                re.I,
            )
            for i in range(0, len(chunks), 2):  # even chunks = code
                if pat.search(chunks[i]):
                    chunks[i] = pat.sub(self._view_name(ns, tbl), chunks[i])
                    used.add((ns, tbl))
        # a CTE (or named window) defined in the statement shadows a
        # same-named warehouse table — substituting the FROM position
        # but not the WITH definition would silently read the TABLE
        # instead of the CTE
        cte_names = {
            m.group(1).lower()
            for i in range(0, len(chunks), 2)
            for m in re.finditer(
                rf"(?:\bWITH\b|,)\s*({_IDENT})\s+AS\s*\(",
                chunks[i],
                re.I,
            )
        }
        for name in sorted(bare, key=len, reverse=True):
            if name.lower() in cte_names:
                continue
            ns, tbl = bare[name]
            view = self._view_name(ns, tbl)
            tpat = re.compile(
                rf"(\b(?:FROM|JOIN)\s+){_part_pat(name)}(?![\w.`])", re.I
            )
            if not any(
                tpat.search(chunks[i]) for i in range(0, len(chunks), 2)
            ):
                continue
            qpat = re.compile(
                rf"(?<![\w.`]){_part_pat(name)}(?=\.[\w`])", re.I
            )
            for i in range(0, len(chunks), 2):
                chunks[i] = tpat.sub(rf"\g<1>{view}", chunks[i])
                chunks[i] = qpat.sub(view, chunks[i])
            used.add((ns, tbl))
        per_table = self._select_prune_filters(sql, used)
        self.last_scan_plan = {}
        for ns, tbl in used:
            loc = os.path.join(self.warehouse, ns, tbl)
            flt = per_table.get((ns, tbl), ())
            stats: dict = {}
            ice.read_iceberg(
                spark, loc, filters=flt, stats_out=stats
            ).createOrReplaceTempView(self._view_name(ns, tbl))
            self.last_scan_plan[f"{ns}.{tbl}"] = {
                **stats, "filters": list(flt)
            }
        return "".join(chunks)

    def _select_prune_filters(self, sql: str, used):
        """Per-table manifest-pruning hints for a SELECT: the typed
        simple conjunction of its top-level WHERE. An UNQUALIFIED
        conjunct is assigned to the single used table whose schema
        carries the column (a column in two used tables would be an
        ambiguous reference — Spark rejects the query — so it never
        prunes); a QUALIFIED conjunct (``o.region = 'eu'``) prunes
        the table its alias or bare name resolves to. Conjuncts
        matching no used table (subquery/CTE outputs) are dropped,
        which only widens the scan.

        Pruning runs ONLY on single-block SELECTs: a CTE, window
        function, or nested subquery over the pruned table does not
        commute with the outer WHERE (ADVICE r11 item 1 — e.g.
        row_number() OVER (ORDER BY y) must number rows the WHERE
        later drops), so those statements scan all files."""
        if not used:
            return {}
        if not _single_block_select(sql):
            return {}
        where = _select_where_clause(sql)
        if where is None:
            return {}
        raw = _qualified_filters(where)
        if not raw:
            return {}
        metas = {
            key: ice.read_table_meta(
                os.path.join(self.warehouse, key[0], key[1])
            )
            for key in used
        }
        # ADVICE r12 (high): a table in more than one FROM/JOIN
        # position (self-join) shares one temp view across its
        # references — any pruning filter would row-filter BOTH
        # aliases, silently dropping the other reference's rows.
        # Such tables never prune.
        aliases, refs = _from_positions(sql, used)
        multi_ref = {k for k, n in refs.items() if n > 1}
        owners: dict[str, list] = {}
        for key, meta in metas.items():
            for f in meta["schema"]["fields"]:
                owners.setdefault(f["name"], []).append(key)
        per_table: dict = {}
        ci = _used_ci(used)
        for qual, col, op, val in raw:
            if qual is not None:
                key = aliases.get(qual.lower())
                if key is None:
                    key = ci.get(("default", qual.lower()))
                if key is None:
                    continue  # unresolvable qualifier: widen, never guess
                if col not in {
                    f["name"] for f in metas[key]["schema"]["fields"]
                }:
                    continue
            else:
                own = owners.get(col, ())
                if len(own) != 1:
                    continue
                key = own[0]
            if key in multi_ref:
                continue
            typed = _type_filters([(col, op, val)], metas[key])
            if typed:
                per_table.setdefault(key, []).extend(typed)
        return {k: tuple(v) for k, v in per_table.items()}

    def _run_select(self, spark, sql: str) -> DataFrame:
        return spark.sql(self._rewrite_select(spark, sql))

    def _aligned(self, spark, df, loc: str) -> DataFrame:
        """Cast a result positionally to the table schema (Spark SQL
        semantics for INSERT by position)."""
        fields = ice.read_table_meta(loc)["schema"]["fields"]
        if len(df.columns) != len(fields):
            raise ValueError(
                f"expected {len(fields)} columns, got {len(df.columns)}"
            )
        return _strict_cast(
            df,
            [
                (c, f["name"], ice.ice_to_spark_type(f["type"]))
                for c, f in zip(df.columns, fields)
            ],
        )

    # ---- the SQL entry point ----

    def execute(self, spark, sql: str) -> DataFrame:
        """Run one statement against the warehouse; always returns a
        DataFrame (DML returns a one-row summary, like Spark's
        own v2 DML commands return metrics)."""
        if not sql or not sql.strip():
            raise ValueError("empty query")
        if _LIST_NS.match(sql):
            return spark.createDataFrame(
                [(n,) for n in self.list_namespaces()], "namespace string"
            )
        if m := _LIST_TBLS.match(sql):
            return spark.createDataFrame(
                self.list_tables(m.group(1)) or [],
                "namespace string, tableName string",
            )
        if m := _DESCRIBE.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            meta = ice.read_table_meta(loc)
            parts = {f["name"] for f in meta["partition-spec"]}
            sort_cols = ice.default_sort_cols(meta)
            sort_pos = {c: i + 1 for i, c in enumerate(sort_cols)}

            def _facets(name: str) -> str:
                out = []
                if name in parts:
                    out.append("partition")
                if name in sort_pos:
                    out.append(f"sort({sort_pos[name]})")
                return " ".join(out)

            return spark.createDataFrame(
                [
                    (
                        f["name"],
                        ice.ice_type_str(f["type"]),
                        _facets(f["name"]),
                    )
                    for f in meta["schema"]["fields"]
                ],
                "col_name string, data_type string, comment string",
            )
        if m := _SNAPSHOTS.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            meta = ice.read_table_meta(loc)
            return spark.createDataFrame(
                [
                    (
                        s["snapshot-id"],
                        s.get("parent-snapshot-id"),
                        s["timestamp-ms"],
                        s["summary"]["operation"],
                    )
                    for s in meta["snapshots"]
                ],
                "snapshot_id bigint, parent_id bigint, "
                "committed_at_ms bigint, operation string",
            )
        if m := _SHOW_PROPS.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            props = ice.read_table_meta(loc).get("properties", {})
            return spark.createDataFrame(
                sorted(props.items()) or [], "key string, value string"
            )
        if m := _CREATE_NS.match(sql):
            os.makedirs(os.path.join(self.warehouse, m.group(1)), exist_ok=True)
            return self._ok(spark, "create_namespace")
        if m := _DROP_NS.match(sql):
            ns = m.group(1)
            if self.list_tables(ns):
                raise ValueError(f"namespace {ns!r} is not empty")
            shutil.rmtree(os.path.join(self.warehouse, ns))
            return self._ok(spark, "drop_namespace")
        if m := _ALTER_PROPS.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            key = m.group(2).replace("''", "'")
            val = m.group(3).replace("''", "'")
            ice.set_table_property(loc, key, val)
            return self._ok(spark, "set_tblproperties", key=key, value=val)
        if m := _WRITE_ORDERED.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            meta = ice.read_table_meta(loc)
            canon = {
                f["name"].lower(): f["name"]
                for f in meta["schema"]["fields"]
            }
            cols = [
                canon.get(c.strip().strip("`").lower(),
                          c.strip().strip("`"))
                for c in m.group(2).split(",")
            ]
            out = ice.set_sort_order(loc, cols)
            return self._ok(
                spark,
                "write_ordered_by",
                order_id=str(out["order-id"]),
                columns=",".join(cols),
            )
        if m := _WRITE_UNORDERED.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            ice.set_sort_order(loc, [])
            return self._ok(spark, "write_unordered", order_id="0")
        if m := _WRITE_BRANCH.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            name = m.group(2)
            if name != "main":
                refs = ice.read_table_meta(loc).get("refs") or {}
                r = refs.get(name)
                if r is None:
                    raise ValueError(f"branch {name!r} does not exist")
                if r["type"] != "branch":
                    raise ValueError(f"ref {name!r} is a tag")
            ice.set_table_property(loc, "write.branch", name)
            return self._ok(spark, "write_to_branch", branch=name)
        if m := _FAST_FORWARD.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            out = ice.fast_forward(loc, m.group(2), m.group(3))
            return self._ok(
                spark,
                "fast_forward",
                target=m.group(2),
                snapshot_id=str(out["snapshot-id"]),
                advanced=str(out["advanced"]),
            )
        if m := _CREATE_REF.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            ref = ice.create_ref(
                loc,
                m.group(3),
                ref_type=m.group(2).lower(),
                snapshot_id=int(m.group(4)) if m.group(4) else None,
            )
            return self._ok(
                spark,
                f"create_{ref['type']}",
                name=ref["name"],
                snapshot_id=str(ref["snapshot-id"]),
            )
        if m := _DROP_REF.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            ref = ice.drop_ref(loc, m.group(2))
            return self._ok(spark, "drop_ref", name=ref["name"])
        if m := _SHOW_REFS.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            refs = ice.read_table_meta(loc).get("refs") or {}
            return spark.createDataFrame(
                [
                    (n, r["type"], r["snapshot-id"])
                    for n, r in sorted(refs.items())
                ]
                or [],
                "name string, type string, snapshot_id bigint",
            )
        if m := _ALTER_ADD_PART.match(sql):
            # ADD PARTITION FIELD day(d) / bucket(8, k) /
            # truncate(10, s) / bare column (identity)
            _, _, loc, _ = self._resolve(m.group(1))
            fn, n, col, bare = (
                m.group(2), m.group(3), m.group(4), m.group(5)
            )
            if bare is not None:
                part = bare
            else:
                kind = fn.lower()
                if kind in ("bucket", "truncate"):
                    if n is None:
                        raise ValueError(
                            f"{kind} transform needs a width: "
                            f"{kind}(N, column)"
                        )
                    part = (col, kind, int(n))
                elif kind in ("year", "month", "day", "hour"):
                    if n is not None:
                        raise ValueError(
                            f"{kind} transform takes one column"
                        )
                    part = (col, kind)
                else:
                    raise ValueError(
                        f"unsupported partition transform {fn!r}"
                    )
            spec = ice.add_partition_field(loc, part)
            return self._ok(
                spark,
                "add_partition_field",
                spec_id=str(spec["spec-id"]),
                field=spec["fields"][-1]["name"],
            )
        if m := _ALTER_DROP_PART.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            spec = ice.drop_partition_field(loc, m.group(2))
            return self._ok(
                spark,
                "drop_partition_field",
                spec_id=str(spec["spec-id"]),
                field=m.group(2),
            )
        if m := _ALTER_TYPE.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            meta = ice.read_table_meta(loc)
            canon = {
                f["name"].lower(): f["name"]
                for f in meta["schema"]["fields"]
            }
            col = canon.get(
                m.group(2).strip("`").lower(), m.group(2).strip("`")
            )
            new_t = _sql_type_to_ice(m.group(3), next_id=lambda: 0)
            if not isinstance(new_t, str):
                raise ValueError(
                    f"cannot promote to nested type {m.group(3)!r}"
                )
            out = ice.promote_column_type(loc, col, new_t)
            return self._ok(
                spark,
                "alter_column_type",
                column=col,
                from_type=ice.ice_type_str(out["from"]),
                to_type=out["to"],
            )
        if m := _ALTER_RENAME.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            ice.rename_column(loc, m.group(2), m.group(3))
            return self._ok(
                spark, "rename_column", old=m.group(2), new=m.group(3)
            )
        if m := _ALTER_DROP.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            ice.drop_column(loc, m.group(2))
            return self._ok(spark, "drop_column", column=m.group(2))
        if m := _ALTER_ADD.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            # element-id for a list type is minted by add_column
            # itself (it knows the table's last-column-id)
            typ = _sql_type_to_ice(m.group(3), next_id=lambda: 0)
            ice.add_column(loc, m.group(2), typ)
            return self._ok(spark, "add_column", column=m.group(2))
        if m := _OPTIMIZE.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            snap = ice.compact_files(
                spark,
                loc,
                sort_by=m.group(2),
                n_slices=int(m.group(3) or 1),
                **(
                    {"target_file_bytes": int(m.group(4))}
                    if m.group(4)
                    else {}
                ),
            )
            return self._ok(
                spark,
                "optimize",
                rewritten_files=snap["summary"]["deleted-data-files"],
                new_files=snap["summary"]["added-data-files"],
            )
        if m := _REWRITE_DELETES.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            snap = ice.rewrite_position_deletes(spark, loc)
            return self._ok(
                spark,
                "rewrite_position_deletes",
                rewritten_delete_files=snap["summary"][
                    "rewritten-delete-files"
                ],
                added_delete_files=snap["summary"]["added-delete-files"],
            )
        if m := _CONVERT_DELETES.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            snap = ice.convert_equality_deletes(spark, loc)
            return self._ok(
                spark,
                "convert_equality_deletes",
                converted_equality_delete_files=snap["summary"][
                    "converted-equality-delete-files"
                ],
                added_delete_files=snap["summary"]["added-delete-files"],
            )
        if m := _EXPIRE.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            res = ice.expire_snapshots(
                loc, keep_last=int(m.group(2) or 1)
            )
            return self._ok(spark, "expire_snapshots", **res)
        if m := _CTAS.match(sql):
            return self._ctas(
                spark, m.group(2), m.group(3), m.group(4),
                if_not_exists=bool(m.group(1)),
            )
        if m := _CREATE_TBL.match(sql):
            return self._create_table(
                spark, m.group(2), m.group(3), m.group(4),
                if_not_exists=bool(m.group(1)),
            )
        if m := _TRUNCATE.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            _no_write_branch(loc, "TRUNCATE")
            snap = ice.overwrite_table(spark, loc, None)
            return self._ok(
                spark,
                "truncate",
                removed_files=snap["summary"]["deleted-data-files"],
            )
        if m := _INSERT_OVER.match(sql):
            return self._insert(
                spark,
                m.group(1),
                m.group(3),
                cols_sql=m.group(2),
                overwrite=True,
            )
        if m := _DROP_TBL.match(sql):
            _, _, loc, _ = self._resolve(m.group(1))
            shutil.rmtree(loc)
            return self._ok(spark, "drop_table")
        if m := _INSERT.match(sql):
            return self._insert(
                spark, m.group(1), m.group(3), cols_sql=m.group(2)
            )
        if m := _MERGE.match(sql):
            return self._merge(spark, m)
        if m := _UPDATE.match(sql):
            set_sql, where = _split_where(m.group(2))
            return self._update(spark, m.group(1), set_sql, where)
        if m := _DELETE.match(sql):
            return self._delete(spark, *m.groups())
        if _SELECT.match(sql):
            return self._run_select(spark, sql)
        raise ValueError(f"unsupported statement: {sql.strip()[:80]!r}")

    @staticmethod
    def _ok(spark, op: str, **extra) -> DataFrame:
        cols = {"operation": op, **{k: str(v) for k, v in extra.items()}}
        return spark.createDataFrame(
            [tuple(cols.values())],
            ", ".join(f"{k} string" for k in cols),
        )

    def _create_table(self, spark, ident, cols_sql, part_sql,
                      if_not_exists=False):
        ns, tbl, loc, exists = self._resolve(ident, must_exist=False)
        if exists:
            # the flag comes from the statement HEAD (regex capture),
            # never from scanning the whole text — a string literal
            # containing "if not exists" must not flip the error into
            # a silent no-op (review r13)
            if if_not_exists:
                return self._ok(spark, "create_table", skipped=True)
            raise ValueError(f"table {ns}.{tbl} already exists")
        coldefs = _split_top_level(cols_sql)
        # list element-ids continue the counter after all top columns
        # (spec: field ids unique across the whole schema)
        _next = iter(range(len(coldefs) + 1, 2 * len(coldefs) + 1))
        fields = []
        for i, coldef in enumerate(coldefs):
            parts = coldef.split()
            if len(parts) < 2:
                raise ValueError(f"bad column definition {coldef!r}")
            # strip backtick quoting: `order` names the column order,
            # not a column literally containing backticks; the type
            # may contain spaces ("decimal(10, 2)") — rejoin the tail
            name = parts[0].strip("`")
            ice_t = _sql_type_to_ice(
                "".join(parts[1:]), next_id=lambda: next(_next)
            )
            fields.append(
                {"id": i + 1, "name": name, "required": False, "type": ice_t}
            )
        names = {f["name"] for f in fields}
        part_cols = _parse_part_cols(part_sql, names)
        os.makedirs(os.path.join(self.warehouse, ns), exist_ok=True)
        ice.create_table(
            loc,
            {"type": "struct", "schema-id": 0, "fields": fields},
            part_cols=part_cols,
        )
        return self._ok(spark, "create_table")

    def _ctas(self, spark, ident, part_sql, select_sql,
              if_not_exists=False) -> DataFrame:
        """CREATE TABLE ... AS SELECT: schema inferred from the
        query, table created (optionally partitioned), result
        appended as the first snapshot."""
        ns, tbl, loc, exists = self._resolve(ident, must_exist=False)
        if exists:
            if if_not_exists:
                return self._ok(spark, "create_table", skipped=True)
            raise ValueError(f"table {ns}.{tbl} already exists")
        src = self._run_select(spark, select_sql)
        schema = ice.spark_schema_to_iceberg(src)
        names = {f["name"] for f in schema["fields"]}
        part_cols = _parse_part_cols(part_sql, names)
        os.makedirs(os.path.join(self.warehouse, ns), exist_ok=True)
        ice.create_table(loc, schema, part_cols=part_cols)
        ice.append(spark, loc, src)
        return self._ok(spark, "create_table_as_select")

    def _insert(self, spark, ident, tail, cols_sql=None,
                overwrite=False) -> DataFrame:
        _, _, loc, _ = self._resolve(ident)
        if re.match(r"^\s*VALUES\b", tail, re.I):
            # Spark SQL parses the tuples — no hand-rolled literal
            # parser (the reference's QueryManager.py:94-140 pitfall)
            src = spark.sql(tail)
        else:
            src = self._run_select(spark, tail)
        if cols_sql:
            # column-list INSERT (hostile-probe r13): route the
            # source positionally into the NAMED columns; every
            # omitted column is NULL (SQL standard semantics)
            from pyspark.sql import functions as F

            fields = ice.read_table_meta(loc)["schema"]["fields"]
            # unquoted identifiers are case-insensitive: resolve the
            # list to the schema's canonical casing first
            canon = {f["name"].lower(): f["name"] for f in fields}
            raw_names = [
                c.strip().strip("`") for c in cols_sql.split(",")
            ]
            bad = [c for c in raw_names if c.lower() not in canon]
            if bad:
                raise ValueError(f"INSERT columns not in schema: {bad}")
            names = [canon[c.lower()] for c in raw_names]
            if len(names) != len(set(names)):
                raise ValueError("duplicate INSERT column")
            if len(src.columns) != len(names):
                raise ValueError(
                    f"expected {len(names)} columns, got "
                    f"{len(src.columns)}"
                )
            named = src.toDF(*names)
            src = named.select(
                *[
                    F.col(f["name"])
                    if f["name"] in names
                    else F.lit(None)
                    .cast(ice.ice_to_spark_type(f["type"]))
                    .alias(f["name"])
                    for f in fields
                ]
            )
        aligned = self._aligned(spark, src, loc)
        branch = _write_branch(loc)
        if overwrite:
            if branch:
                raise ValueError(
                    "INSERT OVERWRITE is unsupported while "
                    f"write.branch={branch!r} is set — publish or "
                    "clear the branch first"
                )
            snap = ice.overwrite_table(spark, loc, aligned)
            return self._ok(
                spark,
                "insert_overwrite",
                replaced_files=snap["summary"]["deleted-data-files"],
                new_files=snap["summary"]["added-data-files"],
            )
        snap = ice.append(spark, loc, aligned, branch=branch)
        return self._ok(
            spark,
            "insert",
            added_records=snap["summary"].get("added-records", "0"),
            **({"branch": branch} if branch else {}),
        )

    def _update(self, spark, ident, set_sql, where) -> DataFrame:
        _, _, loc, _ = self._resolve(ident)
        _no_write_branch(loc, "UPDATE")
        meta = ice.read_table_meta(loc)
        part_set = ice.partition_source_cols(meta)
        schema_cols = {f["name"] for f in meta["schema"]["fields"]}
        mor = (
            meta.get("properties", {}).get("write.update.mode", "")
            == "merge-on-read"
        )
        assignments = {}
        for item in _split_top_level(set_sql):
            col, _, expr = item.partition("=")
            col = col.strip()
            if not col or not expr.strip():
                raise ValueError(f"bad SET item {item!r}")
            if col in part_set and not mor:
                # CoW rewrites files in place, so a row cannot move
                # partitions; MoR appends the updated row, which
                # re-routes it — partition SETs are legal there
                raise ValueError(f"cannot update partition column {col!r}")
            if col not in schema_cols:
                # without this, withColumn would mint a new column the
                # final schema-projection silently drops — a no-op
                # UPDATE instead of an error
                raise ValueError(f"SET target {col!r} is not a column")
            assignments[col] = F.expr(expr.strip())
        # subquery predicates (k IN (SELECT ...)) reference other
        # warehouse tables: register them as views and substitute
        # names, exactly like the SELECT path (hostile-probe r13)
        pred = (
            F.expr(self._rewrite_select(spark, where))
            if where
            else F.lit(True)
        )
        prune = _simple_filters(where, meta)
        if mor:
            snap = ice.mor_update_where(
                spark, loc, pred, assignments, prune_filters=prune
            )
            return self._ok(
                spark,
                "update",
                rewritten_files="0",
                added_delete_files=snap["summary"]["added-delete-files"],
                updated_rows=snap["summary"]["added-position-deletes"],
            )

        def rewrite(src, predicate):
            matched = F.coalesce(predicate, F.lit(False))
            out = src
            for col, new in assignments.items():
                out = out.withColumn(
                    col, F.when(matched, new).otherwise(F.col(col))
                )
            return out

        snap = ice.cow_rewrite_where(
            spark, loc, pred, rewrite, prune_filters=prune
        )
        return self._ok(
            spark,
            "update",
            rewritten_files=snap["summary"]["deleted-data-files"],
        )

    def _delete(self, spark, ident, where) -> DataFrame:
        _, _, loc, _ = self._resolve(ident)
        _no_write_branch(loc, "DELETE")
        meta = ice.read_table_meta(loc)
        # subquery predicates (k IN (SELECT ...)) reference other
        # warehouse tables: register them as views and substitute
        # names, exactly like the SELECT path (hostile-probe r13)
        pred = (
            F.expr(self._rewrite_select(spark, where))
            if where
            else F.lit(True)
        )
        prune = _simple_filters(where, meta)
        # the real engine's table property selects the delete
        # strategy; merge-on-read writes position deletes instead of
        # rewriting data files
        mode = meta.get("properties", {}).get("write.delete.mode", "")
        if mode == "merge-on-read":
            snap = ice.mor_delete_where(
                spark, loc, pred, prune_filters=prune
            )
            return self._ok(
                spark,
                "delete",
                rewritten_files="0",
                added_delete_files=snap["summary"]["added-delete-files"],
                deleted_rows=snap["summary"]["added-position-deletes"],
            )
        snap = ice.cow_rewrite_where(
            spark,
            loc,
            pred,
            lambda src, p: src.filter(~F.coalesce(p, F.lit(False))),
            prune_filters=prune,
        )
        return self._ok(
            spark,
            "delete",
            rewritten_files=snap["summary"]["deleted-data-files"],
        )

    def _merge(self, spark, m) -> DataFrame:
        (tgt_ident, tgt_alias, sub_sql, src_ident, src_alias, on_sql,
         action_sql) = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
            m.group(6), m.group(7).strip(),
        )
        _, _, loc, _ = self._resolve(tgt_ident)
        _no_write_branch(loc, "MERGE")
        source = (
            self._run_select(spark, sub_sql)
            if sub_sql
            else self._run_select(spark, f"SELECT * FROM {src_ident}")
        )
        on_cols = []
        for part in _split_and(on_sql):
            mm = re.match(
                rf"^\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*$",
                part,
            )
            if not mm:
                raise ValueError(f"unsupported ON term {part.strip()!r}")
            a1, c1, a2, c2 = mm.groups()
            # case-insensitive alias/column matching (r13 ADVICE low
            # — same rule as every other identifier on this surface)
            if {a1.lower(), a2.lower()} != {
                tgt_alias.lower(),
                src_alias.lower(),
            } or c1.lower() != c2.lower():
                raise ValueError(
                    "ON terms must equate the same column across the "
                    f"two aliases, got {part.strip()!r}"
                )
            on_cols.append(c1)
        meta = ice.read_table_meta(loc)
        # resolve ON columns through the schema's canonical casing so
        # downstream joins/selects hit real columns
        _canon = {f["name"].lower(): f["name"] for f in meta["schema"]["fields"]}
        on_cols = [_canon.get(c.lower(), c) for c in on_cols]
        mor = (
            meta.get("properties", {}).get("write.merge.mode", "")
            == "merge-on-read"
        )

        # WHEN MATCHED THEN DELETE: a key-tombstone batch — the
        # source only needs the ON columns
        if re.fullmatch(r"DELETE", action_sql, re.I):
            missing = [c for c in on_cols if c not in source.columns]
            if missing:
                raise ValueError(
                    f"MERGE source lacks ON columns {missing}"
                )
            types = {
                f["name"]: f["type"] for f in meta["schema"]["fields"]
            }
            keys = _strict_cast(
                source.select(*on_cols),
                [(c, c, ice.ice_to_spark_type(types[c])) for c in on_cols],
            )
            fn = ice.mor_merge_delete if mor else ice.merge_delete
            snap = fn(spark, loc, keys, on_cols=on_cols)
            return self._ok(
                spark,
                "merge_delete",
                rewritten_files=snap["summary"].get(
                    "deleted-data-files", "0"
                ),
                added_delete_files=snap["summary"].get(
                    "added-delete-files", "0"
                ),
            )

        mm = _MERGE_UPSERT_TAIL.fullmatch(action_sql)
        if not mm:
            raise ValueError(
                f"unsupported MERGE clause {action_sql!r} — expected "
                "UPDATE SET ... WHEN NOT MATCHED THEN INSERT * "
                "[WHEN NOT MATCHED BY SOURCE THEN DELETE | "
                "UPDATE SET ...], or DELETE"
            )
        set_sql = mm.group(1).strip()
        # WHEN NOT MATCHED BY SOURCE — the CDC-mirror clause
        nmbs = None
        if mm.group(2):
            act = mm.group(2).strip()
            if re.fullmatch(r"DELETE", act, re.I):
                nmbs = "delete"
            else:
                from pyspark.sql import functions as F

                canon = {
                    f["name"].lower(): f["name"]
                    for f in meta["schema"]["fields"]
                }
                nmbs = {}
                nm_sql = re.sub(r"^UPDATE\s+SET\s+", "", act, flags=re.I)
                for item in _split_top_level(nm_sql):
                    col, eq, expr = item.partition("=")
                    col = col.strip().strip("`")
                    # strip an optional target-alias qualifier
                    if "." in col:
                        qual, _, bare = col.partition(".")
                        if qual.strip().lower() != tgt_alias.lower():
                            raise ValueError(
                                "NOT MATCHED BY SOURCE SET may only "
                                f"assign target columns, got {item!r}"
                            )
                        col = bare.strip().strip("`")
                    if not eq or not expr.strip() or not col:
                        raise ValueError(
                            f"bad NOT MATCHED BY SOURCE SET item {item!r}"
                        )
                    if col.lower() not in canon:
                        raise ValueError(
                            f"unknown column {col!r} in NOT MATCHED "
                            "BY SOURCE SET"
                        )
                    # no source row exists for these target rows, so
                    # the expression may reference only literals and
                    # target columns
                    nmbs[canon[col.lower()]] = F.expr(expr.strip())
        update_cols = None
        if set_sql != "*":
            # explicit assignments: each must be [tgt.]col = src.col
            # with matching names — column-level update routing
            update_cols = []
            for item in _split_top_level(set_sql):
                am = re.match(
                    rf"^(?:({_IDENT})\.)?({_IDENT})\s*=\s*"
                    rf"({_IDENT})\.({_IDENT})$",
                    item.strip(),
                )
                # identifiers are case-insensitive, like everywhere
                # else on this surface (r13 ADVICE low): compare
                # aliases/columns lowercased and resolve the column
                # through the schema's canonical casing
                if (
                    not am
                    or (am.group(1) or tgt_alias).lower() != tgt_alias.lower()
                    or am.group(3).lower() != src_alias.lower()
                    or am.group(2).lower() != am.group(4).lower()
                ):
                    raise ValueError(
                        f"unsupported MERGE SET item {item.strip()!r}"
                        " — expected [tgt.]col = src.col with the"
                        " same column name"
                    )
                canon = {
                    f["name"].lower(): f["name"]
                    for f in meta["schema"]["fields"]
                }
                update_cols.append(
                    canon.get(am.group(2).lower(), am.group(2))
                )
        missing = [
            f["name"]
            for f in meta["schema"]["fields"]
            if f["name"] not in source.columns
        ]
        if missing:
            raise ValueError(f"MERGE source lacks table columns {missing}")
        # literals in an inline USING (SELECT ...) arrive as Spark's
        # inferred types (INT, DECIMAL); cast BY NAME to the table
        # schema so the appended files carry the table's types —
        # loudly (try_cast + raise on non-NULL -> NULL), matching
        # Spark/Iceberg ANSI MERGE semantics
        source = _strict_cast(
            source,
            [
                (f["name"], f["name"], ice.ice_to_spark_type(f["type"]))
                for f in meta["schema"]["fields"]
            ],
        )
        fn = ice.mor_merge_into if mor else ice.merge_into
        snap = fn(
            spark, loc, source, on_cols=on_cols, update_cols=update_cols,
            not_matched_by_source=nmbs,
        )
        return self._ok(
            spark,
            "merge",
            rewritten_files=snap["summary"]["deleted-data-files"],
            added_files=snap["summary"]["added-data-files"],
        )
