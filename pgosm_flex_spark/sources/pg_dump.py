"""pg_dump COPY-format source — read PostgreSQL dump data files as DataFrames.

The reference ships config/data artifacts as ``pg_dump`` SQL files and
reloads them with ``psql`` (QGIS layer styles:
/root/reference/docker/qgis_styles.py:53-71 loading
db/qgis-style/layer_styles.sql; lookup seeds in db/data/). A user switching
engines holds those same artifacts, so this module parses the dump's
``COPY <table> (cols...) FROM stdin;`` blocks — PostgreSQL's text format:
one row per line, tab-separated, ``\\N`` for NULL, backslash escapes —
into DataFrames.

Parsing is driver-side and streaming (one pass, one row in memory at a
time): these artifacts are metadata-scale (KBs-MBs of styles, seeds,
schema fixtures), not corpus-scale. A corpus-sized dump should be converted
ONCE to parquet (``read_pg_dump_copy(...).write.parquet(...)``) and every
downstream job reads the parquet — re-parsing a text dump per job would
waste the cluster regardless of where the parse runs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_COPY_RE = re.compile(
    r"^COPY\s+(?P<table>[\w\".]+)\s*\((?P<cols>[^)]*)\)\s+FROM\s+stdin;\s*$",
    re.IGNORECASE,
)

# PostgreSQL COPY text-format escapes (COPY docs, "Text Format"):
_ESCAPES = {
    "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t", "v": "\v",
    "\\": "\\",
}


def _decode_field(raw: str) -> str | None:
    r"""Decode one COPY text-format field: ``\N`` → NULL, backslash escapes
    (named, octal ``\ooo``, hex ``\xhh``) → their characters."""
    if raw == "\\N":
        return None
    if "\\" not in raw:
        return raw
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:  # trailing lone backslash: keep literally
            out.append(c)
            break
        nxt = raw[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
        elif nxt == "x" and i + 2 < n and raw[i + 2] in "0123456789abcdefABCDEF":
            j = i + 2
            hexs = raw[j : j + 2]
            if len(hexs) == 2 and hexs[1] not in "0123456789abcdefABCDEF":
                hexs = hexs[0]
            out.append(chr(int(hexs, 16)))
            i = j + len(hexs)
        elif nxt in "01234567":
            j = i + 1
            octs = raw[j : j + 3]
            k = 1
            while k < len(octs) and octs[k] in "01234567":
                k += 1
            out.append(chr(int(octs[:k], 8)))
            i = j + k
        else:  # unknown escape: PostgreSQL keeps the char as-is
            out.append(nxt)
            i += 2
    return "".join(out)


def iter_copy_blocks(path: str) -> Iterator[tuple[str, list[str], Iterator[list[str | None]]]]:
    """Yield ``(table, columns, rows)`` per COPY block, streaming the file
    once. ``rows`` must be consumed before advancing to the next block (it
    shares the underlying file iterator)."""
    with open(path, encoding="utf-8") as f:
        lines = iter(f)
        for line in lines:
            m = _COPY_RE.match(line.strip())
            if not m:
                continue
            cols = [c.strip().strip('"') for c in m.group("cols").split(",")]

            def rows(n_cols: int = len(cols)) -> Iterator[list[str | None]]:
                for data_line in lines:
                    # tolerate CRLF-translated dumps (git autocrlf/Windows):
                    # a literal \r inside a field would arrive escaped as \\r
                    data_line = data_line.rstrip("\n").rstrip("\r")
                    if data_line == "\\.":
                        return
                    fields = data_line.split("\t")
                    if len(fields) != n_cols:
                        raise ValueError(
                            f"COPY row has {len(fields)} fields, header "
                            f"declared {n_cols}: {data_line[:120]!r}"
                        )
                    yield [_decode_field(x) for x in fields]
                raise ValueError(r"COPY block not terminated by \.")

            yield m.group("table"), cols, rows()


def list_copy_tables(path: str) -> list[str]:
    """Table names of every COPY block in the dump, in file order."""
    out = []
    for table, _cols, rows in iter_copy_blocks(path):
        out.append(table)
        for _ in rows:  # drain to reach the next block
            pass
    return out


def read_pg_dump_copy(
    spark: SparkSession, path: str, table: str | None = None
) -> DataFrame:
    """DataFrame of one COPY block's rows — every column ``string`` (NULL for
    ``\\N``); the caller casts to its schema. ``table`` selects a block by
    name (schema-qualified or bare, e.g. ``"layer_styles_staging"`` matches
    ``public.layer_styles_staging``); None requires the dump to hold exactly
    one block."""
    found: list[tuple[str, list[str], list]] = []
    for tbl, cols, rows in iter_copy_blocks(path):
        bare = tbl.split(".")[-1]
        if table is None or table in (tbl, bare):
            found.append((tbl, cols, [tuple(r) for r in rows]))
        else:
            for _ in rows:
                pass
    if not found:
        have = ", ".join(list_copy_tables(path)) or "<none>"
        raise ValueError(f"no COPY block for table {table!r} in {path}; found: {have}")
    if len(found) > 1:
        raise ValueError(
            f"{len(found)} COPY blocks match {table!r} in {path}; "
            "pass a schema-qualified table name"
        )
    _tbl, cols, data = found[0]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(data, schema=schema)
