"""HTML table extraction: WebTables-style relational + triple mining.

After embedded annotations (structured.py), HTML tables are the second
classic triple source in web-KG construction (the WebTables / DBpedia-table
lineage): a header row names predicates, a key column names subjects, and
every other cell is an (subj, header, cell) assertion. Reference analog:
the TSV triple loads at test.py:16-47 — this module derives the same
(subj, pred, obj, is_lit) contract from raw crawl HTML tables instead of
pre-built dumps.

Execution discipline matches structured.py/extract.py: the parser is a
PURE row-local function of the html bytes, run as an Arrow-batched
``mapInPandas`` kernel — no per-row Python UDFs, no cross-row state, so
output is byte-identical per url at any parallelism and both operators are
single narrow map stages (scan column-pruned to (url, html)).

Documented parsing subset (fixture-grade but honest, like the microdata
profile):
- Headers come from the FIRST row of the table if every cell in it is
  ``<th>``; otherwise columns are named ``col{j}``. ``thead``/``tbody``/
  ``tr`` grouping tags are recognized; ``caption`` content is ignored.
- Cell values are the cell's inner text with ALL nested tags stripped and
  whitespace collapsed (links inside cells contribute their anchor text —
  the WebTables convention).
- colspan/rowspan are NOT expanded: cells map positionally and the
  table's ``n_ragged`` telemetry counts rows whose width differs from the
  header row (counted-drop contract — crawl QA alerts, executors never
  raise).
- Rows wider than the header row are truncated to it; narrower rows pad
  missing columns with NULL.
- Nested tables are treated as cell content of the outer cell (their
  markup is stripped with the other tags); they are not recursed into.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_TABLE_RE = re.compile(r"(?is)<table\b[^>]*>(.*?)</table>")
_TR_RE = re.compile(r"(?is)<tr\b[^>]*>(.*?)</tr>")
_CELL_RE = re.compile(r"(?is)<(t[dh])\b[^>]*>(.*?)</t[dh]\s*>")
_STRIP_TAGS_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def _cell_text(raw: str) -> str:
    return _WS_RE.sub(" ", _STRIP_TAGS_RE.sub(" ", raw)).strip()


def parse_tables(html: str) -> list[dict]:
    """All tables in a page as dicts:
    {headers: [str], rows: [[str|None]], n_ragged: int, header_from_th: bool}.

    Pure function of the bytes; table/row/column order is document order.
    Nested-table content never starts a new table here because the outer
    ``_TABLE_RE`` match consumes up to the FIRST ``</table>`` — by the
    documented subset an inner table truncates the outer one's remaining
    rows (counted in the outer table's shape, never raised).
    """
    out = []
    for tm in _TABLE_RE.finditer(html):
        body = tm.group(1)
        raw_rows = []
        for rm in _TR_RE.finditer(body):
            cells = [(kind.lower(), _cell_text(raw)) for kind, raw in _CELL_RE.findall(rm.group(1))]
            if cells:
                raw_rows.append(cells)
        if not raw_rows:
            continue
        first = raw_rows[0]
        header_from_th = all(kind == "th" for kind, _ in first)
        if header_from_th:
            headers = [text for _, text in first]
            data_rows = raw_rows[1:]
        else:
            headers = [f"col{j}" for j in range(len(first))]
            data_rows = raw_rows
        n_cols = len(headers)
        rows: list[list[str | None]] = []
        n_ragged = 0
        for cells in data_rows:
            if len(cells) != n_cols:
                n_ragged += 1
            vals: list[str | None] = [text for _, text in cells[:n_cols]]
            vals.extend([None] * (n_cols - len(vals)))
            rows.append(vals)
        out.append(
            {
                "headers": headers,
                "rows": rows,
                "n_ragged": n_ragged,
                "header_from_th": header_from_th,
            }
        )
    return out


_CELLS_SCHEMA = (
    "url STRING, table_idx INT, row_idx INT, col_idx INT, "
    "header STRING, value STRING"
)
_STATS_SCHEMA = (
    "url STRING, table_idx INT, n_cols INT, n_rows INT, "
    "n_ragged INT, header_from_th BOOLEAN"
)


def _decode(html) -> str:
    if html is None:
        return ""
    return bytes(html).decode("utf-8", errors="replace")


def table_cells(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, html) -> one row per data cell:
    (url, table_idx, row_idx, col_idx, header, value).

    The relational view — value may be NULL for padded ragged rows.
    Single narrow Arrow map stage, scan pruned to (url, html)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "table_idx", "row_idx", "col_idx", "header", "value")}
            for url, html in zip(pdf["url"], pdf[html_col]):
                for ti, t in enumerate(parse_tables(_decode(html))):
                    for ri, vals in enumerate(t["rows"]):
                        for ci, (h, v) in enumerate(zip(t["headers"], vals)):
                            rows["url"].append(url)
                            rows["table_idx"].append(ti)
                            rows["row_idx"].append(ri)
                            rows["col_idx"].append(ci)
                            rows["header"].append(h)
                            rows["value"].append(v)
            yield pd.DataFrame(rows)

    return pages.select("url", html_col).mapInPandas(run, _CELLS_SCHEMA)


def table_stats(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-table shape telemetry incl. the ragged-row counted-drop surface."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in ("url", "table_idx", "n_cols", "n_rows", "n_ragged", "header_from_th")
            }
            for url, html in zip(pdf["url"], pdf[html_col]):
                for ti, t in enumerate(parse_tables(_decode(html))):
                    rows["url"].append(url)
                    rows["table_idx"].append(ti)
                    rows["n_cols"].append(len(t["headers"]))
                    rows["n_rows"].append(len(t["rows"]))
                    rows["n_ragged"].append(t["n_ragged"])
                    rows["header_from_th"].append(t["header_from_th"])
            yield pd.DataFrame(rows)

    return pages.select("url", html_col).mapInPandas(run, _STATS_SCHEMA)


def tables_to_triples(
    pages: DataFrame, key_col: int = 0, html_col: str = "html"
) -> DataFrame:
    """WebTables triple mining: per data row, subject = the key column's
    cell, predicate = header, object = cell, for every non-key column.

    Emitted as (url, subj, pred, obj, obj_is_lit=TRUE) — table objects are
    lexical strings; entity resolution (linking "Org 7" the string to an
    IRI) is the KG layer's job downstream, exactly like literal seeds.
    Rows whose key cell is NULL or empty are dropped (no subject, counted
    nowhere — they remain visible in table_cells). Composed from
    :func:`table_cells` with native expressions, so the plan is the same
    single map stage plus one self-join-free filter/projection pair: cells
    are exploded once, the key column is pulled per (url, table, row) with
    a broadcast-size-agnostic window-free max(CASE) aggregation, then
    joined back — two hash exchanges on (url, table_idx, row_idx), both
    AQE-coalescible, no skew (rows are unique keys by construction).
    """
    from pyspark.sql import functions as F

    cells = table_cells(pages, html_col=html_col)
    keys = (
        cells.filter(F.col("col_idx") == key_col)
        .filter(F.col("value").isNotNull() & (F.col("value") != ""))
        .select("url", "table_idx", "row_idx", F.col("value").alias("subj"))
    )
    return (
        cells.filter((F.col("col_idx") != key_col) & F.col("value").isNotNull())
        .join(keys, ["url", "table_idx", "row_idx"])
        .select(
            "url",
            "subj",
            F.col("header").alias("pred"),
            F.col("value").alias("obj"),
            F.lit(True).alias("obj_is_lit"),
        )
    )
