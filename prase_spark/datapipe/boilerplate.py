"""Per-host boilerplate removal — the crawl-curation pass that strips
nav bars, cookie banners and footers: a LINE that repeats across many
pages of the same host is boilerplate, not content.

Scale shape: explode pages into (host, line) with position, one
hash-aggregation counts each line's page-frequency per host plus one for
the host's page count, frequent lines anti-join out, and the text is
rebuilt by an ordered array collect per page. Everything shuffles on
(host, line-hash)-sized keys; raw text never rides a shuffle key (lines
are compared via xxhash64, exact strings only inside the per-page
rebuild).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_of(url_col) -> "F.Column":
    """Lowercased host of a URL column (native regex)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))


def remove_boilerplate(
    pages: DataFrame,
    min_pages: int = 4,
    max_ratio: float = 0.5,
    url_col: str = "url",
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """(url, text) with boilerplate lines removed: a line is dropped when
    it appears on more than ``max_ratio`` of its host's pages AND the
    host has at least ``min_pages`` pages (small hosts are left alone —
    ratios over 2 pages mean nothing). Line order inside each page is
    preserved; blank lines never count as boilerplate evidence and are
    kept as-is. Returns (url, text, removed_lines).

    Deterministic: membership depends only on per-host line frequencies,
    not partitioning. The per-(host, line) distinct page count uses one
    aggregation over line HASHES; a 64-bit collision could only ever
    merge two identical-hash lines' counts (vanishingly rare, and biased
    toward removing one extra near-boilerplate line, never corrupting
    text)."""
    lines = pages.select(
        url_col,
        host_of(url_col).alias("__host"),
        F.posexplode(F.split(F.col(text_col), F.lit(line_sep))).alias("__pos", "__line"),
    ).withColumn("__lh", F.xxhash64(F.trim(F.col("__line"))))

    host_pages = pages.select(host_of(url_col).alias("__host"), url_col).groupBy(
        "__host"
    ).agg(F.countDistinct(url_col).alias("__host_pages"))

    nonblank = lines.filter(F.trim("__line") != "")
    freq = (
        nonblank.select("__host", "__lh", url_col)
        .distinct()
        .groupBy("__host", "__lh")
        .agg(F.count("*").alias("__line_pages"))
        .join(host_pages, "__host")
        .filter(
            (F.col("__host_pages") >= min_pages)
            & (F.col("__line_pages") > F.col("__host_pages") * F.lit(max_ratio))
        )
        .select("__host", "__lh")
    )
    kept = lines.join(freq, ["__host", "__lh"], "left_anti")
    rebuilt = kept.groupBy(url_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            line_sep,
        ).alias(text_col),
        F.count("*").alias("__kept"),
    )
    totals = lines.groupBy(url_col).agg(F.count("*").alias("__total"))
    return (
        pages.select(url_col)
        .join(rebuilt, url_col, "left")
        .join(totals, url_col, "left")
        .select(
            url_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            (F.coalesce("__total", F.lit(0)) - F.coalesce("__kept", F.lit(0))).alias(
                "removed_lines"
            ),
        )
    )
