"""robots.txt parsing/evaluation + meta-robots noindex — the crawl-
compliance curation pass (exclude pages a crawler should not have kept:
REP-disallowed paths, noindex-tagged documents).

Beyond-reference curation (the reference has no crawl layer), standard
in CC-derived corpora. Everything is native expressions:

- ``parse_robots`` turns robots.txt BODIES into a (host, agent, allow,
  prefix) rule table. Parsing is per-host line algebra: posexplode the
  lines, classify, fill the governing user-agent group forward with a
  running-count window. robots.txt files are protocol-capped (500 KiB
  fetch limit in practice) so the per-host window partition is bounded
  by construction — never corpus-sized.
- ``robots_allowed`` evaluates URLs against the rule table with the REP
  longest-match rule (most specific prefix wins; allow wins length
  ties; no matching rule = allowed). The rule table is hosts-sized —
  tiny next to a page corpus — so the join broadcasts; per-URL argmax
  is ``max_by`` over a bounded candidate set (rules per host), one
  aggregation, no window over the corpus.
- ``drop_noindex`` removes pages whose html carries
  ``<meta name="robots" ... noindex ...>`` (either attribute order) —
  one codegen'd regexp filter, zero exchanges.

Spec subset (pinned, engine-replayable): literal path prefixes only —
``*`` wildcards and ``$`` anchors inside rule paths are out of scope
and dropped with a rule-level flag; an empty rule path means "no rule"
per the REP (``Disallow:`` alone allows everything).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, agent, allow, prefix) rules from raw robots.txt bodies.

    Grammar: lines split on ``\\n``; ``#`` comments stripped; field
    names case-insensitive; a ``User-agent:`` line opens a new group
    when the previous non-blank directive was a rule (stacked agent
    lines share their group, per the REP); ``Allow:``/``Disallow:``
    rules bind to every agent of their group. Rule paths containing
    ``*`` or ``$`` (out of the literal-prefix subset) are dropped.
    Empty rule paths are dropped (no-op per the REP)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("line_no", "raw"),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    field = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    typed = lines.select(
        "host",
        "line_no",
        field.alias("field"),
        value.alias("value"),
    ).where(field.isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("line_no")
    is_agent = (F.col("field") == "user-agent").cast("int")
    # a User-agent line after a RULE line starts a new group; stacked
    # agent lines keep the group -> group id = running count of
    # (agent-line whose previous directive was a rule or nothing)
    prev_field = F.lag("field").over(w)
    opens = (
        (F.col("field") == "user-agent")
        & (prev_field.isNull() | (prev_field != "user-agent"))
    ).cast("int")
    grouped = typed.withColumn("grp", F.sum(opens).over(w)).withColumn(
        "is_agent", is_agent
    )
    agents = (
        grouped.where("is_agent = 1")
        .select("host", "grp", F.lower("value").alias("agent"))
        .distinct()
    )
    rules = grouped.where("is_agent = 0").select(
        "host",
        "grp",
        (F.col("field") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
    )
    return (
        rules.join(agents, on=["host", "grp"])
        .where((F.col("prefix") != "") & ~F.col("prefix").rlike(r"[*$]"))
        .select("host", "agent", "allow", "prefix")
    )


def _path_of(url_col: Column | str) -> Column:
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    p = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    p = F.regexp_replace(p, r"#.*$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_allowed(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """pages + (allowed: boolean) under the REP longest-match rule for
    ``agent`` (exact agent rules win over ``*`` rules per host; the
    most specific matching prefix decides; allow wins exact length
    ties; no match = allowed).

    Plan: the rule table (hosts-sized) broadcasts into the page scan;
    matching candidates reduce with one ``max_by`` aggregation keyed on
    URL — no corpus-wide window, no skew surface beyond the hash agg."""
    from prase_spark.datapipe.boilerplate import host_of

    a = agent.lower()
    r = rules.where(F.col("agent").isin(a, "*") if a != "*" else F.col("agent") == "*")
    # exact-agent rules shadow the wildcard group per host
    host_has_exact = r.where(F.col("agent") == a).select("host").distinct()
    if a != "*":
        wild = r.where(F.col("agent") == "*").join(
            host_has_exact, on="host", how="left_anti"
        )
        r = r.where(F.col("agent") == a).unionByName(wild)
    cand = pages.select(
        F.col(url_col).alias("url"),
        host_of(url_col).alias("__host"),
        _path_of(url_col).alias("__path"),
    ).join(
        F.broadcast(r.withColumnRenamed("host", "__host")),
        on="__host",
        how="left",
    )
    matched = cand.where(
        F.col("prefix").isNotNull() & F.col("__path").startswith(F.col("prefix"))
    )
    verdict = matched.groupBy("url").agg(
        F.max_by(
            F.col("allow"),
            F.struct(F.length("prefix").alias("l"), F.col("allow").cast("int")),
        ).alias("__verdict")
    )
    return (
        pages.join(
            verdict.withColumnRenamed("url", url_col), on=url_col, how="left"
        )
        .withColumn("allowed", F.coalesce(F.col("__verdict"), F.lit(True)))
        .drop("__verdict")
    )


_NOINDEX_RE = (
    r'(?is)<meta\s[^>]*(name\s*=\s*"robots"[^>]*content\s*=\s*"[^"]*noindex'
    r'|content\s*=\s*"[^"]*noindex[^"]*"[^>]*name\s*=\s*"robots")'
)


def drop_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Pages minus those tagged ``<meta name="robots" ... noindex>`` in
    either attribute order. One codegen regexp filter on the scan."""
    return pages.where(~F.decode(F.col(html_col), "utf-8").rlike(_NOINDEX_RE))


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) — ``Sitemap:`` directives from robots.txt
    bodies, the discovery hand-off the REP defines: robots is where a
    host DECLARES its sitemaps, so this feeds
    :func:`prase_spark.datapipe.sitemaps.parse_sitemaps` (and from
    there CDX staleness scoring) without any out-of-band configuration.

    Same line grammar as :func:`parse_robots` (comments stripped,
    field names case-insensitive); Sitemap directives are
    group-independent per the REP, so no group machinery — one
    exchange-free projection plus the per-host dedup aggregate.
    Relative sitemap URLs are out of spec and dropped (the REP requires
    absolute URLs here)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\n")).alias("raw"),
    ).select(
        "host",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    )
    field = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    return (
        lines.select("host", field.alias("f"), value.alias("sitemap_url"))
        .where((F.col("f") == "sitemap")
               & F.col("sitemap_url").rlike(r"(?i)^https?://"))
        .select("host", "sitemap_url")
        .distinct()
    )
