"""URL canonicalization + crawl dedup — the front-of-pipeline pass that
collapses the same page fetched under cosmetically different URLs
(scheme/host case, default ports, fragments, tracking parameters,
trailing slashes) before any text processing spends compute on it.

All native column expressions (chained regexp_replace — one codegen'd
projection); the dedup is one aggregation keyed on the canonical form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped by canonical_url — the common cross-site set
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid",
)


def canonical_url(col: Column | str) -> Column:
    """Deterministic canonical form of a URL column:

    1. lowercase the scheme and host (path/query case is preserved),
    2. drop the fragment (#...),
    3. drop default ports (:80 for http, :443 for https),
    4. drop tracking query parameters (TRACKING_PARAMS), then any bare
       '?'/'&' leftovers,
    5. drop a single trailing slash on a non-root path.

    Pure string rewriting — no parsing library, so the exact same regex
    chain is replayable in any engine (the gate's DuckDB twin)."""
    c = F.col(col) if isinstance(col, str) else col
    # 1: scheme+host lowercase (authority = up to first / ? # after //)
    u = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"#.*$", "")  # 2: fragment
    # 3: default ports — capture-group form (no lookahead: the DuckDB twin
    # runs on RE2, which has none)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80($|[/?#].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443($|[/?#].*)", r"$1$2")
    params = "|".join(TRACKING_PARAMS)
    u = F.regexp_replace(u, rf"([?&])(?:{params})=[^&#]*", r"$1")  # 4
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5: trailing path slash (also when a query follows) on non-root paths
    u = F.regexp_replace(u, r"(://[^/?#]*/.+?)/([?#]|$)", r"$1$2")
    return u


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """(src, final, hops, cyclic) — the terminal target of every
    redirect chain, by POINTER DOUBLING: each round joins the mapping
    with itself, so a chain of length L resolves in ceil(log2 L) joins,
    not L — ``max_hops=32`` costs 5 self-joins however long the chains.

    ``redirects`` is the single-successor edge set a crawl emits from
    3xx captures (one Location per source URL; duplicate sources are
    rejected upstream by construction — a URL redirects to one place at
    a given snapshot). Rows whose chain exceeds ``max_hops`` after the
    doubling rounds still point at a source URL — those are loops (or
    over-long chains, same crawl policy): flagged ``cyclic`` with
    ``final`` NULL, exactly how a crawler treats redirect cycles.

    Scale shape: each round is ONE equi-join of the mapping with itself
    on an 8-byte-hashable key plus a coalesce — no windows, no
    iteration proportional to chain length, localCheckpoint-free
    because the loop depth is a constant 5."""
    import math

    m = redirects.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("n_src"),
            F.col("cur").alias("n_cur"),
            F.col("hops").alias("n_hops"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["n_src"], "left")
            .select(
                "src",
                F.coalesce("n_cur", "cur").alias("cur"),
                (
                    F.col("hops")
                    + F.coalesce(F.col("n_hops"), F.lit(0))
                ).alias("hops"),
            )
        )
    # a cur that is still someone's source after the rounds is a cycle
    # (or an over-max chain): final unusable either way
    srcs = redirects.select(F.col(src_col).alias("cur")).distinct()
    return (
        m.join(srcs.withColumn("__loop", F.lit(True)), on="cur", how="left")
        .select(
            "src",
            F.when(F.col("__loop").isNotNull(), None)
            .otherwise(F.col("cur"))
            .alias("final"),
            "hops",
            F.col("__loop").isNotNull().alias("cyclic"),
        )
    )


def dedup_by_url(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per canonical URL: the EARLIEST capture wins (min ts, tie
    -> min raw url — fully deterministic). Adds ``canonical_url`` and
    ``n_captures``; all original columns of the winning row are kept.
    One hash aggregation on the canonical key (max_by struct)."""
    with_canon = pages.withColumn("canonical_url", canonical_url(url_col))
    others = [c for c in pages.columns]
    return (
        with_canon.groupBy("canonical_url")
        .agg(
            F.min_by(
                F.struct(*others),
                F.struct(F.col(ts_col), F.col(url_col)),
            ).alias("w"),
            F.count("*").alias("n_captures"),
        )
        .select("canonical_url", "w.*", "n_captures")
    )


def page_identity(
    pages: DataFrame,
    *hint_frames: DataFrame,
    redirects: DataFrame | None = None,
    url_col: str = "url",
    hashed: bool = False,
    max_target_indegree: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """(url, page_id) — one canonical page identity per crawled URL, by
    merging every same-document signal a crawl emits into one connected-
    components pass over CANONICALIZED endpoints:

    - cosmetic URL variants (tracking params, fragments, default ports)
      collapse for free because every endpoint passes through
      :func:`canonical_url` before becoming a graph node;
    - ``hint_frames``: any number of (url, target) declaration streams —
      rel=canonical from ``extract.extract_head_meta``, og:url rows from
      ``extract.extract_og_properties``, sitemap <loc> hints — NULL or
      empty targets are skipped;
    - ``redirects``: raw 3xx (src, dst) edges; chains weld transitively
      through CC, so no pointer-doubling resolution is needed here (a
      redirect CYCLE welds into one identity too — for crawl-policy
      verdicts on cycles use :func:`resolve_redirects`, which flags
      them).

    ``page_id`` = min canonical URL in the identity group (the
    :func:`prase_spark.matching.connected_components` convention);
    pages with no signals keep their own canonical URL via self-loops.
    Scale shape: edge streams are unions of one-projection scans; the
    only shuffles are CC's, which runs on the (tiny relative to the
    corpus) declared-identity subgraph plus self-loops. ``stats_out``
    receives n_pages / n_hint_edges / n_redirect_edges telemetry.

    ``hashed=True`` is the 10^12-URL path (the DEPLOY.md doctrine): CC
    iterates over ``xxhash64`` node keys — 8-byte shuffle rows instead
    of URL strings — and the min-URL representative is recovered with
    one node-table join + one per-component min afterwards. Output is
    IDENTICAL to the string mode (pytest-pinned) unless two distinct
    canonical URLs collide in 64 bits (P ≈ n²·2⁻⁶⁴ — audit with
    ``stats_out['n_nodes']`` against distinct page_id count).

    ``max_target_indegree`` is the mega-cluster guard: hint/redirect
    edges into a target exceeding the cap are dropped (with
    ``n_hot_targets``/``n_edges_dropped`` telemetry) before CC — a
    legitimate identity group is the variants+redirects of ONE
    document, so a super-capacity target is a template bug, not
    evidence."""
    from prase_spark.matching import components_min_label

    base = pages.select(
        F.col(url_col).alias("url"), canonical_url(url_col).alias("__cu")
    )
    edges = base.select(F.col("__cu").alias("src"), F.col("__cu").alias("dst"))
    n_hints = 0
    for hf in hint_frames:
        u, t = hf.columns[0], hf.columns[1]
        h = (
            hf.filter(F.col(t).isNotNull() & (F.col(t) != ""))
            .select(
                canonical_url(u).alias("src"), canonical_url(t).alias("dst")
            )
        )
        if stats_out is not None:
            n_hints += h.count()
        edges = edges.unionByName(h)
    if redirects is not None:
        r = redirects.select(
            canonical_url(redirects.columns[0]).alias("src"),
            canonical_url(redirects.columns[1]).alias("dst"),
        )
        if stats_out is not None:
            stats_out["n_redirect_edges"] = r.count()
        edges = edges.unionByName(r)
    if max_target_indegree is not None:
        # mega-cluster guard (the DEPLOY doctrine): a template bug that
        # points a whole site at ONE canonical/og:url target would weld
        # the site into a single identity. A legitimate identity group
        # is variants+redirects of one document, so its target in-degree
        # is small; drop hint edges into super-capacity targets, with
        # telemetry. Self-loops are exempt (they only label the page
        # itself).
        hint_e = edges.where(F.col("src") != F.col("dst"))
        deg = hint_e.groupBy("dst").count()
        hot = deg.where(F.col("count") > max_target_indegree).select("dst")
        if stats_out is not None:
            stats_out["n_hot_targets"] = hot.count()
            stats_out["n_edges_dropped"] = (
                hint_e.join(hot, "dst", "left_semi").count()
            )
        edges = (
            edges.where(F.col("src") == F.col("dst"))
            .unionByName(hint_e.join(hot, "dst", "left_anti"))
        )
    if stats_out is not None:
        stats_out["n_pages"] = base.count()
        stats_out["n_hint_edges"] = n_hints
    lab = components_min_label(edges, hashed=hashed, stats_out=stats_out)
    return (
        base.join(lab, base["__cu"] == lab["node"], "left")
        .select("url", F.coalesce("label", "__cu").alias("page_id"))
    )
