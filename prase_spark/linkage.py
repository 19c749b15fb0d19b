"""Probabilistic record linkage: Fellegi-Sunter agreement-pattern
scoring (Fellegi & Sunter, JASA 1969) — the decision-theoretic layer
between blocking and PARIS.

Where this sits: the blockers (nameblock, metablock, setjoin) produce
candidate pairs; PARIS scores them through relation evidence. When the
two sides carry comparable FIELDS (name, host, type, numeric attrs),
the classical linkage model scores a pair by its agreement PATTERN: for
each feature i, m_i = P(agree | match) and u_i = P(agree | non-match),
estimated by counting over a labeled seed; a pair with pattern gamma
gets the likelihood ratio prod_i (m_i/u_i)^[agree] * ((1-m_i)/(1-u_i))^
[disagree]. Patterns above the acceptance threshold link, below the
rejection threshold clerical-review or drop.

Determinism/doctrine split:
- Everything CORPUS-SIZED (agreement vectors, per-feature counts,
  pattern assignment) is native DataFrame arithmetic with exact
  integers — SQL-twin-able and gate-hashed.
- The m/u RATIOS and the per-pattern likelihood products are unbounded-
  magnitude rationals (products of count ratios overflow any fixed
  decimal at realistic feature counts), so they are computed DRIVER-SIDE
  over the k-feature count table (k rows, a bounded collect per the
  repo's model-table doctrine) with exact ``fractions.Fraction``
  arithmetic — no floats anywhere — and verified by a pure-Python pytest
  replica rather than a SQL twin (the TransE/SGNS precedent for
  non-SQL-representable math).

Scale shape: agreement vectors are one projection over the candidate
join (no shuffle beyond the candidate build); feature counts are one
hash agg over candidates + one over gold; the pattern -> decision map is
at most 2^k rows, broadcast back. Nothing corpus-sized crosses the
driver.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agreement_vectors(
    cand: DataFrame,
    left: DataFrame,
    right: DataFrame,
    features: dict[str, tuple[str, str]],
) -> DataFrame:
    """(key_l, key_r, pattern, agr_<f>...): per candidate pair, one 0/1
    agreement flag per feature (exact equality of the configured
    columns; normalize upstream) and the packed ``pattern`` bitmask
    (feature order = dict order, bit i = feature i). ``left``/``right``
    must be keyed by ``key``; ``cand`` carries (key_l, key_r)."""
    l = left.select(
        F.col("key").alias("key_l"),
        *[F.col(lc).alias(f"__l_{name}") for name, (lc, _) in features.items()],
    )
    r = right.select(
        F.col("key").alias("key_r"),
        *[F.col(rc).alias(f"__r_{name}") for name, (_, rc) in features.items()],
    )
    out = cand.select("key_l", "key_r").join(l, "key_l").join(r, "key_r")
    pattern = F.lit(0).cast("long")
    cols = []
    for i, name in enumerate(features):
        agr = (
            F.col(f"__l_{name}").isNotNull()
            & F.col(f"__r_{name}").isNotNull()
            & (F.col(f"__l_{name}") == F.col(f"__r_{name}"))
        ).cast("long")
        cols.append(agr.alias(f"agr_{name}"))
        pattern = pattern + agr * F.lit(1 << i).cast("long")
    return out.select("key_l", "key_r", pattern.alias("pattern"), *cols)


def fs_counts(
    agr: DataFrame, gold: DataFrame, features: dict[str, tuple[str, str]]
) -> DataFrame:
    """One row per feature: (feature, mn, md, un, ud) — agreement counts
    among gold matches (mn of md) and among non-gold candidates (un of
    ud). Candidates are split by one broadcast semi/anti join against
    the gold pair set; counts are a single hash agg each."""
    g = F.broadcast(gold.select("key_l", "key_r").distinct())
    m = agr.join(g, ["key_l", "key_r"], "left_semi")
    u = agr.join(g, ["key_l", "key_r"], "left_anti")

    def _agg(df: DataFrame, n_col: str, d_col: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(d_col)] + [
            F.sum(f"agr_{name}").alias(f"__{n_col}_{name}") for name in features
        ]
        row = df.agg(*aggs)
        stack = ", ".join(
            f"'{name}', __{n_col}_{name}" for name in features
        )
        return row.selectExpr(
            f"stack({len(features)}, {stack}) AS (feature, {n_col})", d_col
        )

    return _agg(m, "mn", "md").join(_agg(u, "un", "ud"), "feature")


def fs_pattern_weights(
    counts_rows: list, features: dict[str, tuple[str, str]]
) -> dict[int, Fraction]:
    """pattern bitmask -> exact likelihood ratio, from the collected
    (feature, mn, md, un, ud) rows. Laplace-smoothed: m = (mn+1)/(md+2),
    u = (un+1)/(ud+2), so zero-count features stay finite. Pure
    ``Fraction`` arithmetic — exact at any magnitude."""
    by_name = {r["feature"]: r for r in counts_rows}
    order = list(features)
    out: dict[int, Fraction] = {}
    for p in range(1 << len(order)):
        w = Fraction(1)
        for i, name in enumerate(order):
            r = by_name[name]
            m = Fraction(int(r["mn"]) + 1, int(r["md"]) + 2)
            u = Fraction(int(r["un"]) + 1, int(r["ud"]) + 2)
            w *= (m / u) if (p >> i) & 1 else ((1 - m) / (1 - u))
        out[p] = w
    return out


def fellegi_sunter(
    cand: DataFrame,
    left: DataFrame,
    right: DataFrame,
    gold: DataFrame,
    features: dict[str, tuple[str, str]],
    accept: Fraction | int = 1,
) -> DataFrame:
    """The composed linkage: agreement vectors -> per-feature m/u counts
    -> exact per-pattern likelihood ratios (driver-side Fractions over
    <= 2^k patterns) -> broadcast decision join. Returns (key_l, key_r,
    pattern, is_match) where is_match = weight(pattern) >= ``accept``.
    The accepted-pattern set is emitted as data, so downstream engines
    replay the decision without re-deriving the rationals."""
    agr = agreement_vectors(cand, left, right, features).localCheckpoint()
    counts = fs_counts(agr, gold, features).collect()
    weights = fs_pattern_weights(counts, features)
    acc = Fraction(accept)
    spark = agr.sparkSession
    dec = spark.createDataFrame(
        [(p, w >= acc) for p, w in weights.items()], "pattern LONG, is_match BOOLEAN"
    )
    return agr.select("key_l", "key_r", "pattern").join(
        F.broadcast(dec), "pattern"
    ).select("key_l", "key_r", "pattern", "is_match")
