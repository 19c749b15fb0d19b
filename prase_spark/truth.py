"""Truth discovery / conflict resolution over multi-source claims.

A 10^12-document crawl asserts the same ``(subj, pred)`` slot from many
pages, and the assertions conflict: infoboxes disagree with JSON-LD,
stale mirrors disagree with the origin, spam farms collude on wrong
values. The reference stops at entity alignment (objects/KGs.py emits
links and triples; it never reconciles conflicting attribute values) —
but a constructed KG is only as good as the value it keeps per slot, so
conflict resolution is a first-class construction step here
(Knowledge-Vault-style fusion, Dong et al. 2014; TruthFinder, Yin 2008).

The classic algorithms iterate two coupled estimates — claim belief from
source trust, source trust from claim belief — through transcendental
link functions (TruthFinder's ``1 - exp(-γ Σ ...)`` sigmoid). Those are
un-gate-able under this repo's exact-integer doctrine, so
:func:`truth_discovery` uses the *proportional-share* member of the
family, which needs only integer sums and floor division and is
therefore bit-identical on every engine, partitioning, and cluster
size:

- **belief**: a claim's raw belief is the sum of its voters' trust; its
  *share* is that sum's proportion of all trust mass asserted on the
  same ``(subj, pred)`` slot, quantized onto ``[0, scale]``;
- **trust**: a source's trust is the floor-mean share of its claims —
  reliable sources win their slots (share → ``scale``), unreliable ones
  watch their claims crushed by the honest majority (share → 0).

Starting from uniform trust, iteration 1 *is* trust-weighted majority
vote; further iterations transfer trust away from sources whose claims
keep losing, which lets a trusted minority overturn a colluding
majority (pytest pins exactly that flip).

Scale shape (the same bipartite message-passing as ``pagerank``):

- each iteration is two hash-aggregations and two equi-joins — votes ⋈
  trust on ``source`` then groupBy claim; slot totals groupBy
  ``(subj, pred)`` joined back; votes ⋈ belief then groupBy ``source``.
  No windows, no global scalar job, no driver-side collect; every
  aggregation is an associative integer sum with map-side partial
  aggregation, so hot slots and hot sources shard cleanly.
- the share quantizer keeps every intermediate product under
  ``~10^18``: the ratio ``braw * scale / tot`` is computed as
  ``(braw DIV d) * scale DIV (tot DIV d)`` with
  ``d = 1 + tot DIV share_quantum`` — both operands of the multiply are
  bounded by ``share_quantum``/``scale``, so no DECIMAL(38) and no
  overflow at any voter count. Keep ``max_voters_per_slot * scale``
  under 2^63 for the raw sums (same doctrine as ``PAGERANK_SCALE``:
  pass ``scale=10**9`` for slots hotter than ~9M voters).
- lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` iterations (the PARIS-fixpoint doctrine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: trust/belief fixed-point scale: 1.0 == 10^12 (pagerank doctrine).
TRUST_SCALE = 10**12

#: share-ratio quantizer: the slot share keeps ~6 significant digits.
SHARE_QUANTUM = 10**6


def _share_sql(braw: str, tot: str, scale: int, quantum: int) -> str:
    """Integer SQL for ``braw * scale / tot`` without overflow.

    ``d = 1 + tot DIV quantum`` right-shifts both operands so the
    multiply is bounded by ``quantum * scale``; exact when
    ``tot < quantum``, else correct to ~1/quantum relative error —
    deterministically identical in Spark (``DIV``) and DuckDB (``//``)
    because every operand is nonnegative.
    """
    d = f"(CAST(1 AS BIGINT) + {tot} DIV {quantum})"
    return (
        f"CASE WHEN {tot} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE (({braw} DIV {d}) * CAST({scale} AS BIGINT)) "
        f"DIV ({tot} DIV {d}) END"
    )


def truth_discovery(
    claims: DataFrame,
    iterations: int = 3,
    scale: int = TRUST_SCALE,
    share_quantum: int = SHARE_QUANTUM,
    checkpoint_every: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Iterative proportional-share truth discovery.

    ``claims`` carries one row per assertion with columns
    ``(source, subj, pred, obj)``; duplicate assertions of the same
    claim by the same source are collapsed (a source gets one vote per
    claim no matter how many pages repeat it — the standard one-voter
    rule, and the property that makes ``COUNT(*)`` below equal the
    source's claim count).

    Returns ``(belief, trust)``:

    - ``belief``: ``(subj, pred, obj, conf_e12)`` — the final-iteration
      slot share of every distinct claim, on ``[0, scale]``;
    - ``trust``: ``(source, trust_e12)`` — the mean share of each
      source's claims after the last belief update.

    With ``iterations=1`` the belief IS uniform-trust majority share —
    the natural baseline the pytest contrasts against.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")

    votes = (
        claims.select("source", "subj", "pred", "obj").distinct().persist()
    )
    n_claims = votes.groupBy("source").agg(
        F.count("*").alias("n_claims")
    ).persist()
    n_claims.count()

    trust = n_claims.select(
        "source", F.lit(scale).cast("long").alias("trust_e12")
    )
    belief = None
    for i in range(iterations):
        braw = (
            votes.join(trust, "source")
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("trust_e12").alias("braw"))
        )
        tot = braw.groupBy("subj", "pred").agg(
            F.sum("braw").alias("tot")
        )
        belief = braw.join(tot, ["subj", "pred"]).selectExpr(
            "subj",
            "pred",
            "obj",
            _share_sql("braw", "tot", scale, share_quantum)
            + " AS conf_e12",
        )
        trust = (
            votes.join(belief, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.sum("conf_e12").alias("csum"), F.count("*").alias("n"))
            .selectExpr("source", "csum DIV n AS trust_e12")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            belief = belief.localCheckpoint()
            trust = trust.localCheckpoint()

    return belief, trust


def resolve_facts(belief: DataFrame) -> DataFrame:
    """Pick the winning object per ``(subj, pred)`` slot.

    Highest final belief wins; exact ties break to the lexicographically
    smallest object so the result is total-ordered and gate-hashable.
    One aggregation: ``min_by`` over the ``(-conf, obj)`` struct (conf
    is an integer, so negation is exact — the ADVICE r4 caveat about
    negating string keys does not apply; ``obj`` itself is the string
    tiebreak column, never negated).

    Returns ``(subj, pred, obj, conf_e12)``.
    """
    return belief.groupBy("subj", "pred").agg(
        F.expr(
            "min_by(struct(obj, conf_e12), struct(-conf_e12, obj))"
        ).alias("w")
    ).select(
        "subj", "pred", F.col("w.obj").alias("obj"),
        F.col("w.conf_e12").alias("conf_e12"),
    )
