"""Temperature-based mixture sampling (datapipe.sampling): exact weight
arithmetic vs a pure-Python integer oracle, the head-vs-tail rebalancing
property the operator exists for, deterministic membership, and the cap."""

import math

from pyspark.sql import functions as F

from prase_spark.datapipe.sampling import (
    hash_sample,
    temperature_sample,
    temperature_weights,
)


def _oracle_weights(sizes, target_frac):
    f_e6 = int(round(target_frac * 1_000_000))
    w = {s: math.isqrt(n) for s, n in sizes.items()}
    S, N = sum(w.values()), sum(sizes.values())
    out = {}
    for s, n in sizes.items():
        raw = (2 * f_e6 * N * w[s] + S * n) // (2 * S * n)
        out[s] = (n, w[s], min(1_000_000, raw))
    return out


def _docs(spark, sizes):
    rows, i = [], 0
    for s, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, src string")


def test_weights_match_integer_oracle(spark):
    sizes = {"en": 4000, "de": 400, "sw": 16, "yo": 1}
    docs = _docs(spark, sizes)
    got = {
        r["stratum"]: (r["n_size"], r["weight"], r["keep_e6"])
        for r in temperature_weights(docs, "src", target_frac=0.5).collect()
    }
    assert got == _oracle_weights(sizes, 0.5)
    # the rebalancing property: keep-rate strictly rises as sources shrink
    keeps = [got[s][2] for s in ("en", "de", "sw", "yo")]
    assert keeps == sorted(keeps)
    # tiny sources hit the min(1, .) cap — kept whole, never upsampled
    assert got["yo"][2] == 1_000_000


def test_size_col_weighting(spark):
    docs = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 44), (3, "b", 9)],
        "doc_id long, src string, n_tokens long",
    )
    got = {
        r["stratum"]: (r["n_size"], r["weight"])
        for r in temperature_weights(
            docs, "src", size_col="n_tokens", target_frac=1.0
        ).collect()
    }
    assert got == {"a": (144, 12), "b": (9, 3)}


def test_sample_composes_with_stratified_membership(spark):
    sizes = {"en": 2000, "sw": 50}
    docs = _docs(spark, sizes)
    kept = temperature_sample(docs, "src", target_frac=0.5, seed=7)
    rates = {
        r["stratum"]: r["keep_e6"]
        for r in temperature_weights(docs, "src", target_frac=0.5).collect()
    }
    # membership is exactly hash_sample at the stratum's computed rate
    for src in sizes:
        expect = hash_sample(
            docs.filter(F.col("src") == src), rates[src] / 1e6, seed=7
        )
        got_ids = {r["doc_id"] for r in kept.filter(F.col("src") == src).collect()}
        exp_ids = {r["doc_id"] for r in expect.collect()}
        assert got_ids == exp_ids, src
    # determinism: a second run keeps identical rows
    again = {r["doc_id"] for r in temperature_sample(docs, "src", target_frac=0.5, seed=7).collect()}
    assert again == {r["doc_id"] for r in kept.collect()}


def test_null_stratum_rated_and_sampled(spark):
    from prase_spark.datapipe.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en") for i in range(100)] + [(i, None) for i in range(100, 160)],
        "doc_id long, src string",
    )
    # weights allocate mass to the NULL source...
    w = {r["stratum"]: r["keep_e6"] for r in
         temperature_weights(docs, "src", target_frac=0.5).collect()}
    assert None in w and w[None] > 0
    # ...and sampling honors it: the NULL stratum keeps rows at its own
    # rate instead of silently falling to default_rate=0
    kept = temperature_sample(docs, "src", target_frac=0.5, seed=7)
    null_kept = {r["doc_id"] for r in kept.filter(F.col("src").isNull()).collect()}
    expect = {
        r["doc_id"]
        for r in hash_sample(
            docs.filter(F.col("src").isNull()), w[None] / 1e6, seed=7
        ).collect()
    }
    assert null_kept == expect and null_kept
    # an explicit None key in plain stratified_sample behaves the same way
    direct = stratified_sample(
        docs, {None: w[None] / 1e6, "en": 0.0}, "src", default_rate=0.0, seed=7
    )
    assert {r["doc_id"] for r in direct.collect()} == expect


def test_zero_and_null_size_strata_keep_nothing(spark):
    """ADVICE r4: a stratum whose size_col sums to 0 (or NULL) used to
    produce keep_e6 = NULL (decimal division by zero) and a TypeError in
    temperature_sample's driver-side rate collect. It must rate to 0."""
    docs = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 60), (3, "empty", 0), (4, "nul", None)],
        "doc_id long, src string, n_chars long",
    )
    w = {r["stratum"]: r["keep_e6"] for r in
         temperature_weights(docs, "src", size_col="n_chars",
                             target_frac=0.5).collect()}
    assert w["empty"] == 0 and w["nul"] == 0
    assert 0 < w["en"] <= 1_000_000
    # the sample no longer raises, and degenerate strata keep nothing
    kept = temperature_sample(docs, "src", size_col="n_chars",
                              target_frac=0.5, seed=7)
    assert {r["src"] for r in kept.collect()} <= {"en"}
