"""Unigram language-model quality scoring — the CCNet-style "perplexity
against a reference corpus" curation signal, re-expressed as two native
DataFrame passes (no Python in the hot path).

CCNet/Gopher-class pipelines rank documents by how probable a trusted
LM finds their text; gibberish, mangled encodings, and keyword-stuffed
spam all score badly. The full n-gram KenLM is out of scope for a
container with no model artifacts, but the unigram version is the same
pipeline shape and already separates word-soup from prose: train a
unigram distribution on a reference corpus (or the corpus itself), then
score each document's per-token cross-entropy under add-alpha smoothing.

Scale shape (the part that must survive 10^12 docs):
- :func:`unigram_vocab` is explode -> groupBy(term) with map-side
  partial counts — ONE shuffle bounded by distinct-token cardinality,
  then a top-V truncation (row_number over a single global ordering of
  at most |vocab| rows, NOT the corpus).
- :func:`lm_score` broadcasts the top-V vocab (V * ~24 bytes — 100k
  terms is ~2.4 MB, far under any broadcast threshold) and runs
  explode -> BroadcastHashJoin -> groupBy(key). All tokens of a doc
  stay in their partition through the join (explode and a broadcast
  join never repartition), so the partial aggregate collapses to ~one
  row per doc BEFORE the exchange: the only shuffle carries |docs|
  rows, not |tokens|.
- The double-typed ``cross_entropy`` is for ranking/thresholding;
  per the repo's cross-engine discipline the gate hashes the exact
  integer surfaces (``n_tokens``, ``oov_cnt``, ``freq_sum``,
  ``avg_freq_e4``) and pytest value-checks the entropy against a pure
  Python oracle (transcendental log2 is not cross-engine bit-stable).

No reference analog (the reference consumes pre-built triples; see
SURVEY.md §2 'beyond-reference curation suite').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prase_spark.datapipe.textstats import tokens

__all__ = [
    "unigram_vocab",
    "lm_score",
    "bigram_vocab",
    "lm_score_bigram",
    "unigram_vocab_hashed",
    "bigram_vocab_hashed",
    "lm_score_bigram_hashed",
]


def _top_k_by_count(counts: DataFrame, k: int, key_col: str) -> DataFrame:
    """Top-``k`` rows by (cnt DESC, key ASC) — same rows as
    ``orderBy(...).limit(k)``, but scale-safe.

    A bare orderBy().limit(k) compiles to TakeOrderedAndProject: every
    partition keeps a k-row heap and the DRIVER merges P x k rows — at
    web scale (10^9 distinct bigrams, large k, hundreds of partitions)
    that single-threaded merge is the job's serial fraction, and it
    GROWS with cluster size. Here a count-threshold prefilter shrinks
    the input to ~k rows first: pick an approximate (1 - k/n) quantile
    of cnt, keep cnt >= t (PROVABLY a superset of the true top-k for
    any t <= the k-th largest cnt; verified and lowered until the
    superset holds), then run the same deterministic orderBy+limit on
    the ~k survivors. Ties at the boundary resolve identically because
    the final ordering is unchanged. Costs two cheap extra jobs on the
    aggregated table; the driver merge drops from P x k to ~k rows.

    The aggregated ``counts`` is pinned for the helper's multiple jobs
    (each would otherwise re-run the corpus explode+groupBy) and the
    k-row result is materialized eagerly so the pin can be released
    before returning — vocab tables are model artifacts the callers
    persist/broadcast anyway."""
    counts = counts.persist()
    try:
        n = counts.count()
        if n > k:
            q = max(0.0, 1.0 - (1.25 * k) / n)
            t = counts.stat.approxQuantile("cnt", [q], 0.01)[0]
            t = max(int(t), 1)
            pre = counts.filter(F.col("cnt") >= F.lit(t))
            while t > 1 and pre.count() < k:
                t = max(t // 2, 1)
                pre = counts.filter(F.col("cnt") >= F.lit(t))
        else:
            pre = counts
        res = pre.orderBy(F.col("cnt").desc(), F.col(key_col).asc()).limit(k).persist()
        res.count()
        return res
    finally:
        counts.unpersist()


def unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_v: int = 100_000,
) -> DataFrame:
    """(term, cnt): corpus unigram counts, truncated to the ``top_v``
    most frequent terms (ties broken lexically so the vocabulary is
    deterministic). One shuffle, map-side combinable; the top-V cut
    happens on the already-aggregated term table."""
    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return _top_k_by_count(counts, top_v, "term")


def lm_score(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document unigram-LM statistics against a ``(term, cnt)``
    vocabulary (normally :func:`unigram_vocab` output, possibly trained
    on a DIFFERENT, trusted corpus — the CCNet setup).

    Returns one row per input document:

    - ``n_tokens`` — token count (0-token docs are kept, all-zero row);
    - ``oov_cnt`` — tokens absent from the vocabulary;
    - ``freq_sum`` — sum of the corpus counts of the doc's tokens
      (BIGINT-exact; OOV contributes 0);
    - ``avg_freq_e4`` — mean corpus frequency of the doc's tokens,
      exact-integer half-up x 1e4 (the gate-hashable rank signal:
      word soup scores low, stopword-heavy template text high);
    - ``cross_entropy`` — -(1/n) * sum log2 p(tok), add-``alpha``
      smoothing over V+1 outcomes (every OOV token maps to one UNK
      bucket): p(tok) = (cnt + alpha) / (total + alpha * (V + 1)).
      Double-typed, ranking use only.

    The vocab side is broadcast explicitly — the corpus side never
    shuffles before its per-doc partial aggregate (see module note)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    totals = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t"),
        F.count("*").alias("v"),
    ).collect()[0]
    total, v_size = int(totals["t"]), int(totals["v"])
    denom = float(total) + alpha * (v_size + 1)

    pairs = docs.select(
        F.col(key_col).alias("key"), F.explode(tokens(text_col)).alias("term")
    ).join(F.broadcast(vocab), "term", "left")
    logp = F.log2((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha)) / F.lit(denom))
    scored = pairs.groupBy("key").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("cnt").isNull().cast("long")).alias("oov_cnt"),
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("freq_sum"),
        (-F.sum(logp) / F.count("*")).alias("cross_entropy"),
    )
    return docs.select(F.col(key_col).alias("key")).join(
        scored, "key", "left"
    ).select(
        "key",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("oov_cnt", F.lit(0)).cast("long").alias("oov_cnt"),
        F.coalesce("freq_sum", F.lit(0)).cast("long").alias("freq_sum"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(2 * freq_sum * 10000 + n_tokens) div (2 * n_tokens)"),
        ).otherwise(F.lit(0)).cast("long").alias("avg_freq_e4"),
        F.coalesce("cross_entropy", F.lit(0.0)).alias("cross_entropy"),
    )


def bigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_b: int = 1_000_000,
) -> DataFrame:
    """(bigram, cnt): corpus bigram counts ('w1 w2', space-joined),
    truncated to the ``top_b`` most frequent (ties lexical). Same
    distributed top-k shape as :func:`unigram_vocab` — one groupBy
    shuffle bounded by distinct-bigram cardinality, TakeOrderedAndProject
    truncation. The Brants et al. 'stupid backoff' observation is that a
    count-truncated model loses almost nothing at web scale: the head
    bigrams carry the probability mass and everything below the cut
    backs off to unigrams anyway."""
    if top_b < 1:
        raise ValueError(f"top_b must be >= 1, got {top_b}")
    from prase_spark.datapipe.textstats import word_ngrams

    # token array MATERIALIZED in its own projection before the n-gram
    # transform: word_ngrams slices the array per element, and an inline
    # tokens() there re-runs the regex tokenizer per slice — O(tokens^2)
    # regex work per doc (measured 190x on 800-token pages; the same HOF
    # trap chunking and rare_term_ratio already guard against)
    counts = (
        docs.select(tokens(text_col).alias("__t"))
        .select(F.explode(word_ngrams(F.col("__t"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )
    return _top_k_by_count(counts, top_b, "bigram")


def _token_hashes(toks) -> F.Column:
    """array<long>: xxhash64 of each token — each token hashed ONCE, so a
    bigram key can be derived from two longs instead of re-hashing (or
    worse, concatenating) the strings per adjacent pair."""
    return F.transform(toks, lambda w: F.xxhash64(w))


def _bigram_hash_keys(hashes) -> F.Column:
    """array<long> of bigram keys from a token-HASH array: key(i) =
    xxhash64(h[i], h[i+1]). Same two-slice zip_with shape as
    :func:`word_ngrams` n=2 (empty for docs shorter than 2), but the
    zipped payloads are 8-byte longs and the output allocates no
    strings."""
    m = F.greatest(F.size(hashes) - 1, F.lit(0))
    return F.zip_with(
        F.slice(hashes, 1, m),
        F.slice(hashes, 2, m),
        lambda cur, nxt: F.xxhash64(cur, nxt),
    )


def unigram_vocab_hashed(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_v: int = 100_000,
) -> DataFrame:
    """(tkey BIGINT, cnt): hashed twin of :func:`unigram_vocab` —
    ``tkey = xxhash64(term)``, counts identical modulo hash collisions.

    This is the web-scale model-build path (Talbot & Osborne 2007-style
    randomized LM storage; Brants et al. 2007 §4 distributes on hashed
    grams): the groupBy shuffle carries 8-byte longs instead of terms,
    and downstream scoring probes broadcast maps with integer equality.
    Collision risk is the documented trade: for V distinct terms the
    chance of ANY xxhash64 collision is ~V^2/2^65 (10^9 terms -> ~2.7%
    chance of ONE merged pair corpus-wide), which perturbs a ranking
    signal by at most one term's mass — acceptable for curation scoring,
    not for exact-count reporting (use the string twin there).

    Ties at the top-``top_v`` boundary break on tkey ASC (deterministic,
    but a DIFFERENT tie order than the string twin's lexical break —
    equal-count boundary terms may differ between the two models)."""
    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .select(F.xxhash64("term").alias("tkey"))
        .groupBy("tkey")
        .agg(F.count("*").alias("cnt"))
    )
    return _top_k_by_count(counts, top_v, "tkey")


def bigram_vocab_hashed(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_b: int = 1_000_000,
) -> DataFrame:
    """(bkey BIGINT, cnt): hashed twin of :func:`bigram_vocab` with
    ``bkey = xxhash64(xxhash64(w1), xxhash64(w2))`` — no 'w1 w2' concat
    string is ever built, and the distinct-bigram shuffle (the measured
    bottleneck of the LM scaling read: bigram strings average ~15-25
    bytes + offsets vs a fixed 8-byte long) carries fixed-width integer
    rows. Same collision/tie caveats as :func:`unigram_vocab_hashed`."""
    if top_b < 1:
        raise ValueError(f"top_b must be >= 1, got {top_b}")
    counts = (
        docs.select(tokens(text_col).alias("__t"))
        .select(F.explode(_bigram_hash_keys(_token_hashes(F.col("__t")))).alias("bkey"))
        .groupBy("bkey")
        .agg(F.count("*").alias("cnt"))
    )
    return _top_k_by_count(counts, top_b, "bkey")


def lm_score_bigram_hashed(
    docs: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    alpha: float = 1.0,
    backoff: float = 0.4,
) -> DataFrame:
    """Hashed twin of :func:`lm_score_bigram`: same stupid-backoff math,
    same output schema, but ``vocab`` is a (tkey, cnt) table from
    :func:`unigram_vocab_hashed` and ``bigrams`` a (bkey, cnt) table from
    :func:`bigram_vocab_hashed`. The document side hashes each token once
    (`_token_hashes`), derives bigram keys from the hash array, and takes
    the three BroadcastHashJoins on LONG keys — integer probe + no
    string allocation per gram, which is where the string path's 32-core
    leg lost its scaling (measured: the per-gram concat + string
    hashing/equality dominates the scoring stage's CPU).

    Value contract vs the string twin: identical integer surfaces
    (n_bigrams / seen_cnt / bigram_freq_sum) and cross_entropy equal up
    to float-sum ordering, PROVIDED no xxhash64 collision among the
    corpus's distinct terms/bigrams and no count-tie at either top-k
    boundary (tie-break keys differ); pytest pins this on a fixture."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if not 0.0 < backoff <= 1.0:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    totals = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t"), F.count("*").alias("v")
    ).collect()[0]
    denom = float(int(totals["t"])) + alpha * (int(totals["v"]) + 1)

    hs = _token_hashes(F.col("__t"))
    m = F.greatest(F.size(F.col("__h")) - 1, F.lit(0))
    pairs = (
        docs.select(F.col(key_col).alias("key"), tokens(text_col).alias("__t"))
        .select("key", hs.alias("__h"))
        .select(
            "key",
            F.explode(
                F.zip_with(
                    F.slice(F.col("__h"), 1, m),
                    F.slice(F.col("__h"), 2, m),
                    lambda cur, nxt: F.struct(
                        F.xxhash64(cur, nxt).alias("bkey"),
                        cur.alias("k1"),
                        nxt.alias("k2"),
                    ),
                )
            ).alias("g"),
        )
        .select("key", "g.bkey", "g.k1", "g.k2")
    )
    joined = (
        pairs.join(F.broadcast(bigrams), "bkey", "left")
        .join(
            F.broadcast(vocab.select(F.col("tkey").alias("k1"), F.col("cnt").alias("__c1"))),
            "k1",
            "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("tkey").alias("k2"), F.col("cnt").alias("__c2"))),
            "k2",
            "left",
        )
    )
    seen = F.col("cnt").isNotNull() & F.col("__c1").isNotNull()
    score = F.when(seen, F.col("cnt") / F.col("__c1")).otherwise(
        F.lit(backoff)
        * (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(alpha))
        / F.lit(denom)
    )
    scored = joined.groupBy("key").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(seen.cast("long")).alias("seen_cnt"),
        F.sum(F.when(seen, F.col("cnt")).otherwise(F.lit(0))).alias(
            "bigram_freq_sum"
        ),
        (-F.sum(F.log2(score)) / F.count("*")).alias("cross_entropy"),
    )
    return docs.select(F.col(key_col).alias("key")).join(
        scored, "key", "left"
    ).select(
        "key",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("seen_cnt", F.lit(0)).cast("long").alias("seen_cnt"),
        F.coalesce("bigram_freq_sum", F.lit(0)).cast("long").alias("bigram_freq_sum"),
        F.coalesce("cross_entropy", F.lit(0.0)).alias("cross_entropy"),
    )


def lm_score_bigram(
    docs: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    alpha: float = 1.0,
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document stupid-backoff bigram LM statistics (Brants et al.
    2007's distributed web-scale LM, re-expressed as broadcast joins):
    each in-document bigram (w1, w2) scores

        S(w2 | w1) = cnt(w1 w2) / cnt(w1)          if the bigram is known
                   = backoff * p_add_alpha(w2)     otherwise

    where p_add_alpha is the smoothed unigram probability from
    :func:`lm_score`'s model. Returns per doc:

    - ``n_bigrams`` — bigram count (len-1 docs and shorter: 0, kept);
    - ``seen_cnt`` — bigrams found in the ``bigrams`` table (BIGINT);
    - ``bigram_freq_sum`` — sum of cnt(w1 w2) over seen bigrams (BIGINT;
      with ``seen_cnt`` this is the gate-hashable integer surface);
    - ``cross_entropy`` — -(1/n) * sum log2 S, double, ranking only.

    Scale shape: BOTH model tables broadcast (the point of count
    truncation — top-1M bigrams is tens of MB); the corpus side explodes
    bigrams, takes two BroadcastHashJoins, and partially aggregates to
    one row per doc before its only exchange, exactly like
    :func:`lm_score`. Nothing corpus-sized ever shuffles on a token or
    bigram key."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if not 0.0 < backoff <= 1.0:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    from prase_spark.datapipe.textstats import word_ngrams

    totals = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t"), F.count("*").alias("v")
    ).collect()[0]
    denom = float(int(totals["t"])) + alpha * (int(totals["v"]) + 1)

    # tokens materialized below the n-gram transform (see bigram_vocab)
    pairs = docs.select(
        F.col(key_col).alias("key"), tokens(text_col).alias("__t")
    ).select(
        "key",
        F.explode(word_ngrams(F.col("__t"), 2)).alias("bigram"),
    ).select(
        "key",
        "bigram",
        F.split(F.col("bigram"), " ").getItem(0).alias("__w1"),
        F.split(F.col("bigram"), " ").getItem(1).alias("__w2"),
    )
    joined = (
        pairs.join(F.broadcast(bigrams), "bigram", "left")
        .join(
            F.broadcast(vocab.select(F.col("term").alias("__w1"), F.col("cnt").alias("__c1"))),
            "__w1",
            "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("term").alias("__w2"), F.col("cnt").alias("__c2"))),
            "__w2",
            "left",
        )
    )
    # known bigram: cnt/c1 (c1 >= cnt > 0 by construction when both come
    # from the same corpus; a foreign bigram table with a missing w1
    # unigram falls back too, rather than dividing by null)
    seen = F.col("cnt").isNotNull() & F.col("__c1").isNotNull()
    score = F.when(seen, F.col("cnt") / F.col("__c1")).otherwise(
        F.lit(backoff)
        * (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(alpha))
        / F.lit(denom)
    )
    scored = joined.groupBy("key").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(seen.cast("long")).alias("seen_cnt"),
        F.sum(F.when(seen, F.col("cnt")).otherwise(F.lit(0))).alias(
            "bigram_freq_sum"
        ),
        (-F.sum(F.log2(score)) / F.count("*")).alias("cross_entropy"),
    )
    return docs.select(F.col(key_col).alias("key")).join(
        scored, "key", "left"
    ).select(
        "key",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("seen_cnt", F.lit(0)).cast("long").alias("seen_cnt"),
        F.coalesce("bigram_freq_sum", F.lit(0)).cast("long").alias("bigram_freq_sum"),
        F.coalesce("cross_entropy", F.lit(0.0)).alias("cross_entropy"),
    )
