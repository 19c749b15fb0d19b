"""N-Triples serialization for the canonical triple store.

The reference ecosystem's KGs ship as RDF dumps (DBP15K is cut from
DBpedia N-Triples dumps; the reference loads a pre-split TSV rendering
of them — /root/reference/objects/KG.py reads (subj, pred, obj) lines).
A KG-construction pipeline that materializes a graph needs to EXPORT it
in the interchange format other tooling ingests, and re-ingest its own
exports: this module is that boundary, kept entirely JVM-side.

Format (W3C N-Triples, the profile these KGs use):
    <subj-iri> <pred-iri> <obj-iri> .
    <subj-iri> <pred-iri> "literal" .
with the canonical escapes inside IRIs left untouched (the normalizer
upstream guarantees angle-bracket-safe IRIs) and string-literal escapes
``\\ " \n \r \t`` applied/stripped on the literal payload.

Scale posture: both directions are single-scan ``select`` projections —
pure whole-stage-codegen string expressions, no shuffle, no Python on
executors; a 10^12-triple export is embarrassingly parallel and writes
straight out of the scan partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# order matters: backslash first on escape, last on unescape
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]


def _escape_literal(col):
    for raw, esc in _ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def _unescape_literal(col):
    # single left-to-right pass, exactly inverse to _escape_literal:
    # a naive chained replace() would corrupt "\\n" (escaped backslash
    # followed by n) into a newline; the regex consumes one escape pair
    # per step so each backslash is spent exactly once. Java regex
    # inside the JVM — still codegen, no Python.
    # regexp_replace with a callback is not available in SQL; instead
    # split on the escaped-backslash token, unescape the simple pairs in
    # each segment (no \\ can remain inside a segment), then rejoin with
    # a single backslash.
    seg = F.split(col, r"\\\\", -1)
    def _simple(c):
        for esc, raw in [('\\"', '"'), ("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t")]:
            c = F.replace(c, F.lit(esc), F.lit(raw))
        return c
    return F.array_join(F.transform(seg, _simple), "\\")


def to_ntriples(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    obj_is_lit: str = "obj_is_lit",
) -> DataFrame:
    """Render (subj, pred, obj, obj_is_lit) rows as N-Triples ``line``s.

    IRIs are wrapped in angle brackets as-is (upstream normalize_uri
    guarantees bracket-safety); terms already spelled ``_:label`` are
    emitted as blank nodes (bare); literal objects get the five
    canonical string escapes and double quotes.
    """

    def _res_term(col):
        return F.when(col.startswith("_:"), col).otherwise(
            F.concat(F.lit("<"), col, F.lit(">"))
        )

    obj_term = F.when(
        F.col(obj_is_lit),
        F.concat(F.lit('"'), _escape_literal(F.col(obj)), F.lit('"')),
    ).otherwise(_res_term(F.col(obj)))
    return triples.select(
        F.concat(
            _res_term(F.col(subj)), F.lit(" <"), F.col(pred), F.lit("> "),
            obj_term, F.lit(" ."),
        ).alias("line")
    )


# one anchored regex classifies + captures every term shape:
# g1 subj-IRI | g2 subj-blank, g3 pred, g4 obj-IRI | g5 obj-blank |
# g6 obj-literal (an optional ^^<datatype> / @lang suffix is accepted
# and STRIPPED — the engine's literal normalizer drops those wrappers
# anyway, reference objects/KG.py:71-87)
_NT_RE = (
    r"^(?:<([^<>\s]+)>|(_:[A-Za-z][A-Za-z0-9]*)) "
    r"<([^<>\s]+)> "
    r'(?:<([^<>\s]+)>|(_:[A-Za-z][A-Za-z0-9]*)|'
    r'"((?:[^"\\]|\\.)*)"(?:\^\^<[^<>\s]+>|@[A-Za-z][A-Za-z0-9-]*)?)'
    r" \.$"
)


def from_ntriples(
    lines: DataFrame,
    line: str = "line",
    stats_out: dict | None = None,
) -> DataFrame:
    """Parse N-Triples ``line``s back to (subj, pred, obj, obj_is_lit).

    Accepts the full common dump profile: IRI and ``_:label`` blank-node
    terms (blanks come back spelled ``_:label``, so export∘parse is
    still the identity), and typed/language-tagged literals — the
    ``^^<dt>`` / ``@lang`` suffix is stripped to the lexical form, the
    same normalization the engine's literal normalizer applies
    (reference objects/KG.py:71-87). Malformed lines (and comments /
    blank lines) are dropped, counted in ``stats_out['malformed']`` when
    a dict is passed — the same drop-and-count contract as the TSV
    scan's malformed-line filter (sources._read_tsv).
    """
    l = F.col(line)
    # regexp_extract returns '' both for no-match and a non-participating
    # group: terms are ≥1 char by construction, so '' reliably means "the
    # other alternative matched"; the IRI-vs-blank pick is a when chain
    # and the literal branch is flagged off the raw text (only literal
    # objects put a quote after the predicate's closing bracket)
    parsed = lines.select(
        F.when(F.regexp_extract(l, _NT_RE, 1) != "", F.regexp_extract(l, _NT_RE, 1))
        .otherwise(F.regexp_extract(l, _NT_RE, 2))
        .alias("subj"),
        F.regexp_extract(l, _NT_RE, 3).alias("pred"),
        F.when(F.regexp_extract(l, _NT_RE, 4) != "", F.regexp_extract(l, _NT_RE, 4))
        .otherwise(F.regexp_extract(l, _NT_RE, 5))
        .alias("_obj_res"),
        F.regexp_extract(l, _NT_RE, 6).alias("_obj_lit"),
        l.rlike(_NT_RE).alias("_ok"),
        l.rlike(r'> "').alias("_is_lit"),
    )
    if stats_out is not None:
        skip = lines.where(
            ~l.rlike(_NT_RE)
            & ~(F.trim(l) == "")
            & ~F.trim(l).startswith("#")
        )
        stats_out["malformed"] = skip.count()
    return (
        parsed.where("_ok")
        .select(
            "subj",
            "pred",
            F.when(F.col("_is_lit"), _unescape_literal(F.col("_obj_lit")))
            .otherwise(F.col("_obj_res"))
            .alias("obj"),
            F.col("_is_lit").alias("obj_is_lit"),
        )
    )
