"""Name/value normalizers as *native* column expressions (no UDFs).

Reference semantics:
- entity/relation normalizer: regex ``"?<?([^">]*)>?"?.*`` then take the last
  '/'-segment if any (objects/KG.py:59-69, ``default_pre_func``).
- literal normalizer: split at the first '^', then strip at most one leading
  '<', one trailing '>', one leading '"', one trailing '"', trim
  (objects/KG.py:71-87, ``default_pre_func_for_literal``).

Both stay inside whole-stage codegen — string ops on the JVM, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_uri(col: Column) -> Column:
    """Entity/relation/attribute name -> value (objects/KG.py:59-69).

    Names are stripped first (the reference strips in the Entity/Relation
    constructors, objects/Entity.py:6, objects/Relation.py:7)."""
    inner = F.trim(F.regexp_extract(F.trim(col), r'^"?<?([^">]*)>?"?', 1))
    return F.when(
        inner.contains("/"), F.trim(F.element_at(F.split(inner, "/"), -1))
    ).otherwise(inner)


def normalize_literal(col: Column) -> Column:
    """Literal name -> value (objects/KG.py:71-87).

    Strips one layer of ``"…"^^<type>`` wrapping: split at first '^', then
    sequentially strip <, >, ", " (one each, same order as the reference).
    """
    v = F.trim(F.element_at(F.split(F.trim(col), r"\^"), 1))
    v = F.regexp_replace(v, r"^<", "")
    v = F.regexp_replace(v, r">$", "")
    v = F.regexp_replace(v, r'^"', "")
    v = F.regexp_replace(v, r'"$', "")
    return F.trim(v)


def inv_pred_name(col: Column) -> Column:
    """Inverse-predicate naming: ``name + "-(INV)"`` (objects/KG.py:148-150)."""
    return F.concat(F.trim(col), F.lit("-(INV)"))


def clamp01(col: Column) -> Column:
    """Probability clamp to [0,1] (model/PARIS.py:36-38,51-52)."""
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), col))
