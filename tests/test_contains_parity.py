"""CONTAINS composition parity vs the reference (SURVEY §7.4, VERDICT r01 #7).

The reference's composite spec ``FIELD: [modifier, ['CONTAINS', a, b]]``
(config-layer.yaml:19-20, e.g. ``RESOURCECON: [True, ['CONTAINS','CC BY 4.0',
'LINZ']]``) is dispatched in runChecks (errorChecker.py:583-608) as:

1. ``checkContains`` (errorChecker.py:548-562) runs FIRST, AND-folding the
   substrings — the first absent substring raises MetadataIncorrectException.
   A **None** text silently passes checkContains (the ``if ... is not None``
   guard at :557) — missing-ness is governed by the modifier, not CONTAINS.
2. The spec then COLLAPSES to its first element (``extent[1] = extent[1][0]``
   at :584/:597/:608) and ``allChecks`` runs with that modifier alone
   (True → must exist; a literal → value check; NONE → may be absent).

This engine encodes each composition with explicit spec fields (no mutation):

    [True,  [CONTAINS, ...]]  →  {type: contains, values: [...]}
                                 (missing → .missing ≙ allChecks(True) raise)
    [NONE,  [CONTAINS, ...]]  →  {type: contains, values: [...], allow_none: true}
                                 (missing passes ≙ checkContains's None guard)
    [value, [CONTAINS, ...]]  →  {type: value, value: v}
                                 + {type: contains, values: [...], allow_none: true}
                                 (missing raises from the value rule only,
                                  matching the reference's single exception)

Known divergence (documented, by design): empty-string text under CONTAINS
raises MetadataIncorrectException in the reference (every substring check
fails against ''); this engine classifies it as the more precise
``.empty`` violation. Both flag the record; only the class suffix differs.
"""

import pytest
from pyspark.sql import Row

from anzlic_validator_spark.engine import validate
from anzlic_validator_spark.rules import parse_catalog


@pytest.fixture(scope="module")
def corpus(spark):
    # RESOURCECON-shaped fixture corpus: category per reference test corpus
    # (tests/test_errorCheck.py style — one row per anomaly class)
    return spark.createDataFrame(
        [
            Row(k="all_present", con="Released under CC BY 4.0 by LINZ"),
            Row(k="first_only", con="Released under CC BY 4.0"),
            Row(k="second_only", con="Copyright LINZ"),
            Row(k="neither", con="All rights reserved"),
            Row(k="missing", con=None),
            Row(k="empty", con="   "),
        ]
    )


def _fire_map(df, catalog):
    rows = validate(df, parse_catalog(catalog), key_col="k").violations.collect()
    out = {}
    for r in rows:
        out.setdefault(r.key, []).append(r.rule_id)
    return out


def test_contains_true_modifier(spark, corpus):
    """[True, [CONTAINS, 'CC BY 4.0', 'LINZ']] — exist + AND-folded substrings."""
    v = _fire_map(corpus, {"rules": [
        {"id": "con", "type": "contains", "column": "con",
         "values": ["CC BY 4.0", "LINZ"]},
    ]})
    assert "all_present" not in v
    # AND-fold: ANY absent substring is a violation (errorChecker.py:559-562
    # raises on the first miss; the engine reports one .incorrect row)
    assert v["first_only"] == ["con.incorrect"]
    assert v["second_only"] == ["con.incorrect"]
    assert v["neither"] == ["con.incorrect"]
    # collapsed modifier True → missing text violates (allChecks raise)
    assert v["missing"] == ["con.missing"]
    # documented divergence: '' → .empty here, Incorrect in the reference
    assert v["empty"] == ["con.empty"]


def test_contains_none_modifier(spark, corpus):
    """[NONE, [CONTAINS, ...]] — missing text passes (checkContains's
    ``is not None`` guard, errorChecker.py:557)."""
    v = _fire_map(corpus, {"rules": [
        {"id": "con", "type": "contains", "column": "con",
         "values": ["CC BY 4.0", "LINZ"], "allow_none": True},
    ]})
    assert "missing" not in v and "all_present" not in v
    assert v["neither"] == ["con.incorrect"]


def test_contains_value_modifier(spark, corpus):
    """[value, [CONTAINS, ...]] — the collapsed spec runs a value check;
    CONTAINS still applies to present text. Encoded as two explicit rules."""
    v = _fire_map(corpus, {"rules": [
        {"id": "con.val", "type": "value", "column": "con",
         "value": "Released under CC BY 4.0 by LINZ"},
        {"id": "con", "type": "contains", "column": "con",
         "values": ["CC BY 4.0", "LINZ"], "allow_none": True},
    ]})
    assert "all_present" not in v
    # missing text: exactly ONE exception, from the value rule — CONTAINS
    # stays silent exactly as checkContains does on None
    assert v["missing"] == ["con.val.missing"]
    # a wrong-but-substring-complete text fails only the value rule
    assert set(v["first_only"]) == {"con.val.incorrect", "con.incorrect"}
    assert set(v["neither"]) == {"con.val.incorrect", "con.incorrect"}


def test_contains_single_vs_list_equivalence(spark, corpus):
    """config-layer.yaml:19 vs :20 — a single-substring CONTAINS is the
    degenerate list; behavior must not depend on list arity."""
    single = _fire_map(corpus, {"rules": [
        {"id": "con", "type": "contains", "column": "con", "values": ["CC BY 4.0"]},
    ]})
    assert single["second_only"] == ["con.incorrect"]
    assert "first_only" not in single
    assert "all_present" not in single
