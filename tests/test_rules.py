"""Catalog parsing — mirrors tests/test_errorCheck.py:96-106 (invalid config)
and the SKIP/falsy-drop semantics (errorChecker.py:312-329)."""

import os

import pytest

from anzlic_validator_spark.errors import InvalidConfigException
from anzlic_validator_spark.rules import load_catalog, parse_catalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_catalog_loads():
    cat = load_catalog(os.path.join(REPO, "configs/rules_default.yaml"))
    assert len(cat.rules) == 11
    ids = [r.rule_id for r in cat.rules]
    assert "clip_id.unique" in ids and "clips.audio" in ids
    assert len(cat.row_rules) + len(cat.dataset_rules) == len(cat.rules)
    # order is catalog position (verdict precedence)
    assert [r.order for r in cat.rules] == sorted(r.order for r in cat.rules)


def test_invalid_catalog_raises():
    with pytest.raises(InvalidConfigException, match="frobnicate"):
        load_catalog(os.path.join(REPO, "configs/rules_invalid.yaml"))


def test_unknown_key_raises():
    with pytest.raises(InvalidConfigException, match="unknown keys"):
        parse_catalog({"rules": [{"type": "exists", "column": "x", "frob": 1}]})


def test_enabled_false_drops_rule():
    cat = parse_catalog(
        {
            "rules": [
                {"type": "exists", "column": "a"},
                {"type": "exists", "column": "b", "enabled": False},
            ]
        }
    )
    assert [r.rule_id for r in cat.rules] == ["a.exists"]


def test_duplicate_ids_raise():
    with pytest.raises(InvalidConfigException, match="duplicate"):
        parse_catalog(
            {"rules": [{"type": "exists", "column": "a"}, {"type": "exists", "column": "a"}]}
        )


def test_conditional_requires_row_rule_then():
    with pytest.raises(InvalidConfigException, match="row-level"):
        parse_catalog(
            {
                "rules": [
                    {
                        "type": "conditional",
                        "when": {"column": "a", "equals": "x"},
                        "then": {"type": "unique", "columns": ["b"]},
                    }
                ]
            }
        )


def test_catalog_hash_stable_and_sensitive():
    doc = {"rules": [{"type": "exists", "column": "a"}]}
    h1 = parse_catalog(doc).catalog_hash()
    h2 = parse_catalog(doc).catalog_hash()
    h3 = parse_catalog({"rules": [{"type": "exists", "column": "b"}]}).catalog_hash()
    assert h1 == h2 != h3
