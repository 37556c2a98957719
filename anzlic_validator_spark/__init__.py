"""anzlic_validator_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the validation capabilities of
josephramsay/anzlic-validator (see /root/reference) over columnar tables:
a declarative rule catalog (YAML/JSON) is compiled to Catalyst ``Column``
predicates and dataset-level operators (uniqueness, referential anti-joins,
distribution-drift, audio decode checks via Arrow pandas UDFs), emitting
violation rows ``(key, rule_id, observed, expected)`` and per-partition
pass/fail verdicts, resumable through a checkpoint manifest.

Reference semantics: scripts/errorChecker.py (rule grammar + evaluator),
scripts/validate.py (validate/conditional/process), scripts/resolve.py +
scripts/cache.py (resume), Metadata-LDS/* (catalog sweep + histograms).
"""

from anzlic_validator_spark.errors import (
    InvalidConfigException,
    ValidationError,
)
from anzlic_validator_spark.rules import Rule, RuleCatalog, load_catalog
from anzlic_validator_spark.engine import ValidationResult, validate

__version__ = "0.1.0"

__all__ = [
    "InvalidConfigException",
    "ValidationError",
    "Rule",
    "RuleCatalog",
    "load_catalog",
    "ValidationResult",
    "validate",
]
