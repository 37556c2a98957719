"""Error taxonomy.

The reference raises typed exceptions per violation class
(MetadataIncorrectException / MetadataEmptyException / MetadataNoneException,
scripts/errorChecker.py:100-143) and InvalidConfigException for unknown rule
keys (scripts/errorChecker.py:335-337).  In the Spark engine data-level
violations become *rows*, never exceptions — only configuration errors raise.
The violation-class names survive as ``rule_id`` suffixes:

    <rule>.missing   ≙ MetadataNoneException   (errorChecker.py:394-399)
    <rule>.empty     ≙ MetadataEmptyException  (errorChecker.py:381-382)
    <rule>.incorrect ≙ MetadataIncorrectException (errorChecker.py:383-388)
"""


class ValidationError(Exception):
    """Base class for engine errors (driver-side only)."""


class InvalidConfigException(ValidationError):
    """Unknown rule key / malformed rule spec in the catalog.

    Mirrors scripts/errorChecker.py:335-337: raised at catalog-parse time,
    before any Spark job starts.
    """


# rule_id suffixes — the violation classes of the reference
MISSING = "missing"
EMPTY = "empty"
INCORRECT = "incorrect"
