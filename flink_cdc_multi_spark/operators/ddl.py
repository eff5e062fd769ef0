"""DDL classification (reference F4:
java/processfunctions/mysql/DelayedStopSignalProcessFunction.java:166-195,
oracle variant oracle/DelayedStopSignalProcessFunction.java:186-205).

Decision semantics reproduced exactly, including the reference's full-string
``String.matches`` anchoring:

- A DDL is IGNORED iff it full-matches the non-structural alternation and
  (MySQL only) does NOT full-match the structural override alternation.
- Everything else → STOP (schema evolution is manual; job halts,
  README.md:26).
- TRUNCATE TABLE is detected and logged but classified like any other
  statement (mysql:166-169).
- DDL for tables outside the configured target list is IGNORED before
  classification (mysql:149-164).

Both a driver-side classifier (pure Python, used by the stop controller on
collected DDL rows — DDL volume is tiny) and a Column predicate (used to
filter at scale) are provided.
"""

from __future__ import annotations

import re
from enum import Enum

from pyspark.sql import Column

# Java String.matches == full-string match; (?s) lets .* span newlines.
_MYSQL_NON_STRUCTURAL = re.compile(
    r"(?is)("
    r"CREATE\s+INDEX.*|"
    r"DROP\s+INDEX.*|"
    r"ALTER\s+TABLE.*ADD\s+INDEX.*|"
    r"ALTER\s+TABLE.*DROP\s+INDEX.*|"
    r"ALTER\s+TABLE.*ADD\s+KEY.*|"
    r"ALTER\s+TABLE.*DROP\s+KEY.*|"
    r"ALTER\s+TABLE.*ADD\s+CONSTRAINT.*|"
    r"ALTER\s+TABLE.*DROP\s+CONSTRAINT.*|"
    r"ANALYZE\s+TABLE.*|"
    r"OPTIMIZE\s+TABLE.*|"
    r"REPAIR\s+TABLE.*"
    r")\Z"
)

_MYSQL_STRUCTURAL = re.compile(
    r"(?is)(ADD\s+COLUMN.*|DROP\s+COLUMN.*|MODIFY\s+COLUMN.*)\Z"
)

_ORACLE_NON_STRUCTURAL = re.compile(
    r"(?is)("
    r"CREATE\s+INDEX.*|DROP\s+INDEX.*|ALTER\s+INDEX.*|"
    r"CREATE\s+SEQUENCE.*|DROP\s+SEQUENCE.*|ALTER\s+SEQUENCE.*|"
    r"CREATE\s+SYNONYM.*|DROP\s+SYNONYM.*|"
    r"CREATE\s+VIEW.*|DROP\s+VIEW.*|ALTER\s+VIEW.*|"
    r"GRANT\s+.*|REVOKE\s+.*|"
    r"ANALYZE\s+TABLE.*|ANALYZE\s+INDEX.*|"
    r"COMMENT\s+ON.*"
    r")\Z"
)

_TRUNCATE = re.compile(r"(?i).*TRUNCATE\s+TABLE.*", re.DOTALL)


class DDLDecision(Enum):
    IGNORE = "ignore"  # non-structural; keep streaming
    STOP = "stop"  # structural (or unclassified); halt after flush


def classify(ddl: str, dialect: str = "mysql") -> DDLDecision:
    if dialect == "oracle":
        if _ORACLE_NON_STRUCTURAL.match(ddl):
            return DDLDecision.IGNORE
        return DDLDecision.STOP
    if _MYSQL_NON_STRUCTURAL.match(ddl) and not _MYSQL_STRUCTURAL.match(ddl):
        return DDLDecision.IGNORE
    return DDLDecision.STOP


def is_truncate(ddl: str) -> bool:
    return bool(_TRUNCATE.match(ddl))


def stop_predicate(ddl_col: Column, dialect: str = "mysql") -> Column:
    """Column form of ``classify(...) == STOP`` for in-plan filtering.

    Spark ``rlike`` is substring-search; the reference anchors full-string,
    so wrap in ^...$ with (?s).
    """
    def _anchor(p: re.Pattern) -> str:
        body = p.pattern
        # strip the python-side (?is) prefix and \Z anchor; re-anchor for Java
        body = body.replace("(?is)", "").replace(r"\Z", "")
        return f"(?is)^(?:{body})$"

    if dialect == "oracle":
        return ~ddl_col.rlike(_anchor(_ORACLE_NON_STRUCTURAL))
    return ~ddl_col.rlike(_anchor(_MYSQL_NON_STRUCTURAL)) | ddl_col.rlike(
        _anchor(_MYSQL_STRUCTURAL)
    )
