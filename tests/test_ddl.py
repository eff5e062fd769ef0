"""DDL classifier matrix (FIXTURES.md §B2; reference regex sets at
mysql/DelayedStopSignalProcessFunction.java:166-195 and
oracle/DelayedStopSignalProcessFunction.java:186-205)."""

import pytest

from flink_cdc_multi_spark.operators.ddl import (
    DDLDecision,
    classify,
    is_truncate,
    stop_predicate,
)

MYSQL_CASES = [
    # non-structural → IGNORE
    ("CREATE INDEX idx ON t (a)", DDLDecision.IGNORE),
    ("DROP INDEX idx ON t", DDLDecision.IGNORE),
    ("ALTER TABLE t ADD INDEX idx (a)", DDLDecision.IGNORE),
    ("ALTER TABLE t DROP INDEX idx", DDLDecision.IGNORE),
    ("ALTER TABLE t ADD KEY k (a)", DDLDecision.IGNORE),
    ("ALTER TABLE t DROP KEY k", DDLDecision.IGNORE),
    ("ALTER TABLE t ADD CONSTRAINT c UNIQUE (a)", DDLDecision.IGNORE),
    ("ALTER TABLE t DROP CONSTRAINT c", DDLDecision.IGNORE),
    ("ANALYZE TABLE t", DDLDecision.IGNORE),
    ("OPTIMIZE TABLE t", DDLDecision.IGNORE),
    ("REPAIR TABLE t", DDLDecision.IGNORE),
    ("create index lower_case on t (a)", DDLDecision.IGNORE),  # case-insensitive
    # structural / unclassified → STOP
    ("ALTER TABLE t ADD COLUMN c INT", DDLDecision.STOP),
    ("ALTER TABLE t DROP COLUMN c", DDLDecision.STOP),
    ("ALTER TABLE t MODIFY COLUMN c BIGINT", DDLDecision.STOP),
    ("CREATE TABLE t2 (a INT)", DDLDecision.STOP),
    ("DROP TABLE t", DDLDecision.STOP),
    ("RENAME TABLE t TO t2", DDLDecision.STOP),
    ("TRUNCATE TABLE t", DDLDecision.STOP),
    # full-string anchoring parity: prefix must match from the start
    ("X CREATE INDEX idx ON t (a)", DDLDecision.STOP),
]

ORACLE_CASES = [
    ("CREATE INDEX idx ON t (a)", DDLDecision.IGNORE),
    ("ALTER INDEX idx REBUILD", DDLDecision.IGNORE),
    ("CREATE SEQUENCE s", DDLDecision.IGNORE),
    ("DROP SYNONYM syn", DDLDecision.IGNORE),
    ("CREATE VIEW v AS SELECT 1 FROM dual", DDLDecision.IGNORE),
    ("GRANT SELECT ON t TO u", DDLDecision.IGNORE),
    ("REVOKE SELECT ON t FROM u", DDLDecision.IGNORE),
    ("ANALYZE INDEX idx VALIDATE STRUCTURE", DDLDecision.IGNORE),
    ("COMMENT ON TABLE t IS 'x'", DDLDecision.IGNORE),
    ("ALTER TABLE t ADD (c NUMBER)", DDLDecision.STOP),
    ("DROP TABLE t", DDLDecision.STOP),
]


@pytest.mark.parametrize("ddl,expected", MYSQL_CASES)
def test_mysql_classify(ddl, expected):
    assert classify(ddl, "mysql") is expected


@pytest.mark.parametrize("ddl,expected", ORACLE_CASES)
def test_oracle_classify(ddl, expected):
    assert classify(ddl, "oracle") is expected


def test_truncate_detection():
    assert is_truncate("TRUNCATE TABLE t")
    assert is_truncate("some prefix TRUNCATE  TABLE t")
    assert not is_truncate("DELETE FROM t")


def test_multiline_ddl():
    assert classify("CREATE INDEX idx\nON t (a)", "mysql") is DDLDecision.IGNORE


@pytest.mark.parametrize("dialect,cases", [("mysql", MYSQL_CASES), ("oracle", ORACLE_CASES)])
def test_stop_predicate_matches_python(spark, dialect, cases):
    """The in-plan Column predicate must agree with the Python classifier."""
    df = spark.createDataFrame([(ddl,) for ddl, _ in cases], "ddl string")
    got = {
        r["ddl"]: r["stop"]
        for r in df.select("ddl", stop_predicate(df.ddl, dialect).alias("stop")).collect()
    }
    for ddl, expected in cases:
        assert got[ddl] == (expected is DDLDecision.STOP), ddl


# Property test: the driver-side classifier and the in-plan Column
# predicate must agree on ARBITRARY statements, not just the fixtures.
from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = st.sampled_from(
    ["CREATE", "DROP", "ALTER", "TABLE", "INDEX", "KEY", "CONSTRAINT",
     "COLUMN", "ADD", "MODIFY", "ANALYZE", "OPTIMIZE", "REPAIR", "t1",
     "idx", "(a)", "INT", "users", "\n", "x-y"]
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=8))
def test_classifier_predicate_agreement_property(spark, words):
    stmts = [" ".join(words), " ".join(words).lower()]
    df = spark.createDataFrame([(s,) for s in stmts], "ddl string")
    for dialect in ("mysql", "oracle"):
        got = {
            r["ddl"]: r["stop"]
            for r in df.select(
                "ddl", stop_predicate(df.ddl, dialect).alias("stop")
            ).collect()
        }
        for s in stmts:
            assert got[s] == (classify(s, dialect) is DDLDecision.STOP), (s, dialect)
