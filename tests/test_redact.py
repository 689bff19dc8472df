"""PII redaction rules vs a pure-Python re reference (operators/redact.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from scio_db_spark.operators.redact import (
    DEFAULT_RULES,
    redact,
    redaction_census,
    rule_hits,
)

_SAMPLES = [
    ("mail me at jane.doe+spam@example.co.uk please", "email"),
    ("server at 192.168.001.12 went down", "ipv4"),
    ("call +1 555-2368 today", "phone"),
    ("call 44-7911-123456 today", "phone"),
    ("order 123456 shipped", "digit_run"),
    ('{"k": 69}', "digit_run"),
    ("no pii here", None),
    (None, None),
]


def _py_redact(text: str) -> str:
    out = text
    for _n, pattern, repl in DEFAULT_RULES:
        out = re.sub(pattern, repl, out)
    return out


def test_redact_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(t,) for t, _ in _SAMPLES], "text string"
    ).withColumn("red", redact(F.col("text")))
    for r in df.collect():
        if r.text is None:
            assert r.red is None
        else:
            assert r.red == _py_redact(r.text), r.text


@pytest.mark.parametrize("text,rule", [s for s in _SAMPLES if s[1]])
def test_expected_rule_fires(spark, text, rule):
    pattern = dict((n, p) for n, p, _ in DEFAULT_RULES)[rule]
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(rule_hits(F.col("text"), pattern).alias("h"))
        .first()
    )
    assert row.h >= 1, f"{rule} did not fire on {text!r}"


def test_email_redacted_before_digit_run(spark):
    # Rule order: the email must disappear as ONE token, not leave
    # digit fragments for later rules to shred.
    row = (
        spark.createDataFrame([("contact a123456@x.io now",)], "t string")
        .select(redact(F.col("t")).alias("r"))
        .first()
    )
    assert row.r == "contact <EMAIL> now"


def test_census_counts_and_delta(spark):
    df = spark.createDataFrame(
        [("a", "id 1234 and 5678"), ("a", "clean"), ("b", None)],
        "g string, t string",
    )
    out = {
        r.g: r
        for r in redaction_census(df, "t", by="g").collect()
    }
    assert out["a"].hits_digit_run == 2
    assert out["a"].n_changed == 1
    # "1234" and "5678" (4 chars each) both became "<NUM>" (5 chars)
    assert out["a"].chars_delta == -2
    assert out["b"].n_rows == 1 and out["b"].n_changed == 0
    assert out["b"].chars_delta == 0
    # NULL text must count 0 hits (NOT -1: with ANSI off, size(NULL)
    # is -1 and a bare coalesce(size(...)) never fires)
    assert out["b"].hits_digit_run == 0
    assert out["b"].hits_email == 0
