"""PII redaction patterns must actually fire (the sf corpus has no PII, so
the oracle row alone would pass vacuously)."""
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.text_ops import PII_PATTERNS


def _redact(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    red = F.col("text")
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(red, F.lit(pat)).alias(f"n_{kind}"))
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return df.select(red.alias("redacted"), *counts).first()


def test_email_ip_card_redacted(spark):
    r = _redact(
        spark,
        "mail a.user+tag@example.co.uk from 192.168.0.1 "
        "card 1234567812345678 end",
    )
    assert r["redacted"] == "mail [EMAIL] from [IPV4] card [CARD] end"
    assert (r["n_email"], r["n_ipv4"], r["n_card"]) == (1, 1, 1)


def test_progressive_counting(spark):
    # two emails, no false card/ip hits from redacted placeholders
    r = _redact(spark, "a@b.io c@d.org says 10.0.0.254 twice 10.0.0.254")
    assert r["n_email"] == 2 and r["n_ipv4"] == 2 and r["n_card"] == 0


def test_no_false_positives(spark):
    r = _redact(spark, "version 1.2.3 of pkg@dev is not pii, nor 123456")
    assert r["n_email"] == 0  # no dot-TLD after 'dev' -> not an email
    assert r["n_card"] == 0  # 6 digits, not 16
    # 1.2.3 is not 4 dotted octets -> not an IPv4
    assert r["n_ipv4"] == 0
    assert "[" not in r["redacted"]


def test_registration():
    import __spark_entry__ as e

    assert "pii_redact" in e.queries()
    assert "pii_redact" in e.oracle_sql()
