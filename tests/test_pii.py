"""PII scrubbing (functions/pii.py): pattern semantics on crafted
strings, chain-order decomposition, and idempotence. The registry twin
is hash-oracled against DuckDB (RE2) at two scales, which is the
engine-portability proof; these pin the behavior itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_analyser_spark.functions.pii import PII_PATTERNS, pii_counts, scrub_pii


def _scrub(spark, texts: list[str]) -> list[dict]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    return [
        r.asDict()
        for r in df.select(
            "id", *pii_counts("text"), scrub_pii("text").alias("s")
        )
        .orderBy("id")
        .collect()
    ]


def test_each_category_scrubs_and_counts(spark):
    [r] = _scrub(
        spark,
        [
            "mail bob.smith+x@corp.example.org or https://a.example/p?q=1 "
            "from 192.168.1.254 call +555-123-4567 ref 123456789 done"
        ],
    )
    assert r["s"] == (
        "mail <email> or <url> from <ip> call <phone> ref <id> done"
    )
    assert (r["n_url"], r["n_email"], r["n_ipv4"], r["n_phone"], r["n_digit_run"]) == (
        1, 1, 1, 1, 1,
    )


def test_chain_order_prevents_double_counting(spark):
    """An email's digits must not also count as a digit run, an IP's
    octets must not count as phones, a URL hosting an email-shaped path
    is consumed by the URL pass first."""
    [r] = _scrub(
        spark,
        ["see https://x.example/a@b.cc and admin99999999@site.example.com now"],
    )
    assert r["n_url"] == 1 and r["n_email"] == 1
    assert r["n_ipv4"] == r["n_phone"] == r["n_digit_run"] == 0
    assert r["s"] == "see <url> and <email> now"


def test_boundaries_and_negatives(spark):
    rows = _scrub(
        spark,
        [
            "version 1.2.3 stays",          # 3 octets only — not an IP
            "a123456b stays",               # digit run inside a word
            "short 123456 stays",           # 6 digits < 7
            "ip 999.999.999.999 scrubbed",  # naive octet check (documented)
        ],
    )
    assert rows[0]["s"] == "version 1.2.3 stays" and rows[0]["n_ipv4"] == 0
    assert rows[1]["s"] == "a123456b stays" and rows[1]["n_digit_run"] == 0
    assert rows[2]["s"] == "short 123456 stays"
    assert rows[3]["s"] == "ip <ip> scrubbed"


def test_scrub_is_idempotent(spark):
    texts = ["mail a@b.cc 12345678 https://x.y 10.0.0.1 555-123-4567"]
    once = _scrub(spark, texts)[0]["s"]
    again = _scrub(spark, [once])[0]
    assert again["s"] == once
    assert all(again[f"n_{name}"] == 0 for name, _, _ in PII_PATTERNS)