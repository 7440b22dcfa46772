"""PII scan/redact + URL extraction (operators/pii.py).

The synthetic corpus contains no real PII, so these tests plant known
emails / phone numbers / IPs / id-numbers and assert exact counts and
redactions — the oracle parity run then certifies the same expressions
against DuckDB on the real tables.
"""

from __future__ import annotations

import pytest

from edu_online_spark.operators import pii

ROWS = [
    # doc_id, text, source
    (1, "contact alice@example.com or bob.smith+x@sub.dom.org today", "s1"),
    (2, "server at 10.0.0.1 and 192.168.255.254 rebooted", "s1"),
    (3, "ssn 123-45-6789 phone 555-867-5309 and 555.867.5309", "s2"),
    (4, "nothing sensitive here, just 12345 and v1.2", "s2"),
    (5, "see https://Example.COM/path?q=1 and http://other.org", "s3"),
    (6, "call (555) 867-5309 now", "s4"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text", "source"])


def test_pii_scan_counts(docs):
    rows = {r["doc_id"]: r for r in pii.pii_scan(docs).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_pii_total"] == 2
    assert rows[2]["n_ipv4"] == 2 and rows[2]["n_email"] == 0
    assert rows[3]["n_id_number"] == 1  # 123-45-6789 is 3-2-4, id-shaped
    assert rows[3]["n_phone"] == 2  # both separators, 3-3-4
    assert rows[3]["n_pii_total"] == 3
    assert rows[4]["n_pii_total"] == 0
    # a version string `v1.2` must not count as an IP
    assert rows[4]["n_ipv4"] == 0
    assert rows[6]["n_phone"] == 1  # (NNN) NNN-NNNN format


def test_pii_redact_replaces_all_classes(docs):
    out = {r["doc_id"]: r for r in pii.pii_redact(docs).collect()}
    assert out[1]["text_clean"] == "contact [EMAIL] or [EMAIL] today"
    assert out[2]["text_clean"] == "server at [IP] and [IP] rebooted"
    assert out[3]["text_clean"] == "ssn [ID] phone [PHONE] and [PHONE]"
    assert out[4]["text_clean"] == ROWS[3][1]  # untouched
    assert out[1]["n_redactions"] == 2
    assert out[4]["n_redactions"] == 0
    assert out[6]["text_clean"] == "call [PHONE] now"


def test_pii_source_stats(docs):
    stats = {r["source"]: r for r in pii.pii_source_stats(docs).collect()}
    assert stats["s1"]["n_docs"] == 2
    assert stats["s1"]["docs_with_pii"] == 2
    assert stats["s1"]["n_email"] == 2 and stats["s1"]["n_ipv4"] == 2
    assert stats["s2"]["docs_with_pii"] == 1
    assert stats["s3"]["n_pii_total"] == 0


def test_url_domains_lowercased_and_counted(docs):
    out = {r["domain"]: r["n_urls"] for r in pii.url_domains(docs).collect()}
    assert out == {"example.com": 1, "other.org": 1}


def test_k_anonymity_report_flags_small_classes(spark):
    from edu_online_spark.operators.pii import k_anonymity_report

    rows = [("a", "x")] * 6 + [("b", "x")] * 2 + [("c", "y")]
    df = spark.createDataFrame(rows, ["qi1", "qi2"])
    out = {r["class_size"]: r for r in k_anonymity_report(df, ["qi1", "qi2"]).collect()}
    assert out[6]["violates_k"] is False
    assert out[2]["violates_k"] is True and out[2]["n_classes"] == 1
    assert out[1]["violates_k"] is True


def test_sown_registry_queries_are_not_vacuous(spark, sf_dir):
    """The driver corpora carry no organic PII (round-3 finding), so the
    registry queries sow deterministic synthetic PII. Pin that the sown
    inputs actually exercise every pattern class — a regression to the
    vacuous all-zero green fails here, not silently at the judge."""
    from pyspark.sql import functions as F

    from edu_online_spark.sources import load_table

    docs = pii.sow_pii(load_table(spark, sf_dir, "documents"))
    stats = pii.pii_source_stats(docs).agg(
        *[F.sum(f"n_{name}").alias(f"n_{name}") for name, _, _ in pii.PII_PATTERNS]
    ).collect()[0]
    for name, _, _ in pii.PII_PATTERNS:
        assert stats[f"n_{name}"] > 0, f"sowing produced zero {name} hits"
    assert pii.url_domains(docs).count() > 0
    # ... and that not every document is touched (variation matters:
    # all-classes, some-classes, and clean docs all occur)
    scanned = pii.pii_scan(docs)
    n_clean = scanned.filter(F.col("n_pii_total") == 0).count()
    n_dirty = scanned.filter(F.col("n_pii_total") > 0).count()
    assert n_clean > 0 and n_dirty > 0


def test_sown_pii_stays_scan_stage(spark, sf_dir):
    """Sowing is pure projection — the sown redact query must keep the
    zero-Exchange zero-Python single-scan plan of the raw one."""
    from edu_online_spark.sources import load_table
    from tests.test_plans import explain_str

    docs = pii.sow_pii(load_table(spark, sf_dir, "documents"))
    plan = explain_str(pii.pii_redact(docs), "simple")
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert "Join" not in plan
