"""PII detection/redaction gates (operators/pii.py): planted
positives per detector class, redaction tokens and ordering, NULL
semantics, and the one-pass corpus report."""

from __future__ import annotations

import pytest

from e_commerce_lakehouse_spark.operators import pii


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "contact alice@example.com or bob.smith+tag@sub.domain.org now"),
        (1, "server at 10.0.255.7 and backup at 192.168.1.1"),
        (2, "call 555-867-5309 or 555.867.5309 today"),
        (3, "ssn on file: 078-05-1120"),
        (4, "clean text with no identifiers at all"),
        (5, None),
        (6, "mixed: a@b.io from 8.8.8.8 dial 123-456-7890 ssn 111-22-3333"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_detect_counts_per_class(docs):
    got = {r.doc_id: r for r in pii.detect_pii(docs).collect()}
    assert (got[0].n_email, got[0].n_ipv4, got[0].n_phone, got[0].n_ssn) == (2, 0, 0, 0)
    assert got[1].n_ipv4 == 2 and got[1].n_email == 0
    assert got[2].n_phone == 2
    assert got[3].n_ssn == 1 and got[3].n_phone == 0  # 3-2-4 is not 3-3-4
    assert got[4].has_pii is False
    assert got[5].has_pii is False  # NULL text is clean
    assert (got[6].n_email, got[6].n_ipv4, got[6].n_phone, got[6].n_ssn) == (1, 1, 1, 1)
    assert got[6].has_pii is True


def test_redaction_tokens_and_order(docs):
    got = {r.doc_id: r.text_redacted for r in pii.redact_pii(docs).collect()}
    assert got[0] == "contact <EMAIL> or <EMAIL> now"
    assert got[1] == "server at <IP> and backup at <IP>"
    assert got[2] == "call <PHONE> or <PHONE> today"
    assert got[3] == "ssn on file: <SSN>"
    assert got[4] == "clean text with no identifiers at all"
    assert got[5] is None  # NULL stays NULL
    assert got[6] == "mixed: <EMAIL> from <IP> dial <PHONE> ssn <SSN>"


def test_email_with_dotted_digits_not_double_redacted(spark):
    # the local/domain parts contain dotted digit runs that the ipv4
    # pattern would match — email must win (redaction order)
    df = spark.createDataFrame(
        [(0, "mail 10.0.0.1@example.com please")], "doc_id long, text string"
    )
    assert pii.redact_pii(df).first().text_redacted == "mail <EMAIL> please"


def test_pii_report_aggregates(docs):
    rep = {r.pii_type: r for r in pii.pii_report(docs).collect()}
    assert set(rep) == {"email", "ipv4", "phone", "ssn"}
    assert all(r.n_docs == 7 for r in rep.values())
    assert (rep["email"].n_docs_with, rep["email"].n_matches) == (2, 3)
    assert (rep["ipv4"].n_docs_with, rep["ipv4"].n_matches) == (2, 3)
    assert (rep["phone"].n_docs_with, rep["phone"].n_matches) == (2, 3)
    assert (rep["ssn"].n_docs_with, rep["ssn"].n_matches) == (2, 2)
    # redacted_len is the per-class independent replace length sum:
    # spot-check the ssn class (doc 3: one 11-char ssn -> 5-char token,
    # doc 6: one ssn) against hand-computed originals
    texts = [r.text or "" for r in docs.collect()]
    base_len = sum(len(t) for t in texts)
    assert rep["ssn"].redacted_len == base_len - 2 * (11 - 5)


def test_report_is_single_pass(docs):
    # one aggregate over the source: no joins, no window, one Exchange
    plan = pii.pii_report(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_international_preset_planted(spark):
    """E.164 numbers and IBANs (planted, valid-shaped) are detected and
    redacted under PII_PRESETS['international']; the default preset is
    untouched by the addition; both engines (java.regex / RE2) agree on
    the new patterns."""
    import duckdb

    intl = pii.PII_PRESETS["international"]
    rows = [
        (0, "call +442071838750 today"),
        (1, "wire to DE89370400440532013000 ref GB29NWBK60161331926819"),
        (2, "us office 415-555-0101 and intl +14155550101"),
        (3, "no pii here at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    det = {r.doc_id: r for r in pii.detect_pii(df, patterns=intl).collect()}
    assert (det[0].n_e164, det[0].n_iban) == (1, 0)
    assert (det[1].n_iban, det[1].n_e164) == (2, 0)
    assert (det[2].n_phone, det[2].n_e164) == (1, 1)
    assert not det[3].has_pii and not det[4].has_pii
    red = {r.doc_id: r.text_redacted
           for r in pii.redact_pii(df, patterns=intl).collect()}
    assert red[0] == "call <PHONE> today"
    assert red[1] == "wire to <IBAN> ref <IBAN>"
    assert red[2] == "us office <PHONE> and intl <PHONE>"
    assert red[4] is None
    # default preset unchanged: no n_e164/n_iban columns, same classes
    assert set(pii.PII_PATTERNS) == {"email", "ssn", "phone", "ipv4"}
    # report covers the preset's classes
    rep = {r.pii_type: r for r in pii.pii_report(df, patterns=intl).collect()}
    assert set(rep) == set(intl)
    assert rep["iban"].n_matches == 2 and rep["e164"].n_matches == 2
    # RE2 (DuckDB) extracts the same matches as java.regex did above
    for kind, text, want in [
        ("e164", rows[0][1], ["+442071838750"]),
        ("iban", rows[1][1], ["DE89370400440532013000", "GB29NWBK60161331926819"]),
        ("e164", rows[2][1], ["+14155550101"]),
    ]:
        pat = intl[kind][0]
        got = duckdb.sql(
            "SELECT regexp_extract_all(?, ?)", params=[text, pat]
        ).fetchone()[0]
        assert got == want, (kind, got)
