"""PII redaction (functions/text.py:redact_pii)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.functions.text import redact_pii


def _apply(spark, texts, kinds=None):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        r.out
        for r in df.select(redact_pii(F.col("text"), kinds).alias("out")).collect()
    ]


def test_redacts_each_kind(spark):
    got = _apply(
        spark,
        [
            "mail me at jane.doe+spam@sub.example.co.uk today",
            "card 4111 1111 1111 1111 exp 09/28",
            "call (414) 555-2368 or +1 414-555-2368",
            "host 192.168.0.1 responded",
            "no pii here at all",
            None,
        ],
    )
    assert got == [
        "mail me at <EMAIL> today",
        "card <CC> exp 09/28",
        "call <PHONE> or <PHONE>",
        "host <IP> responded",
        "no pii here at all",
        None,
    ]


def test_rule_order_card_before_phone_email_first(spark):
    # a 4-4-4-4 card must become <CC>, not a mangled <PHONE> prefix;
    # an email whose local part is digit-heavy must survive as <EMAIL>
    got = _apply(
        spark,
        [
            "pay 4111-1111-1111-1111 now",
            "write 4145552368@txt.example.com please",
        ],
    )
    assert got == ["pay <CC> now", "write <EMAIL> please"]


def test_kinds_subset_and_ip_vs_phone(spark):
    got = _apply(
        spark,
        ["ip 10.1.2.3 tel 555-123-4567"],
        kinds=("ipv4",),
    )
    assert got == ["ip <IP> tel 555-123-4567"]
    got = _apply(spark, ["ip 10.1.2.3 tel 555.123.4567"])
    # dotted phone is NOT an IP (only two dots); IP is not a phone
    # (octets are 1-3 digits, the phone shape needs a 4-digit run)
    assert got == ["ip <IP> tel <PHONE>"]


def test_redaction_is_codegen_only(spark):
    df = spark.createDataFrame([("a@b.co x",)], "text string").select(
        redact_pii(F.col("text")).alias("out")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redaction_idempotent(spark):
    """Placeholders contain no digits or '@', so a second pass must be a
    no-op — redaction is a fixed point (re-scrubbing an already-scrubbed
    corpus cannot mangle it)."""
    texts = [
        "mail jane.doe@x.co card 4111-1111-1111-1111 tel (414) 555-2368 ip 8.8.8.8",
        "<EMAIL> then 4111 1111 1111 1111 and text",
        "nested a@b.io inside a@b.io twice",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        redact_pii(F.col("text")).alias("r1"),
        redact_pii(redact_pii(F.col("text"))).alias("r2"),
    ).collect()
    for t, r in zip(texts, rows):
        assert r.r2 == r.r1, (t, r.r1, r.r2)
        assert "@" not in r.r1.replace("<EMAIL>", ""), r.r1


def test_cc_full_pan_length_range_no_prefix_leak(spark):
    """13-digit (legacy Visa) and 19-digit (UnionPay) PANs must redact
    WHOLE — the round-10 review found the 14-16-only rule let the phone
    pattern part-match a 13-digit PAN and leak its issuer prefix."""
    got = _apply(
        spark,
        [
            "card 4222222222222 ok",            # 13-digit test PAN
            "card 6212345678901234567 ok",      # 19-digit
            "card 4111111111111111 ok",         # 16 plain
            "num 123456789012 ok",              # 12 digits: NOT a PAN
        ],
    )
    assert got[:3] == ["card <CC> ok", "card <CC> ok", "card <CC> ok"]
    # 12 digits falls to the phone rule (country-code form) — still
    # fully scrubbed, no digit prefix survives
    assert got[3] == "num <PHONE> ok"
    for g in got:
        assert not any(ch.isdigit() for ch in g), g


def test_unknown_kind_raises(spark):
    """A typo'd kind must fail loud — silently applying zero rules would
    ship unscrubbed data."""
    import pytest

    with pytest.raises(ValueError, match="unknown kinds.*ip"):
        _apply(spark, ["x"], kinds=("ip",))
    with pytest.raises(ValueError, match="unknown kinds"):
        _apply(spark, ["x"], kinds=("credit_card", "email"))
