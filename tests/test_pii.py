"""PII redaction: pattern behavior + plan shape."""

from pyspark.sql import functions as F

from onnxocr_ray_spark.operators.pii import pii_counts, redact_pii

CASES = [
    # (input, expected redaction)
    ("mail me at a.b+c@foo-bar.example.org today",
     "mail me at <EMAIL> today"),
    ("edge@case.io", "<EMAIL>"),                      # whole string
    ("two a@b.co and c@d.io here", "two <EMAIL> and <EMAIL> here"),
    ("server 10.0.0.1 and 255.255.255.255 up", "server <IP> and <IP> up"),
    # pattern redacts dotted quads even with >255 octets — deliberate
    # over-match (redaction favors recall; both engines agree)
    ("999.999.999.999", "<IP>"),
    ("ssn-ish 123456789 and longer 1234567890123",
     "ssn-ish <IDNUM> and longer <IDNUM>"),
    ("short digits 12345678 survive", "short digits 12345678 survive"),
    ("v1.2.3 stays; 1.2.3.4 goes", "v1.2.3 stays; <IP> goes"),
    ("email local part with digits 123456789x@y.zz",
     "email local part with digits <EMAIL>"),
    ("no pii at all", "no pii at all"),
    ("", ""),
]


def test_redaction_cases(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(CASES)], "i long, t string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", redact_pii(F.col("t")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i])


def test_counts_match_redactions(spark):
    df = spark.createDataFrame(
        [("a@b.co c@d.io 1.2.3.4 123456789",)], "t string"
    )
    counts = pii_counts(F.col("t"))
    row = df.select(
        *[v.alias(k) for k, v in counts.items()]
    ).collect()[0]
    assert (row["n_emails"], row["n_ips"], row["n_idnums"]) == (2, 1, 1)


def test_plan_is_pure_projection(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("t"))
    plan = (
        df.select(redact_pii(F.col("t")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.lstrip().startswith("*(")  # codegen projection
