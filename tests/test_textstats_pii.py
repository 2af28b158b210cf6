"""PII scrubbing: planted emails/phones/IPs are replaced by typed
placeholders with correct counts; clean text passes through unchanged."""

from blabel_spark.ops.textstats import scrub_pii


def test_scrub_pii_planted(spark):
    rows = [
        (0, "contact john.doe+spam@example.co.uk or call 555-123-4567"),
        (1, "server at 192.168.1.254 and backup 10.0.0.1 are up"),
        (2, "totally clean text with numbers 12345 and words"),
        (3, "a@b.io x@y.org +1 (415) 555-2671"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}

    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert "<EMAIL>" in got[0]["text_scrubbed"]
    assert "<PHONE>" in got[0]["text_scrubbed"]
    assert "john.doe" not in got[0]["text_scrubbed"]

    assert got[1]["n_ip"] == 2
    assert got[1]["text_scrubbed"] == "server at <IP> and backup <IP> are up"

    assert got[2]["n_email"] == got[2]["n_phone"] == got[2]["n_ip"] == 0
    assert got[2]["text_scrubbed"] == rows[2][1]

    assert got[3]["n_email"] == 2 and got[3]["n_phone"] == 1
    assert "@" not in got[3]["text_scrubbed"]


def test_scrub_pii_email_before_ip(spark):
    """An address whose host part looks IP-ish is scrubbed as ONE email,
    not re-matched as an IP."""
    docs = spark.createDataFrame([(0, "mail me: bob@mail4.example.com")],
                                 "doc_id long, text string")
    r = scrub_pii(docs).collect()[0]
    assert r["n_email"] == 1
    assert r["text_scrubbed"] == "mail me: <EMAIL>"
