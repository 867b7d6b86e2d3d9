package graft

import graft.operators.PiiScrub

class PiiScrubSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(text: String) = {
    val r = PiiScrub.scrub(Seq((1L, text)).toDF("id", "text"), "text")
      .select("n_email", "n_ssn", "n_phone", "n_ip", "n_pii", "scrubbed")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getString(5))
  }

  test("each PII class is counted and redacted") {
    val (e, s, p, i, t, out) = one(
      "mail a.b+c@x.co, ssn 123-45-6789, tel 617-555-0100, ip 192.168.0.1")
    assert((e, s, p, i, t) === (1L, 1L, 1L, 1L, 4L))
    assert(out ===
      "mail [EMAIL], ssn [SSN], tel [PHONE], ip [IP]")
  }

  test("multiple hits of one class all redact") {
    val (e, _, _, _, t, out) = one("a@b.io then c@d.org")
    assert(e === 2L && t === 2L)
    assert(out === "[EMAIL] then [EMAIL]")
  }

  test("clean text passes through untouched") {
    val text = "no personal data here, just 42 words and 3.14"
    val (_, _, _, _, t, out) = one(text)
    assert(t === 0L)
    assert(out === text)
  }

  test("phone and ssn shapes do not cross-match") {
    // 3-2-4 digits is SSN, 3-3-4 is phone; each must hit only its class
    val (_, s1, p1, _, _, _) = one("123-45-6789")
    val (_, s2, p2, _, _, _) = one("555-123-4567")
    assert((s1, p1) === (1L, 0L))
    assert((s2, p2) === (0L, 1L))
  }

  test("dotted phone and ipv4 coexist") {
    val (_, _, p, i, _, out) = one("call 555.123.4567 from 10.0.0.7")
    assert((p, i) === (1L, 1L))
    assert(out === "call [PHONE] from [IP]")
  }
}
