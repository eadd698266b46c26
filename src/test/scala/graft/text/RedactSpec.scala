package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RedactSpec extends SparkTestBase {
  import spark.implicits._

  private def run(s: String): (String, Long) = {
    val r = Seq(s).toDF("t")
      .select(Redact.scrub($"t").as("c"), Redact.redactionCount($"t").as("n"))
      .as[(String, Long)].head()
    r
  }

  test("emails, phones and IPs are masked with stable placeholders") {
    val (c, n) = run(
      "mail bob.smith+x@sub.example.org or call 555-867-5309; host 10.0.255.7 ok")
    assert(c === "mail <EMAIL> or call <PHONE>; host <IP> ok")
    assert(n === 3L)
  }

  test("clean text is untouched and counts zero") {
    val s = "three dots a.b.c are not an ip and 12-34 is not a phone"
    val (c, n) = run(s)
    assert(c === s)
    assert(n === 0L)
  }

  test("scrub is idempotent; counts are computed on the raw text") {
    val df = Seq("a@b.io meets 1.2.3.4").toDF("t")
      .select(Redact.scrub($"t").as("once"))
      .select($"once", Redact.scrub($"once").as("twice"),
        Redact.redactionCount($"once").as("n_after"))
    val (once, twice, nAfter) = df.as[(String, String, Long)].head()
    assert(once === twice)
    assert(nAfter === 0L, "placeholders must not re-match any rule")
  }

  test("multiple matches of one rule all masked") {
    val (c, n) = run("a@b.co c@d.co 1.2.3.4 5.6.7.8")
    assert(c === "<EMAIL> <EMAIL> <IP> <IP>")
    assert(n === 4L)
  }
}
