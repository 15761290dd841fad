package graft

import org.apache.spark.sql.functions._

/** Invariants for the synthetic-input scrub operators: redaction must be
  * complete (no raw PII survives) and URL canonicalization must actually
  * normalize every variant class it claims to.
  */
class TextScrubSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_pii_redact: no raw email/phone/IP survives; counts are exact") {
    val rows = SparkEntry.queries("text_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getString(1)
      assert(!red.contains("@mail.example"), s"email survived: $red")
      assert(!red.contains("+1-555-"), s"phone survived: $red")
      assert(!"""10\.\d+\.\d+\.\d+""".r.findFirstIn(red).isDefined,
        s"IP survived: $red")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]") &&
        red.contains("[IP]"))
      // the synthesized message carries exactly one of each
      assert(r.getLong(2) === 1L && r.getLong(3) === 1L && r.getLong(4) === 1L)
    }
  }

  test("dedup_url_canonical: canonical form is fully normalized, clusters collapse") {
    val rows = SparkEntry.queries("dedup_url_canonical")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u.startsWith("https://shop.example.com/item/"), u)
      assert(!u.contains(":443") && !u.contains("#") && !u.contains("utm_"), u)
      assert(!u.takeWhile(_ != '?').endsWith("/"), s"trailing slash: $u")
      assert(u === u.toLowerCase.replace("?ID=", "?id="), s"case leak: $u")
    }
    // case/port/utm/fragment/slash variants of the same item must have
    // collapsed: most canonical URLs should cover several raw variants
    assert(rows.count(_.getLong(1) > 1) > rows.length / 2,
      "expected multi-variant clusters after canonicalization")
  }
}
