package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass a training-data pipeline
  * runs before a corpus release (emails, phone numbers, long numeric
  * identifiers), as single-scan codegen'd regex column expressions.
  *
  * The synthetic `documents` text is lowercase word soup with no
  * digits, so the oracle-checked query renders a contact-card corpus
  * deterministically from `customer` (name, derived e-mail, derived
  * phone, account number) in BOTH engines and scrubs that — the regex
  * semantics (match sets, replacement, ordering) are what the hash
  * compare then actually verifies. PiiSpec covers the patterns on
  * real-shaped fixture strings including negatives.
  *
  * Redaction order matters and is part of the contract: e-mails first
  * (their local parts contain digit runs), then phones (digit groups
  * with separators), then standalone long digit runs — each later
  * count runs over the previous redaction's output so nothing is
  * double-counted.
  *
  * Patterns are deliberately RE2-safe (no backrefs/lookaround) so the
  * same pattern strings run identically under Java regex (Spark) and
  * RE2 (DuckDB oracle).
  *
  * Scale: embarrassingly parallel per-row expressions — one scan, one
  * map-side-partial aggregation on the (tiny) nation key; the nation
  * name join is a broadcast.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
  val IdRe = "[0-9]{6,}"

  def redactEmails(c: Column): Column = regexp_replace(c, EmailRe, "[EMAIL]")
  def redactPhones(c: Column): Column = regexp_replace(c, PhoneRe, "[PHONE]")
  def redactIds(c: Column): Column = regexp_replace(c, IdRe, "[ID]")

  /** Full ordered scrub: emails, then phones, then long digit runs. */
  def redact(c: Column): Column = redactIds(redactPhones(redactEmails(c)))

  def countEmails(c: Column): Column = regexp_count(c, lit(EmailRe))
  def countPhones(c: Column): Column = regexp_count(c, lit(PhoneRe))
  def countIds(c: Column): Column = regexp_count(c, lit(IdRe))

  // Contact-card render: every card carries the customer name (whose
  // 9-digit run is ID-shaped PII on its own); e-mail appears for even
  // keys and phone for keys divisible by 3, so per-nation counts vary.
  private def card(key: Column, name: Column): Column =
    concat(
      lit("Contact "), name,
      when(key % 2 === 0,
        concat(lit(" at user"), key.cast("string"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when(key % 3 === 0,
        concat(lit(" or +1-555-"),
          lpad((key % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      lit(" (acct "), (key * 37 + 100000000L).cast("string"), lit(")"))

  private val duckCard =
    """'Contact ' || c_name
      | || CASE WHEN c_custkey % 2 = 0 THEN ' at user'
      |      || CAST(c_custkey AS VARCHAR) || '@mail.example.com'
      |    ELSE '' END
      | || CASE WHEN c_custkey % 3 = 0 THEN ' or +1-555-'
      |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
      |    ELSE '' END
      | || ' (acct ' || CAST(c_custkey * 37 + 100000000 AS VARCHAR) || ')'
      |""".stripMargin.replaceAll("\n", "")

  private val qPii = QuerySpec.of(
    "q_text_pii",
    s"""WITH cards AS (
      |  SELECT c_nationkey, ($duckCard) AS card FROM customer),
      |r AS (
      |  SELECT c_nationkey, card,
      |    regexp_replace(card, '$EmailRe', '[EMAIL]', 'g') AS t1
      |  FROM cards),
      |r2 AS (
      |  SELECT *, regexp_replace(t1, '$PhoneRe', '[PHONE]', 'g') AS t2
      |  FROM r),
      |r3 AS (
      |  SELECT *, regexp_replace(t2, '$IdRe', '[ID]', 'g') AS t3
      |  FROM r2),
      |m AS (
      |  SELECT c_nationkey,
      |    len(regexp_extract_all(card, '$EmailRe')) AS ne,
      |    len(regexp_extract_all(t1, '$PhoneRe')) AS np,
      |    len(regexp_extract_all(t2, '$IdRe')) AS ni,
      |    length(card) AS oc, length(t3) AS rc
      |  FROM r3)
      |SELECT n.n_name AS nation, count(*) AS n_docs,
      |  CAST(sum(ne) AS BIGINT) AS n_emails,
      |  CAST(sum(np) AS BIGINT) AS n_phones,
      |  CAST(sum(ni) AS BIGINT) AS n_ids,
      |  CAST(sum(CASE WHEN ne + np + ni = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clean,
      |  CAST(sum(oc) AS BIGINT) AS orig_chars,
      |  CAST(sum(rc) AS BIGINT) AS redacted_chars
      |FROM m JOIN nation n ON m.c_nationkey = n.n_nationkey
      |GROUP BY nation ORDER BY nation""".stripMargin) { (s, d) =>
    val cards = Tables.customer(s, d)
      .select(col("c_nationkey"),
        card(col("c_custkey"), col("c_name")).as("card"))
    val nations = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("nation")))
    cards
      .withColumn("t1", redactEmails(col("card")))
      .withColumn("t2", redactPhones(col("t1")))
      .withColumn("t3", redactIds(col("t2")))
      .select(col("c_nationkey"),
        countEmails(col("card")).as("ne"),
        countPhones(col("t1")).as("np"),
        countIds(col("t2")).as("ni"),
        length(col("card")).as("oc"), length(col("t3")).as("rc"))
      .join(nations, "c_nationkey")
      .groupBy("nation")
      .agg(count(lit(1)).as("n_docs"),
        sum("ne").as("n_emails"),
        sum("np").as("n_phones"),
        sum("ni").as("n_ids"),
        sum(when(col("ne") + col("np") + col("ni") === 0, 1).otherwise(0))
          .as("n_clean"),
        sum("oc").as("orig_chars"),
        sum("rc").as("redacted_chars"))
      .orderBy("nation")
  }

  val specs: Seq[QuerySpec] = Seq(qPii)
}
