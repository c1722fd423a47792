package graft

import graft.operators.AsofJoin
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property tests for the native as-of join: on arbitrary random
  * inputs, both physical variants (co-partitioned merge AND broadcast
  * index) must agree exactly with a brute-force per-row reference —
  * newest right row with equal key and rt <= lt, optional inclusive
  * tolerance against that newest candidate only, outer NULL padding.
  *
  * Each sample embeds ~dozens of independent cases in one DataFrame
  * (distinct key spaces), so a property run costs a handful of Spark
  * jobs, not one per case; sample count is tuned down accordingly —
  * the coverage comes from case batching, not sample count.
  */
object AsofProps extends Properties("AsofJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  private val Tol = 50L

  /** (leftRows, rightRows): rows are (key, time, payload); right side
    * deduped per (key, time) — the operator's documented determinism
    * contract.
    */
  private val casesGen: Gen[(Seq[(Long, Long, Long)],
      Seq[(Long, Long, Long)])] = for {
    seed <- Gen.long
  } yield {
    val rnd = new scala.util.Random(seed)
    val nKeys = 1 + rnd.nextInt(30)
    val left = (1L to 300L).map(i =>
      (rnd.nextInt(nKeys).toLong, rnd.nextInt(400).toLong, i))
    val right = (1L to 200L).map(i =>
      (rnd.nextInt(nKeys).toLong, rnd.nextInt(400).toLong, i + 10000))
      .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq
    (left, right)
  }

  private def bruteForce(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], tol: Option[Long])
      : Set[(Long, Option[Long])] =
    left.map { case (k, t, lv) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t)
      val newest = if (cand.isEmpty) None else Some(cand.maxBy(_._2))
      val m = newest.filter(r => tol.forall(t - r._2 <= _)).map(_._3)
      (lv, m)
    }.toSet

  private def run(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], tol: Option[Long],
      bcast: Boolean): Set[(Long, Option[Long])] = {
    import spark.implicits._
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("rk", "rt", "rv")
    AsofJoin.join(l, r, Seq("k" -> "rk"), "t", "rt", tol,
      outer = true, broadcastRight = bcast)
      .select($"lv", $"rv").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
  }

  property("merge exec == brute force (no tolerance)") =
    Prop.forAll(casesGen) { case (l, r) =>
      run(l, r, None, bcast = false) == bruteForce(l, r, None)
    }

  property("merge exec == brute force (inclusive tolerance)") =
    Prop.forAll(casesGen) { case (l, r) =>
      run(l, r, Some(Tol), bcast = false) == bruteForce(l, r, Some(Tol))
    }

  property("broadcast exec == brute force (inclusive tolerance)") =
    Prop.forAll(casesGen) { case (l, r) =>
      run(l, r, Some(Tol), bcast = true) == bruteForce(l, r, Some(Tol))
    }
}
