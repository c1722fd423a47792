package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Oracle for the greedy packer: an independent driver-side fold over
  * the same (doc_id, ntok) input must produce identical assignments,
  * and the distributed result must be invariant to input partitioning.
  */
class PackingSpec extends SparkSpec {

  private def input() = {
    import graft.functions.TextFunctions.wsTokenCount
    Tables.documents(spark, sf)
      .select(col("doc_id"), wsTokenCount(col("text")).as("ntok"))
  }

  /** Reference implementation: sequential greedy fold per bucket. */
  private def referencePack(
      rows: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    rows.sortBy(_._1)
      .groupBy { case (id, _) => id / Corpus.GreedyBucketDocs }
      .toSeq
      .flatMap { case (bucket, docs) =>
        var bin = 0L
        var fill = 0L
        docs.sortBy(_._1).map { case (docId, ntok) =>
          if (fill > 0 && fill + ntok > Corpus.PackBudget) {
            bin += 1; fill = 0L
          }
          fill += ntok
          (bucket, bin, docId, ntok)
        }
      }
  }

  test("greedyPack matches an independent sequential fold") {
    val in = input()
    val got = Corpus.greedyPack(in)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val want = referencePack(
      in.collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSeq)
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.nonEmpty)
    assert(got.toSeq == want)
  }

  test("greedyPack invariants: budget respected, bins contiguous") {
    val packed = Corpus.greedyPack(input()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // No bin over budget unless it holds a single oversized doc.
    packed.groupBy(t => (t._1, t._2)).foreach { case (_, docs) =>
      val total = docs.map(_._4).sum
      assert(total <= Corpus.PackBudget || docs.length == 1)
    }
    // Within a bucket, bin ids are non-decreasing in doc order and
    // start at 0.
    packed.groupBy(_._1).foreach { case (_, docs) =>
      val byDoc = docs.sortBy(_._3).map(_._2)
      assert(byDoc.head == 0L)
      assert(byDoc.zip(byDoc.tail).forall { case (a, b) =>
        b == a || b == a + 1
      })
    }
  }

  test("greedyPack is invariant to input partitioning") {
    val in = input()
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.greedyPack(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity)
        .toSeq
    assert(run(in.repartition(1)) == run(in.repartition(7)))
  }

  test("greedyPack matches the fold on randomized inputs (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 3).foreach { _ =>
      val n = 50 + rnd.nextInt(400)
      // sparse non-contiguous ids, token counts spanning tiny to
      // over-budget (oversized docs must bin alone)
      val rows = (0 until n).map { _ =>
        (math.abs(rnd.nextLong()) % 10000L,
          1L + rnd.nextInt(2 * Corpus.PackBudget.toInt).toLong)
      }.distinctBy(_._1)
      val df = rows.toDF("doc_id", "ntok")
      val got = Corpus.greedyPack(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      val want = referencePack(rows).sortBy(t => (t._1, t._2, t._3))
      assert(got == want)
    }
  }

  test("pack_sequences and greedy pack agree on totals") {
    val q = SparkEntry.queries
    val chunked = q("q_pack_sequences")(spark, sf).collect()
    val greedy = q("q_pack_greedy")(spark, sf).collect()
    val chunkTotal = chunked.map(_.getAs[Long]("total_tokens")).sum
    val greedyTotal = greedy.map(_.getAs[Long]("total_tokens")).sum
    assert(chunkTotal == greedyTotal) // both pack every token exactly once
    // Greedy bins never exceed budget, so it needs at least as many
    // bins as the ideal chunking has chunks.
    assert(greedy.length >= chunked.length)
  }
}
