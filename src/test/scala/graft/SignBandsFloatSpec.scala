package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DotProductFloat, SignBandsFloat}

/** The banded-signature kernel: one SignBandsFloat call must equal the
  * per-plane when(dot > 0) formulation it replaced (bit-for-bit bucket
  * ids — same left-to-right double dots, same sign test), across
  * interpreted and codegen paths, plus the corpus-scaled sizing rule. */
class SignBandsFloatSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val bands = 8

  private def planes(rows: Int): Seq[Array[Float]] = {
    val p = Tbl.embeddings(spark, d).where($"vec_id" < bands * rows)
      .select($"vec_id".cast("int"), $"embedding")
      .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1).map(_._2)
    assert(p.size == bands * rows, s"corpus too small for $bands x $rows planes")
    p
  }

  test("kernel equals the stacked when(dot)-chain formulation bit-for-bit") {
    for (rows <- Seq(1, 6, 11)) {
      val ps = planes(rows)
      val chain = array((0 until bands).map { band =>
        ps.slice(band * rows, (band + 1) * rows).zipWithIndex.map { case (p, j) =>
          when(DotProductFloat.dotF($"embedding", typedLit(p)) > 0.0, lit(1L << j))
            .otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)
      val kernel = SignBandsFloat.signBands(
        $"embedding", typedLit(ps.toArray.flatten), rows)
      val diff = Tbl.embeddings(spark, d)
        .select(chain.as("c"), kernel.as("k"))
        .where(not($"c" <=> $"k"))
      assert(diff.count() == 0, s"rows=$rows: kernel diverges from chain")
    }
  }

  test("null vector yields null signature array") {
    val r = Seq((1, null.asInstanceOf[Array[Float]])).toDF("id", "embedding")
      .select(SignBandsFloat.signBands(
        $"embedding", typedLit(Array(1.0f, 2.0f)), 1).as("s"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("band count derives from the plane matrix: b*r planes -> b buckets") {
    val ps = planes(6)
    val n = Tbl.embeddings(spark, d)
      .select(SignBandsFloat.signBands(
        $"embedding", typedLit(ps.toArray.flatten), 6).as("s"))
      .select(size($"s").as("n")).distinct().as[Int].collect().toSeq
    assert(n == Seq(bands))
  }
}
