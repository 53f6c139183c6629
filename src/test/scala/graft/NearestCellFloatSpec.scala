package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DotProductFloat, NearestCellFloat}

/** The nearest-centroid kernel must equal the array_min((-cos6, id))
  * struct idiom it replaces (max truncated cosine, ties to smallest
  * index) across interpreted and codegen paths. */
class NearestCellFloatSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def cos6(c: org.apache.spark.sql.Column) =
    floor(c * 1000000.0) / 1000000.0

  test("kernel equals the struct-argmin formulation for k=16 and k=64") {
    for (k <- Seq(16, 64)) {
      val cents = Tbl.embeddings(spark, d).where($"vec_id" < k)
        .select($"vec_id".cast("int"), $"embedding")
        .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1)
      assume(cents.size == k, s"corpus too small for $k centroids")
      val chain = array_min(array(cents.map { case (i, c) =>
        struct((-cos6(DotProductFloat.dotF($"embedding", typedLit(c)))).as("nd"),
               lit(i.toLong).as("c_id"))
      }: _*)).getField("c_id")
      val kernel = NearestCellFloat.nearestCell(
        $"embedding", typedLit(cents.toArray.flatMap(_._2)))
      val diff = Tbl.embeddings(spark, d)
        .select(chain.as("c"), kernel.as("k"))
        .where(not($"c" <=> $"k"))
      assert(diff.count() == 0, s"k=$k: kernel diverges from struct idiom")
    }
  }

  test("tie on truncated cosine goes to the smallest index") {
    // two identical centroids: every vector ties; index 0 must win
    val c0 = Array.fill(4)(0.5f)
    val cents = c0 ++ c0
    val r = Seq((1L, Array(1.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(NearestCellFloat.nearestCell(
        $"embedding", typedLit(cents)).as("cell"))
      .as[Long].head()
    assert(r == 0L)
  }

  test("broadcast codebook relation equals the literal kernel, gapped cell ids translate") {
    // the trained-quantizer scale path ships the codebook as a one-row
    // broadcast relation (cids, cmat) instead of a plan literal; the
    // kernel's POSITIONAL argmax must land on the same centroid, and
    // element_at(cids, idx+1) must translate positions to surviving
    // cell ids — including when seed cells died (gapped ids)
    val ids = Seq(0, 3, 7) // deliberately gapped survivors
    val byId = Tbl.embeddings(spark, d).where($"vec_id".isin(ids.map(_.toLong): _*))
      .select($"vec_id".cast("int"), $"embedding")
      .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1)
    assume(byId.size == ids.size)
    val flat = byId.toArray.flatMap(_._2)
    val rel = Seq((byId.map(_._1.toLong).toArray, flat)).toDF("cids", "cmat")
    val out = Tbl.embeddings(spark, d)
      .crossJoin(broadcast(rel))
      .select($"vec_id",
              element_at($"cids",
                (NearestCellFloat.nearestCell($"embedding", $"cmat") + 1)
                  .cast("int")).as("cell"),
              NearestCellFloat.nearestCell(
                $"embedding", typedLit(flat)).as("idx"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == ids(r.getLong(2).toInt).toLong,
             s"vec ${r.getLong(0)}: relation cell ${r.getLong(1)} != " +
             s"literal idx ${r.getLong(2)} -> id")
    }
  }

  test("null vector yields null cell") {
    val r = Seq((1, null.asInstanceOf[Array[Float]])).toDF("id", "embedding")
      .select(NearestCellFloat.nearestCell(
        $"embedding", typedLit(Array(1.0f, 2.0f))).as("c"))
      .collect().head
    assert(r.isNullAt(0))
  }
}
