package graft.operators

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim unit-norm float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * random-hyperplane LSH bucketed variant as the scale path, and
  * embedding-cosine near-dup pairs for the dedup mandate.
  *
  * 100 TB design notes:
  *  - Brute force broadcasts the (small) query set against the full
  *    corpus — one scan, no shuffle of the corpus side, map-side top-k
  *    via window over (query, bucketed) partitions.
  *  - The LSH variant buckets every vector by the sign pattern of its
  *    dot products with 8 fixed hyperplanes (the first 8 corpus vectors
  *    — deterministic, no RNG), then only compares within a bucket:
  *    candidate count drops ~2^8 while the bucket join stays a plain
  *    equi-join on an int key.
  *  - Dot products fold float32 values cast to double, sequentially
  *    (Spark `aggregate` ≡ DuckDB `list_sum` left fold), rounded to 6
  *    before any ranking so both engines rank identically.
  */
object SimilarityOps extends QueryModule {

  /** Sequential-fold dot product of two float vectors, in double —
    * as a native codegen expression (graft.plans.DotProductFloat): the
    * `aggregate(zip_with(...))` HOF formulation is semantically equal
    * but runs interpreted and breaks whole-stage codegen. */
  private def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProductFloat.dotF(a, b)
  private def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in generate_series(1, len($a))])"

  private val NumQueries = 10
  private val TopK = 5

  /** Brute-force cosine top-k: query set = vec_id < 10 (deterministic),
    * ranked per query on (rounded cosine desc, vec_id). Vectors are
    * unit-norm, so cosine = dot. */
  private def topkBrute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tbl.embeddings(s, d)
    val queries = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val scored = emb.crossJoin(broadcast(queries))
      .where($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
              round(dot($"q_emb", $"embedding"), 6).as("cosine"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rk", row_number().over(w))
      .where($"rk" <= TopK)
      .orderBy($"q_id", $"rk")
  }

  private val topkBruteSql =
    s"""SELECT q_id, vec_id, cosine, rk FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    round(${dotSql("q.embedding", "e.embedding")}, 6) AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |                       ORDER BY round(${dotSql("q.embedding", "e.embedding")}, 6) DESC,
       |                                e.vec_id) AS rk
       |  FROM embeddings e, embeddings q
       |  WHERE q.vec_id < $NumQueries AND e.vec_id <> q.vec_id)
       |WHERE rk <= $TopK ORDER BY q_id, rk""".stripMargin

  private val NumPlanes = 8

  /** Hyperplane-LSH bucket id: bit j = sign(v · plane_j), planes = the
    * first 8 corpus vectors (fixed, deterministic). */
  private def lshAnn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tbl.embeddings(s, d)
    val planes = emb.where($"vec_id" < NumPlanes)
      .select($"vec_id".as("p_id"), $"embedding".as("p_emb"))
    // bucket every vector: 8 broadcast-joined sign bits → int key
    val bucketed = emb.crossJoin(broadcast(planes))
      .select($"vec_id", $"embedding", $"p_id",
              when(dot($"embedding", $"p_emb") > 0.0,
                   expr("1 << CAST(p_id AS INT)")).otherwise(lit(0)).as("bit"))
      .groupBy($"vec_id")
      .agg(sum($"bit").as("bucket"), first($"embedding").as("embedding"))
    val queries = bucketed.where($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"bucket", $"embedding".as("q_emb"))
    val scored = bucketed.as("c")
      .join(broadcast(queries).as("q"), Seq("bucket"))
      .where($"c.vec_id" =!= $"q.q_id")
      .select($"q_id", $"bucket", $"c.vec_id".as("vec_id"),
              round(dot($"q_emb", $"c.embedding"), 6).as("cosine"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .orderBy($"q_id", $"rk")
  }

  private val lshAnnSql = {
    val bucketExpr =
      s"""(SELECT sum(CASE WHEN ${dotSql("e.embedding", "p.embedding")} > 0.0
         |                 THEN 1 << p.vec_id ELSE 0 END)
         |  FROM embeddings p WHERE p.vec_id < $NumPlanes)""".stripMargin
    s"""WITH bucketed AS (
       |  SELECT e.vec_id, e.embedding, $bucketExpr AS bucket
       |  FROM embeddings e)
       |SELECT q_id, bucket, vec_id, cosine, rk FROM (
       |  SELECT q.vec_id AS q_id, c.bucket AS bucket, c.vec_id AS vec_id,
       |    round(${dotSql("q.embedding", "c.embedding")}, 6) AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |                       ORDER BY round(${dotSql("q.embedding", "c.embedding")}, 6) DESC,
       |                                c.vec_id) AS rk
       |  FROM bucketed c JOIN bucketed q ON c.bucket = q.bucket
       |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  }

  private val NumCentroids = 16

  /** IVF-style ANN: every vector is assigned to its nearest of 16 fixed
    * centroids (the first 16 corpus vectors — deterministic, no k-means
    * RNG); queries probe only their own cell (nprobe=1). The inverted
    * list is just a groupable int column — at 100 TB the cell assignment
    * is a broadcast map pass and search is an equi-join on cell id. */
  private def ivfAnn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tbl.embeddings(s, d)
    val cents = emb.where($"vec_id" < NumCentroids)
      .select($"vec_id".as("c_id"), $"embedding".as("c_emb"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy(round(dot($"embedding", $"c_emb"), 6).desc, $"c_id")
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("rka", row_number().over(wAssign))
      .where($"rka" === 1)
      .select($"vec_id", $"embedding", $"c_id".as("cell"))
    val queries = assigned.where($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"cell", $"embedding".as("q_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id")
    assigned.as("c")
      .join(broadcast(queries).as("q"), Seq("cell"))
      .where($"c.vec_id" =!= $"q.q_id")
      .select($"q_id", $"cell", $"c.vec_id".as("vec_id"),
              round(dot($"q_emb", $"c.embedding"), 6).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .orderBy($"q_id", $"rk")
  }

  private val ivfAnnSql = {
    s"""WITH assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.vec_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${dotSql("e.embedding", "c.embedding")}, 6) DESC,
       |                 c.vec_id) AS rka
       |    FROM embeddings e, embeddings c WHERE c.vec_id < $NumCentroids)
       |  WHERE rka = 1)
       |SELECT q_id, cell, vec_id, cosine, rk FROM (
       |  SELECT q.vec_id AS q_id, c.cell AS cell, c.vec_id AS vec_id,
       |    round(${dotSql("q.embedding", "c.embedding")}, 6) AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |                       ORDER BY round(${dotSql("q.embedding", "c.embedding")}, 6) DESC,
       |                                c.vec_id) AS rk
       |  FROM assigned c JOIN assigned q ON c.cell = q.cell
       |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  }

  /** Embedding-cosine near-dup pairs, blocked by class label: the
    * embedding leg of the dedup mandate. */
  private def embeddingNeardup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tbl.embeddings(s, d).select($"vec_id", $"label", $"embedding")
    emb.as("l")
      .join(emb.as("r"), $"l.label" === $"r.label" && $"l.vec_id" < $"r.vec_id")
      .select($"l.vec_id".as("a"), $"r.vec_id".as("b"), $"l.label".as("label"),
              round(dot($"l.embedding", $"r.embedding"), 6).as("cosine"))
      .where($"cosine" >= 0.6)
      .orderBy($"a", $"b")
  }

  private val embeddingNeardupSql =
    s"""SELECT l.vec_id AS a, r.vec_id AS b, l.label AS label,
       |  round(${dotSql("l.embedding", "r.embedding")}, 6) AS cosine
       |FROM embeddings l JOIN embeddings r
       |  ON l.label = r.label AND l.vec_id < r.vec_id
       |WHERE round(${dotSql("l.embedding", "r.embedding")}, 6) >= 0.6
       |ORDER BY a, b""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_brute"   -> (topkBrute _),
    "sim_lsh_ann"      -> (lshAnn _),
    "sim_ivf_ann"      -> (ivfAnn _),
    "sim_emb_neardup"  -> (embeddingNeardup _))

  override val oracles: Map[String, String] = Map(
    "sim_topk_brute"   -> topkBruteSql,
    "sim_lsh_ann"      -> lshAnnSql,
    "sim_ivf_ann"      -> ivfAnnSql,
    "sim_emb_neardup"  -> embeddingNeardupSql)
}
