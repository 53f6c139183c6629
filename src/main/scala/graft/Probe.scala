package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch microbench (not registered; delete freely): isolates the
  * per-stage cost of the documents text pipeline at a given sfDir. */
object Probe {
  def main(args: Array[String]): Unit = {
    JvmOpens.check() // fail fast on a bare-java launch (see JvmOpens)
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Tbl.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.TextNorm.norm

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val docs = Tbl.documents(spark, dir)
    t("scan_only")          { docs.select($"doc_id", length($"text")) }
    t("lower_only")         { docs.select($"doc_id", length(lower($"text"))) }
    t("regex1")             { docs.select($"doc_id", length(regexp_replace(lower($"text"), "[^a-z0-9 ]", ""))) }
    t("norm_full")          { docs.select($"doc_id", length(norm($"text"))) }
    t("norm_split_size")    { docs.select($"doc_id", size(split(norm($"text"), " "))) }
    val spaced0 = replace(concat(lit(" "), norm($"text"), lit(" ")), lit(" "), lit("  "))
    t("spaced_len")         { docs.select($"doc_id", length(spaced0)) }
    def cnt(sp: org.apache.spark.sql.Column, w: String) =
      ((length(sp) - length(replace(sp, lit(s" $w ")))) / lit(w.length + 2)).cast("long")
    t("spaced_1count")      { docs.withColumn("sp", spaced0).select($"doc_id", cnt($"sp", "the")) }
    t("spaced_15counts")    { docs.withColumn("sp", spaced0).select($"doc_id",
      Seq("the","a","and","der","und","die","el","y","los","le","et","la","shi","de","bu")
        .map(w => cnt($"sp", w)).reduce(_ + _)) }
    spark.stop()
  }
}
