package graft
import org.apache.spark.sql.SparkSession

/** Local profiling aid: time one registered query in a warm JVM
  * (3 runs, cache cleared between) — separates query cost from the
  * ~20 s sbt/JVM startup that dominates single-query Verify walls.
  * Usage: sbt "runMain graft.TimeOne <query> <sfDir>" */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Tbl.sparkLocalDir)
    // experiment knob: SPARK_GRAFT_CONF="k=v;k2=v2" extra session confs
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (name, dir) = (args(0), args(1))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(s"run$i ${(System.nanoTime() - t0) / 1e9}")
      spark.catalog.clearCache()
      spark.sqlContext.tableNames().foreach(spark.catalog.dropTempView)
    }
    spark.stop()
  }
}
