package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit aid: print the formatted executed plan of registered
  * queries without running them to completion.
  * Usage: sbt "runMain graft.Explain <query> [query...] [sfDir]" */
object Explain {
  def main(args: Array[String]): Unit = {
    JvmOpens.check() // fail fast on a bare-java launch (see JvmOpens)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Tbl.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (names, dir) =
      if (args.length > 1 && new java.io.File(args.last).isDirectory)
        (args.init.toSeq, args.last)
      else (args.toSeq, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.001"))
    for (name <- names) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
