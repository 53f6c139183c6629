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
    // SPARK_GRAFT_EXPLAIN_MODE=formatted prints the numbered-operator
    // form (PushedFilters/ReadSchema per scan) the optimization-round
    // plan artifacts use; default stays the compact tree.
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "simple")
    for (name <- names) {
      println(s"===== $name =====")
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      if (mode == "formatted")
        println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      else println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}
