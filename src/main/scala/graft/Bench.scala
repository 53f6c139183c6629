package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Full materialization via the noop DSv2 sink — every output column
    * is computed and every operator executes, unlike `.count()`, which
    * lets Catalyst PRUNE work that doesn't affect the row count: under
    * count(), an aggregate-final query keeps only its grouping keys
    * (the window/aggregate expressions — often the entire point of the
    * query — are column-pruned away) and EliminateSorts drops the
    * output sort. Measured at sf100p: a 4-window ranking query "ran"
    * in 1.4 s under count() (scan + distinct keys only) vs minutes for
    * the real sorts. Discovered and fixed round 10; all prior rounds'
    * bench lines used count(), so agg-final entries there UNDER-state
    * true materialization cost — cross-ROUND deltas stay comparable
    * (same harness both sides), cross-HARNESS ones don't (SURVEY §13). */
  private[graft] def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    JvmOpens.check() // fail fast on a bare-java launch (see JvmOpens)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Tbl.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    // whichever query the Map happens to order first. The streaming
    // warmup matters most: the first StreamingQuery in a session pays
    // ~2.5s of one-time machinery init (state store, commit log, sink
    // classes, JIT) that otherwise lands on one measured query.
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => }
    try {
      materialize(SparkEntry.queries("s5_stream_complete")(spark, "/root/testdata/sf0.001"))
      spark.catalog.clearCache()
      spark.sqlContext.tableNames().foreach(spark.catalog.dropTempView)
    } catch { case _: Throwable => }
    // host-contention self-adjudication (round-10 verdict item #3):
    // every round since r2 some entries inflate 2-30x under external
    // load and settling "regression or noise?" has needed a judge
    // re-run. Record the OS 1-min load average alongside every timing
    // so an inflated line carries its own explanation: load >> ncpu at
    // sample time = contention, not a plan change.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadAvg: Double = osBean.getSystemLoadAverage // -1.0 if unsupported
    val ncpu = Runtime.getRuntime.availableProcessors
    // Round-12 verdict item #1: loadavg alone could NOT adjudicate the
    // driver's inflated line (j8 49.2 s at load 2.64). Per-query
    // /proc/stat + process-CPU deltas make the thief visible
    // IN-ARTIFACT — see [[CpuMeter]] for the field semantics.
    val loadStart = loadAvg
    // min of 2 timed runs per query: the host occasionally steals
    // 10-20s from exactly one query per pass (confirmed NOT JVM — zero
    // Full GCs, max safepoint 73ms while a query lost 15s), so a
    // single-shot total is dominated by where that stall lands. Caches
    // and sink tables are cleared between runs, so run 2 re-executes
    // the full plan — only JIT/page-cache warmth carries over.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = (1 to 2).map { _ =>
        val l0 = loadAvg
        val c0 = CpuMeter.snap()
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => () }
        val t = (System.nanoTime() - t0) / 1e9
        val cd = CpuMeter.delta(c0, CpuMeter.snap())
        // streaming queries leave memory-sink tables behind; drop them
        // so driver heap doesn't degrade later queries
        spark.catalog.clearCache()
        spark.sqlContext.tableNames().foreach(spark.catalog.dropTempView)
        (t, l0, cd)
      }
      // keep the load/CPU deltas sampled around the run that won the
      // min: that is the run the reported number came from
      name -> runs.minBy(_._1)
    }
    val qs = results.map { case (k, (v, _, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // sibling maps, same keys as "queries": 1-min loadavg when the
    // reported run started, and the run's interference CPU-second
    // deltas (existing consumers of "queries" unaffected)
    val loads = results.map { case (k, (_, l, _)) =>
      s"\"" + k + "\":" + f"$l%.2f" }.mkString("{", ",", "}")
    def cdMap(f: CpuMeter.Delta => Double) = results.map { case (k, (_, _, cd)) =>
      s"\"" + k + "\":" + f"${f(cd)}%.1f" }.mkString("{", ",", "}")
    val steals = cdMap(_.stealS)
    val iowaits = cdMap(_.iowaitS)
    val others = cdMap(_.otherS)
    val gcs = cdMap(_.gcS)
    val loadEnd = loadAvg
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // −1 when EVERY per-query delta is the −1 unavailable sentinel
    // (round-13 ADVICE: a 0.0 sum on a meterless platform was
    // indistinguishable from a genuinely interference-free run)
    def sumOrUnavailable(f: CpuMeter.Delta => Double): Double = {
      val vs = results.values.map(v => f(v._3)).toSeq
      if (vs.nonEmpty && vs.forall(_ < 0)) -1.0 else vs.filter(_ >= 0).sum
    }
    val sumOther = sumOrUnavailable(_.otherS)
    val sumSteal = sumOrUnavailable(_.stealS)
    // provenance on every JSONL line (round-5 VERDICT item #8): the
    // driver's stdout harvester truncates, so cross-round per-query
    // diffs read this file — each line must say WHICH round/commit it
    // measured. Round = the driver's correctness file counter + 1
    // (CORRECTNESS_rNN.json are written at round end, so during round
    // N the highest on disk is N-1); sha = current HEAD.
    val round = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => "CORRECTNESS_r(\\d+)\\.json".r
        .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .maxOption.map(_ + 1).getOrElse(0)
    val sha = try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
    } catch { case scala.util.control.NonFatal(_) => "unknown" }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"load":$loads,"steal_cpu_s":$steals,"iowait_cpu_s":$iowaits,"other_cpu_s":$others,"gc_cpu_s":$gcs,"load_start":${f"$loadStart%.2f"},"load_end":${f"$loadEnd%.2f"},"ncpu":$ncpu,"sf":"$sfDir","runs_per_query":2,"stat":"min","round":$round,"sha":"$sha"}"""
    // stdout carries a COMPACT line only (total + the 12 slowest
    // queries): the driver's stdout harvester keeps a bounded tail of
    // the sbt output, and the full 154-query line (~7 KB) has started
    // before that window every round since r4 — BENCH_rNN.json landed
    // with parsed:null while the full map survived only via the files
    // below. A <1 KB line always fits the tail, so the harvester's
    // parse works again; the complete per-query map still ships in
    // BENCH_full_rNN.json / BENCH_local.json.
    val fullName = f"BENCH_full_r$round%02d.json"
    // "top_queries", NOT "queries": the subset must not wear the full
    // map's key — an unaware cross-round consumer would silently narrow
    // from 154 to 12 entries instead of failing loudly (round-8 ADVICE)
    val topQs = results.toSeq.sortBy(-_._2._1).take(12)
      .map { case (k, (v, _, _)) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","top_queries":$topQs,"n_queries":${results.size},"load_start":${f"$loadStart%.2f"},"load_end":${f"$loadEnd%.2f"},"other_cpu_s_sum":${f"$sumOther%.1f"},"steal_cpu_s_sum":${f"$sumSteal%.1f"},"ncpu":$ncpu,"sf":"$sfDir","runs_per_query":2,"stat":"min","round":$round,"sha":"$sha","full":"$fullName"}""")
    // ALSO land the line in a file: the driver's stdout harvester has
    // truncated the sbt tail before (BENCH_r04 kept 63/135 timings), and
    // per-query history is the regression signal — it must survive
    // verbatim (round-4 VERDICT item #4). APPEND, not truncate: the file
    // is JSONL, one line per run (latest = last line), so sequential
    // runs — e.g. benching several scale factors — keep their history.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")),
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    // NonFatal only: a VM error (OOM...) must crash the bench, not be
    // mistaken for a file-write hiccup (round-5 ADVICE)
    catch { case e if scala.util.control.NonFatal(e) =>
      System.err.println(s"bench file write failed: $e") }
    // self-contained per-round artifact (round-6 VERDICT item #8): the
    // driver's stdout harvester has truncated the per-query tail two
    // rounds running, so the FULL timing map is also written to a file
    // named for the round — one line, overwritten on re-runs within the
    // round, so the driver ships all timings without depending on stdout
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(fullName),
      (line + "\n").getBytes("UTF-8"))
    catch { case e if scala.util.control.NonFatal(e) =>
      System.err.println(s"bench full-file write failed: $e") }
    spark.stop()
  }
}
