package graft

/** JDK-17 module-opens launch guard (round-13 gate post-mortem).
  *
  * Spark 4 on JDK 17 REQUIRES the `--add-opens` set from
  * `org.apache.spark.launcher.JavaModuleOptions` — spark-submit and
  * spark-class always inject it, and build.sbt mirrors it for forked
  * sbt runs. A bare `java -cp … graft.Verify` without those flags is a
  * time bomb, not an immediate failure: everything works until the
  * first code path that needs deep reflection. Round 13's sf10 gate hit
  * exactly that — Kryo is constructed lazily, first touched when
  * memory-pressure eviction serialized a Kryo-eligible cached block
  * (`SerializerManager.canUseKryo`: primitive/primitive-array/String
  * class tags), and `KryoSerializer.newKryo()` died REGISTERING its
  * default class list (`java.nio.HeapByteBuffer` needs `ByteBuffer.hb`
  * accessible ⇒ `java.base does not "opens java.nio"`), cascading into
  * a dead SparkContext two hours into the run (CHECK_sf10_r13 header).
  *
  * At 100 TB, eviction is the steady state, so a launch that cannot
  * serialize-on-evict must die at t=0 with the exact remediation, not
  * at t=2h with a Kryo stack trace. Every long-running main in this
  * repo calls [[check]] before building its SparkSession.
  *
  * The required list is parsed from Spark's OWN launcher constant at
  * runtime, so it can never drift from the Spark version on the
  * classpath. `main` prints the canonical option string — shell
  * launchers (tools/gate_sf10.sh) use it instead of a hand-copied list.
  */
object JvmOpens {

  /** (module, package) pairs Spark's launcher would open to the
    * unnamed module. */
  def requiredOpens: Seq[(String, String)] =
    org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptionArray()
      .toSeq
      .filter(_.startsWith("--add-opens="))
      .map { s =>
        val modPkg = s.stripPrefix("--add-opens=").split('=')(0)
        val Array(mod, pkg) = modPkg.split('/')
        (mod, pkg)
      }

  /** Required opens NOT visible to this (unnamed) module — empty under
    * spark-submit, sbt fork, or a `java $(graft.JvmOpens)` launch.
    * Modules absent from the boot layer are skipped: an `--add-opens`
    * for an unresolved module is a no-op at launch too. */
  def missing: Seq[String] = {
    val unnamed = getClass.getModule
    requiredOpens.collect {
      case (mod, pkg)
          if {
            val m = ModuleLayer.boot().findModule(mod)
            m.isPresent && !m.get.isOpen(pkg, unnamed)
          } =>
        s"--add-opens=$mod/$pkg=ALL-UNNAMED"
    }
  }

  /** Fail fast (with the exact flags to add) when the JVM was launched
    * without Spark's required module options. Escape hatch:
    * SPARK_GRAFT_SKIP_OPENS_CHECK=1 downgrades to a stderr warning —
    * for probing the broken configuration deliberately, never for
    * production runs. */
  def check(): Unit = {
    val miss = missing
    if (miss.nonEmpty) {
      val msg =
        s"""JVM launched without Spark's required JDK module options; missing:
           |  ${miss.mkString("\n  ")}
           |This JVM would die at the FIRST memory-pressure eviction (lazy
           |Kryo init registers java.nio.HeapByteBuffer). Launch via sbt /
           |spark-submit, or prepend:
           |  java $$(java -cp <classpath> graft.JvmOpens) -cp <classpath> …
           |""".stripMargin
      if (sys.env.get("SPARK_GRAFT_SKIP_OPENS_CHECK").contains("1"))
        System.err.println(s"[jvm-opens] WARNING (check skipped): $msg")
      else throw new IllegalStateException(msg)
    }
  }

  /** Prints the canonical launch options — consumed by shell tooling. */
  def main(args: Array[String]): Unit =
    println(org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
}
