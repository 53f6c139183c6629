package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 sf10-gate crash and its fix (JvmOpens):
  *
  * a bare `java -cp` launch without Spark's JDK-17 `--add-opens` set
  * survives until memory-pressure eviction first constructs Kryo, then
  * dies on `java.nio.HeapByteBuffer` registration and takes the
  * SparkContext with it. The fix is two-sided: shell launchers derive
  * the flags from `graft.JvmOpens` (itself parsing Spark's own
  * JavaModuleOptions), and every engine main fail-fasts at startup via
  * `JvmOpens.check()`. These tests run the crash and both fixes as
  * SUBPROCESSES, so the broken configuration is exercised for real —
  * the sbt test JVM itself always carries the opens (build.sbt).
  */
class JvmOpensSpec extends AnyFunSuite {

  private val cp = sys.props("java.class.path")
  private val javaBin =
    new File(new File(sys.props("java.home"), "bin"), "java").getPath

  private def run(addOpens: Boolean, args: String*): (Int, String) = {
    val opens =
      if (addOpens)
        org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptionArray()
          .toSeq
      else Seq.empty
    // 512m: small enough that the evict probe's cached blocks overflow
    // the storage pool (its sizing comment relies on this), harmless
    // for the other modes
    val cmd = Seq(javaBin, "-Xmx512m") ++ opens ++
      Seq("-cp", cp, "graft.KryoProbe") ++ args
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val exit = p.waitFor()
    (exit, out)
  }

  test("this (sbt-forked) JVM carries every open Spark's launcher requires") {
    // pins build.sbt's jdk17AddOpens list against the canonical one in
    // the Spark version on the classpath — drift fails here, not 2h
    // into a gate
    assert(JvmOpens.missing.isEmpty,
           s"build.sbt javaOptions out of sync: ${JvmOpens.missing}")
  }

  test("the requirement list includes java.nio (the round-13 killer)") {
    assert(JvmOpens.requiredOpens.contains(("java.base", "java.nio")))
  }

  test("bare-java Kryo init reproduces the eviction crash; the flags fix it") {
    val (badExit, badOut) = run(addOpens = false)
    assert(badExit != 0, s"expected bare-java Kryo init to fail:\n$badOut")
    assert(badOut.contains("HeapByteBuffer") ||
             badOut.contains("InaccessibleObjectException"),
           s"failed for an unexpected reason:\n${badOut.take(2000)}")

    val (okExit, okOut) = run(addOpens = true)
    assert(okExit == 0 && okOut.contains("kryo-probe-ok"),
           s"Kryo init should survive with the launcher flags:\n${okOut.take(2000)}")
  }

  test("eviction survival: a real SparkContext under memory pressure " +
       "dies bare, survives with the flags (the round-13 gate, end to end)") {
    // the full production path: MemoryStore.evictBlocksToFreeSpace ->
    // dropFromMemory -> dataSerializeStream auto-picks Kryo for the
    // String-class-tag blocks the probe caches beyond its storage pool
    val (badExit, badOut) = run(addOpens = false, "evict")
    assert(badExit != 0, s"expected the bare-java eviction to fail:\n$badOut")
    assert(badOut.contains("HeapByteBuffer"),
           s"failed for an unexpected reason:\n${badOut.take(3000)}")
    assert(badOut.contains("dropFromMemory") || badOut.contains("evictBlocks"),
           s"crash not on the eviction path:\n${badOut.take(3000)}")

    val (okExit, okOut) = run(addOpens = true, "evict")
    assert(okExit == 0 && okOut.contains("kryo-probe-ok"),
           s"eviction should survive with the launcher flags:\n${okOut.take(3000)}")
  }

  test("JvmOpens.check() fail-fasts a bare-java launch with the remediation") {
    val (exit, out) = run(addOpens = false, "guard")
    assert(exit != 0)
    assert(out.contains("required JDK module options"), out.take(2000))
    assert(out.contains("--add-opens=java.base/java.nio=ALL-UNNAMED"),
           out.take(2000))

    val (okExit, okOut) = run(addOpens = true, "guard")
    assert(okExit == 0 && okOut.contains("kryo-probe-ok"), okOut.take(2000))
  }
}
