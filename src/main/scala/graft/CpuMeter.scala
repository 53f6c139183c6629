package graft

/** Host-interference meter for bench artifacts (round-12 verdict item
  * #1). The 1-min loadavg is an EMA of runnable-task count and has
  * repeatedly failed to explain inflated timings (a query can lose 10×
  * wall at loadavg 2 on a 32-cpu box): it misses short bursts, IO
  * stalls, and hypervisor steal entirely. `/proc/stat`'s first line
  * carries host-wide cumulative tick counters that DO see all of it —
  * including co-tenant processes in foreign PID namespaces that `ps`
  * cannot enumerate — so per-query deltas adjudicate "regression or
  * interference?" from the artifact alone:
  *
  *   steal  = cpu-seconds the hypervisor withheld from this guest
  *   iowait = cpu-seconds cores sat idle waiting on IO
  *   other  = host busy cpu-seconds minus this JVM's own process CPU —
  *            i.e. compute consumed by ANYONE else during the window
  *
  * A wall-time spike with other≫0 / steal≫0 is environmental; all
  * three ≈0 beside a high wall means the regression is real. All
  * fields report −1 when the kernel interface is unavailable (non-Linux
  * or masked /proc), never throw.
  */
object CpuMeter {
  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean

  /** Cumulative host ticks (USER_HZ = 100 on linux-amd64/arm64) plus
    * this JVM's cumulative process CPU ns. */
  final case class Snap(total: Long, idle: Long, iowait: Long,
                        steal: Long, ownNs: Long)

  /** Interference CPU-seconds between two snapshots. */
  final case class Delta(stealS: Double, iowaitS: Double, otherS: Double) {
    def fmt: String =
      f"steal=$stealS%.1f iowait=$iowaitS%.1f other=$otherS%.1f"
  }

  def snap(): Snap = {
    // /proc/stat line 1: "cpu user nice system idle iowait irq softirq
    // steal guest guest_nice" — cumulative ticks summed over all cpus
    val t = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      finally src.close()
    } catch { case e if scala.util.control.NonFatal(e) => Array.empty[Long] }
    val ownNs = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    if (t.length >= 8) Snap(t.sum, t(3), t(4), t(7), ownNs)
    else Snap(-1L, -1L, -1L, -1L, ownNs)
  }

  def delta(a: Snap, b: Snap): Delta =
    if (a.total < 0 || b.total < 0) Delta(-1.0, -1.0, -1.0)
    else {
      val hz = 100.0
      val busyS = (b.total - a.total - (b.idle - a.idle) -
                   (b.iowait - a.iowait)) / hz
      val ownS = if (a.ownNs < 0 || b.ownNs < 0) -1.0
                 else (b.ownNs - a.ownNs) / 1e9
      Delta((b.steal - a.steal) / hz, (b.iowait - a.iowait) / hz,
            if (ownS < 0) -1.0 else math.max(0.0, busyS - ownS))
    }
}
