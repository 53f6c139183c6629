package graft

import org.apache.spark.SparkConf
import org.apache.spark.serializer.KryoSerializer

/** Minimal reproduction of the round-13 gate crash, as a subprocess
  * probe for JvmOpensSpec and as a standalone launch-environment
  * diagnostic.
  *
  * `KryoSerializer.newKryo()` registers a default class list that
  * includes `java.nio.HeapByteBuffer`; building its FieldSerializer
  * reflects into `ByteBuffer.hb`, which on JDK 17 requires
  * `--add-opens=java.base/java.nio=ALL-UNNAMED`. Spark constructs Kryo
  * LAZILY — in the round-13 gate the first construction happened when
  * memory-pressure eviction serialized a Kryo-eligible cached block,
  * two hours into the run. This main forces that construction at t=0:
  *
  *   java -cp <cp> graft.KryoProbe          # kryo: the raw crash path
  *   java -cp <cp> graft.KryoProbe guard    # JvmOpens.check() fail-fast
  *
  * Exit 0 = this launch survives eviction-time Kryo init; nonzero with
  * the stack = the launch is a time bomb (add the JvmOpens flags).
  */
object KryoProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("guard")) JvmOpens.check()
    else {
      val ser = new KryoSerializer(new SparkConf(false)).newInstance()
      // serialize forces borrowKryo -> newKryo -> default registrations
      val out = ser.serialize("probe")
      require(ser.deserialize[String](out) == "probe")
    }
    println("kryo-probe-ok")
  }
}
