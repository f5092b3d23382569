package graft
package probes

/** Interleaved A/B for the streaming-checkpoint SUBSTRATE (round-14
  * verdict item 3): the same st-family registry closures, reps
  * alternating the checkpoint base between tmpfs (/dev/shm — the
  * [[RegistryFixtures.ckptRoot]] default) and the ext4 /tmp the
  * suite used through round 14, inside ONE JVM — the round-14
  * measurement lesson (a sequential same-JVM A/B "measured" a 45%
  * width win that was JIT warm-up ordering) applied to substrates.
  * Each invocation gets a fresh checkpoint dir either way, so reps
  * are independent; `min` per arm is the comparable number.
  * Usage: `runMain graft.probes.CkptSubstrateProbe <sfDir> [reps] [q1,q2,..]`
  */
object CkptSubstrateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "st6_stream_mor", "st8_stream_hll", "st9_stream_dedup",
      "st10_stream_join", "st11_stream_cms", "st7_stream_asof"))
    val spark = Sessions.local(Sessions.envCores)

    def runOnce(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms once (codegen/JIT out of the measurement)
    names.foreach { n =>
      sys.props("graft.ckpt.base") = "/tmp"; runOnce(n)
      sys.props.remove("graft.ckpt.base"); runOnce(n)
    }
    val acc = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        sys.props("graft.ckpt.base") = "/tmp"
        acc((n, "ext4")) ::= runOnce(n)
        sys.props.remove("graft.ckpt.base")
        acc((n, "shm")) ::= runOnce(n)
      }
    }
    names.foreach { n =>
      val e = acc((n, "ext4")); val m = acc((n, "shm"))
      println(f"[ckpt] $n ext4_min=${e.min}%.3f shm_min=${m.min}%.3f " +
        f"delta=${(m.min - e.min) / e.min * 100}%+.1f%% " +
        s"ext4=${e.reverse.map(t => f"$t%.3f").mkString(",")} " +
        s"shm=${m.reverse.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
