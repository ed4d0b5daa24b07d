package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved, order-alternating A/B of prefixJoin's verify-tail join
  * strategy (round 15): doc-sized `sets` broadcasts (the static plan's
  * choice) vs candidate-side SHUFFLE_HASH builds
  * (`prefixJoinImpl(shuffleHashVerify)`). Dev tool only — never
  * invoked by the driver. Usage:
  * `runMain graft.tools.AbPrefixJoin <sfDir> [rounds]`. */
object AbPrefixJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-sf1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(shj: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Analytics
        .prefixJoinImpl(spark, sfDir, shj)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    once(false); once(true) // warmup both arms, not recorded
    val (as, bs) = (1 to rounds).map { i =>
      val (a, b) = if (i % 2 == 1) {
        val a0 = once(false); val b0 = once(true); (a0, b0)
      } else {
        val b0 = once(true); val a0 = once(false); (a0, b0)
      }
      println(f"[ab round $i] broadcast $a%.3f s | shuffle_hash $b%.3f s" +
        (if (i % 2 == 0) " (shj first)" else ""))
      (a, b)
    }.unzip
    println(f"[ab] broadcast min ${as.min}%.3f median " +
      f"${as.sorted.apply(as.size / 2)}%.3f | shuffle_hash min " +
      f"${bs.min}%.3f median ${bs.sorted.apply(bs.size / 2)}%.3f")
    spark.stop()
  }
}
