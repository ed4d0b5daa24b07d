package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of rareShinglePairs' join-key width (round 15,
  * VERDICT r14 #5): string trigram keys vs 60-bit md5-hashed longs
  * (`rareShinglePairsImpl(hashKeys)`), alternated A/B/A/B… in ONE JVM
  * so box drift hits both arms equally — the round-14 sf0.1 reading
  * was inside noise and the ask is a re-run at sf1 where the 4×
  * shuffle-byte cut should dominate the digest cost if it ever will.
  * Dev tool only — never invoked by the driver; the enrolled row is
  * untouched by whatever this measures. Usage:
  * `runMain graft.tools.AbRareShingle <sfDir> [rounds]`. */
object AbRareShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-sf1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(hashKeys: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.LlmOps
        .rareShinglePairsImpl(spark, sfDir, hashKeys)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    once(false); once(true) // warmup both arms, not recorded
    // order alternates per round (AB, BA, AB, …) so within-pair JVM/GC
    // position bias cancels instead of always favoring the second arm
    val (as, bs) = (1 to rounds).map { i =>
      val (a, b) = if (i % 2 == 1) {
        val a0 = once(false); val b0 = once(true); (a0, b0)
      } else {
        val b0 = once(true); val a0 = once(false); (a0, b0)
      }
      println(f"[ab round $i] strings $a%.3f s | hashed $b%.3f s" +
        (if (i % 2 == 0) " (hashed first)" else ""))
      (a, b)
    }.unzip
    println(f"[ab] strings min ${as.min}%.3f median " +
      f"${as.sorted.apply(as.size / 2)}%.3f | hashed min ${bs.min}%.3f " +
      f"median ${bs.sorted.apply(bs.size / 2)}%.3f")
    spark.stop()
  }
}
