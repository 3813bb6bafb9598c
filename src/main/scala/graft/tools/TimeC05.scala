package graft.tools

/** One-off: time c05_embed_neardup_banded at 1x and 10x after the
  * adaptive guard (bench-regression check + scale check in one run). */
object TimeC05 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    def time(dir: String): Double = (1 to 2).map { _ =>
      graft.CachedFrames.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("c05_embed_neardup_banded")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    val t1 = time("/root/testdata/sf0.1")
    val t10 = time("/tmp/scale17/sf10x")
    println(f"TIMEC05 1x=$t1%.2f 10x=$t10%.2f ratio=${t10 / t1}%.2fx")
    spark.stop()
  }
}
