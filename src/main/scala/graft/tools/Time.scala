package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Per-query timing probe: run named corpus queries N passes each at a
  * given SF dir, print every pass (the bench only reports the min — this
  * shows cache warm-up and variance). Usage:
  *   runMain graft.tools.Time <sfDir> <passes> <name> [<name>...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; p <- 1 to passes) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"TIME $name pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
