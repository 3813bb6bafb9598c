package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named corpus queries to files —
  * the optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <query...>
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) like Bench.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    for (n <- names) {
      val out = new java.io.PrintWriter(s"$outDir/${n}_$suffix.txt")
      try {
        val plan = try {
          val df = qs(n)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
        out.println(plan)
      } finally out.close()
      System.err.println(s"[explain] wrote $n")
    }
    spark.stop()
  }
}
