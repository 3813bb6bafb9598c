package graft

import org.apache.spark.sql.SparkSession

/** BENCH harness (BASELINE.md protocol): every corpus query timed on
  * SPARK_GRAFT_SF_DIR, materialized through the noop sink (count() would
  * let Catalyst prune the payload columns — noop forces full evaluation).
  * One global warm-up query absorbs JVM/codegen/session start-up so the
  * per-query numbers measure the plans, not the JIT. Prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up: a scan+shuffle+join touching the common tables
    try {
      val li = queries.Tables.lineitem(spark, sfDir)
      val o = queries.Tables.orders(spark, sfDir)
      materialize(li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count())
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { materialize(fn(spark, sfDir)); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
