package graft.tools
import graft._
object Explain {
  def main(a: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val d = "/root/testdata/sf0.01"
    val names = if (a.nonEmpty) a.toSeq else Seq("b01_term", "q1_agg", "b21_join_revenue", "a13_merge", "b23_asof_join", "b09_terms_agg")
    for (n <- names) {
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
