package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

trait SparkTestBase {
  lazy val spark: SparkSession = Sessions.local("4")

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Shorthand mutation builder: cells as (family, qualifier, value). */
  def mut(key: String, op: String, t: String, seq: Long,
          cells: (String, String, String)*): Mutation =
    Mutation(key, op, ts(t), seq, cells.map { case (f, q, v) => Cell(f, q, v) })

  def mutDf(ms: Seq[Mutation]): DataFrame = {
    val sp = spark
    import sp.implicits._
    ms.toDF()
  }

  /** Collect an index DataFrame (id, info) to a comparable Scala map. */
  def indexMap(df: DataFrame): Map[String, Map[String, String]] =
    df.collect().map { r =>
      r.getString(0) -> Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)
    }.toMap
}
