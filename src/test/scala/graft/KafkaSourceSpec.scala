package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kafka change-log source (SURVEY §1.3, third source kind). No broker
  * exists in the sandbox, so the wire-decode plumbing is proven by
  * equivalence on a hand-built wire frame (the part that is ours), and the
  * reader-construction test self-cancels when the spark-sql-kafka
  * connector is absent from the classpath (it is a standard Spark
  * distribution artifact, not a library dependency here).
  */
class KafkaSourceSpec extends AnyFunSuite with SparkTestBase {

  test("decodeKafka round-trips mutations through the wire frame") {
    val ms = Seq(
      mut("k1", "U", "2024-01-01 00:00:00", 1, ("f", "a", "1")),
      mut("k2", "D", "2024-01-01 00:00:01", 2),
      mut("k3", "U", "2024-01-01 00:00:02", 3, ("f", "a", "2"), ("g", "b", "x")))
    val wire = mutDf(ms).select(
      col("row_key").cast("binary").as("key"),
      to_json(struct(col("row_key"), col("op"), col("ts"), col("seq"), col("cells")))
        .cast("binary").as("value"),
      lit("mutations").as("topic"), lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"))
    val decoded = ChangeLog.typed(ChangeLog.decodeKafka(wire)).collect().toSeq
    assert(decoded.sortBy(_.seq) == ms.sortBy(_.seq))
  }

  test("malformed kafka records become quarantine rows, not failures") {
    val bad = spark.range(2).select(
      lit(null).cast("binary").as("key"),
      when(col("id") === 0, lit("{not json"))
        .otherwise(lit("""{"row_key":"ok","op":"U","ts":"2024-01-01T00:00:00Z","seq":9,"cells":[]}"""))
        .cast("binary").as("value"))
    val out = ChangeLog.decodeKafka(bad)
    assert(out.count() == 2) // PERMISSIVE: nothing thrown
    assert(out.filter(col("row_key").isNull).count() == 1) // the A17 quarantine row
    assert(out.filter(col("row_key") === "ok" && col("seq") === 9).count() == 1)
  }

  test("kafka-format readers build when the connector is on the classpath") {
    val available =
      try {
        org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
          "kafka", spark.sessionState.conf)
        true
      } catch { case _: Throwable => false }
    assume(available, "spark-sql-kafka connector not present in this sandbox")
    val df = ChangeLog.readStreamKafka(spark, "localhost:9092", "mutations")
    assert(df.isStreaming &&
      df.schema.fieldNames.toSeq == Seq("row_key", "op", "ts", "seq", "cells"))
    val batch = ChangeLog.readKafka(spark, "localhost:9092", "mutations")
    assert(!batch.isStreaming &&
      batch.schema.fieldNames.toSeq == Seq("row_key", "op", "ts", "seq", "cells"))
  }
}
