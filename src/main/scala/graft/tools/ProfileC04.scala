package graft.tools
import graft._
import graft.ext.{Dedup, TextAnalysis}
import graft.functions.Hashing
import org.apache.spark.sql.functions._
object ProfileC04 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(a: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    val docs = queries.Tables.documents(spark, d)
    t("warmup")(docs.count())
    val sh = Dedup.shingles(docs, col("doc_id"), col("text")).persist()
    t("shingles")(sh.count())
    val g = sh.select(col("doc_id"), explode(col("grams")).as("gs"))
      .select(col("doc_id"), Hashing.md5Long60(col("gs")).as("g"))
    t("grams+hash")(g.count())
    val inter = g.as("a").join(g.as("b"),
      col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    t("inter")(inter.count())
    t("full")(Dedup.ngramJaccard(docs, col("doc_id"), col("text"), 0.4).count())
    t("full2")(Dedup.ngramJaccard(docs, col("doc_id"), col("text"), 0.4).count())
    t("capped")(Dedup.ngramJaccardCapped(docs, col("doc_id"), col("text"), 0.4, maxDf = 20).count())
    t("capped2")(Dedup.ngramJaccardCapped(docs, col("doc_id"), col("text"), 0.4, maxDf = 20).count())
    spark.stop()
  }
}
