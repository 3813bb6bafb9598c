package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 14 — the md5-60 hash that underpins LSH planes,
  * minhash families, deterministic sampling/splits, shard slices, and
  * every cross-engine-deterministic operator: engine values (Catalyst
  * md5+conv+substring, plus the JVM-side TextKernels.md5Hash60 third
  * implementation) vs an independent java.security.MessageDigest twin.
  * Then the two consumers with mechanical contracts on top of it: the
  * `slice` API (membership = hash mod max, and slices PARTITION the
  * corpus) and `terminate_after` (per-hash-shard first-n by id with the
  * terminated_early flag).
  */
class HashingDifferentialSpec extends AnyFunSuite with SparkTestBase {

  // independent md5-60: first 15 hex chars of the digest, base-16
  private def twin60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def randomStrings(n: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      rnd.nextInt(5) match {
        case 0 => "" + i
        case 1 => Random.alphanumeric.take(rnd.nextInt(30)).mkString
        case 2 => s"päivä-$i-éü中文" // unicode incl. CJK
        case 3 => "x" * (50 + rnd.nextInt(200)) + i
        case _ => s"key:$i:${rnd.nextLong()}"
      }
    } :+ ""
  }

  test("md5Long60 (Catalyst and JVM forms) equals the MessageDigest twin (501 strings)") {
    val sp = spark
    import sp.implicits._
    val ss = randomStrings(500, 31337L)
    val got = ss.toDF("s")
      .select(col("s"), graft.functions.Hashing.md5Long60(col("s")).as("h"),
        graft.functions.Hashing.seeded(7, col("s")).as("h7"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    ss.foreach { s =>
      assert(got(s)._1 == twin60(s), s"md5Long60 divergence on '$s'")
      assert(got(s)._2 == twin60(s"7:$s"), s"seeded divergence on '$s'")
      assert(graft.functions.Hashing.md5Long60Jvm(s) == twin60(s),
        s"JVM-side md5Hash60 divergence on '$s'")
    }
  }

  test("slice membership is hash mod max, and slices partition the corpus") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 200L).map(i => (i, s"d$i"))
    val d = docs.toDF("id", "payload")
    Seq(2, 3, 7).foreach { max =>
      val slices = (0 until max).map { sid =>
        graft.dsl.EsQueryJson.search(d,
          s"""{"query": {"match_all": {}}, "slice": {"id": $sid, "max": $max},
             | "sort": ["id"], "size": 300}""".stripMargin)
          .collect().map(_.getAs[Long]("id")).toSet
      }
      slices.zipWithIndex.foreach { case (got, sid) =>
        val want = docs.map(_._1)
          .filter(i => Math.floorMod(twin60(i.toString), max.toLong) == sid).toSet
        assert(got == want, s"slice divergence (max=$max id=$sid)")
      }
      assert(slices.map(_.size).sum == docs.size, s"slices overlap or drop (max=$max)")
      assert(slices.reduce(_ ++ _) == docs.map(_._1).toSet)
    }
  }

  test("terminate_after: per-hash-shard first-n with the terminated_early flag") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 150L).map(i => (i, s"p$i"))
    val d = docs.toDF("id", "payload")
    Seq((5, 4), (10, 3), (200, 2)).foreach { case (n, shards) =>
      val got = graft.dsl.EsDsl.terminateAfter(d, col("id"), n, shards)
        .collect().map(r => (r.getAs[Long]("id"),
          r.getAs[Int]("shard"), r.getAs[Boolean]("terminated_early"))).toSet
      val byShard = docs.map(_._1)
        .groupBy(i => Math.floorMod(twin60(i.toString), shards.toLong).toInt)
      val want = byShard.flatMap { case (sh, ids) =>
        ids.sorted.take(n).map(i => (i, sh, ids.size > n))
      }.toSet
      assert(got == want, s"terminate_after divergence (n=$n shards=$shards):\n" +
        s" engine-only=${(got -- want).take(5)} twin-only=${(want -- got).take(5)}")
    }
  }
}
