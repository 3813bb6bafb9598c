package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 15 — the ip field machinery: `aton` vs a
  * java.net.InetAddress twin (the JDK's own dotted-quad parser),
  * `cidrRange` vs independent mask arithmetic, and `ip_range` agg
  * buckets (bounds + CIDR masks) vs a twin that re-buckets the raw
  * addresses. Random addresses cover the full 32-bit space including
  * the 0.0.0.0 / 255.255.255.255 edges.
  */
class NetDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private def twinAton(ip: String): Long = {
    val bs = java.net.InetAddress.getByName(ip).getAddress
    bs.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  private def randomIps(n: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    (1 to n).map { _ =>
      Seq.fill(4)(rnd.nextInt(256)).mkString(".")
    } ++ Seq("0.0.0.0", "255.255.255.255", "10.0.0.1", "192.168.255.254", "9.9.9.9")
  }

  test("aton equals the InetAddress twin; cidrRange equals mask arithmetic") {
    val sp = spark
    import sp.implicits._
    val ips = randomIps(300, 54321L)
    val got = ips.toDF("ip").select(col("ip"), graft.dsl.Net.aton(col("ip")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ips.foreach(ip => assert(got(ip) == twinAton(ip), s"aton divergence on $ip"))
    // cidrRange vs independent mask arithmetic over random prefixes
    val rnd = new Random(9876L)
    (0 until 100).foreach { _ =>
      val ip = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
      val bits = rnd.nextInt(32) + 1 // /1 .. /32
      val (lo, hi) = graft.dsl.Net.cidrRange(s"$ip/$bits")
      val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
      val base = twinAton(ip) & mask
      assert(lo == base && hi == base + (1L << (32 - bits)),
        s"cidrRange divergence on $ip/$bits: engine=($lo,$hi) twin=($base,${base + (1L << (32 - bits))})")
    }
  }

  test("ip_range buckets (bounds + masks) match the re-bucketing twin (10 bodies)") {
    val sp = spark
    import sp.implicits._
    val rnd = new Random(24680L)
    val rows = (1L to 200L).map(i => (i, Seq.fill(4)(rnd.nextInt(256)).mkString(".")))
    val d = rows.toDF("id", "ip")
    (0 until 10).foreach { ci =>
      val cut1 = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
      val cut2 = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
      val (loCut, hiCut) =
        if (twinAton(cut1) <= twinAton(cut2)) (cut1, cut2) else (cut2, cut1)
      val bits = 4 + rnd.nextInt(12)
      val maskIp = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
      val body =
        s"""{"aggs": {"ips": {"ip_range": {"field": "ip",
           |  "ranges": [{"key": "a", "to": "$loCut"},
           |             {"key": "b", "from": "$loCut", "to": "$hiCut"},
           |             {"mask": "$maskIp/$bits"},
           |             {"key": "d", "from": "$hiCut"}]}}}}""".stripMargin
      val got = graft.dsl.EsQueryJson.aggregations(d, body)("ips")
        .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("doc_count")).toMap
      val vs = rows.map { case (_, ip) => twinAton(ip) }
      val (mLo, mHi) = {
        val mask = (0xffffffffL << (32 - bits)) & 0xffffffffL
        val base = twinAton(maskIp) & mask
        (base, base + (1L << (32 - bits)))
      }
      val want = Map(
        "a" -> vs.count(_ < twinAton(loCut)).toLong,
        "b" -> vs.count(v => v >= twinAton(loCut) && v < twinAton(hiCut)).toLong,
        s"$maskIp/$bits" -> vs.count(v => v >= mLo && v < mHi).toLong,
        "d" -> vs.count(_ >= twinAton(hiCut)).toLong)
      assert(got == want, s"ip_range divergence (case $ci): $body\n engine=$got\n twin  =$want")
    }
  }
}
