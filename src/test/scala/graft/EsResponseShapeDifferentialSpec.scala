package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 13 — response shaping: `_source` filtering
  * (include list / true / false), `stored_fields` (list and `_none_`),
  * `docvalue_fields`, and `script_fields` riding the projection. The
  * twin re-derives the exact COLUMN LIST (ES's projection rules: source
  * list ∪ stored fields, computed columns appended) and every row's
  * values. A projection bug silently ships wrong or missing fields to
  * every client — worth its own front even though no query logic runs.
  */
class EsResponseShapeDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private lazy val rows: Seq[(Long, String, Long, String)] = {
    val rnd = new Random(717171L)
    (1L to 50L).map(i => (i, s"s${rnd.nextInt(5)}", (i * 11) % 97, s"t${i % 7}"))
  }

  private def df = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "src", "v", "tag")
  }

  test("projection rules match the twin (30 seeded bodies)") {
    val rnd = new Random(6029L)
    val d = df
    val all = Seq("doc_id", "src", "v", "tag")
    (0 until 30).foreach { ci =>
      val lo = rnd.nextInt(60)
      // _source: None | Some(list) | Some(true) | Some(false)
      val srcMode = rnd.nextInt(4)
      val srcList = rnd.shuffle(all).take(1 + rnd.nextInt(3))
      val stored = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(rnd.shuffle(all).take(1 + rnd.nextInt(2)))
        case _ => if (srcMode == 3) None else Some(Seq.empty) // "_none_"
      }
      val dv = if (rnd.nextBoolean()) Some(Seq("v")) else None
      val sf = rnd.nextBoolean()
      val parts = Seq.newBuilder[String]
      parts += s""""query": {"range": {"v": {"gte": $lo}}}"""
      srcMode match {
        case 1 => parts += s""""_source": [${srcList.map("\"" + _ + "\"").mkString(", ")}]"""
        case 2 => parts += s""""_source": true"""
        case 3 => parts += s""""_source": false"""
        case _ =>
      }
      stored.foreach { st =>
        if (st.isEmpty) parts += s""""stored_fields": "_none_""""
        else parts += s""""stored_fields": [${st.map("\"" + _ + "\"").mkString(", ")}]"""
      }
      dv.foreach(f => parts += s""""docvalue_fields": [${f.map("\"" + _ + "\"").mkString(", ")}]""")
      if (sf) parts += s""""script_fields": {"v2": {"script": "doc['v'].value * 2"}}"""
      parts += s""""sort": ["doc_id"], "size": 50"""
      val body = s"{${parts.result().mkString(",\n ")}}"
      val storedW = stored.getOrElse(Seq.empty)
      // "_source": false with nothing else would be a zero-field hit —
      // the engine rejects it loudly (twin asserts the reject)
      if (srcMode == 3 && storedW.isEmpty && dv.isEmpty && !sf)
        intercept[IllegalArgumentException] {
          graft.dsl.EsQueryJson.search(d, body).collect(); ()
        }
      else {
        val out = graft.dsl.EsQueryJson.search(d, body)
        // twin: expected column list per the ES projection rules —
        // stored_fields WITHOUT _source suppresses the source (ES: "If
        // you use the stored_fields parameter, the _source is not
        // included by default"); `_none_` suppresses stored fields only
        val computed = (if (sf) Seq("v2") else Seq.empty) ++
          dv.map(_.map(_ + "_dv")).getOrElse(Seq.empty)
        val wantCols = srcMode match {
          case 1 => (srcList ++ storedW).distinct ++ computed
          case 3 => storedW ++ computed
          case 0 if storedW.nonEmpty => storedW ++ computed
          case _ => all ++ computed // absent-with-no-stored, or true
        }
        assert(out.columns.toSeq.sorted == wantCols.sorted,
          s"projection divergence (case $ci): $body\n engine=${out.columns.toSeq}\n twin  =$wantCols")
        // values: every projected column equals the raw row / computation
        val byId = rows.map(r => r._1 -> r).toMap
        val expected = rows.filter(_._3 >= lo).sortBy(_._1)
        val got = out.collect()
        assert(got.length == expected.length, s"row count (case $ci)")
        got.zip(expected).foreach { case (r, (id, s, v, t)) =>
          wantCols.foreach {
            case "doc_id" => assert(r.getAs[Long]("doc_id") == id)
            case "src" => assert(r.getAs[String]("src") == s)
            case "v" => assert(r.getAs[Long]("v") == v)
            case "tag" => assert(r.getAs[String]("tag") == t)
            case "v2" => assert(r.getAs[Long]("v2") == v * 2, s"script field (case $ci)")
            case "v_dv" => assert(r.getAs[Long]("v_dv") == v, s"docvalue (case $ci)")
            case other => fail(s"unexpected column $other")
          }
        }
        byId // silence unused warning path
      }
    }
  }
}
