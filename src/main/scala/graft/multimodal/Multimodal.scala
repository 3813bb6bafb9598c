package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C6 — multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, flowing through every relational operator.
  *
  * The decode kernels (JPEG decode, resampling, frame extraction) need
  * native libraries this container doesn't ship, so they are STUBBED with a
  * clearly-marked deterministic fake that parses bytes from the payload
  * header. Everything Spark-side is real and tested: the binary schema, the
  * batched `mapPartitions` plumbing (the Scala analog of `mapInPandas` —
  * partition-at-a-time iterators, no per-row JNI crossings), partitioning
  * behavior, and the metadata contract.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, width: Int, height: Int, n_bytes: Int, fmt: String)

  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Attach a synthetic binary payload derived from the text column — the
    * test corpus has no real media, so the payload is the md5 digest bytes
    * (deterministic, 16 bytes; reproducible in DuckDB via from_hex(md5)). */
  def withFakePayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), to_binary(md5(col(textCol)), lit("hex")).as("payload"))

  /** STUB decode — deterministic fake of an image-header parse: "width" and
    * "height" read from the first payload bytes, format from a byte mod.
    * A real deployment swaps `decodeHeader` for an actual codec call; the
    * signature, batching and schema stay identical. */
  private def decodeHeader(payload: Array[Byte]): (Int, Int, String) = {
    // ??? real codec goes here; deterministic fake below
    val w = 1 + (payload(0) & 0xff) % 64
    val h = 1 + (payload(1) & 0xff) % 64
    val fmt = ((payload(2) & 0xff) % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    (w, h, fmt)
  }

  /** Partition-batched decode: one iterator pass per partition (the
    * `mapInPandas` shape), emitting typed metadata. */
  def decodeMeta(payloads: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          val (w, h, f) = decodeHeader(p)
          MediaMeta(id, w, h, p.length, f)
        }
      }
  }

  /** Expression-only twin of the stub decode (codegen'd; used by the
    * oracle-checked query — byte reads become hex substrings). */
  def decodeMetaExpr(payloads: DataFrame): DataFrame =
    payloads.select(
      col("doc_id"),
      (conv(substring(hex(col("payload")), 1, 2), 16, 10).cast("int") % 64 + 1).as("width"),
      (conv(substring(hex(col("payload")), 3, 2), 16, 10).cast("int") % 64 + 1).as("height"),
      length(col("payload")).as("n_bytes"),
      when(conv(substring(hex(col("payload")), 5, 2), 16, 10).cast("int") % 3 === 0, "jpeg")
        .when(conv(substring(hex(col("payload")), 5, 2), 16, 10).cast("int") % 3 === 1, "png")
        .otherwise("webp").as("fmt"))

  /** STUB frame-sampler: emit every `stride`-th "frame index" up to a fake
    * frame count parsed from the payload — the video-sampling plumbing
    * (explode to frame rows, carry payload refs) without a codec. */
  def sampleFrames(payloads: DataFrame, stride: Int): DataFrame =
    payloads.select(
      col("doc_id"),
      explode(sequence(lit(0),
        conv(substring(hex(col("payload")), 7, 2), 16, 10).cast("int") % 30,
        lit(stride))).as("frame_idx"))
}
