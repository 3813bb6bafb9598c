package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Mutable object buffer for [[FoldCellAgg]]: the four per-(id, qualifier)
  * fold extrema in one compact object instead of four struct-typed
  * declarative buffers. */
final class FoldBuf extends Serializable {
  var hasD = false; var dTs = 0L; var dSeq = 0L // max (ts,seq) over D ops
  var hasU = false; var uTs = 0L; var uSeq = 0L // max (ts,seq) over U ops
  // argmax of cell value over (ts,seq,pos) for U ops with a present cell;
  // (vTs,vSeq) doubles as omax — same qualifying rows
  var hasV = false; var vTs = 0L; var vSeq = 0L; var vPos = 0
  var v: UTF8String = null
}

/** The merge fold's g1 aggregation as ONE hash-aggregatable function.
  *
  * The declarative formulation (`max(struct(ts,seq))` ×3 +
  * `max_by(value, struct(ts,seq,pos))`) carries struct-typed buffers, which
  * `HashAggregateExec`'s mutable UnsafeRow map cannot hold — the whole
  * stage fell back to SortAggregate partials (sort-before-partial on the
  * full exploded batch). Packing the ordinals into primitive longs cannot
  * work unbounded: ts-micros alone needs 51 bits and seq is unbounded, so
  * any single-long encoding imposes batch-size limits. A
  * TypedImperativeAggregate instead gets ObjectHashAggregateExec — the
  * HASH-based partial aggregation path for object buffers (sort fallback
  * only past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * distinct keys per partition) — with no domain bounds at all, and fuses
  * the four extrema into one buffer update per row.
  *
  * Inputs: op (string), tsUs (long, `unix_micros(ts)`), seq (long),
  * pos (int, null iff cell null), value (string, nullable), cellNull
  * (boolean). Output struct mirrors the declarative outputs exactly:
  * `(dmax struct<ts_us,seq>, umax struct<ts_us,seq>, omax struct<ts_us,seq>,
  * vlast string)`, each null when no qualifying row existed — downstream
  * window/compare logic is unchanged (struct comparisons over (ts_us, seq)
  * order identically to (timestamp, seq)).
  */
case class FoldCellAgg(op: Expression, tsUs: Expression, seq: Expression,
                       pos: Expression, value: Expression, cellNull: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FoldBuf] {

  private val D = UTF8String.fromString("D")
  private val U = UTF8String.fromString("U")

  override def children: Seq[Expression] = Seq(op, tsUs, seq, pos, value, cellNull)
  override def nullable: Boolean = false
  private val ordType = StructType(Seq(
    StructField("ts_us", LongType, nullable = false),
    StructField("seq", LongType, nullable = false)))
  override def dataType: DataType = StructType(Seq(
    StructField("dmax", ordType, nullable = true),
    StructField("umax", ordType, nullable = true),
    StructField("omax", ordType, nullable = true),
    StructField("vlast", StringType, nullable = true)))

  override def createAggregationBuffer(): FoldBuf = new FoldBuf

  @inline private def lt(aTs: Long, aSeq: Long, bTs: Long, bSeq: Long): Boolean =
    aTs < bTs || (aTs == bTs && aSeq < bSeq)

  override def update(b: FoldBuf, input: InternalRow): FoldBuf = {
    val o = op.eval(input).asInstanceOf[UTF8String]
    if (o == null) return b
    val tAny = tsUs.eval(input); val sAny = seq.eval(input)
    if (tAny == null || sAny == null) return b
    val t = tAny.asInstanceOf[Long]; val s = sAny.asInstanceOf[Long]
    if (o.equals(D)) {
      if (!b.hasD || lt(b.dTs, b.dSeq, t, s)) { b.hasD = true; b.dTs = t; b.dSeq = s }
    } else if (o.equals(U)) {
      if (!b.hasU || lt(b.uTs, b.uSeq, t, s)) { b.hasU = true; b.uTs = t; b.uSeq = s }
      if (!cellNull.eval(input).asInstanceOf[Boolean]) {
        val p = pos.eval(input).asInstanceOf[Int]
        if (!b.hasV || lt(b.vTs, b.vSeq, t, s) ||
            (b.vTs == t && b.vSeq == s && b.vPos < p)) {
          b.hasV = true; b.vTs = t; b.vSeq = s; b.vPos = p
          val vv = value.eval(input).asInstanceOf[UTF8String]
          b.v = if (vv == null) null else vv.clone()
        }
      }
    }
    b
  }

  override def merge(b: FoldBuf, o: FoldBuf): FoldBuf = {
    if (o.hasD && (!b.hasD || lt(b.dTs, b.dSeq, o.dTs, o.dSeq))) {
      b.hasD = true; b.dTs = o.dTs; b.dSeq = o.dSeq
    }
    if (o.hasU && (!b.hasU || lt(b.uTs, b.uSeq, o.uTs, o.uSeq))) {
      b.hasU = true; b.uTs = o.uTs; b.uSeq = o.uSeq
    }
    if (o.hasV && (!b.hasV || lt(b.vTs, b.vSeq, o.vTs, o.vSeq) ||
        (b.vTs == o.vTs && b.vSeq == o.vSeq && b.vPos < o.vPos))) {
      b.hasV = true; b.vTs = o.vTs; b.vSeq = o.vSeq; b.vPos = o.vPos; b.v = o.v
    }
    b
  }

  override def eval(b: FoldBuf): Any = {
    def ord(has: Boolean, t: Long, s: Long): Any =
      if (has) new GenericInternalRow(Array[Any](t, s)) else null
    new GenericInternalRow(Array[Any](
      ord(b.hasD, b.dTs, b.dSeq),
      ord(b.hasU, b.uTs, b.uSeq),
      ord(b.hasV, b.vTs, b.vSeq),
      if (b.hasV) b.v else null))
  }

  override def serialize(b: FoldBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.hasD); out.writeLong(b.dTs); out.writeLong(b.dSeq)
    out.writeBoolean(b.hasU); out.writeLong(b.uTs); out.writeLong(b.uSeq)
    out.writeBoolean(b.hasV); out.writeLong(b.vTs); out.writeLong(b.vSeq); out.writeInt(b.vPos)
    val vb = if (b.v == null) null else b.v.getBytes
    out.writeInt(if (vb == null) -1 else vb.length)
    if (vb != null) out.write(vb)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FoldBuf = {
    val in = ByteBuffer.wrap(bytes)
    val b = new FoldBuf
    b.hasD = in.get() != 0; b.dTs = in.getLong; b.dSeq = in.getLong
    b.hasU = in.get() != 0; b.uTs = in.getLong; b.uSeq = in.getLong
    b.hasV = in.get() != 0; b.vTs = in.getLong; b.vSeq = in.getLong; b.vPos = in.getInt
    val n = in.getInt
    if (n >= 0) { val vb = new Array[Byte](n); in.get(vb); b.v = UTF8String.fromBytes(vb) }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(op = newChildren(0), tsUs = newChildren(1), seq = newChildren(2),
      pos = newChildren(3), value = newChildren(4), cellNull = newChildren(5))
}

object FoldCellAgg {
  /** Column-level entry: `foldCells(op, unix_micros(ts), seq, pos, value,
    * cellNull)` as an aggregate expression. */
  def foldCells(op: Column, tsUs: Column, seq: Column, pos: Column,
                value: Column, cellNull: Column): Column =
    column(FoldCellAgg(expression(op), expression(tsUs), expression(seq),
      expression(pos), expression(value), expression(cellNull)).toAggregateExpression())
}
