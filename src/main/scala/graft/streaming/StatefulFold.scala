package graft.streaming

import graft.{Cell, Mutation}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A7/A8/A13 as CUSTOM streaming state (`flatMapGroupsWithState`): per
  * row_key, mutations fold into the current doc and every micro-batch
  * emits the post-batch doc (or its tombstone) — an UPDATE STREAM of the
  * index, computed without re-reading any stored index.
  *
  * This is the operator form of the reference's per-doc upsert/delete
  * semantics (`observer6/HbaseDataSyncEsObserver.java:93-129`): a delete
  * kills every cell written up to it; later puts resurrect the doc; per
  * qualifier the last write by (ts, seq) wins. The state keeps each
  * qualifier's winning (ts, seq) and the delete high-water mark, so LATE
  * and DUPLICATE mutations — across any micro-batch split — fold to the
  * same result as the batch `Merge.fold` of the full log (spec'd in
  * StreamingSpec against randomized logs and splits).
  *
  * State size = live doc width per key, i.e. exactly the index: this
  * operator IS an index held in stream state. At 100 TB one runs it
  * per-partition-key range or prefers the bucketed-parquet index
  * ([[BucketedIndex]]); it exists for pipelines that want the update
  * stream itself (e.g. feeding a downstream cache / CDC fan-out). */
object StatefulFold {

  /** Per-qualifier winning write. */
  case class CellState(ts: Long, seq: Long, value: String)

  /** Per-doc state: delete high-water mark, resurrect mark (max put), and
    * the winning cells. */
  case class DocState(delTs: Long, delSeq: Long, putTs: Long, putSeq: Long,
                      cells: Map[String, CellState])

  /** One emitted update: the doc as of the end of the micro-batch.
    * `alive = false` is a tombstone (doc currently deleted). */
  case class DocUpdate(id: String, alive: Boolean, info: Map[String, String])

  private def gt(t1: Long, s1: Long, t2: Long, s2: Long): Boolean =
    t1 > t2 || (t1 == t2 && s1 > s2)

  private val empty = DocState(Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue, Map.empty)

  /** Fold one group's new mutations into its state (public: the spec and
    * the streaming operator run the identical transition). */
  def fold(st0: DocState, muts: Seq[Mutation]): DocState = {
    var st = st0
    for (m <- muts.sortBy(m => (m.ts.getTime, m.seq))) {
      val t = m.ts.getTime; val s = m.seq
      m.op match {
        case "D" =>
          if (gt(t, s, st.delTs, st.delSeq))
            st = DocState(t, s, st.putTs, st.putSeq,
              st.cells.filter { case (_, c) => gt(c.ts, c.seq, t, s) })
        case _ => // U
          if (gt(t, s, st.putTs, st.putSeq))
            st = st.copy(putTs = t, putSeq = s)
          // last-wins inside the mutation, like the reference's HashMap.put
          val flat = m.cells.foldLeft(Map.empty[String, Cell])((acc, c) => acc + (c.qualifier -> c))
          for ((q, c) <- flat) {
            val newerThanCell = st.cells.get(q).forall(old => gt(t, s, old.ts, old.seq))
            val afterDelete = gt(t, s, st.delTs, st.delSeq)
            if (newerThanCell && afterDelete)
              st = st.copy(cells = st.cells + (q -> CellState(t, s, c.value)))
          }
      }
    }
    st
  }

  def alive(st: DocState): Boolean = gt(st.putTs, st.putSeq, st.delTs, st.delSeq)

  /** The streaming operator. Pair with `outputMode("update")`. */
  def updates(mutations: Dataset[Mutation]): Dataset[DocUpdate] = {
    val spark = mutations.sparkSession
    import spark.implicits._
    mutations.groupByKey(_.row_key)
      .flatMapGroupsWithState[DocState, DocUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[Mutation], state: GroupState[DocState]) =>
          val st = fold(state.getOption.getOrElse(empty), it.toSeq)
          state.update(st)
          Iterator.single(DocUpdate(key, alive(st),
            st.cells.map { case (q, c) => q -> c.value }))
      }
  }
}
