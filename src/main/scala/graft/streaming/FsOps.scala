package graft.streaming

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Closed-stream wrappers for java.nio directory traversal.
  *
  * `Files.list` / `Files.walk` return lazy streams that hold an OPEN
  * directory fd until `close()` is called; a call site that drops the
  * stream after consuming the iterator leaks one fd per call. The bucketed
  * index does one listing per publish/read/vacuum, so a long-lived driver
  * (or the 200-schedule crash fuzzer) accumulates thousands of leaked
  * directory handles and dies on `Too many open files`. Materialize the
  * listing eagerly, close the stream always.
  */
object FsOps {
  /** Directory children, stream closed (unordered, like `Files.list`). */
  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** Recursive walk in REVERSE path order (children before parents — the
    * delete-tree order), stream closed. */
  def walkReverse(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]()).iterator().asScala.toVector
    finally s.close()
  }
}
