package graft.cypher

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Compressed positional deletion-vector membership (r15, VERDICT r14 #1).
  *
  * The r14 positional dvs compiled to `array_contains(element_at(mapLit,
  * basename), row_index)` — a per-row LINEAR scan of the file's deleted
  * positions, O(tombstones) per row, which is why the merge-on-read
  * fallback bounds were pinned at 1024 touched ids / 4096 tombstones. This
  * index gives the Delta/Iceberg endgame shape: per-file SORTED position
  * arrays probed by binary search, O(log tombstones) per row, held as a
  * codegen reference object instead of a plan literal (a 64k-position map
  * literal would bloat the plan tree and the generated code).
  *
  * Per-row cost: one bytes-equality check against the memoized last file
  * path (row_index runs are contiguous per file, so the basename decode +
  * hash lookup happens once per file change, not once per row) + one
  * binary search. The memo is a single reference write — safe under any
  * sharing (no tearing), merely re-resolved on a stale read.
  *
  * Reference analog: none — PG heap-deletes in place (no deletion vectors
  * to apply at read); this is pure 100 TB merge-on-read hygiene.
  */
final class DvIndex(dv: Map[String, Array[Long]]) extends Serializable {
  private val byBase: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](math.max(dv.size * 2, 8))
    dv.foreach { case (k, v) => m.put(k, v) }
    m
  }
  val files: Int = dv.size
  val positions: Long = dv.valuesIterator.map(_.length.toLong).sum

  // (lastPathSeen, itsPositionsOrNull) — one field so a concurrent reader
  // can never observe a torn pair
  @transient private var memo: (UTF8String, Array[Long]) = _

  def deleted(path: UTF8String, rowIndex: Long): Boolean = {
    var m = memo
    if (m == null || !m._1.equals(path)) {
      val s = path.toString
      val i = s.lastIndexOf('/')
      // copy(): the incoming UTF8String may be backed by a reused buffer
      m = (path.copy(), byBase.get(if (i >= 0) s.substring(i + 1) else s))
      memo = m
    }
    val arr = m._2
    arr != null && java.util.Arrays.binarySearch(arr, rowIndex) >= 0
  }

  override def toString: String = s"DvIndex($files files, $positions positions)"
}

/** `true` iff the (file, row position) is NOT deletion-vector-suppressed.
  * `filePath` is `_metadata.file_path`, `rowIndex` is `_metadata.row_index`
  * (absolute per file regardless of pushdown). `id` never appears, so
  * pushed id filters and parquet row-group pruning on id survive on
  * dv-bearing label reads (the r14 WriteSpec plan invariant).
  */
case class DvLive(filePath: Expression, rowIndex: Expression, index: DvIndex)
    extends BinaryExpression with Predicate {

  override def left: Expression = filePath
  override def right: Expression = rowIndex
  override def prettyName: String = "dv_live"

  override protected def nullSafeEval(p: Any, i: Any): Any =
    !index.deleted(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("dvIndex", index, classOf[DvIndex].getName)
    nullSafeCodeGen(ctx, ev, (p, i) => s"${ev.value} = !$idx.deleted($p, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(filePath = newLeft, rowIndex = newRight)
}
