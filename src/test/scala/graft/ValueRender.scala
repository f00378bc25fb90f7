package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Renders a collected DataFrame result in the reference's psql cell
  * format: scalar columns through [[graft.gvalue.PgOut]], flattened
  * entity column groups (`v__id`, `v__label`, `v__<prop>`, …) as the
  * reference's `{"id": …, "label": …, "properties": {…}}` text. Shared
  * by ValueReplaySpec (new-regress suites) and OldValueReplaySpec
  * (old/regress suites) — the two eras render entities identically.
  */
object ValueRender {

  /** None when the schema carries a column group we can't render as an
    * entity (VLE/path internals without id+label).
    */
  def renderRows(rows: Seq[Row], schema: StructType): Option[Seq[Seq[String]]] = {
    // group flat entity columns (`v__id`, `v__label`, `v__name`, …) into
    // logical entity cells, in first-appearance order
    val fields = schema.fields
    sealed trait Cell
    case class Scalar(i: Int) extends Cell
    case class Entity(prefix: String, cols: Seq[Int]) extends Cell
    val cells = scala.collection.mutable.ListBuffer.empty[Cell]
    val seen = scala.collection.mutable.Set.empty[String]
    fields.zipWithIndex.foreach { case (f, i) =>
      val cut = f.name.indexOf("__")
      if (cut < 0) cells += Scalar(i)
      else {
        val p = f.name.substring(0, cut)
        if (!seen(p)) {
          seen += p
          val group = fields.indices.filter(j => fields(j).name.startsWith(p + "__"))
          // renderable entity := has id and label columns; anything else
          // (VLE/path internals like `__ids`, `__nodes`) is unsupported
          if (group.exists(j => fields(j).name == s"${p}__id") &&
            group.exists(j => fields(j).name == s"${p}__label"))
            cells += Entity(p, group)
          else return None
        }
      }
    }
    def entityText(row: Row, p: String, cols: Seq[Int]): String = {
      val idIdx = cols.find(j => fields(j).name == s"${p}__id").get
      if (row.isNullAt(idIdx)) return ""
      val id = row.getLong(idIdx)
      val label0 = row.getString(cols.find(j => fields(j).name == s"${p}__label").get)
      val label = if (label0 == "_default") "" else label0 // _ag_label_vertex renders ""
      def opt(n: String): Option[Int] =
        cols.find(j => fields(j).name == s"${p}__$n").filterNot(row.isNullAt)
      val props = cols.filter { j =>
        val n = fields(j).name.substring(p.length + 2)
        // gsrc/gdst are the undirected bind's orientation internals
        !Set("id", "label", "start_id", "end_id", "gsrc", "gdst").contains(n)
      }.sortBy { j => // jsonb object key order: length, then bytewise
        val k = graft.cypher.Compiler.PropNames.unesc(
          fields(j).name.substring(p.length + 2))
        (k.length, k)
      }.flatMap { j =>
        if (row.isNullAt(j)) None
        else {
          val key = graft.cypher.Compiler.PropNames.unesc(
            fields(j).name.substring(p.length + 2))
          Some(s""""$key": ${graft.gvalue.PgOut.gcell(row.get(j), fields(j).dataType)}""")
        }
      }
      val ends = (opt("start_id"), opt("end_id")) match {
        case (Some(s), Some(e)) =>
          s""""start_id": ${row.getLong(s)}, "end_id": ${row.getLong(e)}, """
        case _ => ""
      }
      s"""{"id": $id, $ends"label": "$label", "properties": {${props.mkString(", ")}}}"""
    }
    Some(rows.map { row =>
      cells.toSeq.map {
        case Scalar(i) => graft.gvalue.PgOut.cell(row.get(i), fields(i))
        case Entity(p, cols) => entityText(row, p, cols)
      }
    })
  }
}
