package graft.cypher

import graft.gvalue.{GArray, GBool, GMap, GNull, GValue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** The reference's "new cypher" SQL statement surface (regress
  * new_cypher.sql:59-207): its unified grammar runs plain SQL SELECT /
  * CREATE TABLE / INSERT / UPDATE / DELETE FROM / TABLE statements next
  * to Cypher. Here those route to Spark SQL over session-scoped temp
  * views, with a thin translation layer for the PG-isms Spark doesn't
  * parse (ISNULL/NOTNULL, IS UNKNOWN, SIMILAR TO, BETWEEN SYMMETRIC,
  * `= SOME (…)`, ARRAY[…] / ARRAY(subquery), ROW(…), FROM ONLY,
  * `::gtype` literal comparisons).
  *
  * Scale note: everything lands in `spark.sql` — Catalyst plans it like
  * any other query; the session table map only pins small DDL-created
  * relations (localCheckpoint'd on write so lineage stays flat).
  */
final class SqlSurface(spark: SparkSession) {

  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]

  /** Session table lookup (the vle() SRF joins against these). */
  def table(name: String): Option[DataFrame] = tables.get(name)

  private val CreateTable =
    "(?is)^CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(\\w+)\\s*\\(([^)]*)\\)(.*)$".r
  private val DropTable = "(?is)^DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(\\w+).*$".r
  private val InsertInto = "(?is)^INSERT\\s+INTO\\s+(\\w+)\\s+(.*)$".r
  private val Update =
    "(?is)^UPDATE\\s+(\\w+)\\s+SET\\s+(\\w+)\\s*=\\s*(.*?)(?:\\s+WHERE\\s+(.*))?$".r
  private val DeleteFrom = "(?is)^DELETE\\s+FROM\\s+(\\w+)(?:\\s+WHERE\\s+(.*))?$".r
  private val TableCmd = "(?is)^TABLE\\s+(\\w+)$".r
  private val GtypeCmp =
    "(?is)^SELECT\\s+'(.*)'::gtype\\s*(=|<>|<@|@>)\\s*'(.*)'::gtype$".r

  /** Does this statement belong to the SQL surface (vs Cypher clauses)?
    * `ag_*`/`pg_*` catalog probes (e.g. `SELECT * FROM ag_label` — psql
    * scaffolding in the regress scripts) are NOT accepted: there is no
    * backing catalog here, and the replay treats them as scaffolding.
    */
  def accepts(q: String): Boolean =
    ("(?is)^\\s*(SELECT|TABLE\\s+\\w+\\s*$|INSERT\\s+INTO|UPDATE\\s+\\w+\\s+SET|CREATE\\s+(TEMPORARY\\s+)?TABLE|DROP\\s+TABLE|DELETE\\s+FROM)\\b.*".r
      .pattern.matcher(q).matches() ||
      "(?is)^\\s*TABLE\\s+\\w+\\s*$".r.pattern.matcher(q).matches()) &&
      !"(?is).*\\b(FROM|JOIN)\\s+(ONLY\\s+)?(ag_(?!graph\\b)|pg_)\\w*.*".r.pattern.matcher(q).matches()

  def run(q0: String): DataFrame = {
    // the reference's whole fn catalog is SQL-visible; mirror before any
    // raw-SQL statement (idempotent createOrReplace), not only after the
    // first Cypher registry fallback
    graft.functions.Registry.register(spark)
    val q = q0.trim.stripSuffix(";").trim
    q match {
      case CreateTable(name, colSrc, tail) =>
        val inherited = "(?i)INHERITS\\s*\\(\\s*(\\w+)".r.findFirstMatchIn(tail)
          .flatMap(m => tables.get(m.group(1))).map(_.schema.fields.toSeq)
          .getOrElse(Seq.empty)
        val own = colSrc.split(",").map(_.trim).filter(_.nonEmpty).map { d =>
          val toks = d.split("\\s+")
          StructField(toks(0), sqlType(toks.lift(1).getOrElse("text")))
        }.toSeq
        val schema = StructType(inherited ++ own)
        register(name, spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
        spark.emptyDataFrame
      case DropTable(name) =>
        tables.remove(name)
        spark.catalog.dropTempView(name)
        spark.emptyDataFrame
      case InsertInto(name, body0) =>
        val target = tables.getOrElse(name,
          throw new IllegalArgumentException(s"relation \"$name\" does not exist"))
        val body = if (body0.trim.toUpperCase.startsWith("VALUES"))
          s"SELECT * FROM ${body0.trim}" else translate(body0)
        val src = spark.sql(body).toDF(target.columns: _*)
        // composite-typed sources (vertex/edge struct columns from a
        // cypher() TVF) re-type an EMPTY target: the CREATE TABLE only
        // knew the name `vertex`, the insert supplies the real schema
        val composite = src.schema.fields.exists(f =>
          f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[ArrayType])
        if (composite && target.isEmpty)
          register(name, src.localCheckpoint())
        else {
          val aligned = src.select(target.schema.fields.map(f =>
            col(f.name).cast(f.dataType)).toSeq: _*)
          register(name, target.unionByName(aligned).localCheckpoint())
        }
        spark.emptyDataFrame
      case Update(name, c, e, where) =>
        val target = tables.getOrElse(name,
          throw new IllegalArgumentException(s"relation \"$name\" does not exist"))
        val dt = target.schema(c).dataType
        val newVal = expr(translate(e)).cast(dt)
        val updated = Option(where) match {
          case Some(w) => target.withColumn(c,
            when(expr(translate(w)), newVal).otherwise(col(c)))
          case None => target.withColumn(c, newVal)
        }
        register(name, updated.localCheckpoint())
        spark.emptyDataFrame
      case DeleteFrom(name, where) =>
        val target = tables.getOrElse(name,
          throw new IllegalArgumentException(s"relation \"$name\" does not exist"))
        val remaining = Option(where) match {
          case Some(w) => target.filter(!coalesce(expr(translate(w)), lit(false)))
          case None => target.limit(0)
        }
        register(name, remaining.localCheckpoint())
        spark.emptyDataFrame
      case TableCmd(name) => spark.sql(s"SELECT * FROM $name")
      case GtypeCmp(l, op, r) =>
        val (a, b) = (GValue.parseRender(l), GValue.parseRender(r))
        val res = op match {
          case "="  => GValue.cmp(a, b) == 0
          case "<>" => GValue.cmp(a, b) != 0
          case "@>" => GValue.contains(a, b)
          case "<@" => GValue.contains(b, a)
        }
        spark.range(1).select(lit(res).as("?column?"))
      case _ if q.matches("(?i)^SELECT(\\s+ALL)?$") =>
        // PG `SELECT;` → one empty row
        spark.range(1).select()
      case _ if q.matches("(?i)^SELECT\\s+(ALL\\s+)?\\*$") =>
        throw new IllegalArgumentException(
          "SELECT * with no tables specified is not valid")
      case _ => pgMarkers(spark.sql(translate(q)))
    }
  }

  /** Stamp raw-SQL-surface render markers (PG array_out / record_out) on
    * plain array/record output columns that carry no marker yet — see
    * PgOut.sqlSurfaceMarker (new_cypher.out ARRAY/ROW constructors).
    */
  private def pgMarkers(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.gvalue.PgOut
    val needs = df.schema.fields.exists(f =>
      !f.metadata.contains(PgOut.TypeKey) &&
        PgOut.sqlSurfaceMarker(f.dataType).isDefined)
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      PgOut.sqlSurfaceMarker(f.dataType) match {
        case Some(m) if !f.metadata.contains(PgOut.TypeKey) =>
          col(f.name).as(f.name, new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString(PgOut.TypeKey, m).build())
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }

  private def register(name: String, df: DataFrame): Unit = {
    tables(name) = df
    df.createOrReplaceTempView(name)
  }

  private def sqlType(t: String): DataType = t.toLowerCase match {
    case "int" | "integer" | "int2" | "int4" | "int8" | "bigint" |
         "smallint" | "serial" => LongType
    case "float" | "float4" | "float8" | "double" | "real" | "numeric" => DoubleType
    case "bool" | "boolean" => BooleanType
    case _ => StringType // text, varchar, char, unknown
  }

  /** PG-ism → Spark SQL translation (regex-level; each rule is narrow
    * enough not to fire inside string literals the regress uses).
    */
  private def translate(q0: String): String = {
    var q = q0.trim
    // schema-qualified catalog view name → session temp view
    q = q.replaceAll("(?i)\\bpostgraph\\.ag_graph\\b", "ag_graph")
    // '123'::graphid — the 64-bit packed entity id type is a plain BIGINT
    // here (graphid.h packing); comparisons then resolve natively
    q = "'(-?[0-9]+)'\\s*::\\s*graphid\\b".r.replaceAllIn(q,
      m => s"CAST(${m.group(1)} AS BIGINT)")
    q = q.replaceAll("(?i)\\bISNULL\\b", "IS NULL")
    q = q.replaceAll("(?i)\\bNOTNULL\\b", "IS NOT NULL")
    q = q.replaceAll("(?i)\\bIS\\s+NOT\\s+UNKNOWN\\b", "IS NOT NULL")
    q = q.replaceAll("(?i)\\bIS\\s+UNKNOWN\\b", "IS NULL")
    q = q.replaceAll("(?i)\\bFROM\\s+ONLY\\b", "FROM")
    // TABLESAMPLE BERNOULLI(p)/SYSTEM(p) (cypher_gram.y:2046-2080) →
    // Spark's native `TABLESAMPLE (p PERCENT)`; REPEATABLE(seed) is
    // already Spark syntax and passes through
    q = "(?i)\\bTABLESAMPLE\\s+(?:BERNOULLI|SYSTEM)\\s*\\(\\s*([0-9.]+)\\s*\\)".r
      .replaceAllIn(q, m => s"TABLESAMPLE (${m.group(1)} PERCENT)")
    q = q.replaceAll("(?i)\\bFROM\\s+LATERAL\\s*\\(", "FROM (")
    q = q.replaceAll("(?i)\\bBETWEEN\\s+ASYMMETRIC\\b", "BETWEEN")
    q = "(?i)BETWEEN\\s+SYMMETRIC\\s+(\\S+)\\s+AND\\s+(\\S+)".r
      .replaceAllIn(q, m => s"BETWEEN least(${m.group(1)},${m.group(2)}) " +
        s"AND greatest(${m.group(1)},${m.group(2)})")
    q = "(?i)(NOT\\s+)?SIMILAR\\s+TO\\s+'([^']*)'".r.replaceAllIn(q, { m =>
      val neg = Option(m.group(1)).map(_ => "NOT ").getOrElse("")
      val rx = m.group(2).replace("%", ".*").replace("_", ".")
      java.util.regex.Matcher.quoteReplacement(s"${neg}RLIKE '^$rx$$'")
    })
    q = q.replaceAll("(?i)=\\s*(?:SOME|ANY)\\s*\\(", " IN (")
    q = q.replaceAll("(?i)(?:<>|!=)\\s*ALL\\s*\\(", " NOT IN (")
    q = "(?i)\\bARRAY\\s*\\[([^\\]]*)\\]".r.replaceAllIn(q,
      m => java.util.regex.Matcher.quoteReplacement(s"array(${m.group(1)})"))
    q = "(?is)\\bARRAY\\s*\\(\\s*(SELECT\\b[^()]*)\\)".r.replaceAllIn(q,
      m => java.util.regex.Matcher.quoteReplacement(
        s"(SELECT collect_list(__c) FROM (${m.group(1)}) AS __arr(__c))"))
    q = q.replaceAll("(?i)^SELECT\\s+ROW\\s*\\(", "SELECT struct(")
    // bare tuple constructor `SELECT (1, 2, 3)` (no nesting, ≥1 comma)
    if (q.matches("(?is)^SELECT\\s*\\(([^()]*,[^()]*)\\)$"))
      q = q.replaceFirst("(?is)^SELECT\\s*\\(", "SELECT struct(")
    q
  }
}
