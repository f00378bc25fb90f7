package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The reference's `cypher('graph', $$ … $$)` SQL entry point (SURVEY §3.2;
  * reference: the AGE-compat SETOF-record function in sql/postgraph.sql.in)
  * as a Spark TABLE-VALUED FUNCTION:
  *
  * {{{
  *   CypherTvf.registerGraph("tpch", graph)
  *   CypherTvf.register(spark)
  *   spark.sql("SELECT * FROM cypher('tpch', 'MATCH (n:Nation) RETURN n.n_name AS n')")
  * }}}
  *
  * The builder compiles the Cypher text straight to the query's analyzed
  * LogicalPlan, so the TVF composes with arbitrary SQL around it — joins
  * against parquet tables, CTEs, window functions — and Catalyst optimizes
  * ACROSS the boundary (filters push into the graph scans).
  */
object CypherTvf {

  private val graphs =
    new java.util.concurrent.ConcurrentHashMap[String, PropertyGraph]()

  def registerGraph(name: String, g: PropertyGraph): Unit = graphs.put(name, g)

  private def str(e: Expression, what: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"cypher(graph, query): $what must be a string literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val builder = (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cypher(graph_name, query) expects 2 arguments")
      val gname = str(exprs(0), "graph name")
      val query = str(exprs(1), "query")
      val graph = Option(graphs.get(gname)).getOrElse(
        throw new IllegalArgumentException(
          s"unknown graph '$gname' — CypherTvf.registerGraph it first"))
      new Compiler(graph).run(query)
        .asInstanceOf[org.apache.spark.sql.classic.DataFrame]
        .queryExecution.analyzed: LogicalPlan
    }
    session.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction("cypher", builder, "internal")
  }
}
