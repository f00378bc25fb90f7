package graft

import graft.cypher.Compiler
import graft.graph.PropertyGraph
import graft.operators.GraphQueries
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class PersistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("graph save/load roundtrip preserves labels, ids, and query results") {
    val g = GraphQueries.tpchGraph(spark, sf)
    val dir = Files.createTempDirectory("graft_graph").toString
    g.save(dir)
    val loaded = PropertyGraph.load(spark, dir)
    assert(loaded.labelIds == g.labelIds)
    val q = "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) RETURN n.n_name AS nation, count(*) AS n ORDER BY nation"
    val before = new Compiler(g).run(q).collect().map(_.toString).toSeq
    val after = new Compiler(loaded).run(q).collect().map(_.toString).toSeq
    assert(before == after)
  }

  test("CSV and JSON sources build the same graph as parquet") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_src").toString
    val nation = Tables.T(spark, sf, "nation")
    val region = Tables.T(spark, sf, "region")
    nation.write.option("header", "true").csv(s"$dir/nation_csv")
    region.write.json(s"$dir/region_json")
    val nationCsv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/nation_csv")
    val regionJson = spark.read.json(s"$dir/region_json")
    val g = new graft.graph.GraphBuilder(spark)
      .vertexLabel("Nation", nationCsv, "n_nationkey")
      .vertexLabel("Region", regionJson, "r_regionkey")
      .edgeLabel("IN_REGION", nationCsv, "n_nationkey",
        "Nation", "n_nationkey", "Region", "n_regionkey")
      .build()
    val rows = new Compiler(g).run(
      "MATCH (n:Nation)-[:IN_REGION]->(r:Region) RETURN r.r_name AS region, count(*) AS n ORDER BY region")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = nation.join(region,
        nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name")).count().orderBy(col("r_name"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == expected.toSeq)
  }
}
