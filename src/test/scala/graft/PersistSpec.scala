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
}
