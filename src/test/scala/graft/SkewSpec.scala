package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting equivalence: the skew-mitigated shapes return exactly the
  * plain-shape results on a deliberately skewed input (one key holding
  * ~90% of rows).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = spark.range(10000)
    .select(when(col("id") % 10 =!= 0, lit(42L)).otherwise(col("id")).as("k"),
      col("id").as("v"))

  test("salted two-phase count equals plain groupBy count") {
    val plain = skewed.groupBy(col("k")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(skewed, col("k"), salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain)
    assert(plain(42L) == 9000L)
  }

  test("salted join equals plain join on a hot-key input") {
    val dim = spark.range(100).select(col("id").as("dk"), (col("id") * 2).as("dv"))
    val plain = skewed.join(dim, skewed("k") === dim("dk"))
      .select(col("v"), col("dv"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", salts = 8)
      .select(col("v"), col("dv"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
