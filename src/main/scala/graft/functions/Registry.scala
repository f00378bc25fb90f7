package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers the reference-named function catalog for `spark.sql` use
  * (the reference exposes 496 SQL functions in its sql catalog files — this
  * registry carries the vector/tsearch/text subset whose bodies are our
  * composed codegen-friendly expression trees, NOT Scala UDFs).
  */
object Registry {

  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    // classic.SparkSession.expression resolves the functions-API ColumnNode
    // tree into a real (codegen-able) catalyst Expression tree
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    def reg(name: String, arity: Int)(f: Seq[Column] => Column): Unit = {
      val builder = (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity arguments")
        session.expression(f(exprs.map(Bridge.column)))
      }
      fr.createOrReplaceTempFunction(name, builder, "internal")
    }

    // vector surface (vector.c / pgvector operators)
    reg("tovector", 1)(a => VectorFns.tovector(a(0)))
    reg("dims", 1)(a => VectorFns.dims(a(0)))
    reg("norm", 1)(a => VectorFns.norm(a(0)))
    reg("l2_distance", 2)(a => VectorFns.l2Distance(a(0), a(1)))
    reg("l2_squared_distance", 2)(a => VectorFns.l2Squared(a(0), a(1)))
    reg("l1_distance", 2)(a => VectorFns.l1Distance(a(0), a(1)))
    reg("inner_product", 2)(a => VectorFns.innerProduct(a(0), a(1)))
    reg("negative_inner_product", 2)(a => VectorFns.negativeInnerProduct(a(0), a(1)))
    reg("cosine_distance", 2)(a => VectorFns.cosineDistance(a(0), a(1)))
    reg("spherical_distance", 2)(a => VectorFns.sphericalDistance(a(0), a(1)))
    reg("vector_add", 2)(a => VectorFns.vadd(a(0), a(1)))
    reg("vector_sub", 2)(a => VectorFns.vsub(a(0), a(1)))
    reg("vector_mul", 2)(a => VectorFns.vmul(a(0), a(1)))

    // tsearch surface (gtype_tsearch.c)
    reg("totsvector", 1)(a => TsearchFns.toTsvector(a(0)))
    reg("ts_delete", 2)(a => TsearchFns.tsDelete(a(0), a(1)))
    reg("tsvector_concat", 2)(a => TsearchFns.tsvectorConcat(a(0), a(1)))

    // text pipeline
    reg("quality_score", 1)(a => TextFns.qualityScore(a(0)))
    reg("simhash64", 1)(a => TextFns.simhash64(a(0)))
    reg("fingerprint_md5", 1)(a => TextFns.fingerprintMd5(a(0)))
  }
}
