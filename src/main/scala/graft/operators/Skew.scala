package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for the 100 TB path. AQE's skew-join
  * splitting handles most cases at runtime; these are the explicit forms
  * for the two shapes AQE does NOT cover:
  *
  *  - aggregation skew: one hot group overwhelming a reducer → two-phase
  *    salted aggregation (partial per (key, salt), then final per key);
  *  - broadcast-infeasible skewed joins where ONE side's hot keys are
  *    known: replicate the small side per salt, salt the big side.
  *
  * Used by the dedup/LSH family conceptually (hot shingles/bands); exact
  * operators keep their plain shapes because AQE covers their joins — this
  * is the documented escape hatch when it doesn't.
  */
object Skew {

  /** Two-phase salted COUNT per key: distributes a hot key's rows over
    * `salts` partial groups before the final combine. Result is exactly
    * groupBy(key).count() for any input.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.select(key.as("__k"))
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col("__k"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as("count"))
      .withColumnRenamed("__k", "key")

  /** Salted inner equi-join for a skewed LEFT side against a small-ish
    * right side that cannot be broadcast: the right side replicates once
    * per salt value, the left side gets a random salt — hot keys spread
    * over `salts` reducers. Row-identical to `left.join(right, leftKey ===
    * rightKey)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
