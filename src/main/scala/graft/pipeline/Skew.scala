package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at 100 TB.
  *
  * Spark's partial aggregation already absorbs skewed groupBys map-side, and
  * AQE splits skewed sort-merge join partitions at runtime. What neither
  * covers is a hot-key shuffle join where the dimension can't broadcast:
  * there, salting spreads one hot key over `salts` reducers by replicating
  * the small side. Results are identical to the unsalted join (the salt is
  * a pure distribution key, dropped before output).
  */
object Skew {

  /** Salted equi-join: the big side gets a uniform salt in [0, salts); the
    * small side is replicated once per salt value; the join key becomes
    * (key, salt). One hot key's rows land on `salts` reducers instead of
    * one.
    *
    * Use ONLY when the replicated side is a fixed-size dimension (so the
    * ×salts replication is free) and the key is so low-cardinality or
    * skewed that reducer parallelism is the bottleneck. When BOTH sides
    * scale with the data, salting multiplies shuffle volume — prefer AQE's
    * runtime skew-join splitting (enabled by default) there. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val bigS = big.withColumn("_salt",
      floor(rand(42) * salts).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: phase 1 combines on (key, salt), phase 2
    * merges the ≤`salts` partials per key. Correct for any decomposable
    * aggregate; exposed for count+sum, the pipeline's common shape. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val phase1 = df
      .withColumn("_salt", floor(rand(42) * salts).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
    phase1.groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
  }
}
