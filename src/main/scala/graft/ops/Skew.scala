package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY "Partitioning & shuffle": salting
  * for skew). AQE's skew-join handling covers sort-merge joins at
  * runtime; explicit salting is for the cases AQE can't split — e.g. a
  * single hot key feeding a hash aggregate or a broadcast-ineligible
  * dimension join.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt
    * derived from `saltFrom` (any column unique-ish per row), the small
    * side is replicated `n`× so every (key, salt) pair matches. Result
    * equals the plain join, but the hot key's rows spread over n
    * shuffle partitions. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, n: Int): DataFrame = {
    val salted = large.withColumn("_salt", pmod(hash(saltFrom), lit(n)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation for a hot group key: partial
    * aggregate on (key, salt), then final aggregate on key. For algebraic
    * aggregates Spark's own partial aggregation already does this
    * map-side; this form is for aggregates where the partial state must
    * be bounded per task (e.g. collect-like ops). */
  def twoPhaseCount(df: DataFrame, key: String, saltFrom: Column, n: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(saltFrom), lit(n)))
      .groupBy(col(key), col("_salt")).count()
      .groupBy(col(key)).agg(sum("count").as("count"))
}
