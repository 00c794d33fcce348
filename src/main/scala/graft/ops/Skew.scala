package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators.
  *
  * AQE's runtime skew-join splitting (on in `GraftSession`) handles
  * skew it can observe; these helpers are the planned-ahead form for
  * keys KNOWN to be pathological (the null key, a celebrity user, a
  * default timestamp) — the standard salting constructions for a
  * 1000-executor cluster where one hot key would otherwise serialize
  * onto one task.
  */
object Skew {

  /** Salted two-level aggregation of additive aggregates: rows are
    * spread over `buckets` sub-keys (deterministic hash of the whole
    * row's spread column), partially aggregated per (key, salt), then
    * merged per key. Identical result to a direct groupBy — the salt
    * only splits the hot key's partial work across tasks.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      buckets: Int): DataFrame = {
    // Salt must be uncorrelated with the data: a hot key whose rows
    // share one value would hash to a single salt and still serialize
    // onto one task. A per-row unique id spreads even identical rows
    // (projected first — nondeterministic expressions can't sit in a
    // grouping expression).
    val partial = df
      .withColumn("_salt",
        pmod(hash(monotonically_increasing_id()), lit(buckets)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }

  /** Salted broadcast-replicated join for a skewed fact⋈dim equi join:
    * the dim side is exploded `buckets`× (one copy per salt value), the
    * fact side picks a deterministic salt per row, and the join key
    * becomes (key, salt) — the hot key's rows now land on `buckets`
    * tasks instead of one. Semantically identical to the plain join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(struct(fact.columns.map(col).toIndexedSeq: _*)),
        lit(buckets)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact
      .join(saltedDim,
        col(factKey) === col(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
