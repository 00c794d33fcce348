package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL exposure of Spark's OWN Bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the engine's
  * runtime-filter machinery (what `InjectRuntimeFilter` plants on the
  * fact side of selective joins — plan-pinned in `PlanShapeSpec`), but
  * Spark does not register them as SQL functions. Registering them
  * makes the same mergeable sketch available as a USER primitive: build
  * a membership filter over a key set once, probe it map-side anywhere
  * — the 100 TB pattern for "is this key in that other dataset" when a
  * join is too heavy and exactness isn't required (false positives
  * possible, false negatives never).
  *
  * `might_contain` requires its filter argument to be a constant or
  * scalar subquery (the sketch must be a build-once broadcast value,
  * never a per-row column), so callers go through the SQL layer:
  * `graft_might_contain((SELECT graft_bloom_agg(k, items, bits) FROM
  * build), probe_key)`.
  */
object BloomFns {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}
