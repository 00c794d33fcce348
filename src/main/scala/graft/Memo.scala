package graft

import org.apache.spark.sql.DataFrame

/** The one place a corpus-memo materializes: an EAGER
  * `localCheckpoint` (truncate lineage + pin blocks — the session
  * "maintained table" tier) in normal operation, a LAZY one when the
  * `graft.plan.only` system property is set.
  *
  * Plan-only mode exists for [[graft.plans.ExchangeGoldenSpec]]: the
  * exchange-count pins need each query's EXECUTED PLAN, not its
  * results, but an eager checkpoint runs the whole index build at
  * memo-construction time — at sf10 on the 4-core test session that
  * is tens of minutes of spill-bound shuffle for numbers the planner
  * never looks at. Eager and lazy checkpoints produce the SAME
  * logical node (a stats-less `LogicalRDD` scan), so every plan —
  * and therefore every pinned count — is identical; only the
  * side-effectful materialization is deferred to an action that
  * plan-pinning never takes. `ExchangeGoldenSpec` re-pinning the
  * three pre-existing scales byte-identically under plan-only mode
  * is the recorded proof of that equivalence.
  */
object Memo {
  def planOnly: Boolean = sys.props.contains("graft.plan.only")

  /** Use as `df.transform(Memo.checkpoint)` where
    * `df.localCheckpoint(true)` used to be.
    */
  def checkpoint(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = !planOnly)
}
