package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: per-key top-k rows.
  *
  * The composable formulation (`row_number().over(window) <= k`)
  * materializes a rank column for EVERY row and filters afterwards;
  * this operator declares the same required distribution + ordering
  * (so Catalyst plans the identical single Exchange + Sort) and then
  * emits the first k rows per key directly from the sorted stream —
  * no rank projection, no post-filter, and downstream operators see
  * at most k·#keys rows. The full custom-operator ladder: LogicalPlan
  * → Strategy → UnaryExecNode, registered via `SparkSessionExtensions`
  * (`GraftExtensions`) or per-session `experimental.extraStrategies`.
  */
case class PartitionedTopK(
    k: Int,
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PartitionedTopK = copy(child = newChild)
}

/** Physical operator. Requires clustering on the partition keys and a
  * (keys, order) sort — EnsureRequirements inserts the one Exchange +
  * Sort, exactly as it would for a window function — then streams each
  * sorted partition, counting rows per key run.
  */
case class PartitionedTopKExec(
    k: Int,
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionExprs.map(SortOrder(_, Ascending)) ++ orderExprs)

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val kk = k
    val pExprs = partitionExprs
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      var currentKey: UnsafeRow = null
      var n = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          n = 0
        }
        n += 1
        n <= kk
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): PartitionedTopKExec = copy(child = newChild)
}

/** Planner strategy lowering the logical node to the exec node. */
object PartitionedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionedTopK(k, p, o, child) =>
      PartitionedTopKExec(k, p, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

object PartitionedTopK {

  /** Make the strategy available on a session that was not built with
    * `GraftExtensions` (idempotent).
    */
  def setup(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(PartitionedTopKStrategy))
      spark.experimental.extraStrategies =
        PartitionedTopKStrategy +: spark.experimental.extraStrategies

  /** Top-k rows per key group, ordered by `order` — a list of
    * (column name, ascending?) pairs. Names are resolved against the
    * child's analyzed output here (Spark 4's Column→Expression
    * conversion yields lazy ColumnNode wrappers the analyzer does not
    * resolve inside foreign plan nodes).
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    setup(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name)}"))
    val orderExprs = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftSqlShims.ofRows(spark,
      PartitionedTopK(k, keys.map(attr(_)), orderExprs, child))
  }
}
