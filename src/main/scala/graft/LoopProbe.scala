package graft

/** Observability hook for the data-dependent iterative operators
  * (round-11 verdict #5): the 12 construction-heavy fixpoint queries
  * are excluded from the sf10 exchange pins — planning them executes
  * their convergence loops — so a convergence-REGIME flip at sf10
  * (a fixpoint that starts taking 2× the rounds, a peel that stops
  * early) was invisible to every golden. Each iterative loop records
  * `(label, iterations, exchangesPerIteration)` here on completion;
  * `graft.tools.FixpointGolden` runs each excluded query under the
  * probe and dumps a TSV golden, and `FixpointGoldenSpec` pins it at
  * the scales where construction is affordable.
  *
  * `exchangesPerIteration` is the shuffle-exchange node count of ONE
  * iteration's pre-checkpoint plan (constant across iterations by
  * construction — every loop checkpoints each generation, so round k
  * plans exactly like round 1; nsw_beam gained its in-loop beam
  * checkpoint in round 13 exactly so this invariant holds for it
  * too): iteration count × that constant is the loop's total shuffle
  * budget, the number that decides whether the operator finishes at
  * 100 TB. One documented approximation (ADVICE r12): hits_power's
  * value sums the two RAW half-step frames (auth + hub) — l1norm's
  * post-checkpoint normalization exchanges straddle the half-step
  * boundary and land in the NEXT half-step's probed plan, so the
  * recorded constant is exact per full iteration but its split
  * between the two halves is nominal.
  *
  * Recording is a lock-free append; overhead is one plan walk on the
  * first iteration and nothing per-row. The probe is process-global
  * (the tools run one query at a time); concurrent queries interleave
  * events but each event is atomic.
  */
object LoopProbe {

  final case class Event(label: String, iterations: Int,
      exchangesPerIter: Int)

  private val events_ =
    new java.util.concurrent.ConcurrentLinkedQueue[Event]()

  @volatile private var enabled = false

  /** Probing is opt-in: the plan walk on iteration 1 is cheap but not
    * free, and production loops should not accumulate an unbounded
    * queue nobody drains.
    */
  def enable(): Unit = { enabled = true }
  def disable(): Unit = { enabled = false; events_.clear() }
  def isEnabled: Boolean = enabled

  def reset(): Unit = events_.clear()

  def record(label: String, iterations: Int,
      exchangesPerIter: Int): Unit =
    if (enabled) { events_.add(Event(label, iterations, exchangesPerIter)); () }

  /** Shuffle-exchange node count of `df`'s executed plan — planning
    * only, no action. Callers pass one iteration's PRE-checkpoint
    * frame. Returns -1 when probing is off so call sites can skip
    * the plan walk entirely.
    */
  def exchangeCount(df: org.apache.spark.sql.DataFrame): Int =
    if (!enabled) -1
    else df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  def events: Seq[Event] = {
    import scala.jdk.CollectionConverters._
    events_.iterator().asScala.toSeq
  }
}
