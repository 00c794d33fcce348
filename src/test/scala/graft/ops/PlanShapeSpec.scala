package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec

/** Plan-shape proof for the two-level grouping-sets family: the
  * Expand node (which replicates its input once per grouping set —
  * ×3 rollup/sets, ×4 cube) must sit ABOVE a pre-aggregation, so it
  * replicates group-count rows, never the scanned input. This is the
  * property SCALE.md claims; the spec pins it against regression.
  */
class PlanShapeSpec extends SparkSpec {

  test("runtime bloom filter prunes the fact side of a selective join") {
    // The 100 TB feature under test: with a selective dimension-side
    // filter, Catalyst injects a runtime bloom filter
    // (BloomFilterMightContain) into the fact-side scan, so fact rows
    // that cannot join are dropped BEFORE the shuffle. Local datasets
    // sit under the size thresholds, so the thresholds are lowered to
    // observe the cluster-scale plan shape.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val prior = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      import org.apache.spark.sql.functions._
      val sel = graft.Tables.orders(spark, sf())
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 300000)
      val joined = graft.Tables.lineitem(spark, sf())
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        "no runtime bloom filter injected on the fact side")
    } finally prior.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q_pq_search top-k plans as TakeOrderedAndProject, not a global sort") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_pq_search")(spark, sf())
        .queryExecution.executedPlan
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "expected TakeOrderedAndProject for the top-k")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_anomaly broadcasts the per-type stats side") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_anomaly")(spark, sf())
        .queryExecution.executedPlan
      val bcJoins = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bcJoins.nonEmpty,
        "stats must broadcast onto the scan, not shuffle the events")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_chi2 broadcasts the scalar sides and plans top-k, not a global sort") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_chi2")(spark, sf())
        .queryExecution.executedPlan
      val bc = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      }
      assert(bc.size >= 3, s"df/cl/N sides must broadcast, got ${bc.size}")
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "expected TakeOrderedAndProject for the top-50")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_ewma and q_rolling_median shuffle exactly once (the user_id exchange)") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q_ewma", "q_rolling_median")) {
        val plan = graft.SparkEntry.queries(q)(spark, sf())
          .queryExecution.executedPlan
        val exchanges = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(exchanges.size == 1, s"$q: ${exchanges.size} exchanges, want 1")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_feature_hash single-distinct agg plans without Expand") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_feature_hash")(spark, sf())
        .queryExecution.executedPlan
      val expands = plan.collect { case e: ExpandExec => e }
      assert(expands.isEmpty,
        "single count_distinct must not replicate input through Expand")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_attribution shuffles exactly once (the range-frame window pass)") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_attribution")(spark, sf())
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // window pass on user_id; the <= 9-group rollup rides the same
      // exchange count (partials collapse map-side before one final)
      assert(exchanges.size <= 2,
        s"${exchanges.size} exchanges — the purchase-join-view shape leaked in")
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.isEmpty, "attribution must be a window pass, not a self-join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_oov_rate broadcasts the bounded vocabulary") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_oov_rate")(spark, sf())
        .queryExecution.executedPlan
      val bc = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bc.nonEmpty, "vocabulary must broadcast onto the token stream")
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "top-K vocabulary must plan as TakeOrderedAndProject")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_drift and q_source_overlap broadcast their totals sides") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q_drift", "q_source_overlap")) {
        val plan = graft.SparkEntry.queries(q)(spark, sf())
          .queryExecution.executedPlan
        val bc = plan.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        }
        assert(bc.nonEmpty, s"$q: totals must broadcast, not shuffle")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_basket broadcasts item counts and N; top-25 is TakeOrderedAndProject") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_basket")(spark, sf())
        .queryExecution.executedPlan
      val bc = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      }
      assert(bc.size >= 3,
        s"item counts (×2) and N must broadcast, got ${bc.size}")
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "top-25 rules must plan as TakeOrderedAndProject")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_tpch21 plans the correlations as semi+anti joins; top-25 is TakeOrderedAndProject") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_tpch21")(spark, sf())
        .queryExecution.executedPlan
      val planStr = plan.toString
      assert(planStr.contains("LeftSemi"),
        "EXISTS must plan as a LEFT SEMI join, not a distinct+inner rewrite")
      assert(planStr.contains("LeftAnti"),
        "NOT EXISTS must plan as a LEFT ANTI join")
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "top-25 must plan as TakeOrderedAndProject")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_hard_negatives broadcasts the probe side; corpus never shuffles for the join") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_hard_negatives")(spark, sf())
        .queryExecution.executedPlan
      val bc = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      }
      assert(bc.nonEmpty,
        "probe set must broadcast against the streamed corpus")
      val smj = plan.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      assert(smj.isEmpty, "the scoring join must not sort-merge the corpus")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_vocab_growth scans the corpus once (persisted bucket frame)") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_vocab_growth")(spark, sf())
        .queryExecution.executedPlan
      // Every consumer (intra-shard running sums, shard totals, carry
      // self-join) must read the persisted bucket frame, never the
      // corpus directly...
      val outerScans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(outerScans.isEmpty,
        s"consumers must read the cached bucket frame, not re-scan the " +
          s"corpus (got ${outerScans.size} direct scans)")
      val cached = plan.collect {
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
      }
      assert(cached.size >= 2,
        s"expected >=2 cached-bucket-frame consumers, got ${cached.size}")
      // ...and the cached frame itself is built from ONE corpus scan.
      val innerScans = cached.head.relation.cachedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(innerScans.size == 1,
        s"the bucket frame must be a linear single-scan pipeline " +
          s"(got ${innerScans.size} scans)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_golden_record survivorship is one agg, no corpus-wide window") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_golden_record")(spark, sf())
        .queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        "survivorship must be max_by aggregation, not a row_number window")
      val aggs = plan.collect { case a: BaseAggregateExec => a }
      assert(aggs.nonEmpty, "expected the cluster-keyed max_by aggregate")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_substring_dup fingerprint count is Expand-free; text never shuffles") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_substring_dup")(spark, sf())
        .queryExecution.executedPlan
      val expands = plan.collect { case e: ExpandExec => e }
      assert(expands.isEmpty,
        "single count_distinct must not replicate fingerprints through Expand")
      // No shuffle may carry the text column — only doc_id + hashes move.
      val shuffledText = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.child.output.exists(_.name == "text") => e
      }
      assert(shuffledText.isEmpty, "document text must never shuffle")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_bpe_iter round winners are 1-row broadcasts, counts are top-1") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_bpe_iter")(spark, sf())
        .queryExecution.executedPlan
      val bc = plan.collect {
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bc.size >= 4,
        s"each round's winner must broadcast into the rewrite, got ${bc.size}")
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.size >= 3,
        s"per-round top-1 must plan as TakeOrderedAndProject, got ${toap.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_tpch1 is one lineitem pass: single exchange, no Expand") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_tpch1")(spark, sf())
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"Q1 must shuffle only 6 partial-agg rows, got ${exchanges.size} exchanges")
      assert(plan.collect { case e: ExpandExec => e }.isEmpty,
        "Q1's 8 aggregates must share one pass, not Expand the input")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_tpch2 broadcasts every dimension and plans top-100 as TakeOrdered") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_tpch2")(spark, sf())
        .queryExecution.executedPlan
      val bc = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bc.size >= 3,
        s"nation/region/part must broadcast, got ${bc.size} broadcast joins")
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, "top-100 must be TakeOrderedAndProject, not a global sort")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_tpch20 scans lineitem exactly once and semi-joins the pair list") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // Optimization round 13: the pair aggregate moved into the
      // shared partsupp surrogate (Tpch.psAgg — one build per
      // session/corpus serving Q2/Q11/Q16/Q20), so the CONSUMER plan
      // contains ZERO lineitem scans: the "one lineitem pass" this
      // test pins now lives in the memoized build. Pin both halves:
      // the consumer must not re-scan lineitem, and the build it
      // consumes must compute availability + 1996 quantity in one
      // pass.
      val plan = graft.SparkEntry.queries("q_tpch20")(spark, sf())
        .queryExecution.executedPlan
      def liScans(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains("lineitem")) => f
        }
      assert(liScans(plan).isEmpty,
        s"the consumer must read the shared pair table, not re-scan " +
          s"lineitem — got ${liScans(plan).size} scans")
      val buildPlan = graft.ops.Tpch.psBuildForSpec(spark, sf())
        .queryExecution.executedPlan
      assert(liScans(buildPlan).size == 1,
        s"availability + 1996 quantity must share ONE lineitem pass " +
          s"in the shared build, got ${liScans(buildPlan).size} scans")
      assert(plan.toString.contains("LeftSemi"),
        "supplier filter must plan as a semi join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_doc_surprisal joins hash (never nested-loop) and top-k is bounded") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_doc_surprisal")(spark, sf())
        .queryExecution.executedPlan
      val nested = plan.collect {
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(nested.isEmpty,
        "LM join must stay a hash join — nested-loop means a missing equi-key")
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, "top-50 must be TakeOrderedAndProject")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("grouping-sets family expands group partials, not input rows") {
    // AQE wraps the plan adaptively; the static plan is what carries
    // the Expand/aggregate nesting being asserted.
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q_grouping_sets", "q_rollup", "q_cube")) {
        val df = graft.SparkEntry.queries(q)(spark, sf())
        val expands = df.queryExecution.executedPlan.collect {
          case e: ExpandExec => e
        }
        assert(expands.nonEmpty, s"$q: no Expand in plan")
        expands.foreach { e =>
          val aggBelow = e.child.collectFirst {
            case a: BaseAggregateExec => a
          }
          assert(aggBelow.isDefined,
            s"$q: Expand feeds off the raw input (no pre-aggregation)")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_changepoint windows reuse one event_type exchange after the daily agg") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_changepoint")(spark, sf())
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // 1: the (type, day) daily hash agg; 2: the event_type window
      // partitioning (ordered prefix + whole-partition totals + the
      // argmax rank all share it). A third exchange would mean a
      // window stopped reusing the partitioning — the regression this
      // pin guards.
      assert(exchanges.size <= 2,
        s"q_changepoint: ${exchanges.size} exchanges, want <= 2")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_paths session windows share the user exchange; top-20 is TakeOrdered") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_paths")(spark, sf())
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // user window + (user, session) window + (user, session) path agg
      // must all ride ONE user_id exchange (a (user, session) partition
      // refines the user partition); the only other exchange is the
      // bounded path histogram.
      assert(exchanges.size <= 2,
        s"q_paths: ${exchanges.size} exchanges, want <= 2")
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "q_paths: top-20 must be TakeOrderedAndProject")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_streaks islands agg reuses the user window exchange") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_streaks")(spark, sf())
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // (user, day) distinct + user window + (user, anchor) islands agg
      // + bounded histogram: the islands agg must NOT add an exchange
      // beyond the distinct, the window repartition, and the final
      // histogram (<= 3 total).
      assert(exchanges.size <= 3,
        s"q_streaks: ${exchanges.size} exchanges, want <= 3")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_kmv_distinct plans its sketch as TakeOrderedAndProject") {
    // The scale claim: the K minima come from per-partition top-K +
    // merge (mergeable sketch), never a global sort of distinct
    // hashes. TakeOrderedAndProject IS that algorithm in Spark.
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_kmv_distinct")(spark, sf())
        .queryExecution.executedPlan
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "KMV sketch must plan TakeOrderedAndProject")
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec
            if s.global => s
      }
      assert(sorts.isEmpty, "no global sort may back the sketch")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_countmin broadcasts the 1536-cell sketch into the top-20 probe") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_countmin")(spark, sf())
        .queryExecution.executedPlan
      val toap = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(toap.nonEmpty, "exact top-20 must plan TakeOrderedAndProject")
      val bcJoins = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bcJoins.nonEmpty,
        "the counter frame must broadcast onto the probe side")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("q_constraints plans LEFT ANTI for both referential checks") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("q_constraints")(spark, sf())
        .queryExecution.executedPlan
      val antis = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
      }
      assert(antis.size >= 2,
        s"expected >= 2 LEFT ANTI referential joins, got ${antis.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}
