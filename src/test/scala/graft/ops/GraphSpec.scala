package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Triangle counting checked against an independent Scala-side
  * brute-force recompute of the same top-edge graph.
  */
class GraphSpec extends SparkSpec {

  test("q_triangles equals brute-force recompute of the top-edge graph") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length)
        w((ss(i), ss(j))) = w.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    val edges = w.toSeq
      .sortBy { case ((a, b), wt) => (-wt, a, b) }
      .take(500).map(_._1).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    val adj = verts.map { v =>
      v -> edges.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }
    }.toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    val vs = verts.toSeq.sorted
    for {
      a <- vs; b <- adj(a) if b > a; c <- adj(a)
      if c > b && adj(b).contains(c)
    } Seq(a, b, c).foreach(v =>
      triCount(v) = triCount.getOrElse(v, 0L) + 1)
    val got = SparkEntry.queries("q_triangles")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triCount.toMap)
  }

  test("q_pagerank equals the integer-exact Scala-side recompute") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length)
        w((ss(i), ss(j))) = w.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    val edges = w.toSeq
      .sortBy { case ((a, b), wt) => (-wt, a, b) }.take(500).map(_._1)
    val dir = edges ++ edges.map(e => (e._2, e._1))
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val verts = deg.keys.toSeq.sorted
    val n = verts.size
    var pr = verts.map(v => v -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val m = scala.collection.mutable.Map.empty[Long, Long]
      dir.foreach { case (u, v) =>
        m(v) = m.getOrElse(v, 0L) + pr(u) / deg(u)
      }
      pr = verts.map(v =>
        v -> (150000000000L / n + 85L * m.getOrElse(v, 0L) / 100L)).toMap
    }
    val expected = pr.toSeq.sortBy { case (v, p) => (-p, v) }.take(20)
      .zipWithIndex.map { case ((v, p), i) => (v, p, i + 1) }
    val got = SparkEntry.queries("q_pagerank")(spark, sf())
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == expected)
  }

  test("q_kcore equals the Scala-side peeling recompute") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length)
        w((ss(i), ss(j))) = w.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    var edges = w.toSeq
      .sortBy { case ((a, b), wt) => (-wt, a, b) }.take(500).map(_._1)
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val peelRound = scala.collection.mutable.Map.empty[Long, Int]
    for (r <- 1 to 3) {
      val deg = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
      }
      val rem = alive.filter(v => deg.getOrElse(v, 0L) < 8)
      rem.foreach(v => peelRound(v) = r)
      alive = alive -- rem
      edges = edges.filter { case (a, b) => alive(a) && alive(b) }
    }
    val finalDeg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      finalDeg(a) = finalDeg.getOrElse(a, 0L) + 1
      finalDeg(b) = finalDeg.getOrElse(b, 0L) + 1
    }
    val expected =
      peelRound.map { case (v, r) => (v, r, 0L) }.toSet ++
        alive.map(v => (v, 0, finalDeg.getOrElse(v, 0L)))
    val got = SparkEntry.queries("q_kcore")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // (cascade depth is data-dependent: sf0.001's tiny graph survives
    // intact, sf0.01 — the oracle-gate scale — peels 35/9/12 across the
    // three rounds; the recompute covers whichever shape `sf()` yields)
    assert(got == expected)
  }

  test("star contraction equals label flooding on adversarial graphs") {
    import spark.implicits._
    // The case star contraction exists for: a long CHAIN (diameter =
    // n−1, the flooding worst case), plus a star, a triangle, and
    // singletons. Both algorithms must produce identical labels —
    // component minimum for every member.
    val chain = (1L until 40L).map(i => (i, i + 1))
    val star = Seq((100L, 150L), (100L, 151L), (100L, 152L))
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val pairs = (chain ++ star ++ tri).toDF("doc_a", "doc_b")
    val ids = ((1L to 40L) ++ Seq(100L, 150L, 151L, 152L) ++
      (200L to 202L) ++ Seq(900L, 901L)).toDF("doc_id")

    val flood = graft.llm.Dedup.canonicalFixpoint(ids, pairs, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val starred = Graph.starContractComponents(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starred == flood)
    // and both equal the closed-form answer
    (1L to 40L).foreach(v => assert(starred(v) == 1L))
    Seq(100L, 150L, 151L, 152L).foreach(v => assert(starred(v) == 100L))
    (200L to 202L).foreach(v => assert(starred(v) == 200L))
    assert(starred(900L) == 900L && starred(901L) == 901L)
  }

  test("q_link_pred equals the Scala-side CN/RA over the edge view") {
    val edges = Graph.topEdges(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val cand = (for {
      (z, nbrs) <- adj.toSeq; a <- nbrs; b <- nbrs if a < b
    } yield ((a, b), z)).groupBy(_._1)
      .filterNot { case (pair, _) => edges.contains(pair) }
      .map { case ((a, b), ws) =>
        (a, b, ws.size.toLong, ws.map(w => 1000000L / deg(w._2)).sum)
      }.toSeq
    val expected = cand
      .sortBy { case (a, b, cn, ra) => (-ra, -cn, a, b) }.take(20)
      .zipWithIndex
      .map { case ((a, b, cn, ra), i) => (a, b, cn, ra, i + 1) }.toSet
    val got = SparkEntry.queries("q_link_pred")(spark, sf()).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("cn"), r.getAs[Long]("ra_ppm"),
        r.getAs[Int]("rnk"))).toSet
    assert(got == expected)
    // no predicted pair may already be an edge
    assert(got.forall { case (a, b, _, _, _) => !edges.contains((a, b)) })
  }

  test("q_local_cc equals the brute-force clustering recompute") {
    val edges = Graph.topEdges(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val expected = adj.collect {
      case (v, nbrs) if nbrs.size >= 2 =>
        val ns = nbrs.toSeq.sorted
        var tri = 0L
        for (i <- ns.indices; j <- i + 1 until ns.length)
          if (adj(ns(i)).contains(ns(j))) tri += 1
        val d = nbrs.size.toLong
        (v, d, tri, 2L * tri * 1000000L / (d * (d - 1)))
    }.toSet
    val got = SparkEntry.queries("q_local_cc")(spark, sf()).collect()
      .map(r => (r.getAs[Long]("supplier"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("cc_ppm"))).toSet
    assert(got == expected)
  }

  test("q_hits scores are a fixpoint-consistent integer sequence") {
    // Independent Scala recompute of the exact 2-round integer HITS.
    val edges = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val byCust = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def l1(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = m.values.sum
      m.view.mapValues(s => s * BigInt(1000000000000L) / tot).toMap
    }
    var hub: Map[Long, BigInt] =
      byCust.keys.map(_ -> BigInt(1000000L)).toMap
    var auth: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to 2) {
      auth = l1(bySupp.view.mapValues(_.map(hub).sum).toMap)
      hub = l1(byCust.view.mapValues(_.map(auth).sum).toMap)
    }
    def top15(m: Map[Long, BigInt]): Seq[(Long, Long)] =
      m.toSeq.map { case (v, s) => (v, s.toLong) }
        .sortBy { case (v, s) => (-s, v) }.take(15)
    val expected =
      top15(auth).zipWithIndex.map { case ((v, s), i) =>
        ("authority", v, s, i + 1) } ++
      top15(hub).zipWithIndex.map { case ((v, s), i) =>
        ("hub", v, s, i + 1) }
    val got = SparkEntry.queries("q_hits")(spark, sf()).collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("node"),
        r.getAs[Long]("score_scaled"), r.getAs[Int]("rnk"))).toSeq
    assert(got.toSet == expected.toSet)
  }
}
