package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the embedding-compression (q_rproj / q_pq) and
  * corpus-composition (q_mixture / q_boilerplate) operators, checking
  * each against an independent Scala-side reference computation.
  */
class EmbeddingMixSpec extends SparkSpec {

  private def qv(e: Seq[Float]): Array[Long] =
    e.map(x => math.floor(x.toDouble * 1000000).toLong).toArray

  test("rproj: each output matches the Scala-side sign-fold on a sample row") {
    val df = graft.SparkEntry.queries("q_rproj")(spark, sf())
    val emb = graft.Tables.embeddings(spark, sf())
      .filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0)
    val q = qv(emb)
    val expected = (0 until 8).map { j =>
      (0 until 64).map { i =>
        val h = ((i + 1).toLong * (j + 1) * 2654435761L) % 1000003L
        (if (h % 2 == 0) 1L else -1L) * q(i)
      }.sum
    }
    val row = df.filter(col("vec_id") === 0).collect()(0)
    (0 until 8).foreach(j => assert(row.getLong(j + 1) === expected(j)))
    assert(df.count() === graft.Tables.embeddings(spark, sf()).count())
  }

  test("pq: codes in range, error equals Scala-side min-distance sum") {
    val df = graft.SparkEntry.queries("q_pq")(spark, sf())
    val emb = graft.Tables.embeddings(spark, sf())
      .filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0)
    val q = qv(emb)
    def cent(c: Int, i: Int): Long =
      ((c + 1).toLong * (i + 17) * 2654435761L) % 1000003L - 500001L
    val dists = (0 until 8).map { b =>
      (0 until 4).map { c =>
        (0 until 8).map { k =>
          val d = q(b * 8 + k) - cent(c, b * 8 + k); d * d
        }.sum
      }
    }
    val expCodes = dists.map(ds => ds.indexOf(ds.min)).mkString("|")
    val expErr = dists.map(_.min).sum
    val row = df.filter(col("vec_id") === 0).collect()(0)
    assert(row.getString(1) === expCodes)
    assert(row.getLong(2) === expErr)
    val codes = df.select(explode(split(col("codes"), "\\|")).as("c"))
      .select(col("c").cast("int")).as[Int](spark.implicits.newIntEncoder)
      .collect()
    assert(codes.forall(c => c >= 0 && c <= 3))
  }

  test("pq_search: ADC top-10 equals the full Scala-side recompute") {
    def cent(c: Int, i: Int): Long =
      ((c + 1).toLong * (i + 17) * 2654435761L) % 1000003L - 500001L
    def dmat(q: Array[Long]): IndexedSeq[IndexedSeq[Long]] =
      (0 until 8).map { b =>
        (0 until 4).map { c =>
          (0 until 8).map { k =>
            val d = q(b * 8 + k) - cent(c, b * 8 + k); d * d
          }.sum
        }
      }
    val all = graft.Tables.embeddings(spark, sf())
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> qv(r.getSeq[Float](1))).toMap
    val pdist = dmat(all(0L))
    val expected = all.toSeq.filter(_._1 != 0L).map { case (id, q) =>
      val code = dmat(q).map(ds => ds.indexOf(ds.min))
      id -> (0 until 8).map(b => pdist(b)(code(b))).sum
    }.sortBy { case (id, adc) => (adc, id) }.take(10)
    val got = graft.SparkEntry.queries("q_pq_search")(spark, sf())
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected.map { case (id, adc) => (id, adc) })
  }

  test("ivf_pq: bucket-pruned ADC top-5 equals the Scala-side recompute") {
    def cent(c: Int, i: Int): Long =
      ((c + 1).toLong * (i + 17) * 2654435761L) % 1000003L - 500001L
    def dmat(q: Array[Long]): IndexedSeq[IndexedSeq[Long]] =
      (0 until 8).map { b =>
        (0 until 4).map { c =>
          (0 until 8).map { k =>
            val d = q(b * 8 + k) - cent(c, b * 8 + k); d * d
          }.sum
        }
      }
    val raw = graft.Tables.embeddings(spark, sf())
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    // identical fold order to Similarity.dot → identical doubles
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cents = (0L until 8L).map(id => id -> raw(id)).toMap
    val assign = raw.map { case (id, v) =>
      id -> (0L until 8L).map { c =>
        (-dot(v, cents(c)) / (nrm(v) * nrm(cents(c))), c)
      }.min._2
    }
    val codes = raw.map { case (id, v) =>
      id -> dmat(v.map(x => math.floor(x * 1000000).toLong))
        .map(ds => ds.indexOf(ds.min))
    }
    val expected = raw.keys.filter(_ % 97 == 0).toSeq.sorted.flatMap { q =>
      val pdist = dmat(raw(q).map(x => math.floor(x * 1000000).toLong))
      raw.keys.filter(n => n != q && assign(n) == assign(q)).toSeq
        .map { n => (q, n, (0 until 8).map(b => pdist(b)(codes(n)(b))).sum) }
        .sortBy { case (_, n, adc) => (adc, n) }.take(5)
        .zipWithIndex.map { case ((qq, n, adc), i) => (qq, n, adc, i + 1) }
    }.toSet
    val got = graft.SparkEntry.queries("q_ivf_pq")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == expected)
  }

  test("hamming_ann: rerank equals the Scala recompute over sign codes") {
    val embAll = graft.Tables.embeddings(spark, sf())
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def code(v: Array[Float]): (Long, Long) = {
      def word(off: Int) = (0 until 32).foldLeft(0L) { (acc, i) =>
        acc + (if (v(off + i) > 0) 1L << i else 0L)
      }
      (word(0), word(32))
    }
    val codes = embAll.map { case (id, v) => id -> code(v) }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((acc, i) =>
          acc + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expected = (0L until 5L).flatMap { q =>
      val (q0, q1) = codes(q)
      val cand = embAll.filter(_._1 != q).map { case (id, _) =>
        val (c0, c1) = codes(id)
        (id, java.lang.Long.bitCount(q0 ^ c0)
          + java.lang.Long.bitCount(q1 ^ c1))
      }.sortBy { case (id, h) => (h, id) }.take(20)
      val qv = embAll.find(_._1 == q).get._2
      cand.map { case (id, h) =>
        (id, h, cos(qv, embAll.find(_._1 == id).get._2))
      }.sortBy { case (id, _, c) => (-c, id) }.take(5)
        .zipWithIndex
        .map { case ((id, h, c), i) => (q, id, h, c, i + 1) }
    }.toSet
    val got = graft.SparkEntry.queries("q_hamming_ann")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4)))
      .toSet
    assert(got == expected)
  }

  test("mixture: per-source sample count = min(quota, source size)") {
    val docs = graft.Tables.documents(spark, sf())
    val out = graft.SparkEntry.queries("q_mixture")(spark, sf())
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wt = sizes.keys.map(s => s -> ((s.drop(3).toInt % 4) + 1).toLong).toMap
    val sw = wt.values.sum
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.keys.foreach { s =>
      val quota = 200L * wt(s) / sw
      assert(got.getOrElse(s, 0L) === math.min(quota, sizes(s)),
        s"source $s: quota $quota, present ${sizes(s)}")
    }
  }

  test("boilerplate: gram accounting consistent, verdict matches fraction") {
    val out = graft.SparkEntry.queries("q_boilerplate")(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, nb) = (r.getLong(1), r.getLong(2))
      assert(nb >= 0 && nb <= n)
      val frac = r.getDouble(3)
      assert(frac === nb.toDouble / n)
      assert(r.getBoolean(4) === (frac > 0.5))
    }
  }

  test("source_sim: TV distance bounded, all pairs present, Scala parity") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q_source_sim")(spark, sf()).collect()
    val sources = graft.Tables.documents(spark, sf())
      .select(col("source")).distinct().collect().map(_.getString(0))
    val nPairs = sources.length * (sources.length - 1) / 2
    assert(out.length == nPairs)
    out.foreach { r =>
      val tv = r.getAs[Long]("tv_ppb")
      assert(tv >= 0L && tv <= 1000000000L)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
    // full Scala recompute of the floored-share TV for every pair
    val counts = graft.Tables.documents(spark, sf())
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
      .groupBy(identity).map { case ((s, t), xs) => (s, t, xs.size.toLong) }
      .groupBy(_._1)
    val shares = counts.map { case (s, xs) =>
      val n = xs.map(_._3).sum
      s -> xs.map { case (_, t, c) => t -> BigInt(c) * 1000000000 / n }.toMap
    }
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield {
      val (sa, sb) = (shares(a), shares(b))
      val gap = (sa.keySet ++ sb.keySet).toSeq.map { t =>
        (sa.getOrElse(t, BigInt(0)) - sb.getOrElse(t, BigInt(0))).abs
      }.sum
      (a, b, (gap / 2).toLong)
    }).toSet
    val got = out.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b"), r.getAs[Long]("tv_ppb"))).toSet
    assert(got == expected)
  }
}
