package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The per-query scaling-ratio gate as a standing test (round-9
  * verdict #2): `tools/scale_gate.py` only fired when someone
  * remembered to run it, so a plan change that reintroduces a
  * super-linear query could pass `sbt test`. This spec is a Scala
  * port of the same rules, run on every test invocation against the
  * two NEWEST checked-in `bench/scale_r*` profile sets — checking in
  * a new round's profiles automatically subjects them to the gate.
  *
  * Gate rules (identical to the Python tool): for each query the
  * warm sf0.1→sf1 ratio (sub-100 ms sf0.1 times floored to 100 ms)
  * fails when it exceeds BOTH `reference_ratio × 1.5` and the 3×
  * absolute floor, or the 15× hard cap regardless of reference
  * (15× on 10× data = super-linear).
  */
class ScaleGateSpec extends AnyFunSuite {

  private val RelTol = 1.5
  private val AbsFloor = 3.0
  private val HardCap = 15.0

  /** Parse the flat `{"name":1.23,...}` maps graft.Bench writes. */
  private[plans] def parseProfile(text: String): Map[String, Double] =
    "\"([^\"]+)\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)".r
      .findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap

  private def loadProfile(dir: Path, name: String): Map[String, Double] =
    parseProfile(new String(
      Files.readAllBytes(dir.resolve(name + ".json")), "UTF-8"))

  private[plans] def warmRatios(sf01: Map[String, Double],
      sf1: Map[String, Double]): Map[String, Double] =
    sf01.flatMap { case (q, v01) =>
      sf1.get(q) match {
        case Some(v1) if v01 >= 0 && v1 >= 0 =>
          Some(q -> v1 / math.max(v01, 0.1))
        case _ => None
      }
    }

  /** Port of scale_gate.py's failure rules; returns failure lines.
    * `candHi`/`refHi` are the raw HIGH-scale warm times: a query
    * whose high-scale time did not regress (cand ≤ ref × RelTol)
    * passes regardless of ratio — a ratio gate punishes the
    * denominator improving (round 11: q_band_shape's sf0.1 warm got
    * 2.2× faster and "failed" with an sf1 time that had IMPROVED);
    * a real scaling-law regression must show in the high-scale time.
    */
  private[plans] def gate(cand: Map[String, Double],
      ref: Map[String, Double],
      candHi: Map[String, Double] = Map.empty,
      refHi: Map[String, Double] = Map.empty): Seq[String] = {
    def hiOk(q: String): Boolean =
      (candHi.get(q), refHi.get(q)) match {
        case (Some(c), Some(r)) => c >= 0 && r >= 0 && c <= r * RelTol
        case _ => false
      }
    cand.toSeq.sortBy(_._1).flatMap { case (q, cr) =>
      if (cr > HardCap && !hiOk(q))
        Some(f"$q: warm ratio $cr%.1fx exceeds the hard cap ${HardCap}x")
      else if (cr <= HardCap) ref.get(q) match {
        case Some(rr) if cr > math.max(rr * RelTol, AbsFloor) &&
            !hiOk(q) =>
          Some(f"$q: warm ratio $cr%.1fx vs reference $rr%.1fx")
        case _ => None
      } else None
    }
  }

  private def profileDirs: Seq[Path] = {
    val bench = Paths.get("bench")
    if (!Files.isDirectory(bench)) return Seq.empty
    Files.list(bench).iterator().asScala
      .filter(p => p.getFileName.toString.matches("scale_r\\d+[a-z]?") &&
        Seq("sf01_warm", "sf1_warm")
          .forall(n => Files.exists(p.resolve(n + ".json"))))
      .toSeq
      // Numeric round order, letter suffix after the bare number
      // (r8 < r8b < r9); the newest is the candidate.
      .sortBy { p =>
        val n = p.getFileName.toString.stripPrefix("scale_r")
        (n.takeWhile(_.isDigit).toInt, n.dropWhile(_.isDigit))
      }
  }

  private case class RatioPair(cand: Map[String, Double],
      ref: Map[String, Double], candHi: Map[String, Double],
      refHi: Map[String, Double], label: String)

  private def latestRatioPair: Option[RatioPair] = {
    val dirs = profileDirs
    if (dirs.size < 2) None
    else {
      val Seq(ref, cand) = dirs.takeRight(2)
      Some(RatioPair(
        warmRatios(loadProfile(cand, "sf01_warm"),
          loadProfile(cand, "sf1_warm")),
        warmRatios(loadProfile(ref, "sf01_warm"),
          loadProfile(ref, "sf1_warm")),
        loadProfile(cand, "sf1_warm"),
        loadProfile(ref, "sf1_warm"),
        s"${cand.getFileName} vs ${ref.getFileName}"))
    }
  }

  /** The SECOND decade (sf1→sf10) pair, when the newest two profile
    * sets both carry sf10 profiles (round-10 verdict #2: the decade
    * where the real scale bugs lived had no machine-checked
    * reference). Same rules as decade 1.
    */
  private def latestRatioPairSf10: Option[RatioPair] = {
    val dirs = profileDirs
      .filter(p => Files.exists(p.resolve("sf10_warm.json")))
    if (dirs.size < 2) None
    else {
      val Seq(ref, cand) = dirs.takeRight(2)
      Some(RatioPair(
        warmRatios(loadProfile(cand, "sf1_warm"),
          loadProfile(cand, "sf10_warm")),
        warmRatios(loadProfile(ref, "sf1_warm"),
          loadProfile(ref, "sf10_warm")),
        loadProfile(cand, "sf10_warm"),
        loadProfile(ref, "sf10_warm"),
        s"${cand.getFileName} vs ${ref.getFileName} (sf1->sf10)"))
    }
  }

  test("newest checked-in scale profiles pass the gate vs the previous set") {
    latestRatioPair match {
      case None =>
        fail("fewer than two bench/scale_r* profile sets checked in — " +
          "the scale gate has nothing to compare (each round must " +
          "check in its profiles)")
      case Some(RatioPair(cand, ref, candHi, refHi, label)) =>
        val failures = gate(cand, ref, candHi, refHi)
        assert(failures.isEmpty,
          s"scale gate FAIL ($label):\n" + failures.mkString("\n"))
        info(s"scale gate OK ($label): ${cand.size} queries within " +
          s"tolerance (rel ${RelTol}x, floor ${AbsFloor}x, cap ${HardCap}x)")
        // The comparison must not silently dwindle: both sets cover
        // (nearly) the full suite.
        assert(cand.size >= ref.size - 5,
          s"candidate ratio set shrank: ${cand.size} vs ${ref.size}")
    }
  }

  test("second decade (sf1->sf10): newest sf10 profiles pass the gate") {
    latestRatioPairSf10 match {
      case None =>
        cancel("fewer than two profile sets with sf10 profiles — the " +
          "second-decade gate activates once two rounds have checked " +
          "in sf10 benches")
      case Some(RatioPair(cand, ref, candHi, refHi, label)) =>
        val failures = gate(cand, ref, candHi, refHi)
        assert(failures.isEmpty,
          s"scale gate FAIL ($label):\n" + failures.mkString("\n"))
        info(s"scale gate OK ($label): ${cand.size} queries within " +
          s"tolerance (rel ${RelTol}x, floor ${AbsFloor}x, cap ${HardCap}x)")
        assert(cand.size >= ref.size - 5,
          s"candidate ratio set shrank: ${cand.size} vs ${ref.size}")
    }
  }

  test("a synthetic super-linear regression fails the gate") {
    // Take the real newest profiles and inflate one query's sf1 warm
    // time 100x — the gate must name it. This pins that the gate CAN
    // fail (a gate that never fires is not a gate).
    latestRatioPair match {
      case None => fail("no profiles — see the other test")
      case Some(RatioPair(cand, ref, candHi, refHi, _)) =>
        val victim = cand.keys.min
        // Inflate BOTH the ratio and the high-scale time — a real
        // regression moves both, and the hi-scale escape must not
        // mask the injection.
        val broken = cand.updated(victim, cand(victim) * 100.0)
        val brokenHi = candHi.updated(victim,
          candHi.getOrElse(victim, 1.0) * 100.0)
        val failures = gate(broken, ref, brokenHi, refHi)
        assert(failures.exists(_.startsWith(victim + ":")),
          s"inflating $victim 100x did not trip the gate: $failures")
        // And the uninflated map still passes — the synthetic failure
        // is attributable to the injection alone.
        assert(gate(cand, ref, candHi, refHi).isEmpty)
    }
  }

  test("profile parser reads Bench's JSON map format") {
    val m = parseProfile("""{"q_a":1.25,"q_b":-1.0,"q_c":3e-2}""")
    assert(m == Map("q_a" -> 1.25, "q_b" -> -1.0, "q_c" -> 0.03))
  }
}
