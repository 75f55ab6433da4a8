package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests over the pure kernel surfaces (SURVEY §5.2).
  * These run the interpreted (`nullSafeEval`/static) paths — codegen
  * parity with those paths is covered by the per-kernel specs, so
  * properties proven here transfer to the generated code.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val FpB = TextFunctions.FpBase
  private val FpP = TextFunctions.FpPrime
  private val ShP = TextFunctions.ShPrime

  // -- IntersectCountSorted: merge count == set-intersection cardinality --

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 500L)).map(_.distinct.sorted.toArray)

  test("IntersectCountSorted equals set-intersection cardinality (forAll)") {
    check("intersect", Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val e = IntersectCountSorted(Literal(1L), Literal(1L))
      val got = e.nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
        .asInstanceOf[Long]
      got == (a.toSet & b.toSet).size.toLong
    })
  }

  test("IntersectCountSorted is symmetric and bounded (forAll)") {
    check("intersect-sym", Prop.forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val e = IntersectCountSorted(Literal(1L), Literal(1L))
      def cnt(x: Array[Long], y: Array[Long]) =
        e.nullSafeEval(new GenericArrayData(x), new GenericArrayData(y))
          .asInstanceOf[Long]
      val ab = cnt(a, b)
      ab == cnt(b, a) && ab <= math.min(a.length, b.length) &&
        cnt(a, a) == a.length
    })
  }

  // -- PolyHash: algebraic and range properties --

  private val asciiWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val asciiText: Gen[String] =
    Gen.listOf(asciiWord).map(_.mkString(" "))

  test("charFold stays in range and extends per-character (forAll)") {
    check("charfold", Prop.forAll(asciiText, Gen.alphaNumChar) { (s, c) =>
      val h = PolyHash.charFold(UTF8String.fromString(s), FpB, FpP)
      val h2 = PolyHash.charFold(UTF8String.fromString(s + c), FpB, FpP)
      h >= 0 && h < FpP && h2 == (h * FpB + c.toLong) % FpP
    })
  }

  test("tokenHashes: one hash per split token, all in range (forAll)") {
    check("tokenhashes", Prop.forAll(asciiText) { s =>
      val th = PolyHash.tokenHashes(UTF8String.fromString(s), FpB, ShP)
      val n = th.numElements()
      val hs = (0 until n).map(th.getLong)
      n == s.split(" ", -1).length && hs.forall(h => h >= 0 && h < ShP)
    })
  }

  test("shingleSet: sorted, distinct, correctly bounded size (forAll)") {
    check("shingleset", Prop.forAll(asciiText, Gen.choose(1, 5)) { (s, n) =>
      val sh = PolyHash.shingleSet(UTF8String.fromString(s), n, FpB, ShP)
      val xs = (0 until sh.numElements()).map(sh.getLong)
      val nTok = s.split(" ", -1).length
      val sortedDistinctOk = xs == xs.distinct.sorted
      val sizeOk =
        if (nTok < n) xs.isEmpty
        else xs.nonEmpty && xs.length <= nTok - n + 1
      sortedDistinctOk && sizeOk
    })
  }

  // -- Sampling thresholds --

  test("bucketThreshold: monotone in fraction, exact at the ends (forAll)") {
    val frac = Gen.chooseNum(0.0, 1.0)
    check("threshold", Prop.forAll(frac, frac) { (f1, f2) =>
      val lo = math.min(f1, f2); val hi = math.max(f1, f2)
      import graft.operators.Sampling.{bucketThreshold, Buckets}
      bucketThreshold(lo) <= bucketThreshold(hi) &&
        bucketThreshold(0.0) == 0L && bucketThreshold(1.0) == Buckets.toLong
    })
  }

  // -- SimHash reference mixer --

  test("SimHash mixer is deterministic and in range (forAll)") {
    check("mixer", Prop.forAll(Gen.chooseNum(0L, ShP - 1)) { h0 =>
      def mix(h: Long): Long =
        (0 until SimHashBits.MixRounds).foldLeft(h)((x, _) =>
          (x * SimHashBits.MixMul + SimHashBits.MixAdd) % ShP)
      val m = mix(h0)
      m == mix(h0) && m >= 0 && m < ShP
    })
  }

  // -- TopKByScore buffer: the O(k·partitions) shuffle promise --

  // scores from a SMALL set force heavy ties (the tie-break path);
  // ids may repeat too (the aggregate does not dedup)
  private val scoredPairs: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.oneOf(0.0, 0.25, 0.5, 0.5, 1.0, -1.0, 2.5),
      Gen.chooseNum(0L, 50L)))

  test("TopKHeap never exceeds k through any offer/merge sequence (forAll)") {
    // the operator's network claim — shuffle rows per group = heap size —
    // holds ONLY if the bound survives arbitrary partitioning into
    // partial buffers and arbitrary merge order, not just the happy path
    check("topk-bound", Prop.forAll(
      scoredPairs, Gen.chooseNum(1, 8), Gen.chooseNum(1, 6)) { (xs, k, nChunks) =>
      val chunks = if (xs.isEmpty) List(Nil)
        else xs.grouped(math.max(1, xs.size / nChunks)).toList
      val heaps = chunks.map { c =>
        val h = new TopKHeap(k)
        c.foreach { case (s, id) =>
          h.offer(s, id)
          assert(h.size <= k, s"offer overflowed: ${h.size} > $k")
        }
        h
      }
      val merged = heaps.reduceLeft { (a, b) =>
        var i = 0
        while (i < b.size) { a.offer(b.scores(i), b.ids(i)); i += 1 }
        assert(a.size <= k, s"merge overflowed: ${a.size} > $k")
        a
      }
      merged.size <= k && merged.size == math.min(k, xs.size)
    })
  }

  test("TopKHeap merge result equals the global sorted take-k (forAll)") {
    // partition + merge must be indistinguishable from one sorted pass:
    // the algebraic-aggregate property that makes map-side partials safe
    check("topk-alg", Prop.forAll(
      scoredPairs, Gen.chooseNum(1, 8), Gen.chooseNum(1, 6)) { (xs, k, nChunks) =>
      val chunks = if (xs.isEmpty) List(Nil)
        else xs.grouped(math.max(1, xs.size / nChunks)).toList
      val merged = chunks.map { c =>
        val h = new TopKHeap(k); c.foreach { case (s, id) => h.offer(s, id) }; h
      }.reduceLeft { (a, b) =>
        var i = 0
        while (i < b.size) { a.offer(b.scores(i), b.ids(i)); i += 1 }
        a
      }
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      merged.sortedDesc.toList == want
    })
  }
}
