package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.scalatest.funsuite.AnyFunSuite

/** Generative guards for the sketch primitives' JVM-side contracts —
  * the properties the DataFrame specs exercise only at fixed corpora.
  */
class SketchPropertySpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def check(prop: Prop, n: Int = 100): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  test("itemOf: byte-array items hash CONTENT — equal bytes collide, distinct bytes stay distinct") {
    // guards the fix for the identity-toString bug: a frequency/theta
    // sketch fed Array[Byte] must see the bytes, not the object
    val bytesGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    check(Prop.forAll(bytesGen, bytesGen) { (a, b) =>
      val (ia, ib) = (graft.functions.FreqExpressions.itemOf(a),
        graft.functions.FreqExpressions.itemOf(b))
      // bijective binding: string equality IFF byte equality — and a
      // fresh copy of the same bytes maps to the same item
      (ia == ib) == java.util.Arrays.equals(a, b) &&
        graft.functions.FreqExpressions.itemOf(a.clone()) == ia
    })
  }

  test("KLL serialize/heapify round-trip preserves the sketch verbatim") {
    val valuesGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e9, 1e9))
    check(Prop.forAll(valuesGen) { vs =>
      val sk = KllDoublesSketch.newHeapInstance(200)
      vs.foreach(sk.update)
      val back = KllDoublesSketch.heapify(Memory.wrap(sk.toByteArray))
      java.util.Arrays.equals(back.toByteArray, sk.toByteArray) &&
        back.getN == vs.length.toLong
    }, 50)
  }

  test("bloom: no false negatives for arbitrary unicode strings; merge order irrelevant") {
    import org.apache.spark.util.sketch.BloomFilter
    val strsGen = Gen.nonEmptyListOf(
      Gen.listOf(Gen.chooseNum(Char.MinValue, Char.MaxValue)
        .suchThat(c => !Character.isSurrogate(c))).map(_.mkString))
    check(Prop.forAll(strsGen) { ss =>
      // build in two halves merged, probe with the SAME UTF-8-bytes
      // contract BloomFilterAgg/BloomMightContain use
      def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val (h1, h2) = ss.splitAt(ss.length / 2)
      def half(h: List[String]) = {
        val bf = BloomFilter.create(math.max(ss.length.toLong, 1L), 0.01)
        h.foreach(s => bf.putBinary(bytes(s)))
        bf
      }
      val merged = half(h1).mergeInPlace(half(h2))
      val other = half(h2.reverse).mergeInPlace(half(h1.reverse))
      ss.forall(s => merged.mightContainBinary(bytes(s))) &&
        {
          val bos = new java.io.ByteArrayOutputStream()
          val bos2 = new java.io.ByteArrayOutputStream()
          merged.writeTo(bos); other.writeTo(bos2)
          java.util.Arrays.equals(bos.toByteArray, bos2.toByteArray)
        }
    }, 50)
  }

  test("theta: estimates are exact and set algebra matches exactly under capacity") {
    import org.apache.datasketches.theta.{SetOperation, Sketch}
    val setGen = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.toSet)
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      def sketchOf(s: Set[String]) = {
        val u = SetOperation.builder().setLogNominalEntries(12).buildUnion()
        s.foreach(u.update)
        Sketch.wrap(Memory.wrap(u.getResult.toByteArray))
      }
      val (sa, sb) = (sketchOf(a), sketchOf(b))
      val inter = SetOperation.builder().buildIntersection()
        .intersect(sa, sb).getEstimate
      sa.getEstimate == a.size.toDouble &&
        inter == a.intersect(b).size.toDouble
    }, 50)
  }
}
