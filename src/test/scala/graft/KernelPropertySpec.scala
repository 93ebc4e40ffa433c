package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BinaryKernels

/** Property-based exactness nets for the bit-twiddling kernels — the one
  * code class where a single off-by-one (sign extension, masking, tail
  * handling) produces plausible-but-wrong integers that a handful of
  * hand fixtures can miss. References are independent formulations
  * (BigInteger.bitCount / elementwise comparison), driven by generators
  * over the full byte range including negative bytes. Raw scalacheck
  * (no scalatest bridge on the offline classpath): each property runs
  * 200 seeded cases through Test.check. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val byteArrays: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray))

  test("popcount equals BigInteger.bitCount on the unsigned value") {
    check(Prop.forAll(byteArrays) { a =>
      // prepend a zero byte so BigInteger reads the bytes as unsigned
      val ref =
        if (a.isEmpty) 0
        else new java.math.BigInteger(Array[Byte](0) ++ a).bitCount()
      BinaryKernels.popcount(a) == ref
    })
  }

  test("hamming equals the elementwise XOR popcount and its axioms hold") {
    check(Prop.forAll(byteArrays, byteArrays) { (a, b0) =>
      // force equal lengths (the kernel refuses mismatches by contract)
      val b = java.util.Arrays.copyOf(b0, a.length)
      val ref = a.zip(b).map { case (x, y) =>
        java.lang.Integer.bitCount((x ^ y) & 0xff)
      }.sum
      val h = BinaryKernels.hamming(a, b)
      val c = a.map(x => (~x).toByte)
      h == ref &&
        BinaryKernels.hamming(a, a) == 0 &&            // identity
        BinaryKernels.hamming(b, a) == h &&            // symmetry
        h >= 0 && h <= 8 * a.length &&                 // bounds
        BinaryKernels.hamming(a, c) <=                 // triangle inequality
          h + BinaryKernels.hamming(b, c)
    })
  }

  test("hamming refuses length mismatches for any sizes") {
    check(Prop.forAll(Gen.choose(0, 32), Gen.choose(0, 32)) { (n, m) =>
      n == m || (try {
        BinaryKernels.hamming(new Array[Byte](n), new Array[Byte](m))
        false
      } catch {
        case e: IllegalArgumentException => e.getMessage.contains("bin_hamming")
      })
    })
  }

  test("deflate length is deterministic and empty maps to zero") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Gen.listOf(Gen.alphaNumStr).map(_.mkString(" "))
    check(Prop.forAll(texts) { t =>
      val s = UTF8String.fromString(t)
      val d1 = graft.functions.DeflateKernel.deflatedLen(s)
      val d2 = graft.functions.DeflateKernel.deflatedLen(s)
      d1 == d2 && (if (t.isEmpty) d1 == 0 else d1 > 0)
    })
  }

  test("pack_bytes round-trips every 0..255 code and refuses out-of-range") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val codes = Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.toArray))
    check(Prop.forAll(codes) { cs =>
      val packed = graft.functions.PqCodec.pack(
        new GenericArrayData(cs.map(Int.box)))
      packed.length == cs.length &&
        cs.indices.forall(i => (packed(i) & 0xff) == cs(i))
    })
    check(Prop.forAll(Gen.oneOf(Gen.choose(-1000, -1), Gen.choose(256, 1000))) { bad =>
      try {
        graft.functions.PqCodec.pack(
          new GenericArrayData(Array(Int.box(bad))))
        false
      } catch {
        case e: IllegalArgumentException => e.getMessage.contains("0..255")
      }
    })
  }

  test("shard scatter stays in range across the exact-id domain") {
    check(Prop.forAll(Gen.choose(0L, graft.ops.Sharding.MaxId),
      Gen.choose(1, 4096)) { (id, n) =>
      val s = ((id * graft.ops.Sharding.Mixer) % graft.ops.Sharding.Modulus) % n
      s >= 0 && s < n && id <= Long.MaxValue / graft.ops.Sharding.Mixer
    })
  }
}
