package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ServerlogKernel, VectorTextKernel}

/** Property tests (SURVEY §5): total functions on arbitrary input — a parse
  * engine at 10^12 rows WILL see every possible byte sequence; nothing here
  * may throw, and fast/slow paths must agree everywhere.
  */
class PropertySpec extends AnyFunSuite {

  /** manual forAll over raw ScalaCheck gens (no scalatest-plus bridge in the
    * offline cache): 300 samples per property, seeded deterministically. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until 300).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }

  private val anyString: Gen[String] = Arbitrary.arbitrary[String]

  /** strings biased toward the serverlog shape — spaces, brackets, markers. */
  private val loggy: Gen[String] = for {
    n <- Gen.choose(0, 30)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const("[x1]"), Gen.const("[]"),
      Gen.const("svc-a,"), Gen.const("Svc-B"), Gen.const("[000000001a]"),
      Gen.const("##JIDU##"), Gen.const("""##JIDU##{"k": "v"}##JIDU##"""),
      Gen.const("{\"k\": 1}"), Gen.const("2024-01-01 00:00:00.000")))
  } yield parts.mkString(" ")

  test("serverlog parse is total (never throws) and status-consistent") {
    forAll(Gen.oneOf(anyString, loggy)) { s =>
      val u = UTF8String.fromString(s)
      val row = ServerlogKernel.parse(u)      // must not throw
      val fast = ServerlogKernel.status(u)    // must not throw
      val slow = row.getUTF8String(13) // field 13 = status (12 = script_error)
      assert(fast == slow, s"status mismatch on ${s.take(80)}: $slow vs $fast")
    }
  }

  test("parse row invariants: logtime prefix, ok-iff-fields") {
    forAll(loggy) { s =>
      val row = ServerlogKernel.parse(UTF8String.fromString(s))
      val status = row.getUTF8String(13).toString
      assert(Set("ok", "short", "bad_service", "benchmark").contains(status))
      if (s.nonEmpty) {
        val logtime = row.getUTF8String(0).toString
        assert(logtime == s.take(23))
      }
      if (status != "ok") {
        // non-ok rows never expose positional fields beyond service
        assert(row.isNullAt(2) && row.isNullAt(7) && row.isNullAt(10))
      }
    }
  }

  test("simhash64 is deterministic and insensitive to token order only via content") {
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(6)))) { tokens =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val arr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
      val a = VectorTextKernel.simhash64(arr)
      val b = VectorTextKernel.simhash64(arr)
      assert(a == b)
    }
  }

  test("minhash signature: correct width, stable, elementwise in [0, 2^31)") {
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(6))), Gen.choose(1, 64)) { (sh, k) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val arr = new GenericArrayData(sh.map(UTF8String.fromString).toArray[Any])
      val sig = VectorTextKernel.minhashSig(arr, k)
      assert(sig.numElements() == k)
      (0 until k).foreach { i =>
        val v = sig.getLong(i)
        if (sh.nonEmpty) assert(v >= 0L && v < 2147483647L)
      }
    }
  }

  test("minhash signatures respect containment: identical sets → identical sigs") {
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)))) { sh =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val a = new GenericArrayData(sh.map(UTF8String.fromString).toArray[Any])
      val b = new GenericArrayData(scala.util.Random.shuffle(sh).map(UTF8String.fromString).toArray[Any])
      val sa = VectorTextKernel.minhashSig(a, 16)
      val sb = VectorTextKernel.minhashSig(b, 16)
      assert((0 until 16).forall(i => sa.getLong(i) == sb.getLong(i)),
        "minhash must be order-independent (set semantics)")
    }
  }

  test("fnv1a32 matches the published FNV-1a test vectors") {
    // standard FNV-1a 32-bit vectors (public domain reference values)
    val vectors = Seq(
      "" -> 0x811c9dc5, "a" -> 0xe40c292c, "foobar" -> 0xbf9cf968)
    vectors.foreach { case (s, expect) =>
      assert(VectorTextKernel.fnv1a32(UTF8String.fromString(s)) == expect,
        s"fnv1a32($s)")
    }
  }

  test("cosine kernel is bounded and symmetric") {
    val floats = Gen.listOfN(16, Gen.choose(-100.0f, 100.0f))
    forAll(floats, floats) { (a, b) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val aa = new GenericArrayData(a.toArray[Any])
      val bb = new GenericArrayData(b.toArray[Any])
      val c1 = VectorTextKernel.cosine(aa, bb)
      val c2 = VectorTextKernel.cosine(bb, aa)
      if (!c1.isNaN) {
        assert(c1 >= -1.0000001 && c1 <= 1.0000001)
        assert(c1 == c2)
      }
    }
  }
}
