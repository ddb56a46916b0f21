package graft.functions

import org.apache.spark.sql.graft.{DotProductI8, QuantizeI8}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the int8 quantization kernel, evaluated
  * through the expression's own eval path: the floor rule, the
  * reconstruction error bound (|qᵢ·scale − xᵢ| ≤ scale/2 — the bound
  * that makes int8 search a controlled approximation), and the exact
  * integer dot.
  */
class QuantizePropertySpec extends AnyFunSuite {

  private val vecGen: Gen[Array[Double]] = for {
    n <- Gen.choose(1, 64)
    xs <- Gen.listOfN(n, Gen.choose(-1000.0, 1000.0))
  } yield xs.toArray

  private def quantize(xs: Array[Double]): Array[Byte] = {
    val e = QuantizeI8(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toByteArray()
  }

  private def run(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("codes follow the floor rule exactly") {
    run(Prop.forAll(vecGen) { xs =>
      val mx = xs.map(math.abs).foldLeft(0.0)(math.max)
      val q = quantize(xs)
      if (mx == 0.0) q.forall(_ == 0)
      else {
        val scale = mx / 127.0
        q.zip(xs).forall { case (b, x) =>
          b == math.min(127.0,
            math.max(-127.0, math.floor(x / scale + 0.5))).toByte
        }
      }
    })
  }

  test("reconstruction error is bounded by scale/2 per component") {
    run(Prop.forAll(vecGen) { xs =>
      val mx = xs.map(math.abs).foldLeft(0.0)(math.max)
      val q = quantize(xs)
      mx == 0.0 || {
        val scale = mx / 127.0
        q.zip(xs).forall { case (b, x) =>
          math.abs(b * scale - x) <= scale / 2 + 1e-9
        }
      }
    })
  }

  test("integer dot equals the BigInt reference (never overflows)") {
    run(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val qa = quantize(a); val qb = quantize(b)
      val n = math.min(qa.length, qb.length)
      val expected = (0 until n)
        .map(i => BigInt(qa(i).toInt) * qb(i).toInt).sum
      val lit = (arr: Array[Byte]) =>
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ByteType))
      val got = DotProductI8(lit(qa), lit(qb)).eval(null)
        .asInstanceOf[Long]
      BigInt(got) == expected
    })
  }
}
