package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties for the flagship `sum` (driven by
  * deterministic seeds — no scalatest bridge in the dependency set):
  * semantics match a sequential null-as-zero wrapping accumulation
  * (the reference's C++ loop) and are invariant to partitioning (the
  * reference's chunk-invariance, SURVEY §5).
  */
class BearlyPropSpec extends SparkSpec {
  import spark.implicits._

  private val colGen: Gen[List[Option[Long]]] =
    Gen.listOfN(40, Gen.frequency(
      3 -> Gen.choose(Long.MinValue, Long.MaxValue).map(Some(_)),
      1 -> Gen.const(Option.empty[Long])))

  test("sum == sequential null-as-zero wrapping fold, any partitioning") {
    val params = Gen.Parameters.default
    (1 to 25).foreach { i =>
      val xs = colGen.pureApply(params, Seed(i.toLong))
      val parts = 1 + (i % 7)
      val expected = xs.foldLeft(0L)((acc, x) => acc + x.getOrElse(0L))
      val df = xs.toDF("v").repartition(parts)
      assert(Bearly.sum(df).collect().toSeq == Seq(Row(expected)),
        s"seed $i parts $parts")
    }
  }

  test("sum over two columns: each column independent, nulls dropped") {
    val params = Gen.Parameters.default
    (1 to 10).foreach { i =>
      val a = colGen.pureApply(params, Seed(100L + i))
      val b = colGen.pureApply(params, Seed(200L + i))
      val rows = a.zip(b)
      val ea = a.foldLeft(0L)((acc, x) => acc + x.getOrElse(0L))
      val eb = b.foldLeft(0L)((acc, x) => acc + x.getOrElse(0L))
      val df = rows.toDF("a", "b").repartition(3)
      assert(Bearly.sum(df).collect().toSeq == Seq(Row(ea, eb)), s"seed $i")
    }
  }
}
