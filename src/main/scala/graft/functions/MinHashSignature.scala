package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single per-row expression: for hash i,
  * min over the text's k-word shingles of
  * (a_i * xxhash64(shingle) + b_i) mod (2^61-1); empty/short docs get
  * the sentinel p everywhere. Seeds are splitmix64-derived compile-
  * time constants (identical to [[graft.operators.Dedup]]'s
  * formulation), and the shingle hash is Spark's own xxhash64
  * (seed 42) so values match the SQL-built variant exactly.
  *
  * Why an Expression and not explode+groupBy: signatures become a
  * map-only projection — zero shuffle at any scale — and the inner
  * loop is plain JVM code instead of per-element interpreted
  * higher-order functions. Codegen emits one [[compute]] call via a
  * reference object (previously `CodegenFallback`), so the row never
  * leaves whole-stage codegen.
  */
case class MinHashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val P = 2305843009213693951L // 2^61 - 1

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => (splitmix64(2L * i) & Long.MaxValue) % (P - 1) + 1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => (splitmix64(2L * i + 1) & Long.MaxValue) % P)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val text = input.toString
    val words = text.split(" ", -1)
    val sig = Array.fill(numHashes)(P)
    if (words.length >= shingleK) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + shingleK <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < shingleK) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val h = XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
        var k = 0
        while (k < numHashes) {
          // pmod semantics: Math.floorMod keeps the value in [0, P)
          val v = java.lang.Math.floorMod(h * as(k) + bs(k), P)
          if (v < sig(k)) sig(k) = v
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
