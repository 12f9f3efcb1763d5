package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Multi-table random-hyperplane LSH signatures for an
  * `array<double>` embedding: output element `t` (of `nTables`) packs
  * `bitsPerTable` sign bits — bit b = (dot(v, plane_{t,b}) >= 0).
  * Vectors agreeing on ALL bits of ANY table are near-dup candidates
  * (multi-table OR trades a little precision for the recall a single
  * wide table loses).
  *
  * Hyperplane components are derived lazily from a splitmix64 counter
  * keyed by (plane index, dimension index) — compile-time
  * deterministic, nothing materialized, and crucially
  * DIMENSION-GENERIC: the loop runs over the actual input array
  * length, so any embedding width works (the previous inline-SQL
  * formulation hard-coded dim = 64 and silently produced nulls on
  * anything else).
  *
  * Codegen: `doGenCode` emits a single call to [[compute]] through a
  * reference object, keeping the projection inside whole-stage
  * codegen without a fallback eval path.
  */
case class HyperplaneSignature(child: Expression, nTables: Int, bitsPerTable: Int)
    extends UnaryExpression {

  require(nTables >= 1 && bitsPerTable >= 1 && bitsPerTable <= 63,
    s"invalid LSH shape: $nTables tables x $bitsPerTable bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplanes"

  import HyperplaneSignature.comp

  def compute(a: ArrayData): ArrayData = {
    val dim = a.numElements()
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var b = 0
      while (b < bitsPerTable) {
        val plane = t * bitsPerTable + b
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += a.getDouble(j) * comp(plane, j); j += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperSig", this, classOf[HyperplaneSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Component j of hyperplane `plane`, in [-1, 1) — splitmix64 of
    * the (plane, j) pair; identical on every executor with zero
    * state. Public so the DuckDB oracle can embed the same matrix as
    * SQL literals (`Double.toString` is shortest-round-trip, so the
    * literal parses back to the identical bits).
    */
  def comp(plane: Int, j: Int): Double = {
    var z = (plane.toLong << 32 | j.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }
}
