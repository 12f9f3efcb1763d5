package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL word n-grams (n = 1..maxN, WITH repeats) of a
  * whitespace-tokenized text as one per-row expression —
  * array<struct<n:int, gram:string>>. The higher-order-function
  * spelling (transform → slice → array_join per n, flattened)
  * evaluates INTERPRETED: every element pays Slice.nullSafeEval with
  * a Scala-collection copy plus a struct allocation through
  * non-codegen eval — jstack at sf10 showed all worker time inside
  * ArrayDataIndexedSeq.slice / GenericArrayData.<init>
  * (round-13 finding; the same pitfall [[WordShingles]] fixed for the
  * distinct-shingle case). One JVM pass here: split once, build each
  * gram with a reused StringBuilder, no per-element collection
  * machinery. Codegen emits one [[compute]] call via a reference
  * object.
  */
case class WordNgrams(child: Expression, maxN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("n", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val raw = input.toString.split(" ", -1)
    var m = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { raw(m) = raw(i); m += 1 }; i += 1 }
    var total = 0
    var n = 1
    while (n <= maxN) { if (m >= n) total += m - n + 1; n += 1 }
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder
    var k = 0
    n = 1
    while (n <= maxN) {
      var s = 0
      while (s + n <= m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(raw(s + j))
          j += 1
        }
        val row = new GenericInternalRow(2)
        row.update(0, n)
        row.update(1, UTF8String.fromString(sb.toString))
        out(k) = row
        k += 1
        s += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngrams", this, classOf[WordNgrams].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
