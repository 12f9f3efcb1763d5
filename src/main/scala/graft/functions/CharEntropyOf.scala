package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-entropy as ONE per-row pass —
  * struct<n_chars:int, entropy:double> with
  * entropy = −Σ (c/n)·ln(c/n) over the document's character counts.
  *
  * The relational spelling (`explode(sequence(1, length(text)))` +
  * `substring(text, i, 1)`) pays an O(i) UTF-8 walk per extracted
  * character — `UTF8String.substring` has no index, it counts chars
  * from the start — so a doc of n chars does O(n²/2) byte steps
  * before the partial aggregate collapses anything (measured 15.7 s
  * warm at sf10, the suite's 4th-slowest key, 9.8×/decade — the
  * round-13 verdict's "quadratic char walk"). This expression walks
  * the bytes once: ASCII counts in a 128-slot array, other code
  * points in a small insertion-ordered map keyed by the char's UTF-8
  * bytes, then folds the ≤|alphabet| counts into the entropy sum.
  *
  * Equivalence argument (the DuckDB oracle keeps the relational
  * spelling): `length`/`substring` both segment by UTF-8 character
  * boundaries, so per-char counts are identical; the entropy fold
  * sums the same ≤|alphabet| doubles, and summation order (here:
  * ASCII code order then first-occurrence; engines: hash-group
  * order) only moves the sum at machine epsilon — the consumer
  * rounds to 6 decimals, the suite-wide convention for
  * order-insensitive double aggregates.
  *
  * Shape at 100 TB: the whole key becomes map-only — scan, one pass
  * per doc, presentation sort. No explode, no (doc, char) shuffle.
  */
case class CharEntropyOf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): GenericInternalRow = {
    val b = input.getBytes
    val ascii = new Array[Long](128)
    // rare path: non-ASCII chars, keyed by their UTF-8 byte run
    var other: java.util.LinkedHashMap[UTF8String, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 0) { // single-byte (ASCII) char
        ascii(c) += 1
        i += 1
      } else {
        val len = UTF8String.numBytesForFirstByte(c)
        if (other == null) other = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
        val key = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, i, i + len))
        val cell = other.get(key)
        if (cell == null) other.put(key, Array(1L)) else cell(0) += 1
        i += len
      }
      n += 1
    }
    var sum = 0.0
    val nd = n.toDouble
    var j = 0
    while (j < 128) {
      if (ascii(j) > 0) {
        val p = ascii(j) / nd
        sum += p * math.log(p)
      }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val p = it.next()(0) / nd
        sum += p * math.log(p)
      }
    }
    val row = new GenericInternalRow(2)
    row.update(0, n.toInt)
    row.update(1, -sum)
    row
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropyOf].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
