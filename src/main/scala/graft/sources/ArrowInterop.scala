package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, BitVector, Float8Vector, IntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Arrow IPC interchange boundary — the Spark-native echo of the
  * reference's entire data model: bearly exchanges tables zero-copy
  * as Arrow capsule streams (`/root/reference/src/bearly/bearly_ext.cc:93-100`
  * single-batch basic stream out, `:10-24` any stream exporter in).
  * Here the same boundary is the Arrow IPC *stream format* over
  * bytes: any Arrow-speaking consumer (pyarrow, polars, duckdb,
  * nanoarrow) can read [[toArrowBytes]] output, and [[fromArrowBytes]]
  * accepts theirs.
  *
  * Deliberately driver-side and bounded (`maxRows` guard): the
  * interchange is for RESULTS — the reference's whole data model is
  * in-memory tables — while 100 TB inputs stay in parquet and never
  * cross this boundary. Distributed Arrow export is what
  * `df.write.parquet` already is (parquet pages are the scale-out
  * interchange); this is the in-memory handoff for bounded outputs.
  */
object ArrowInterop {

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType  => ArrowType.Utf8.INSTANCE
      case BooleanType => ArrowType.Bool.INSTANCE
      case other => throw new IllegalArgumentException(
        s"ArrowInterop supports long/int/double/string/boolean result columns; " +
          s"'${f.name}' is ${other.simpleString}")
    }
    new Field(f.name, new FieldType(f.nullable, t, null),
      java.util.Collections.emptyList[Field]())
  }

  private def sparkField(f: Field): StructField = {
    val dt: DataType = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case _: ArrowType.FloatingPoint => DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case other => throw new IllegalArgumentException(s"unsupported Arrow type $other")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  /** Serialize a bounded DataFrame result to Arrow IPC stream bytes
    * (schema message + one record batch + EOS).
    */
  def toArrowBytes(df: DataFrame, maxRows: Int = 1 << 20): Array[Byte] = {
    val rows = df.limit(maxRows).collect()
    val schema = df.schema
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(
        new ArrowSchema(schema.fields.map(arrowField).toList.asJava), alloc)
      try {
        root.allocateNew()
        schema.fields.zipWithIndex.foreach { case (f, ci) =>
          val vec = root.getVector(ci)
          f.dataType match {
            case LongType =>
              val v = vec.asInstanceOf[BigIntVector]
              rows.zipWithIndex.foreach { case (r, i) =>
                if (r.isNullAt(ci)) v.setNull(i) else v.setSafe(i, r.getLong(ci)) }
            case IntegerType =>
              val v = vec.asInstanceOf[IntVector]
              rows.zipWithIndex.foreach { case (r, i) =>
                if (r.isNullAt(ci)) v.setNull(i) else v.setSafe(i, r.getInt(ci)) }
            case DoubleType =>
              val v = vec.asInstanceOf[Float8Vector]
              rows.zipWithIndex.foreach { case (r, i) =>
                if (r.isNullAt(ci)) v.setNull(i) else v.setSafe(i, r.getDouble(ci)) }
            case StringType =>
              val v = vec.asInstanceOf[VarCharVector]
              rows.zipWithIndex.foreach { case (r, i) =>
                if (r.isNullAt(ci)) v.setNull(i)
                else v.setSafe(i, r.getString(ci).getBytes("UTF-8")) }
            case BooleanType =>
              val v = vec.asInstanceOf[BitVector]
              rows.zipWithIndex.foreach { case (r, i) =>
                if (r.isNullAt(ci)) v.setNull(i)
                else v.setSafe(i, if (r.getBoolean(ci)) 1 else 0) }
            case _ => // unreachable: arrowField already rejected it
          }
        }
        root.setRowCount(rows.length)
        val bos = new java.io.ByteArrayOutputStream()
        val w = new ArrowStreamWriter(root, null,
          java.nio.channels.Channels.newChannel(bos))
        try { w.start(); w.writeBatch(); w.end() } finally w.close()
        bos.toByteArray
      } finally root.close()
    } finally alloc.close()
  }

  /** Read an Arrow IPC stream (any batch count) back into a local
    * DataFrame — the consumer side of the boundary.
    */
  def fromArrowBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val reader = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc)
      try {
        val root = reader.getVectorSchemaRoot
        val schema = StructType(root.getSchema.getFields.asScala.map(sparkField).toSeq)
        val out = scala.collection.mutable.ArrayBuffer[Row]()
        while (reader.loadNextBatch()) {
          (0 until root.getRowCount).foreach { i =>
            out += Row.fromSeq(schema.fields.indices.map { ci =>
              val vec = root.getVector(ci)
              if (vec.isNull(i)) null
              else schema.fields(ci).dataType match {
                case LongType    => vec.asInstanceOf[BigIntVector].get(i)
                case IntegerType => vec.asInstanceOf[IntVector].get(i)
                case DoubleType  => vec.asInstanceOf[Float8Vector].get(i)
                case StringType  => new String(vec.asInstanceOf[VarCharVector].get(i), "UTF-8")
                case BooleanType => vec.asInstanceOf[BitVector].get(i) == 1
                case _ => null
              }
            })
          }
        }
        spark.createDataFrame(out.asJava, schema)
      } finally reader.close()
    } finally alloc.close()
  }
}
