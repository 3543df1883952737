package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The partition-transform functions exposed through the catalog's
  * FunctionCatalog surface — what lets Spark RESOLVE the transform
  * expressions the scan reports in `KeyGroupedPartitioning` (bucket /
  * days / months / years / hours / truncate) and so plan a
  * storage-partitioned join between two graft tables laid out by the
  * same transform with NO shuffle on either side. At 100 TB, bucketing
  * both fact tables by the join key once and joining shuffle-free on
  * every later run is the single largest cost deletion this library
  * offers; the function definitions here are byte-for-byte the writer's
  * own derivations ([[GraftPartTransform.deriveLogical]]), so an
  * evaluated transform can never disagree with the directory layout.
  *
  * Results: bucket -> int ordinal (exactly Spark's `pmod(hash(col), n)`);
  * time transforms -> the rendered dir string; truncate -> string prefix
  * or the floored long. Null in, null out (the hive default dir).
  */
object GraftFunctions {
  val names: Seq[String] =
    Seq("bucket", "years", "months", "days", "hours", "truncate")

  def unbound(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(new BucketUnbound)
    case "truncate" => Some(new TruncateUnbound)
    case n @ ("years" | "months" | "days" | "hours") => Some(new TimeUnbound(n))
    case _ => None
  }

  private def timeOk(dt: DataType, kind: String): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case DateType => kind != "hours"
    case _ => false
  }

  private final class TimeUnbound(kind: String) extends UnboundFunction {
    override def name(): String = kind
    override def description(): String =
      s"graft $kind(col): the $kind partition-transform rendering"
    override def bind(input: StructType): BoundFunction = {
      require(input.fields.length == 1 && timeOk(input.fields(0).dataType, kind),
        s"graft: $kind() takes one timestamp/date column")
      val dt = input.fields(0).dataType
      val pt = PartTransform(kind, "c", 0)
      new ScalarFunction[UTF8String] {
        override def inputTypes(): Array[DataType] = Array(dt)
        override def resultType(): DataType = StringType
        override def name(): String = kind
        override def canonicalName(): String = s"graft.$kind(${dt.simpleString})"
        override def produceResult(row: InternalRow): UTF8String =
          if (row.isNullAt(0)) null
          else UTF8String.fromString(
            GraftPartTransform.deriveLogical(pt, dt, row.get(0, dt)))
      }
    }
  }

  private final class BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "graft bucket(n, col): pmod(hash(col), n) — the bucket partition transform"
    override def bind(input: StructType): BoundFunction = {
      require(input.fields.length == 2,
        "graft: bucket() takes (numBuckets, col)")
      val dt = input.fields(1).dataType
      require(dt match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _ => false
      }, s"graft: bucket() source must be integral/string, got ${dt.simpleString}")
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket(${dt.simpleString})"
        override def produceResult(row: InternalRow): Integer =
          if (row.isNullAt(1)) null
          else Integer.valueOf(GraftPartTransform.bucketOf(
            row.get(1, dt), dt, row.getInt(0)))
      }
    }
  }

  private final class TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "graft truncate(w, col): string prefix / floored integral — the truncate partition transform"
    override def bind(input: StructType): BoundFunction = {
      require(input.fields.length == 2,
        "graft: truncate() takes (width, col)")
      val dt = input.fields(1).dataType
      dt match {
        case StringType =>
          new ScalarFunction[UTF8String] {
            override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
            override def resultType(): DataType = StringType
            override def name(): String = "truncate"
            override def canonicalName(): String = "graft.truncate(string)"
            override def produceResult(row: InternalRow): UTF8String =
              if (row.isNullAt(1)) null
              else row.getUTF8String(1).substringSQL(1, row.getInt(0))
          }
        case ByteType | ShortType | IntegerType | LongType =>
          new ScalarFunction[java.lang.Long] {
            override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
            override def resultType(): DataType = LongType
            override def name(): String = "truncate"
            override def canonicalName(): String = s"graft.truncate(${dt.simpleString})"
            override def produceResult(row: InternalRow): java.lang.Long =
              if (row.isNullAt(1)) null
              else {
                val w = row.getInt(0).toLong
                val v = dt match {
                  case ByteType => row.getByte(1).toLong
                  case ShortType => row.getShort(1).toLong
                  case IntegerType => row.getInt(1).toLong
                  case _ => row.getLong(1)
                }
                java.lang.Long.valueOf(Math.floorDiv(v, w) * w)
              }
          }
        case other => throw new UnsupportedOperationException(
          s"graft: truncate() source must be integral/string, got ${other.simpleString}")
      }
    }
  }
}
