package graft.spark

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One partition-layout dimension: either an identity column or a derived
  * (hidden-partitioning) transform over a source column — `days(ts)`,
  * `months(ts)`, `hours(ts)`, `years(ts)`, `bucket(16,id)`,
  * `truncate(4,s)`. The table schema keeps the SOURCE column; the hive
  * directory layout carries the DERIVED value under a derived dir name
  * (`ts_day=2026-08-16/`), so queries filter on the source column and the
  * scan prunes directories by compiling those predicates into
  * derived-value ranges. This is what makes `PARTITIONED BY (days(ts))`
  * usable on an event table: nobody materializes a date column by hand or
  * remembers to filter on it.
  *
  * Scale note: at 100 TB the directory layout is the coarsest and
  * cheapest pruning layer — a day-ranged query over a days(ts) layout
  * skips whole directories before ANY footer IO, which no zone map can
  * match (zone maps still need the footer read).
  *
  * Time derivations are calendar-in-UTC over the internal epoch micros
  * (for TIMESTAMP_NTZ: over the wall-time micros, which is the same
  * arithmetic). Both the writer and the pruner share ONE derivation
  * function, so pruning can never disagree with the layout.
  */
final case class PartTransform(kind: String, src: String, arg: Int) {
  def isIdentity: Boolean = kind == "identity"

  /** The hive dir-segment name the derived value is laid out under. */
  val dirName: String = kind match {
    case "identity" => src
    case "years"    => src + "_year"
    case "months"   => src + "_month"
    case "days"     => src + "_day"
    case "hours"    => src + "_hour"
    case "bucket"   => src + "_bucket"
    case "truncate" => src + "_trunc"
  }

  /** Canonical spec string — what the sidecar persists and the
    * `partitionby` write option accepts. Identity stays a bare column
    * name (backward compatible with every pre-transform sidecar). */
  def spec: String = kind match {
    case "identity"             => src
    case "bucket" | "truncate"  => s"$kind($arg,$src)"
    case k                      => s"$k($src)"
  }
}

object GraftPartTransform {
  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L
  private val TimeKinds = Set("years", "months", "days", "hours")

  private val FnPat =
    raw"(?i)(years|months|days|hours|year|month|day|date|hour)\s*\(\s*([^(),\s]+)\s*\)".r
  private val ArgPat = raw"(?i)(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)".r
  private val ArgPatRev = raw"(?i)(bucket|truncate)\s*\(\s*([^(),\s]+)\s*,\s*(\d+)\s*\)".r
  // Spark's parser canonicalizes days/hours/... aliases; accept the
  // common singular forms too
  private val Alias = Map("year" -> "years", "month" -> "months",
    "day" -> "days", "date" -> "days", "hour" -> "hours")

  /** Parse one spec string. A bare name is identity. */
  def parse(spec: String): PartTransform = spec.trim match {
    case FnPat(k, c) => PartTransform(normKind(k), c, 0)
    case ArgPat(k, n, c) => PartTransform(k.toLowerCase, c, n.toInt)
    case ArgPatRev(k, c, n) => PartTransform(k.toLowerCase, c, n.toInt)
    case bare if bare.nonEmpty && !bare.contains('(') =>
      PartTransform("identity", bare, 0)
    case other => throw new IllegalArgumentException(
      s"graft: cannot parse partition spec '$other' — expected a column " +
        "name, days(col)/months(col)/years(col)/hours(col), " +
        "bucket(n,col) or truncate(w,col)")
  }

  private def normKind(k: String): String = {
    val lk = k.toLowerCase
    Alias.getOrElse(lk, lk)
  }

  /** Split a comma-joined `partitionby` option value into specs,
    * respecting parens (`bucket(16,id)` is ONE spec). */
  def splitSpecs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        if (cur.nonEmpty) { out += cur.toString.trim; cur.clear() }
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  /** Connector Transform -> canonical spec string (CREATE TABLE
    * PARTITIONED BY arrives as v2 Transforms). */
  def fromV2(t: org.apache.spark.sql.connector.expressions.Transform): String = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, Literal => V2Lit}
    def oneCol(refs: Array[NamedReference], what: String): String = {
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"graft: $what must reference exactly one top-level column, got " +
          refs.map(_.describe()).mkString(", "))
      refs.head.fieldNames.head
    }
    normKind(t.name) match {
      case "identity" => oneCol(t.references(), "identity partitioning")
      case k @ ("years" | "months" | "days" | "hours") =>
        s"$k(${oneCol(t.references(), s"$k() partitioning")})"
      case k @ ("bucket" | "truncate") =>
        val col = oneCol(t.references(), s"$k() partitioning")
        val lit = t.arguments().collectFirst {
          case l: V2Lit[_] => String.valueOf(l.value).toInt
        }.getOrElse(throw new IllegalArgumentException(
          s"graft: $k() partitioning needs an integer argument"))
        require(lit > 0, s"graft: $k() argument must be positive, got $lit")
        s"$k($lit,$col)"
      case other => throw new IllegalArgumentException(
        s"graft: unsupported partition transform '$other' — supported: " +
          "identity columns, years/months/days/hours(col), bucket(n,col), " +
          "truncate(w,col)")
    }
  }

  /** Canonical spec -> connector Transform (what partitioning() reports —
    * the planner routes dynamic partition overwrite and storage-
    * partitioned decisions off this). */
  def toV2(pt: PartTransform)
      : org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    pt.kind match {
      case "identity" => Expressions.identity(pt.src)
      case "years"    => Expressions.years(pt.src)
      case "months"   => Expressions.months(pt.src)
      case "days"     => Expressions.days(pt.src)
      case "hours"    => Expressions.hours(pt.src)
      case "bucket"   => Expressions.bucket(pt.arg, pt.src)
      case "truncate" => Expressions.apply("truncate",
        Expressions.literal(pt.arg), Expressions.column(pt.src))
    }
  }

  /** Source-column types each transform accepts. Time transforms take
    * TIMESTAMP / TIMESTAMP_NTZ / DATE (hours rejects DATE — a date has no
    * hour); bucket/truncate take integral/string; identity additionally
    * takes boolean and DATE. */
  def validate(pt: PartTransform, schema: StructType): Unit = {
    require(schema.fieldNames.contains(pt.src),
      s"graft: partition source column '${pt.src}' is not in the table schema")
    val dt = schema(pt.src).dataType
    def bad(allowed: String): Nothing = throw new IllegalArgumentException(
      s"graft: partition spec '${pt.spec}' cannot apply to column " +
        s"'${pt.src}' of type ${dt.simpleString} ($allowed)")
    pt.kind match {
      case "identity" => dt match {
        case BooleanType | ByteType | ShortType | IntegerType | LongType |
             StringType | DateType => ()
        case _ => bad("boolean/integral/string/date only")
      }
      case "hours" => dt match {
        case TimestampType | TimestampNTZType => ()
        case _ => bad("timestamp only — a date has no hour")
      }
      case k if TimeKinds(k) => dt match {
        case TimestampType | TimestampNTZType | DateType => ()
        case _ => bad("timestamp/date only")
      }
      case "bucket" | "truncate" => dt match {
        case ByteType | ShortType | IntegerType | LongType | StringType => ()
        case _ => bad("integral/string only")
      }
    }
    if (pt.kind == "bucket" || pt.kind == "truncate")
      require(pt.arg > 0,
        s"graft: ${pt.kind}() argument must be positive, got ${pt.arg} " +
          s"in partition spec '${pt.spec}'")
    if (!pt.isIdentity)
      require(!schema.fieldNames.exists(_.equalsIgnoreCase(pt.dirName)),
        s"graft: derived partition dir name '${pt.dirName}' collides with " +
          "a table column — rename the column or partition differently")
  }

  /** Resolve one `partitionby` entry against the write schema and the
    * table's declared layout specs: full transform syntax parses
    * directly; a bare name is an identity column, OR the derived dir
    * name of a declared transform (what the maintenance rewrites pass
    * after inferring the layout from the directory names). */
  def resolve(entry: String, schema: StructType,
      declared: Seq[PartTransform]): PartTransform = {
    // canonicalize the source column to the schema's declared case:
    // column resolution is case-insensitive everywhere else, and the
    // restate-vs-declared-layout check compares canonical SPEC STRINGS —
    // days(TS) must restate a declared days(ts), not conflict with it
    def canonSrc(p: PartTransform): PartTransform =
      schema.fieldNames.find(_.equalsIgnoreCase(p.src))
        .filter(_ != p.src).map(n => p.copy(src = n)).getOrElse(p)
    val pt = canonSrc(parse(entry))
    if (!pt.isIdentity) pt
    else if (schema.fieldNames.contains(pt.src)) pt
    else declared.find(_.dirName.equalsIgnoreCase(pt.src)).getOrElse(pt)
  }

  /** The partition-schema field a transform exposes (what SHOW PARTITIONS
    * and ADD/DROP PARTITION bind): identity keeps the source field; time
    * transforms are the rendered string; bucket is the bucket ordinal;
    * truncate keeps string, widens integrals to long. */
  def partField(pt: PartTransform, schema: StructType): StructField = {
    val srcField = schema(pt.src)
    pt.kind match {
      case "identity" => srcField
      case "bucket"   => StructField(pt.dirName, IntegerType, nullable = srcField.nullable)
      case "truncate" => srcField.dataType match {
        case StringType => StructField(pt.dirName, StringType, srcField.nullable)
        case _ => StructField(pt.dirName, LongType, srcField.nullable)
      }
      case _ => StructField(pt.dirName, StringType, srcField.nullable)
    }
  }

  // ---- derivation: internal value -> logical dir value (string) -------
  // ONE function serves the writer (row values) and the pruner (filter
  // literals converted to internal form): the layout and the pruning can
  // never drift apart.

  private def renderTime(kind: String, epochDay: Long, hour: Long): String = {
    val d = java.time.LocalDate.ofEpochDay(epochDay)
    kind match {
      case "years"  => f"${d.getYear}%04d"
      case "months" => f"${d.getYear}%04d-${d.getMonthValue}%02d"
      case "days"   => f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
      case "hours"  => f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d-$hour%02d"
    }
  }

  /** Possible values of `EXTRACT(field FROM CAST(src AS date))` (the shape
    * Spark pushes for `month(ts)`/`day(ts)`) among rows living in a
    * months/days/hours dir — what lets a PERIODIC calendar predicate,
    * which no base-column range can carry, still prune whole directories.
    * None = undecidable (caller keeps the dir).
    *
    * Soundness: the dir covers a contiguous instant range under the UTC
    * derivation calendar; the residual filter evaluates the field in the
    * PLAN-TIME session zone, so the candidates come from the dir range
    * re-read in that zone — local dates over a contiguous instant range
    * form the contiguous local-date span [local(start), local(end-1µs)]
    * (DST never moves a local date backwards across the span ends). For
    * DATE / TIMESTAMP_NTZ sources the derivation IS wall time and the
    * candidates are exact with no zone involved.
    */
  def fieldCandidates(pt: PartTransform, dt: DataType, dirVal: String,
      field: String): Option[Set[Int]] = {
    if (!TimeKinds(pt.kind) || pt.kind == "years") return None
    if (dirVal == null || dirVal.startsWith("-")) return None
    val parts = dirVal.split("-")
    val expect = pt.kind match { case "months" => 2; case "days" => 3; case _ => 4 }
    if (parts.length != expect || parts.exists(_.isEmpty)) return None
    val (ld1, ld2) =
      try {
        val y = parts(0).toInt; val mo = parts(1).toInt
        val d0 = pt.kind match {
          case "months" => java.time.LocalDate.of(y, mo, 1)
          case _ => java.time.LocalDate.of(y, mo, parts(2).toInt)
        }
        val hr = if (pt.kind == "hours") parts(3).toLong else 0L
        // dir's covered wall range under the derivation calendar
        val (s, e) = pt.kind match {
          case "months" => (d0.atStartOfDay(), d0.plusMonths(1).atStartOfDay())
          case "days"   => (d0.atStartOfDay(), d0.plusDays(1).atStartOfDay())
          case _ => val h0 = d0.atStartOfDay().plusHours(hr); (h0, h0.plusHours(1))
        }
        dt match {
          case TimestampType =>
            // instants (derivation is UTC) re-read in the session zone
            val zone = java.time.ZoneId.of(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
            val si = s.toInstant(java.time.ZoneOffset.UTC)
            val ei = e.toInstant(java.time.ZoneOffset.UTC).minusNanos(1000)
            (si.atZone(zone).toLocalDate, ei.atZone(zone).toLocalDate)
          case DateType | TimestampNTZType =>
            (s.toLocalDate, e.minusNanos(1000).toLocalDate)
          case _ => return None
        }
      } catch { case _: RuntimeException => return None }
    val span = java.time.temporal.ChronoUnit.DAYS.between(ld1, ld2)
    if (span < 0 || span > 62) return None // huge span: nothing to prune
    val out = Set.newBuilder[Int]
    var d = ld1
    val f = field.toLowerCase
    while (!d.isAfter(ld2)) {
      f match {
        case "month" => out += d.getMonthValue
        case "day" => out += d.getDayOfMonth
        case _ => return None
      }
      d = d.plusDays(1)
    }
    Some(out.result())
  }

  /** Possible `EXTRACT(HOUR FROM ts)` values among rows in an HOURS dir
    * (coarser dirs span all 24 — undecidable). The dir covers one
    * derivation-calendar hour; in the session zone its instants can land
    * on two (or, across a DST fold, three) local hours — enumerated by
    * stepping the instant range (offsets change only in >=15-min
    * quanta). NTZ is exact wall time. */
  def hourCandidates(pt: PartTransform, dt: DataType,
      dirVal: String): Option[Set[Int]] = {
    if (pt.kind != "hours") return None
    if (dirVal == null || dirVal.startsWith("-")) return None
    val parts = dirVal.split("-")
    if (parts.length != 4 || parts.exists(_.isEmpty)) return None
    try {
      val d0 = java.time.LocalDate.of(parts(0).toInt, parts(1).toInt, parts(2).toInt)
      val h = parts(3).toInt
      dt match {
        case TimestampNTZType => Some(Set(h))
        case TimestampType =>
          val zone = java.time.ZoneId.of(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          val s0 = d0.atStartOfDay().plusHours(h.toLong)
            .toInstant(java.time.ZoneOffset.UTC)
          val out = Set.newBuilder[Int]
          var m = 0
          while (m < 60) {
            out += s0.plusSeconds(m * 60L).atZone(zone).getHour
            m += 15
          }
          out += s0.plusSeconds(3599L).atZone(zone).getHour
          Some(out.result())
        case _ => None
      }
    } catch { case _: RuntimeException => None }
  }

  /** Bucket ordinal with EXACTLY Spark's `pmod(hash(col), n)` semantics
    * (Murmur3 seed 42 over Spark's per-type byte rendering) — so the SQL
    * predicate `pmod(hash(id), 16) = 3` and the layout agree, and the
    * maintenance passes can reconstruct the dir from the data. */
  def bucketOf(v: Any, dt: DataType, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(v, dt, 42L).toInt
    ((h % n) + n) % n
  }

  /** Internal (catalyst) non-null value -> logical dir value. */
  def deriveLogical(pt: PartTransform, dt: DataType, v: Any): String = pt.kind match {
    case "identity" => dt match {
      case StringType => v.asInstanceOf[UTF8String].toString
      case DateType => java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Int].toLong).toString
      case _ => String.valueOf(v)
    }
    case k if TimeKinds(k) => dt match {
      case DateType => renderTime(k, v.asInstanceOf[Int].toLong, 0L)
      case _ => // TimestampType / TimestampNTZType: epoch/wall micros
        val us = v.asInstanceOf[Long]
        renderTime(k, Math.floorDiv(us, MicrosPerDay),
          Math.floorDiv(Math.floorMod(us, MicrosPerDay), MicrosPerHour))
    }
    case "bucket" => String.valueOf(bucketOf(v, dt, pt.arg))
    case "truncate" => dt match {
      case StringType =>
        v.asInstanceOf[UTF8String].substringSQL(1, pt.arg).toString
      case _ =>
        val l = v match {
          case b: Byte => b.toLong; case s: Short => s.toLong
          case i: Int => i.toLong; case l: Long => l
        }
        String.valueOf(Math.floorDiv(l, pt.arg.toLong) * pt.arg.toLong)
    }
  }

  /** External (filter-literal) value -> internal form, or None when the
    * literal's runtime type doesn't map (pruning then keeps the dir —
    * conservative, never wrong). */
  def toInternal(dt: DataType, v: Any): Option[Any] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    if (v == null) return None
    dt match {
      case StringType => v match {
        case s: String => Some(UTF8String.fromString(s))
        case u: UTF8String => Some(u)
        case _ => None
      }
      case TimestampType => v match {
        case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
        case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
        case _ => None
      }
      case TimestampNTZType => v match {
        case l: java.time.LocalDateTime =>
          Some(DateTimeUtils.localDateTimeToMicros(l))
        case _ => None
      }
      case DateType => v match {
        case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d))
        case l: java.time.LocalDate => Some(l.toEpochDay.toInt)
        case _ => None
      }
      case ByteType => v match { case b: Byte => Some(b); case _ => None }
      case ShortType => v match { case s: Short => Some(s); case _ => None }
      case IntegerType => v match { case i: Int => Some(i); case _ => None }
      case LongType => v match { case l: Long => Some(l); case _ => None }
      case BooleanType => v match { case b: Boolean => Some(b); case _ => None }
      case _ => None
    }
  }

  /** Monotonic transforms support range pruning: any non-decreasing
    * source value maps to a non-decreasing derived value. bucket is the
    * only non-monotonic one (equality/IN pruning only). */
  def monotonic(pt: PartTransform): Boolean = pt.kind != "bucket"

  /** Ordering of two derived dir values under the SOURCE type's order, or
    * None when a value falls outside the fixed-width rendering the order
    * relies on (pre-CE / five-digit years) — the caller then keeps the
    * dir. The source type decides the truncate order: a STRING-truncate
    * dir must compare lexicographically even when its value happens to
    * parse as a number ('9' > '11' as strings, not 9 < 11), and an
    * integral-truncate dir must compare numerically. */
  def cmpDerived(pt: PartTransform, srcType: DataType,
      a: String, b: String): Option[Int] = {
    if (a == null || b == null) return None
    pt.kind match {
      case k if TimeKinds(k) =>
        // fixed-width zero-padded renderings compare lexicographically;
        // a leading '-' (negative year) would not
        if (a.startsWith("-") || b.startsWith("-") || a.length != b.length) None
        else Some(a.compareTo(b))
      case "truncate" => srcType match {
        // Spark orders strings by UTF-8 BINARY bytes; Java String
        // compareTo is UTF-16 code-unit order. They diverge when a
        // supplementary-plane char meets [U+E000,U+FFFF] — compare the
        // way the engine does or pruning silently drops matching dirs.
        case StringType =>
          Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
        case _ =>
          try Some(java.lang.Long.compare(a.toLong, b.toLong))
          catch { case _: NumberFormatException => None }
      }
      case _ => None
    }
  }

  /** Exact-match SQL derivation of the dir value from the source column —
    * what lets a maintenance pass (partition-scoped compaction) scope a
    * table scan to one derived directory with a data predicate. Uses only
    * timezone-stable constructs: epoch-micros arithmetic for TIMESTAMP,
    * wall-time field extraction for TIMESTAMP_NTZ/DATE.
    */
  def deriveColumn(pt: PartTransform, dt: DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val c = col(pt.src)
    pt.kind match {
      case "identity" => dt match {
        case DateType => date_format(c, "yyyy-MM-dd")
        case _ => c.cast(StringType)
      }
      case k if TimeKinds(k) =>
        val (dateCol, hourCol) = dt match {
          case DateType => (c, lit(0L))
          case TimestampNTZType =>
            (c.cast(DateType), hour(c).cast(LongType))
          case _ => // TimestampType: UTC calendar over epoch micros
            val us = unix_micros(c)
            val day = floor(us / lit(MicrosPerDay)).cast(LongType)
            (date_from_unix_date(day.cast(IntegerType)),
              floor(pmod(us, lit(MicrosPerDay)) / lit(MicrosPerHour))
                .cast(LongType))
        }
        k match {
          case "years"  => date_format(dateCol, "yyyy")
          case "months" => date_format(dateCol, "yyyy-MM")
          case "days"   => date_format(dateCol, "yyyy-MM-dd")
          case "hours"  => concat(date_format(dateCol, "yyyy-MM-dd"),
            lit("-"), lpad(hourCol.cast(StringType), 2, "0"))
        }
      case "bucket" => pmod(hash(c), lit(pt.arg)).cast(StringType)
      case "truncate" => dt match {
        case StringType => substring(c, 1, pt.arg)
        case _ => (c.cast(LongType) - pmod(c.cast(LongType), lit(pt.arg.toLong)))
          .cast(StringType)
      }
    }
  }
}
