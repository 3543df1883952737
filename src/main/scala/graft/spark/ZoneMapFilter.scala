package graft.spark

import graft.format.PageMeta
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Zone-map predicate evaluation: decides whether a page group can possibly
  * contain rows matching the pushed filters, from per-page min/max/nullCount
  * alone. This is the format extension the reference lacks (its write-time
  * stats are never persisted — SURVEY.md §2.2); pages that cannot match are
  * skipped before decode.
  *
  * Filters are advisory: Spark still applies them row-level above the scan,
  * so pruning only needs to be sound (never skip a page that could match),
  * not complete.
  */
object ZoneMapFilter {

  /** A page-group skip test. `fields` lists every column the predicate
    * consults; `canSkip(meta)` resolves each field's PageMeta for the current
    * page group via `meta` and returns true iff the whole group can be
    * skipped. Composites (AllOf/AnyOf) may span multiple fields, which is why
    * evaluation takes a resolver rather than a single PageMeta.
    */
  sealed trait PagePred extends Serializable {
    def fields: Seq[String]
    /** true iff the page group can be SKIPPED */
    def canSkip(meta: String => PageMeta): Boolean
  }

  /** Single-column predicate: the common case, evaluated on its own PageMeta. */
  sealed trait LeafPred extends PagePred {
    def field: String
    final def fields: Seq[String] = Seq(field)
    final def canSkip(meta: String => PageMeta): Boolean = canSkipMeta(meta(field))
    def canSkipMeta(pm: PageMeta): Boolean
  }

  /** Conjunction: skip if ANY branch skips (a row must satisfy all). */
  private final case class AllOf(ps: Array[PagePred]) extends PagePred {
    def fields: Seq[String] = ps.flatMap(_.fields).distinct.toSeq
    def canSkip(meta: String => PageMeta): Boolean = ps.exists(_.canSkip(meta))
  }

  /** Disjunction: skip only if EVERY branch skips (soundness for OR). */
  private final case class AnyOf(ps: Array[PagePred]) extends PagePred {
    def fields: Seq[String] = ps.flatMap(_.fields).distinct.toSeq
    def canSkip(meta: String => PageMeta): Boolean = ps.forall(_.canSkip(meta))
  }

  private def dblOf(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)

  /** kind 1 = long domain, 2 = double domain, matching PageMeta.statsKind. */
  private final case class Cmp(field: String, kind: Int, op: Int, v: Either[Long, Double])
      extends LeafPred {
    // op: 0 =, 1 >, 2 >=, 3 <, 4 <=
    def canSkipMeta(pm: PageMeta): Boolean = {
      if (pm.numValues == 0) return true // element leaf: no elements in group
      if (pm.nullCount == pm.numValues) return true // all null
      (kind, v) match {
        case (1, Left(x)) if pm.statsKind == 1 =>
          op match {
            case 0 => x < pm.minLong || x > pm.maxLong ||
              (pm.bloom != null &&
                !graft.format.BloomUtil.mightContain(pm.bloom, graft.format.BloomUtil.hashLong(x)))
            case 1 => pm.maxLong <= x
            case 2 => pm.maxLong < x
            case 3 => pm.minLong >= x
            case 4 => pm.minLong > x
            case _ => false
          }
        case (2, Right(x)) if pm.statsKind == 2 || pm.statsKind == 3 =>
          // statsKind 3 = page contains NaN. Spark orders NaN above every
          // value and NaN = NaN is true, so NaN rows match any >/>= bound
          // (never skip) and an = NaN probe (never skip); NaN never matches
          // </<= or a finite = probe, so those may still prune on the
          // non-NaN min/max. All-NaN pages store NaN bits, and every
          // comparison below is then false — conservatively kept.
          val nanPage = pm.statsKind == 3
          val min = dblOf(pm.minLong)
          val max = dblOf(pm.maxLong)
          op match {
            case 0 => !(nanPage && x.isNaN) && (x < min || x > max)
            case 1 => !nanPage && max <= x
            case 2 => !nanPage && max < x
            case 3 => min >= x
            case 4 => min > x
            case _ => false
          }
        case _ => false
      }
    }
  }

  /** String/binary bounds (statsKind 4). minBin is a valid lower bound and
    * maxBin a valid upper bound for every value in the page (truncation
    * rounds them outward — PageStats.binStats), so comparisons against the
    * bounds prune soundly; null maxBin disables upper-bound tests.
    */
  private final case class CmpBin(field: String, op: Int, x: Array[Byte]) extends LeafPred {
    // op: 0 =, 1 >, 2 >=, 3 <, 4 <=, 5 startsWith
    def canSkipMeta(pm: PageMeta): Boolean = {
      if (pm.numValues == 0) return true // element leaf: no elements in group
      if (pm.nullCount == pm.numValues) return true
      if (pm.statsKind != 4) return false
      val aboveMax = pm.maxBin != null && ZoneMapFilter.cmpBytes(x, pm.maxBin) > 0
      val maxLeX = pm.maxBin != null && ZoneMapFilter.cmpBytes(pm.maxBin, x) <= 0
      op match {
        case 0 => aboveMax || ZoneMapFilter.cmpBytes(x, pm.minBin) < 0 ||
          (pm.bloom != null && !graft.format.BloomUtil.mightContain(pm.bloom,
            graft.format.BloomUtil.hashBytes(x, 0, x.length)))
        case 1 => maxLeX
        case 2 => pm.maxBin != null && ZoneMapFilter.cmpBytes(pm.maxBin, x) < 0
        case 3 => ZoneMapFilter.cmpBytes(pm.minBin, x) >= 0
        case 4 => ZoneMapFilter.cmpBytes(pm.minBin, x) > 0
        case 5 =>
          // no value with prefix x exists if max < x, or min >= smallest
          // byte string above every x-prefixed value
          if (pm.maxBin != null && ZoneMapFilter.cmpBytes(pm.maxBin, x) < 0) true
          else {
            val hi = graft.format.PageStats.incrementUp(x)
            hi != null && ZoneMapFilter.cmpBytes(pm.minBin, hi) >= 0
          }
        case _ => false
      }
    }
  }

  private final case class InSetBin(field: String, xs: Array[Array[Byte]]) extends LeafPred {
    def canSkipMeta(pm: PageMeta): Boolean = {
      if (pm.nullCount == pm.numValues && pm.numValues > 0) return true
      if (pm.statsKind != 4) return false
      xs.forall(x =>
        (pm.maxBin != null && ZoneMapFilter.cmpBytes(x, pm.maxBin) > 0) ||
          ZoneMapFilter.cmpBytes(x, pm.minBin) < 0 ||
          (pm.bloom != null && !graft.format.BloomUtil.mightContain(pm.bloom,
            graft.format.BloomUtil.hashBytes(x, 0, x.length))))
    }
  }

  private[spark] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  /** Guard for predicates whose skip logic is only valid on NaN-free pages:
    * defers to `inner` except on pages that contain NaN (statsKind 3), which
    * are never skipped. Used when a NaN probe was dropped from an IN-set
    * envelope — the dropped probe still matches NaN rows (Spark NaN = NaN).
    */
  private final case class UnlessNanPage(field: String, inner: PagePred) extends PagePred {
    def fields: Seq[String] = inner.fields
    def canSkip(meta: String => PageMeta): Boolean =
      meta(field).statsKind != 3 && inner.canSkip(meta)
  }

  /** All probes were NaN: only NaN-bearing pages (statsKind 3) can match, so
    * every NaN-free double page skips. All-NULL pages are written with
    * statsKind 0 (no stats recorded) and are conservatively READ, not
    * skipped — kind 0 also covers stats-less lanes, so it cannot double as
    * an all-null signal.
    */
  private final case class OnlyNanMatches(field: String) extends LeafPred {
    def canSkipMeta(pm: PageMeta): Boolean = pm.statsKind == 2
  }

  private final case class AllNullSkip(field: String) extends LeafPred {
    // IsNotNull: skip pages where every value is null
    def canSkipMeta(pm: PageMeta): Boolean =
      pm.nullCount >= 0 && pm.numValues > 0 && pm.nullCount == pm.numValues
  }

  /** `col <=> null`: only rows that ARE null match, so pages recorded with
    * ZERO nulls skip (nullCount is only trusted when present, >= 0).
    */
  private final case class NoNullSkip(field: String) extends LeafPred {
    def canSkipMeta(pm: PageMeta): Boolean =
      pm.nullCount == 0 && pm.numValues > 0
  }

  /** Not(a = v): skippable only when every non-null value in the page equals
    * v (min == max == v) — null rows never satisfy NOT(=) either.
    */
  private final case class NotEq(field: String, kind: Int, v: Either[Long, Double])
      extends LeafPred {
    def canSkipMeta(pm: PageMeta): Boolean = {
      if (pm.nullCount == pm.numValues && pm.numValues > 0) return true
      (kind, v) match {
        case (1, Left(x)) if pm.statsKind == 1 => pm.minLong == x && pm.maxLong == x
        case (2, Right(x)) if pm.statsKind == 2 => // NaN pages (kind 3) never skip
          !x.isNaN && dblOf(pm.minLong) == x && dblOf(pm.maxLong) == x
        case _ => false
      }
    }
  }

  private final case class InSet(field: String, kind: Int, longs: Array[Long],
      dbls: Array[Double]) extends LeafPred {
    def canSkipMeta(pm: PageMeta): Boolean = {
      if (pm.nullCount == pm.numValues && pm.numValues > 0) return true
      if (kind == 1) pm.statsKind == 1 && longs.forall(x =>
        x < pm.minLong || x > pm.maxLong ||
          (pm.bloom != null && !graft.format.BloomUtil.mightContain(pm.bloom,
            graft.format.BloomUtil.hashLong(x))))
      else if (pm.statsKind == 2 || pm.statsKind == 3) {
        // NaN page (kind 3): a NaN probe value matches the page's NaN rows
        // (Spark NaN = NaN), so only prune when every probe is finite and
        // outside the non-NaN bounds.
        val min = dblOf(pm.minLong)
        val max = dblOf(pm.maxLong)
        dbls.forall(x => !(pm.statsKind == 3 && x.isNaN) && (x < min || x > max))
      } else false
    }
  }

  /** Convert a literal to the column's stats domain. Returns None for
    * unsupported (string/binary/bool/nested) columns or values.
    */
  private def toDomain(dt: DataType, value: Any): Option[(Int, Either[Long, Double])] = {
    if (value == null) return None
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some((1, Left(value.asInstanceOf[Number].longValue())))
      case DateType => value match {
        case d: java.sql.Date => Some((1, Left(d.toLocalDate.toEpochDay)))
        case d: java.time.LocalDate => Some((1, Left(d.toEpochDay)))
        case _ => None
      }
      case TimestampType | TimestampNTZType => value match {
        case t: java.sql.Timestamp =>
          Some((1, Left(t.getTime * 1000L + (t.getNanos / 1000) % 1000)))
        case i: java.time.Instant =>
          Some((1, Left(i.getEpochSecond * 1000000L + i.getNano / 1000)))
        case l: java.time.LocalDateTime =>
          Some((1, Left(l.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
            l.getNano / 1000)))
        case _ => None
      }
      case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS => value match {
        case b: java.math.BigDecimal =>
          try Some((1, Left(b.setScale(d.scale).unscaledValue().longValueExact())))
          catch { case _: ArithmeticException => None }
        case _ => None
      }
      case FloatType | DoubleType =>
        Some((2, Right(value.asInstanceOf[Number].doubleValue())))
      case _ => None
    }
  }

  /** UTF-8 bytes of a string probe / raw binary probe — the byte domain
    * statsKind 4 bounds are compared in (Spark compares strings the same way).
    */
  private def toBinDomain(dt: DataType, value: Any): Option[Array[Byte]] = {
    if (value == null) return None
    dt match {
      case StringType => Some(value.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case BinaryType => value match {
        case b: Array[Byte] => Some(b)
        case _ => None
      }
      case d: DecimalType if d.precision > Decimal.MAX_LONG_DIGITS =>
        // i128 pages store exact bounds in the order-preserving encoding
        val jbd = value match {
          case b: java.math.BigDecimal => b
          case b: scala.math.BigDecimal => b.bigDecimal
          case b: Decimal => b.toJavaBigDecimal
          case _ => null
        }
        if (jbd == null) None
        else
          try {
            val bi = jbd.setScale(d.scale).unscaledValue()
            Some(graft.format.Int128.orderedBytes(
              graft.format.Int128.hiOf(bi), graft.format.Int128.loOf(bi)))
          } catch { case _: ArithmeticException => None }
      case _ => None
    }
  }

  /** Types whose pages carry zone-map stats a pushed predicate can act on
    * (the long/double/binary stats domains above). Used to decide which
    * columns are worth advertising for runtime join-key filtering.
    */
  def prunable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Existence predicate for `array_contains(field, literal)`: a page group
    * whose ELEMENT-leaf bounds exclude the probe cannot contain any array
    * holding it, so the whole group skips. DSv2 never delivers element
    * predicates through pushFilters (source filters are attribute-path
    * only); the GraftElementPushdown rule compiles them here and grafts the
    * result onto the scan. The `field.element` path resolves to the element
    * leaf via [[GraftSchema.leafIndexOfPath]]; element pages share the page
    * GRID with the row-aligned leaves even though their value counts differ.
    * Reference precedent for fully independent per-leaf page streams:
    * `/root/reference/src/read/reader.rs:50-146`.
    */
  def elementEquals(fieldName: String, elementType: DataType, value: Any): Option[PagePred] =
    pathEquals(fieldName + ".element", elementType, value)

  /** IN-set bound against a leaf path: skip a page group iff EVERY probe
    * value is excluded. A partially-convertible value set must not push at
    * all — the unconvertible value could match inside a skipped page.
    */
  def pathIn(path: String, dt: DataType, values: Seq[Any]): Option[PagePred] = {
    val ps = values.map(pathEquals(path, dt, _))
    if (ps.isEmpty || ps.exists(_.isEmpty)) None
    else Some(AnyOf(ps.map(_.get).toArray))
  }

  def elementIn(fieldName: String, elementType: DataType, values: Seq[Any]): Option[PagePred] =
    pathIn(fieldName + ".element", elementType, values)

  /** Equality bound against an arbitrary leaf path (array element / map key /
    * map value — see [[GraftSchema.leafIndexOfPath]] for the reserved
    * segments). Skips a page group iff the leaf's bounds exclude the probe.
    */
  def pathEquals(path: String, dt: DataType, value: Any): Option[PagePred] =
    toDomain(dt, value).map { case (k, d) => Cmp(path, k, 0, d): PagePred }
      .orElse(toBinDomain(dt, value).map(b => CmpBin(path, 0, b): PagePred))

  /** Deterministic structural rendering of a predicate — used as the
    * equality key for scan instances (CmpBin holds a raw byte array, whose
    * reference equality would defeat `sameResult` plan reuse).
    */
  def render(p: PagePred): String = p match {
    case Cmp(f, k, op, v) => s"cmp($f,$k,$op,$v)"
    case CmpBin(f, op, x) => s"cmpbin($f,$op,${x.map("%02x".format(_)).mkString})"
    case InSetBin(f, xs) => s"insetbin($f,${xs.map(_.map("%02x".format(_)).mkString).mkString(",")})"
    case InSet(f, k, ls, ds) => s"inset($f,$k,${ls.mkString(",")};${ds.mkString(",")})"
    case NotEq(f, k, v) => s"noteq($f,$k,$v)"
    case AllNullSkip(f) => s"allnull($f)"
    case NoNullSkip(f) => s"nonull($f)"
    case OnlyNanMatches(f) => s"onlynan($f)"
    case UnlessNanPage(f, inner) => s"unlessnan($f,${render(inner)})"
    case AllOf(ps) => ps.map(render).mkString("all(", ",", ")")
    case AnyOf(ps) => ps.map(render).mkString("any(", ",", ")")
  }

  /** Deterministic structural rendering of a pushed source Filter — used as
    * the scan-equality key: a `sources.EqualTo(attr, Array[Byte])` compares
    * its array referentially, so two identical binary-literal filters would
    * otherwise never be equal and cache/exchange reuse would silently miss.
    */
  def renderFilter(f: Filter): String = {
    def v(x: Any): String = x match {
      case null => "null"
      case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
      case a: Array[_] => a.map(v).mkString("[", ",", "]")
      case s: Seq[_] => s.map(v).mkString("[", ",", "]")
      case other => String.valueOf(other)
    }
    f match {
      case And(l, r) => s"and(${renderFilter(l)},${renderFilter(r)})"
      case Or(l, r) => s"or(${renderFilter(l)},${renderFilter(r)})"
      case Not(c) => s"not(${renderFilter(c)})"
      case EqualTo(a, x) => s"eq($a,${v(x)})"
      case EqualNullSafe(a, x) => s"eqns($a,${v(x)})"
      case GreaterThan(a, x) => s"gt($a,${v(x)})"
      case GreaterThanOrEqual(a, x) => s"ge($a,${v(x)})"
      case LessThan(a, x) => s"lt($a,${v(x)})"
      case LessThanOrEqual(a, x) => s"le($a,${v(x)})"
      case In(a, xs) => s"in($a,${v(xs)})"
      case StringStartsWith(a, x) => s"sw($a,$x)"
      case StringEndsWith(a, x) => s"ew($a,$x)"
      case StringContains(a, x) => s"sc($a,$x)"
      case IsNull(a) => s"null($a)"
      case IsNotNull(a) => s"notnull($a)"
      case other => other.toString
    }
  }

  /** Restrict a predicate to the fields a given file carries. Conjunctions
    * keep every branch whose fields all resolve (sound: dropping an AND
    * branch only weakens pruning); disjunctions survive only if ALL branches
    * resolve (an unresolvable OR branch could match anything). Used by the
    * reader so a composite spanning a missing column still prunes on the
    * columns the file does have.
    */
  def restrict(p: PagePred, has: String => Boolean): Option[PagePred] = p match {
    case AllOf(ps) =>
      val kept = ps.flatMap(restrict(_, has))
      if (kept.isEmpty) None
      else if (kept.length == 1) Some(kept(0))
      else Some(AllOf(kept))
    case AnyOf(ps) =>
      val kept = ps.flatMap(restrict(_, has))
      if (kept.length == ps.length) Some(AnyOf(kept)) else None
    case leaf => if (leaf.fields.forall(has(_))) Some(leaf) else None
  }

  /** Compile the subset of `filters` usable for page pruning. Returned
    * filters are the ones reflected in pushedFilters() / explain output.
    * Recurses into And/Or/Not: an OR skips a page only when BOTH branches
    * skip it; a NOT is rewritten to the complementary comparison (sound under
    * SQL null semantics — null rows satisfy neither the filter nor its
    * complement, and all-null pages are handled by each leaf).
    */
  def compile(schema: StructType, filters: Array[Filter]): (Array[Filter], Array[PagePred]) = {
    val usable = Array.newBuilder[Filter]
    val preds = Array.newBuilder[PagePred]
    filters.foreach { f =>
      compileOne(schema, f) match {
        case Some(p) => usable += f; preds += p
        case None =>
      }
    }
    (usable.result(), preds.result())
  }

  /** Resolve a pushed-filter attribute to an atomic type: a top-level column
    * first (so a column literally named "a.b" wins), else a dotted path
    * through structs only — struct leaves stay row-aligned with the page
    * grid, which is what makes their zone maps usable; array/map paths
    * change cardinality and are rejected.
    */
  private[spark] def resolveAtomic(schema: StructType, name: String): Option[DataType] = {
    schema.fields.find(_.name == name).map(_.dataType).filter(GraftSchema.isAtomic) match {
      case some @ Some(_) => some
      case None if name.contains('.') =>
        var dt: DataType = schema
        name.split('.').foreach { p =>
          dt match {
            case st: StructType => st.fields.find(_.name == p) match {
              case Some(f) => dt = f.dataType
              case None => return None
            }
            case _ => return None
          }
        }
        Some(dt).filter(GraftSchema.isAtomic)
      case None => None
    }
  }

  private def compileOne(schema: StructType, filter: Filter): Option[PagePred] = {
    def fieldType(name: String): Option[DataType] = resolveAtomic(schema, name)

    def cmpPred(a: String, v: Any, op: Int): Option[PagePred] =
      fieldType(a).flatMap { dt =>
        toDomain(dt, v).map { case (k, d) => Cmp(a, k, op, d): PagePred }
          .orElse(toBinDomain(dt, v).map(b => CmpBin(a, op, b): PagePred))
      }

    filter match {
      case EqualTo(a, v) => cmpPred(a, v, 0)
      case GreaterThan(a, v) => cmpPred(a, v, 1)
      case GreaterThanOrEqual(a, v) => cmpPred(a, v, 2)
      case LessThan(a, v) => cmpPred(a, v, 3)
      case LessThanOrEqual(a, v) => cmpPred(a, v, 4)
      case StringStartsWith(a, v) => cmpPred(a, v, 5)
      case IsNotNull(a) if fieldType(a).isDefined => Some(AllNullSkip(a))
      // null-safe equality against a non-null literal selects exactly the
      // rows plain equality selects — same bounds predicate; <=> null can
      // only match rows inside pages that HAVE nulls
      case EqualNullSafe(a, v) if v != null => cmpPred(a, v, 0)
      case EqualNullSafe(a, null) if fieldType(a).isDefined => Some(NoNullSkip(a))
      case In(a, vs0) if vs0 != null && vs0.nonEmpty =>
        // a null probe can never select a row (x IN (null, ...) is null or
        // true, never true FOR the null element) — drop it rather than
        // refusing to push the whole set
        val vs = vs0.filter(_ != null)
        if (vs.isEmpty) return None
        // ≤64 values: exact per-value membership test against the bounds.
        // Larger sets (typical for runtime join-key filters): collapse to the
        // set's [min, max] envelope — O(1) per page instead of O(|set|),
        // still sound (a page outside the envelope contains no set member).
        fieldType(a).flatMap { dt =>
          val ds = vs.flatMap(v => toDomain(dt, v))
          val bs = vs.flatMap(v => toBinDomain(dt, v))
          if (ds.length == vs.length && ds.forall(_._1 == ds.head._1)) {
            val kind = ds.head._1
            if (kind == 1) {
              val ls = ds.map(_._2.swap.toOption.get)
              if (vs.length <= 64) Some(InSet(a, 1, ls, Array.empty))
              else Some(AllOf(Array(Cmp(a, 1, 2, Left(ls.min)), Cmp(a, 1, 4, Left(ls.max)))))
            } else {
              val xs = ds.map(_._2.toOption.get)
              if (vs.length <= 64) Some(InSet(a, 2, Array.empty, xs))
              else {
                // envelope over the FINITE probes only (a NaN probe would
                // poison min/max under IEEE ordering); a dropped NaN probe
                // still matches NaN-page rows, so the envelope is wrapped in
                // UnlessNanPage — NaN-bearing pages are never skipped
                val fin = xs.filter(x => !x.isNaN)
                if (fin.isEmpty) Some(OnlyNanMatches(a))
                else {
                  val env = AllOf(Array(
                    Cmp(a, 2, 2, Right(fin.min)), Cmp(a, 2, 4, Right(fin.max))))
                  if (fin.length < xs.length) Some(UnlessNanPage(a, env))
                  else Some(env)
                }
              }
            }
          } else if (bs.length == vs.length) {
            if (vs.length <= 64) Some(InSetBin(a, bs))
            else {
              val lo = bs.reduce((x, y) => if (cmpBytes(x, y) <= 0) x else y)
              val hi = bs.reduce((x, y) => if (cmpBytes(x, y) >= 0) x else y)
              Some(AllOf(Array(CmpBin(a, 2, lo), CmpBin(a, 4, hi))))
            }
          } else None
        }
      case And(l, r) =>
        // a partially-compilable AND still prunes on the compilable side
        (compileOne(schema, l), compileOne(schema, r)) match {
          case (Some(x), Some(y)) => Some(AllOf(Array(x, y)))
          case (x, y) => x.orElse(y)
        }
      case Or(l, r) =>
        // both branches must compile, else the OR as a whole can't prune
        for { x <- compileOne(schema, l); y <- compileOne(schema, r) }
          yield AnyOf(Array(x, y))
      case Not(EqualTo(a, v)) =>
        fieldType(a).flatMap(dt => toDomain(dt, v).map { case (k, d) => NotEq(a, k, d) })
      case Not(child) => invert(child).flatMap(compileOne(schema, _))
      case _ => None
    }
  }

  /** Complement of a filter under three-valued logic restricted to rows the
    * zone map reasons about. NaN-safe: Spark orders NaN above all doubles in
    * both the original and complementary comparison, and NaN pages
    * (statsKind 3) never skip >/>= or =, so the rewrite stays sound.
    */
  private def invert(f: Filter): Option[Filter] = f match {
    case e: EqualTo => Some(Not(e)) // compileOne's Not(EqualTo) case → NotEq
    case GreaterThan(a, v) => Some(LessThanOrEqual(a, v))
    case GreaterThanOrEqual(a, v) => Some(LessThan(a, v))
    case LessThan(a, v) => Some(GreaterThanOrEqual(a, v))
    case LessThanOrEqual(a, v) => Some(GreaterThan(a, v))
    case IsNull(a) => Some(IsNotNull(a))
    case Not(inner) => Some(inner)
    case Or(l, r) => for { il <- invert(l); ir <- invert(r) } yield And(il, ir)
    case And(l, r) => for { il <- invert(l); ir <- invert(r) } yield Or(il, ir)
    case _ => None
  }
}
