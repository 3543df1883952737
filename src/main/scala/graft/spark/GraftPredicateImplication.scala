package graft.spark

import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Extract, GeneralScalarExpression, Literal => V2Lit, NamedReference, Cast => V2Cast}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Sound IMPLIED v1 filters for expression-shaped V2 predicates that the
  * direct v1 translation cannot carry — the payoff of the V2 pushdown
  * lane. Each mapping derives a strictly WEAKER condition on the base
  * column (every row matching the predicate satisfies it), so feeding it
  * to zone maps and partition-directory pruning can only skip data the
  * query could never return; the original predicate always re-applies
  * row-level above the scan.
  *
  * Mappings (base column must be a top-level schema column):
  *
  *   - `EXTRACT(YEAR FROM CAST(ts AS date)) ⋈ Y` (what `year(ts) = 2023`
  *     plans to): the year is monotonic in ts, so Y compiles to the
  *     [year-start, next-year-start) timestamp range in the PLAN-TIME
  *     session zone — exactly the zone the residual filter evaluates
  *     under. Works on DATE columns directly too. The single most common
  *     expression predicate on event tables, and on a days(ts)/months(ts)
  *     layout the implied range prunes whole directories.
  *   - `SUBSTRING(s, 1, n) = 'p'` ⟹ s starts with p (a short s must
  *     EQUAL p; a long one must start with it). `>=`/`>` imply s >= p
  *     (a string is >= its own prefix). `<`/`<=` are not implied (the
  *     tail of s can exceed the prefix bound) and map to nothing.
  *   - `ABS(k) < c` ⟹ -c < k < c (similarly `<=`); `ABS(k) = c` ⟹
  *     k IN (-c, c); `ABS(k) > c` ⟹ k < -c OR k > c.
  *
  * Everything unrecognized maps to Nil — never wrong, just unpruned.
  */
object GraftPredicateImplication {

  def implied(p: Predicate, schema: StructType): Seq[Filter] = {
    val out = compile(p, schema)
    out.getOrElse(Nil)
  }

  private def colOf(e: V2Expr): Option[String] = e match {
    case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames.head)
    case _ => None
  }

  private def litVal(e: V2Expr): Option[Any] = e match {
    case l: V2Lit[_] => Option(l.value)
    case _ => None
  }

  private def fieldType(schema: StructType, name: String): Option[DataType] =
    schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)

  /** The `col#month` / `col#day` MARKER attribute a calendar-field
    * predicate compiles to: not a schema column — PartitionPrune resolves
    * it against the declared time transforms (months/days/hours dirs
    * carry the field), every other consumer fails to resolve it and
    * conservatively ignores it. This is what carries `month(ts) = 3`
    * (periodic — no base-column range exists) to directory pruning. */
  private def fieldAttr(e: V2Expr, schema: StructType): Option[String] = e match {
    case ex: Extract =>
      val f = ex.field.toUpperCase match {
        case "MONTH" | "MONTHS" | "MON" | "MONS" => Some("month")
        case "DAY" | "DAYS" => Some("day")
        case "HOUR" | "HOURS" => Some("hour") // hour(ts): no date cast
        case _ => scala.None
      }
      val srcCol = ex.source() match {
        case c: V2Cast if c.dataType() == DateType => colOf(c.expression())
        case other => colOf(other)
      }
      for {
        fld <- f
        name <- srcCol
        dt <- fieldType(schema, name)
        if dt == DateType || dt == TimestampType || dt == TimestampNTZType
      } yield s"$name#$fld"
    case _ => scala.None
  }

  private def intOf(v: Any): Option[Integer] = v match {
    case i: java.lang.Integer => Some(i)
    case l: java.lang.Long => Some(Integer.valueOf(l.toInt))
    case s: java.lang.Short => Some(Integer.valueOf(s.toInt))
    case b: java.lang.Byte => Some(Integer.valueOf(b.toInt))
    case _ => scala.None
  }

  private def compile(p: Predicate, schema: StructType): Option[Seq[Filter]] = {
    val op = p.name()
    val ch = p.children()
    // EXTRACT(MONTH/DAY ...) IN (v, ...): candidates vs the dir's field set
    if (op == "IN" && ch.length >= 2) {
      return for {
        attr <- fieldAttr(ch(0), schema)
        vs <- { val lits = ch.drop(1).toSeq.map(litVal(_).flatMap(intOf))
                if (lits.forall(_.isDefined)) Some(lits.flatten) else scala.None }
      } yield Seq(In(attr, vs.toArray[Any]))
    }
    if (!Set("=", ">", ">=", "<", "<=").contains(op) || ch.length != 2)
      return None
    // normalize to (expr ⋈ literal); flip the op when the literal is left
    val (lhs, rhs, theOp) = (ch(0), ch(1)) match {
      case (l, r) if litVal(r).isDefined => (l, r, op)
      case (l, r) if litVal(l).isDefined =>
        val flipped = op match {
          case ">" => "<"; case ">=" => "<="; case "<" => ">"
          case "<=" => ">="; case o => o
        }
        (r, l, flipped)
      case _ => return None
    }
    val v = litVal(rhs).get
    fieldAttr(lhs, schema).foreach { attr =>
      intOf(v).foreach { iv =>
        return Some(Seq(theOp match {
          case "=" => EqualTo(attr, iv)
          case ">" => GreaterThan(attr, iv)
          case ">=" => GreaterThanOrEqual(attr, iv)
          case "<" => LessThan(attr, iv)
          case _ => LessThanOrEqual(attr, iv)
        }))
      }
    }
    lhs match {
      // EXTRACT(YEAR FROM CAST(col AS date)) / EXTRACT(YEAR FROM dateCol)
      case ex: Extract if ex.field.equalsIgnoreCase("YEAR") ||
          ex.field.equalsIgnoreCase("YEARS") =>
        val srcCol = ex.source() match {
          case c: V2Cast if c.dataType() == DateType => colOf(c.expression())
          case other => colOf(other)
        }
        for {
          name <- srcCol
          dt <- fieldType(schema, name)
          y <- v match {
            case i: java.lang.Integer => Some(i.intValue)
            case l: java.lang.Long => Some(l.toInt)
            case _ => scala.None
          }
          fs <- yearRange(name, dt, y, theOp)
        } yield fs
      // SUBSTRING(col, 1, n)
      case g: GeneralScalarExpression
          if g.name.equalsIgnoreCase("SUBSTRING") && g.children().length >= 2 &&
            litVal(g.children()(1)).contains(1) =>
        for {
          name <- colOf(g.children()(0))
          dt <- fieldType(schema, name) if dt == StringType
          s <- v match { case s: String => Some(s)
            case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
            case _ => scala.None }
          fs <- theOp match {
            case "=" => Some(Seq(StringStartsWith(name, s)))
            case ">" | ">=" => Some(Seq(GreaterThanOrEqual(name, s)))
            case _ => scala.None
          }
        } yield fs
      // ABS(col) — non-finite literals opt out (Spark treats NaN = NaN as
      // true; a NaN probe through the zone-map In/Cmp machinery is not a
      // soundness bet worth making for a predicate nobody prunes on)
      case g: GeneralScalarExpression
          if g.name.equalsIgnoreCase("ABS") && g.children().length == 1 &&
            (v match {
              case d: java.lang.Double => !d.isNaN && !d.isInfinite
              case f: java.lang.Float => !f.isNaN && !f.isInfinite
              case _ => true
            }) =>
        for {
          name <- colOf(g.children()(0))
          dt <- fieldType(schema, name)
          neg <- negate(v)
          fs <- theOp match {
            case "<" => Some(Seq(GreaterThan(name, neg), LessThan(name, v)))
            case "<=" => Some(Seq(GreaterThanOrEqual(name, neg), LessThanOrEqual(name, v)))
            case "=" => Some(Seq(In(name, Array(neg, v))))
            case ">" => Some(Seq(Or(LessThan(name, neg), GreaterThan(name, v))))
            case ">=" => Some(Seq(Or(LessThanOrEqual(name, neg), GreaterThanOrEqual(name, v))))
            case _ => scala.None
          }
        } yield fs
      case _ => None
    }
  }

  private def negate(v: Any): Option[Any] = v match {
    case b: java.lang.Byte => Some(java.lang.Byte.valueOf((-b.byteValue).toByte))
    case s: java.lang.Short => Some(java.lang.Short.valueOf((-s.shortValue).toShort))
    case i: java.lang.Integer => Some(java.lang.Integer.valueOf(-i.intValue))
    case l: java.lang.Long => Some(java.lang.Long.valueOf(-l.longValue))
    case f: java.lang.Float => Some(java.lang.Float.valueOf(-f.floatValue))
    case d: java.lang.Double => Some(java.lang.Double.valueOf(-d.doubleValue))
    case d: java.math.BigDecimal => Some(d.negate())
    case d: org.apache.spark.sql.types.Decimal => Some(d.unary_-)
    case _ => scala.None
  }

  /** ts/date range implied by `year(col) theOp y`, in the plan-time
    * session zone (what the residual filter evaluates under). */
  private def yearRange(name: String, dt: DataType, y: Int,
      theOp: String): Option[Seq[Filter]] = {
    // sane year window keeps the LocalDate/ZonedDateTime math total
    if (y < 1 || y > 9998) return scala.None
    dt match {
      case DateType =>
        def d(yy: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(yy, 1, 1))
        theOp match {
          case "=" => Some(Seq(GreaterThanOrEqual(name, d(y)), LessThan(name, d(y + 1))))
          case ">=" => Some(Seq(GreaterThanOrEqual(name, d(y))))
          case ">" => Some(Seq(GreaterThanOrEqual(name, d(y + 1))))
          case "<" => Some(Seq(LessThan(name, d(y))))
          case "<=" => Some(Seq(LessThan(name, d(y + 1))))
          case _ => scala.None
        }
      case TimestampType =>
        val zone = java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        def t(yy: Int) = java.sql.Timestamp.from(
          java.time.ZonedDateTime.of(yy, 1, 1, 0, 0, 0, 0, zone).toInstant)
        theOp match {
          case "=" => Some(Seq(GreaterThanOrEqual(name, t(y)), LessThan(name, t(y + 1))))
          case ">=" => Some(Seq(GreaterThanOrEqual(name, t(y))))
          case ">" => Some(Seq(GreaterThanOrEqual(name, t(y + 1))))
          case "<" => Some(Seq(LessThan(name, t(y))))
          case "<=" => Some(Seq(LessThan(name, t(y + 1))))
          case _ => scala.None
        }
      case _ => scala.None // NTZ externals need LocalDateTime plumbing; skip
    }
  }
}
