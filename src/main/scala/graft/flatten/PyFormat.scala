package graft.flatten

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import graft.CatalystBridge

/** Python-exact value rendering (SURVEY.md §7.4).
  *
  * The reference stringifies every cell with Python semantics
  * [`ElasticSearch ETL.py:131-151`]: `None -> ''`, `bool -> 'True'/'False'`,
  * `dict/list -> json.dumps(v)` (comma-space separators, lowercase
  * true/false/null inside JSON), everything else `str(v)`.
  *
  * `str(float)` differs from Java's `Double.toString` in its scientific-
  * notation thresholds (Python: plain decimal for 1e-4 <= |x| < 1e16; Java
  * switches at 1e-3/1e7), so doubles go through [[pyRepr]], exposed to
  * Catalyst as a codegen-friendly `StaticInvoke` (a static JVM call inside
  * whole-stage codegen — no UDF serialization, no interpretation).
  */
object PyFormat {

  /** Python `repr(double)` (shortest round-trip digits, Python's exp
    * thresholds and `e+XX`/`e-XX` exponent shape). Public static — invoked
    * from generated code via StaticInvoke.
    */
  def pyRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    val abs = math.abs(d)
    // Java's Double.toString already emits shortest round-trip digits; we
    // re-shape them to Python's fixed/exponential split.
    val jstr = java.lang.Double.toString(d) // e.g. "1.23456789E7"
    val (mantissa: String, exp: Int) = jstr.indexOf('E') match {
      case -1 => (jstr, 0)
      case i  => (jstr.substring(0, i), jstr.substring(i + 1).toInt)
    }
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    if (abs >= 1e16 || abs < 1e-4) {
      // Python exponential form: mantissa 'e' sign two-digit-min exponent,
      // and a bare integer mantissa (1e+16, not 1.0e+16).
      val neg = mantissa.startsWith("-")
      val digits = mantissa.stripPrefix("-").replace(".", "")
        .reverse.dropWhile(_ == '0').reverse match {
        case "" => "0"
        case s  => s
      }
      // normalize: first digit, then optional .rest ; exponent adjusts
      val pointPos = mantissa.stripPrefix("-").indexOf('.') match {
        case -1 => mantissa.stripPrefix("-").length
        case p  => p
      }
      val e10 = exp + pointPos - 1
      val head = digits.substring(0, 1)
      val rest = digits.substring(1)
      val m = if (rest.isEmpty) head else s"$head.$rest"
      val sign = if (e10 < 0) "-" else "+"
      f"${if (neg) "-" else ""}$m%se$sign%s${math.abs(e10)}%02d"
    } else if (exp == 0) {
      jstr // already plain decimal, matches Python in this range
    } else {
      // Java chose scientific but Python wants plain decimal: expand.
      java.math.BigDecimal.valueOf(d).stripTrailingZeros.toPlainString match {
        case s if s.contains('.') => s
        case s                    => s + ".0"
      }
    }
  }

  /** [[pyRepr]] boxed as Spark's internal string type — StaticInvoke with a
    * StringType result contract must produce UTF8String.
    */
  def pyReprUtf8(d: Double): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(pyRepr(d))

  /** `pyRepr` as a Column (codegen'd static call). */
  def pyDoubleStr(c: Column): Column = CatalystBridge.column(
    StaticInvoke(
      PyFormat.getClass, StringType, "pyReprUtf8",
      Seq(CatalystBridge.expression(c)), Seq(DoubleType),
      returnNullable = false))

  /** Python `str(v)` for a scalar column: '' for null, True/False for
    * booleans, pyRepr for doubles, plain cast otherwise.
    */
  def pyStr(c: Column, dt: DataType): Column = dt match {
    case BooleanType =>
      when(c.isNull, "").when(c, "True").otherwise("False")
    case DoubleType | FloatType =>
      coalesce(when(c.isNotNull, pyDoubleStr(c.cast(DoubleType))), lit(""))
    case StringType => coalesce(c, lit(""))
    case _          => coalesce(c.cast(StringType), lit(""))
  }

  /** JSON string escaping per Python `json.dumps` defaults (ensure_ascii
    * escapes are omitted — inputs here are the reference's ASCII corpora;
    * quotes/backslashes/control chars are the observable cases).
    */
  private def jsonEscape(c: Column): Column = {
    val esc = regexp_replace(
      regexp_replace(c, "\\\\", "\\\\\\\\"),
      "\"", "\\\\\"")
    val ctl = regexp_replace(
      regexp_replace(regexp_replace(esc, "\n", "\\\\n"), "\r", "\\\\r"),
      "\t", "\\\\t")
    ctl
  }

  /** Python `json.dumps(scalar)` rendering INSIDE a JSON document:
    * lowercase true/false/null, quoted+escaped strings, pyRepr doubles.
    */
  def pyJsonScalar(c: Column, dt: DataType): Column = dt match {
    case BooleanType =>
      when(c.isNull, "null").when(c, "true").otherwise("false")
    case DoubleType | FloatType =>
      coalesce(when(c.isNotNull, pyDoubleStr(c.cast(DoubleType))), lit("null"))
    case StringType =>
      when(c.isNull, "null")
        .otherwise(concat(lit("\""), jsonEscape(c), lit("\"")))
    case _ => coalesce(c.cast(StringType), lit("null"))
  }

  /** Python `json.dumps(value)` for arbitrarily nested arrays/scalars —
    * `[1000.0]`, `["S9290", "M4833"]`, `[]` — with json.dumps' default
    * `", "` item separator [`ElasticSearch ETL.py:134-135` renders arrays of
    * primitives this way]. Structs fall back to Spark `to_json` (null fields
    * dropped, compact separators) — only reachable via max_depth truncation.
    */
  def pyJson(c: Column, dt: DataType): Column = dt match {
    case ArrayType(et, _) =>
      when(c.isNull, "null").otherwise(
        concat(lit("["),
          array_join(transform(c, x => pyJson(x, et)), ", ", "null"),
          lit("]")))
    case _: StructType => when(c.isNull, "null").otherwise(to_json(c))
    case _             => pyJsonScalar(c, dt)
  }
}
