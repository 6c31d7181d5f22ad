package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `json_long(json, 'key')` — the integer
  * value of a top-level JSON object member as a LONG, equal to
  * `TRY_CAST(get_json_object(json, '$.key') AS BIGINT)` (first
  * NON-NULL-valued occurrence on duplicate keys — a `"k": null` member
  * does not settle the lookup, matching Jackson's write-nothing path
  * evaluation; NULL on absent key / corrupt JSON / non-integer value —
  * the p5 reject-unparseable semantics; try_cast because ANSI CAST
  * throws on the non-integer images this returns NULL for).
  *
  * Why native: `get_json_object` runs a full Jackson tokenizer per row —
  * object mapper state, token events, a string materialization, then a
  * cast re-parse. For the single-scalar probe a validity gate needs, that
  * is ~all waste: this expression walks the UTF8 bytes once, skipping
  * non-matching members structurally (strings with escapes, nested
  * objects/arrays by depth, literals, numbers) and parsing the matched
  * integer in place — no allocation, no boxing on the hot path, inside
  * whole-stage codegen. Measured on p5 at sf5 (5M events):
  * get_json_object 4.5s / from_json(pruned) 2.3s / this 0.6s, against
  * DuckDB's 0.93s — the per-byte JSON term the r11 verdict priced now
  * favors Spark. The DuckDB oracle keeps replaying
  * `CAST(json_extract_string(..) AS BIGINT)` — values equal by
  * construction, every query stays hash-exact (JsonGetLongSpec pins
  * parity against get_json_object across the adversarial shapes:
  * escapes, nesting, key-lookalike payloads, duplicates, overflow).
  */
case class JsonGetLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_long requires (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_long"

  protected override def nullSafeEval(json: Any, key: Any): Any =
    JsonGetLong.evalJsonLong(
      json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, k) => {
      val tmp = ctx.freshName("jsonLong")
      s"""
         |java.lang.Long $tmp = graft.plans.JsonGetLong.evalJsonLong($j, $k);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonGetLong =
    copy(left = newLeft, right = newRight)
}

object JsonGetLong {

  /** Single-pass scan. Returns null (boxed) for: not a top-level object,
    * absent key, corrupt JSON, non-integer value, long overflow — each a
    * case where `CAST(get_json_object(..) AS BIGINT)` is also NULL. */
  def evalJsonLong(json: UTF8String, key: UTF8String): java.lang.Long = {
    val b = json.getBytes
    val kb = key.getBytes
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      i = skipWs(b, i, n)
      if (i < n && b(i) == '}') return null // key absent
      if (!first) {
        if (i >= n || b(i) != ',') return null
        i = skipWs(b, i + 1, n)
      }
      first = false
      // member key
      if (i >= n || b(i) != '"') return null
      val keyStart = i + 1
      i = skipString(b, i, n)
      if (i < 0) return null
      val keyEnd = i - 1 // position of closing quote
      i = skipWs(b, i, n)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1, n)
      if (i >= n) return null
      val matches = keyEnd - keyStart == kb.length && {
        var j = 0
        var eq = true
        while (eq && j < kb.length) {
          // an escaped key never byte-equals an unescaped probe; a false
          // negative there matches Jackson only for keys that NEED no
          // escape, which is the documented contract (plain identifiers)
          if (b(keyStart + j) != kb(j)) eq = false
          j += 1
        }
        eq
      }
      // a matched member whose value is the JSON null literal does NOT
      // settle the lookup: Jackson's path evaluation writes nothing for
      // it and a later duplicate still matches (found by the randomized
      // parity property — {"k": null, "k": 7} is 7 under
      // get_json_object). Any other matched value decides, integer or
      // not.
      val isNullLit = i + 3 < n && b(i) == 'n' && b(i + 1) == 'u' &&
        b(i + 2) == 'l' && b(i + 3) == 'l'
      if (matches && !isNullLit) return parseLongValue(b, i, n)
      i = skipValue(b, i, n)
      if (i < 0) return null
    }
    null
  }

  private def skipWs(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  /** From the opening quote past the closing quote; -1 if unterminated. */
  private def skipString(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start + 1
    while (i < n) {
      if (b(i) == '\\') i += 2
      else if (b(i) == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Past one JSON value of any type; -1 on corrupt input. */
  private def skipValue(b: Array[Byte], start: Int, n: Int): Int = {
    if (start >= n) return -1
    b(start) match {
      case '"' => skipString(b, start, n)
      case '{' | '[' =>
        var depth = 0
        var i = start
        while (i < n) {
          b(i) match {
            case '"' =>
              i = skipString(b, i, n)
              if (i < 0) return -1
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      case _ =>
        // number / true / false / null: run to the next delimiter
        var i = start
        while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
        if (i == start) -1 else i
    }
  }

  /** The matched member's value as a long: a bare or quoted integer
    * (optionally negative); anything else — float, exponent, literal,
    * structure, overflow — is null, as its string image would not survive
    * CAST(.. AS BIGINT). */
  private def parseLongValue(b: Array[Byte], start: Int, n: Int): java.lang.Long = {
    var i = start
    var quoted = false
    if (i < n && b(i) == '"') { quoted = true; i += 1 }
    var neg = false
    if (i < n && b(i) == '-') { neg = true; i += 1 }
    if (i >= n || b(i) < '0' || b(i) > '9') return null
    // negative accumulation: |Long.MinValue| > Long.MaxValue, so this is
    // the only orientation that parses the full domain edge-exactly
    var acc = 0L
    while (i < n && b(i) >= '0' && b(i) <= '9') {
      val d = b(i) - '0'
      if (acc < (Long.MinValue + d) / 10) return null // overflow -> null
      acc = acc * 10 - d
      i += 1
    }
    if (quoted) {
      if (i >= n || b(i) != '"') return null
      i += 1
    }
    // the value must END here (else it was 1.5, 1e3, 12abc, ...)
    i = skipWs(b, i, n)
    if (i < n && b(i) != ',' && b(i) != '}') return null
    if (neg) acc
    else if (acc == Long.MinValue) null // +9223372036854775808 overflows
    else -acc
  }

  private val builder = (exprs: Seq[Expression]) =>
    JsonGetLong(exprs.head, exprs(1))

  /** Runtime registration (idempotent) — usable on any session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_long", builder, "internal")

  private[plans] def injection = ((
    org.apache.spark.sql.catalyst.FunctionIdentifier("json_long"),
    new ExpressionInfo(classOf[JsonGetLong].getName, "json_long"),
    builder))
}
