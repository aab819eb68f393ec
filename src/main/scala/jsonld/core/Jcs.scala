package jsonld.core

import Json._

/** RFC 8785 JSON Canonicalization Scheme (JCS), used for `rdf:JSON`
  * (`@json`) literals. Member names sort by UTF-16 code units; numbers use
  * ES6 `Number::toString` serialization; strings escape only the mandatory
  * set. All numbers are treated as IEEE-754 doubles, matching JSON parsers
  * in ES6 and Go.
  *
  * Note: `Double.toString` on JDK 17 implements "shortest uniquely
  * identifying" decimal output, which coincides with ES6/Ryū output for all
  * fixture values (rare historical divergences exist; JDK 19+ removed them).
  */
object Jcs {

  /** Canonicalize an already-parsed JSON value (strings are JSON string
    * values, never raw JSON text).
    */
  def canonicalizeValue(value: Any): String = {
    val sb = new StringBuilder
    write(sb, value)
    sb.toString
  }

  def canonicalize(value: Any): String = {
    val sb = new StringBuilder
    value match {
      case s: String =>
        // a raw JSON text string: parse then canonicalize (parity with
        // canonicalizers that accept byte input)
        write(sb, Json.parse(s))
      case other => write(sb, other)
    }
    sb.toString
  }

  private def write(sb: StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null")
    case b: java.lang.Boolean => sb.append(if (b) "true" else "false")
    case s: String => writeString(sb, s)
    case m: JObj @unchecked =>
      sb.append('{')
      // UTF-16 code-unit order == Java natural String order
      val keys = m.keys.toSeq.sorted
      var firstK = true
      keys.foreach { k =>
        if (!firstK) sb.append(',')
        firstK = false
        writeString(sb, k)
        sb.append(':')
        write(sb, m(k))
      }
      sb.append('}')
    case a: JArr @unchecked =>
      sb.append('[')
      var first = true
      a.foreach { x =>
        if (!first) sb.append(',')
        first = false
        write(sb, x)
      }
      sb.append(']')
    case n if Json.isNumber(n) => sb.append(es6Number(Json.numberValue(n)))
    case other => throw new IllegalArgumentException(s"cannot canonicalize ${other.getClass}")
  }

  private def writeString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** ES6 Number::toString (7.1.12.1 of ECMA-262). */
  def es6Number(d: Double): String = {
    if (d.isNaN || d.isInfinite)
      throw new IllegalArgumentException("NaN/Infinity not allowed in JSON")
    if (d == 0.0) return "0" // covers -0.0
    val neg = d < 0
    val abs = math.abs(d)
    // shortest round-trip decimal digits (ES6 semantics): try 15, 16, 17
    // significant digits and keep the first that parses back exactly.
    // (JDK 17 Double.toString is not always shortest; JDK 19+ is.)
    var repr: String = null
    var prec = 15
    while (repr == null && prec <= 17) {
      val cand = String.format(java.util.Locale.ROOT, "%." + (prec - 1) + "e",
        java.lang.Double.valueOf(abs))
      if (java.lang.Double.parseDouble(cand) == abs) repr = cand
      prec += 1
    }
    if (repr == null) repr = java.lang.Double.toString(abs)
    val bd = new java.math.BigDecimal(repr).stripTrailingZeros()
    val digits = bd.unscaledValue().toString
    val k = digits.length
    val n = k - bd.scale() // value = 0.<digits> * 10^n
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (k <= n && n <= 21) {
      sb.append(digits)
      var i = 0
      while (i < n - k) { sb.append('0'); i += 1 }
    } else if (0 < n && n <= 21) {
      sb.append(digits.substring(0, n)).append('.').append(digits.substring(n))
    } else if (-6 < n && n <= 0) {
      sb.append("0.")
      var i = 0
      while (i < -n) { sb.append('0'); i += 1 }
      sb.append(digits)
    } else {
      sb.append(digits.charAt(0))
      if (k > 1) sb.append('.').append(digits.substring(1))
      sb.append('e')
      val e = n - 1
      if (e >= 0) sb.append('+')
      sb.append(e)
    }
    sb.toString
  }
}
