package graft.util

/** The repo's ONE JSON string escaper/decoder. Three hand-rolled copies
  * (spool adapter, Verify, source offsets) had drifted — the weakest
  * skipped control chars, which is exactly the class of byte that turns
  * a checkpoint or oracle file into unparseable JSON.
  */
object JsonStrings {

  /** `s` as a quoted JSON string literal: backslash, quote, and ALL
    * control chars (< 0x20) escaped.
    */
  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Inverse of [[quote]] over the UNQUOTED content: full JSON escape
    * semantics (spec escapes + \\uXXXX). Unknown escapes pass the
    * escaped char through (lenient — inputs here are self-written).
    */
  def unescape(content: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < content.length) {
      val c = content.charAt(i)
      if (c == '\\' && i + 1 < content.length) {
        content.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < content.length =>
            sb.append(Integer.parseInt(content.substring(i + 2, i + 6), 16)
              .toChar)
            i += 6
          case e => sb.append(e); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
