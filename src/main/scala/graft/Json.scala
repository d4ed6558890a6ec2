package graft

/** Minimal JSON string escaping shared by the Bench/Verify artifact
  * writers. Escapes backslash, quote, and ALL control chars (<0x20) —
  * Spark exception text routinely carries tabs, newlines, and ANSI
  * escape bytes, any of which would make the driver's json.load fail
  * and silently zero a round's artifact. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
