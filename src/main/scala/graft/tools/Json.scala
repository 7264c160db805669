package graft.tools

/** Minimal JSON string escaping for the driver-facing artifacts
  * (`oracle_sql.json`, the bench line). A malformed escape here makes the
  * driver's `json.load` fail and silently zeroes the round's correctness —
  * hence the dedicated unit test. */
object Json {
  /** Quote + escape: backslash, quote, and ALL control chars (<0x20). */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def obj(fields: Iterable[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}
