package graft

/** Minimal JSON string emission shared by [[Bench]] and [[Verify]].
  *
  * Both mains hand-assemble one-line JSON (no JSON library in the
  * dependency budget), and both embed builder-authored SQL or exception
  * messages — strings that routinely contain newlines, tabs, and other
  * control characters. A raw control char inside a JSON string literal is
  * invalid JSON and silently corrupts the driver's parse (the exact
  * failure mode this repo hit twice with truncated/miswrapped output), so
  * escaping lives here once instead of drifting between the two mains.
  */
private[graft] object Jsons {

  /** Escape + quote `s` as a JSON string literal: backslash, quote, and
    * ALL control chars below 0x20 (`\n`/`\r`/`\t` named, the rest as
    * `\u00XX`).
    */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Truncate to at most `n` chars WITHOUT splitting a surrogate pair —
    * `String.take` can cut between a high and low surrogate, leaving a
    * lone surrogate that is itself malformed content for downstream
    * consumers.
    */
  def truncAtCodePoint(s: String, n: Int): String =
    if (s.length <= n) s
    else if (Character.isHighSurrogate(s.charAt(n - 1))) s.substring(0, n - 1)
    else s.substring(0, n)
}
