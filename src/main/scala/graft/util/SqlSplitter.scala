package graft.util

/** Split a SQL script into individual statements, respecting quoted
  * strings, identifiers and comments.
  *
  * Capability parity with the reference's SQL-file splitter
  * (`lakehouse_engine/utils/sql_parser_utils.py:9-191`): the delimiter
  * (';' by default, configurable — the reference accepts e.g. '===') only
  * terminates a statement when outside single/double quotes, backticks,
  * line comments (`--`) and block comments. */
object SqlSplitter {

  def split(sql: String, delimiter: String = ";"): Seq[String] = {
    require(delimiter.nonEmpty, "sql delimiter must be non-empty")
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var state: Char = 'n' // n=normal, '=single, "=double, `=backtick, l=line comment, b=block comment
    while (i < sql.length) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else '\u0000'
      state match {
        case 'n' =>
          if (c == '\'' ) { state = '\''; cur += c }
          else if (c == '"') { state = '"'; cur += c }
          else if (c == '`') { state = '`'; cur += c }
          else if (c == '-' && next == '-') { state = 'l'; cur += c }
          else if (c == '/' && next == '*') { state = 'b'; cur += c }
          else if (c == delimiter.head &&
              sql.regionMatches(i, delimiter, 0, delimiter.length)) {
            out += cur.toString; cur.clear(); i += delimiter.length - 1
          }
          else cur += c
        // inside string literals, a backslash escapes the next character
        // (Spark's default non-escapedStringLiterals mode) and doubled
        // quotes escape themselves — neither may close the literal
        case '\'' =>
          cur += c
          if (c == '\\' && i + 1 < sql.length) { cur += next; i += 1 }
          else if (c == '\'' && next == '\'') { cur += next; i += 1 }
          else if (c == '\'') state = 'n'
        case '"' =>
          cur += c
          if (c == '\\' && i + 1 < sql.length) { cur += next; i += 1 }
          else if (c == '"' && next == '"') { cur += next; i += 1 }
          else if (c == '"') state = 'n'
        case '`' => cur += c; if (c == '`') state = 'n'
        case 'l' => cur += c; if (c == '\n') state = 'n'
        case 'b' =>
          cur += c
          if (c == '*' && next == '/') { cur += next; i += 1; state = 'n' }
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
