package graft.spec

/** Boolean SQL validator — behavior-compatible port of the reference's
  * `validators.SQLValidator.validate_sql` (reference: src/sous_chef/
  * validators.py:19-131), including its EXTRACT-aware FROM search and
  * alias-required rules. Kept verbatim-in-behavior for fixture replay;
  * the engine's real check is Catalyst analysis ([[CatalystInference]]).
  */
object LegacySqlValidator {

  def validateSql(query: String): Boolean =
    try {
      // join lines outside parens, stripping "--" comments per line
      val cleanQuery = {
        val sb = new StringBuilder
        val current = new StringBuilder
        var inParens = 0
        def flush(): Unit = {
          var line = current.toString
          val ci = line.indexOf("--")
          if (ci >= 0) line = line.substring(0, ci)
          if (line.trim.nonEmpty) { sb.append(" "); sb.append(line.trim) }
          current.clear()
        }
        query.foreach { ch =>
          if (ch == '(') inParens += 1
          else if (ch == ')') inParens -= 1
          if (ch == '\n' && inParens == 0) flush()
          else current.append(ch)
        }
        flush()
        sb.toString.trim
      }

      if (!cleanQuery.toUpperCase.startsWith("SELECT")) return false

      // find FROM not inside EXTRACT(...)
      val upper = cleanQuery.toUpperCase
      var inExtract = false
      var fromPos = -1
      var i = 0
      while (i < upper.length && fromPos == -1) {
        if (upper.startsWith("EXTRACT", i)) inExtract = true
        else if (upper.startsWith("FROM", i) && !inExtract) fromPos = i
        else if (upper.charAt(i) == ')') inExtract = false
        i += 1
      }
      if (fromPos == -1) return false

      val selectPart = cleanQuery.substring(6, fromPos).trim
      if (selectPart.isEmpty) return false

      // paren-aware column split
      val columns = scala.collection.mutable.ArrayBuffer[String]()
      val cur = new StringBuilder
      var parens = 0
      selectPart.foreach {
        case '(' => parens += 1; cur.append('(')
        case ')' => parens -= 1; cur.append(')')
        case ',' if parens == 0 =>
          if (cur.nonEmpty) { columns += cur.toString.trim; cur.clear() }
        case ch => cur.append(ch)
      }
      if (cur.nonEmpty) columns += cur.toString.trim

      columns.forall { raw =>
        val col = raw.trim.toUpperCase
        if (col.isEmpty) true
        else if (col.contains(" AS ")) true
        else if (col.forall(_.isLetterOrDigit) && col.nonEmpty) true
        else if (col.contains('.') && !col.endsWith(".") && col.split("\\.", -1).length == 2) true
        else if (col.endsWith(".") || col.contains('(') ||
          Seq("+", "-", "*", "/").exists(col.contains(_)) ||
          Seq("CASE", "EXTRACT").exists(col.contains(_))) false
        else true
      }
    } catch { case _: Exception => false }

  /** reference: validators.py:133-141 (validate_config). */
  def validateConfig(config: Map[String, Any]): Boolean =
    Seq("query", "timestamp_field", "database").forall(config.contains) &&
      validateSql(String.valueOf(config("query")))
}
