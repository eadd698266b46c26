package graft.spec

/** Structured validation error — the reference's CI contract
  * (reference: src/sous_chef/errors.py:4-10 `ValidationError{path, code,
  * message, context}`).
  *
  * @param path    JSON path to the error location (e.g.
  *                `feature_views.v1.tags`)
  * @param code    machine-readable code ([[ValidationCodes]])
  * @param message human-readable message — byte-identical to the legacy
  *                string contract so fixture-replay tests hold
  * @param context additional context key/values
  */
case class ValidationError(
    path: String,
    code: String,
    message: String,
    context: Map[String, String] = Map.empty) {

  def toDict: Map[String, Any] =
    Map("path" -> path, "code" -> code, "message" -> message, "context" -> context)
}

/** Machine-readable error codes. INVALID_SQL and MISSING_FIELD mirror
  * the reference enum (reference: validators.py:7-10
  * `ValidationErrorCode`); the rest are engine extensions for the tag /
  * reference checks the reference reports as bare strings.
  */
object ValidationCodes {
  val InvalidSql = "INVALID_SQL"
  val MissingField = "MISSING_FIELD"
  val UnsupportedTags = "UNSUPPORTED_TAGS"
  val MissingTags = "MISSING_TAGS"
  val InvalidType = "INVALID_TYPE"
  val UnknownReference = "UNKNOWN_REFERENCE"
  val EmptyList = "EMPTY_LIST"
}

/** Base engine exception carrying structured errors (reference:
  * errors.py:12-30 `SousChefError` + `to_dict`). Extends
  * IllegalArgumentException so the legacy message-string contract — and
  * every caller catching it — is preserved.
  */
class GraftError(
    message: String,
    val errors: Seq[ValidationError] = Nil) extends IllegalArgumentException(message) {

  /** CI-friendly dictionary shape (reference: errors.py:18-30). */
  def toDict: Map[String, Any] =
    Map("message" -> message, "errors" -> errors.map(_.toDict))

  /** CI-friendly JSON rendering of [[toDict]]. */
  def toJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val errJson = errors.map { e =>
      val ctx = e.context.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
        .mkString("{", ", ", "}")
      s"""{"path": "${esc(e.path)}", "code": "${esc(e.code)}", """ +
        s""""message": "${esc(e.message)}", "context": $ctx}"""
    }.mkString("[", ", ", "]")
    s"""{"message": "${esc(message)}", "errors": $errJson}"""
  }
}
