package graft.spec

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** SQL feature-transform validation + schema inference (SURVEY.md §2.8
  * M1-M6).
  *
  * Two layers:
  *  - [[SqlSource]] — behavior-compatible port of the reference's
  *    text-based validator/inferrer (reference: src/sous_chef/
  *    sql_sources.py:8-219), including its strict-mode rules (no CTEs,
  *    no `SELECT *`, unaliased expressions dropped from the schema) and
  *    its 3-type surface {INT64, FLOAT, STRING}. Used for fixture-replay
  *    parity.
  *  - [[CatalystInference]] — the native improvement: schemas come from
  *    Catalyst's analyzed plan, not string parsing, then map onto the
  *    same 3-type surface at the spec boundary.
  */
class SqlSource {

  /** reference: sql_sources.py:8-50 (_validate_format) */
  def validateFormat(queryIn: String): Seq[String] = {
    val query0 = queryIn.trim
    if (Seq(';', '`', '|').exists(query0.contains(_)))
      throw new IllegalArgumentException("Invalid SELECT statement")
    val query1 =
      if (!query0.contains('\n') && query0.contains(','))
        query0.split(",", -1).mkString("\n")
      else query0
    if (query1.toUpperCase.startsWith("WITH"))
      throw new IllegalArgumentException("CTEs (WITH clauses) are not supported")

    val cleanLines = query1.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    if (cleanLines.isEmpty) throw new IllegalArgumentException("Empty query")

    var selectLine = -1
    var fromLine = -1
    var i = 0
    while (i < cleanLines.length && fromLine == -1) {
      val u = cleanLines(i).toUpperCase
      if (u.startsWith("SELECT") && selectLine == -1) selectLine = i
      else if (u.startsWith("FROM")) fromLine = i
      i += 1
    }
    if (selectLine == -1) throw new IllegalArgumentException("Query must start with SELECT")
    if (fromLine == -1) throw new IllegalArgumentException("Query must contain FROM clause")
    cleanLines.slice(selectLine, fromLine)
  }

  /** reference: sql_sources.py:52-65 (validate_query) */
  def validateQuery(query: String): Boolean =
    try {
      if (query.contains('*')) return false
      if (query.toUpperCase.contains("WITH")) return false
      val lines = validateFormat(query)
      val selectPart = extractSelect(lines)
      selectPart.nonEmpty && splitColumns(selectPart).nonEmpty
    } catch { case _: Exception => false }

  /** Structured form of [[validateQuery]] — emits the reference enum's
    * INVALID_SQL code (reference: validators.py:7-10) with the specific
    * format failure as the message when one is identifiable. */
  def validateQueryStructured(
      query: String,
      path: String = "query"): Seq[ValidationError] =
    if (validateQuery(query)) Nil
    else {
      val detail =
        try {
          if (query.contains('*')) "SELECT * is not supported"
          else if (query.toUpperCase.contains("WITH"))
            "CTEs (WITH clauses) are not supported"
          else { validateFormat(query); "Query has no parseable columns" }
        } catch { case e: Exception => String.valueOf(e.getMessage) }
      Seq(ValidationError(path, ValidationCodes.InvalidSql, detail,
        Map("query" -> query.take(200))))
    }

  /** reference: sql_sources.py:67-75 (_extract_select) */
  def extractSelect(lines: Seq[String]): String =
    lines.map { line =>
      if (line.toUpperCase.startsWith("SELECT")) line.drop(6).trim else line
    }.mkString(" ").trim

  /** Paren- and CASE-aware column splitting (reference: sql_sources.py:
    * 89-125 _split_columns). */
  def splitColumns(selectPart: String): Seq[String] = {
    val normalized = selectPart.split("\\s+").mkString(" ")
    val columns = ArrayBuffer[String]()
    val current = new StringBuilder
    var parens = 0
    var inCase = false
    normalized.foreach {
      case '(' => parens += 1; current.append('(')
      case ')' => parens -= 1; current.append(')')
      case ',' if parens == 0 && !inCase =>
        val c = current.toString.trim
        if (c.nonEmpty) columns += c
        current.clear()
      case ch if ch.isWhitespace && current.isEmpty => // skip leading ws
      case ch =>
        val soFar = current.toString.toUpperCase
        if (soFar.contains("CASE")) inCase = true
        if (inCase && soFar.contains("END")) inCase = false
        current.append(ch)
    }
    val last = current.toString.trim
    if (last.nonEmpty) columns += last
    columns.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Column → (Option[name], expr) (reference: sql_sources.py:127-146
    * _parse_column). Unaliased expressions return None and are DROPPED
    * from the inferred schema (asserted by tests/test_sql_sources.py:
    * 74-86). */
  def parseColumn(colIn: String): (Option[String], String) = {
    val col = colIn.trim
    val upper = col.toUpperCase
    val asIdx = upper.indexOf(" AS ")
    if (asIdx >= 0) {
      val expr = upper.substring(0, asIdx)
      val alias = upper.substring(asIdx + 4)
      return (Some(alias.trim), expr.trim)
    }
    val specials = Seq("(", "CASE", "+", "-", "*", "/")
    if (col.contains('.') && !specials.exists(upper.contains(_))) {
      val parts = col.split("\\.")
      return (Some(parts.last.trim.toUpperCase), col.trim.toUpperCase)
    }
    if (!(specials :+ "." :+ "OVER").exists(upper.contains(_)))
      return (Some(col.trim.toUpperCase), col.trim.toUpperCase)
    (None, upper)
  }

  /** reference: sql_sources.py:212-219 (_infer_type) */
  def inferType(exprIn: String): String = {
    val expr = exprIn.toUpperCase
    if (Seq("COUNT(", "ROW_NUMBER(", "RANK(").exists(expr.contains(_))) "INT64"
    else if (Seq("SUM(", "AVG(", "MIN(", "MAX(").exists(expr.contains(_))) "FLOAT"
    else "STRING"
  }

  /** reference: sql_sources.py:195-210 (_requires_alias) */
  def requiresAlias(exprIn: String): Boolean = {
    val expr = exprIn.toUpperCase
    Seq(
      "COUNT(", "SUM(", "AVG(", "MAX(", "MIN(",
      "RANK(", "ROW_NUMBER(",
      "CASE",
      "+", "-", "*", "/",
      "CONCAT(", "||",
      "COALESCE(", "NVL(",
      "CAST(", "CONVERT(").exists(expr.contains(_))
  }

  /** reference: sql_sources.py:155-193 (infer_schema) */
  def inferSchema(query: String): Seq[FieldSpec] = {
    val q = query.trim
    if (q.toUpperCase.startsWith("WITH"))
      throw new IllegalArgumentException("CTEs (WITH clauses) are not supported")
    if (!q.toUpperCase.startsWith("SELECT"))
      throw new IllegalArgumentException("Query must start with SELECT")
    if (!q.toUpperCase.contains("FROM"))
      throw new IllegalArgumentException("Query must contain FROM clause")
    if (Seq(';', '`', '|').exists(q.contains(_)))
      throw new IllegalArgumentException("Invalid SELECT statement")
    val lines = validateFormat(q)
    val selectPart = extractSelect(lines)
    splitColumns(selectPart).flatMap { col =>
      val (name, expr) = parseColumn(col)
      name.map(n => FieldSpec(n, inferType(expr)))
    }
  }
}

/** Snowflake dialect: SYS_-prefixed columns filtered (reference:
  * sql_sources.py:236-239); exotic types stringified (:224-234). */
class SnowflakeSource extends SqlSource {
  val typeMap: Map[String, String] = Map(
    "NUMBER" -> "FLOAT", "FLOAT" -> "FLOAT", "VARCHAR" -> "STRING",
    "ARRAY" -> "STRING", "OBJECT" -> "STRING", "VARIANT" -> "STRING")
  def mapType(t: String): String = typeMap.getOrElse(t.toUpperCase, "STRING")
  override def inferSchema(query: String): Seq[FieldSpec] =
    super.inferSchema(query).filterNot(_.name.startsWith("SYS_"))
}

/** Teradata dialect (reference: sql_sources.py:241-294). */
class TeradataSource extends SqlSource {
  val typeMap: Map[String, String] = Map(
    "INTEGER" -> "INT64", "DECIMAL" -> "FLOAT", "NUMBER" -> "FLOAT",
    "FLOAT" -> "FLOAT", "VARCHAR" -> "STRING", "DATE" -> "STRING",
    "TIMESTAMP" -> "STRING")
  def mapType(t: String): String =
    typeMap.getOrElse(t.split("\\(")(0).toUpperCase, "STRING")
  override def validateQuery(query: String): Boolean =
    try {
      val q = query.trim.toUpperCase
      if (!q.startsWith("SELECT")) return false
      if (!q.contains("FROM")) return false
      val selectPart = q.substring(q.indexOf("SELECT") + 6, q.indexOf("FROM")).trim
      selectPart.nonEmpty && selectPart != "*"
    } catch { case _: Exception => false }
}

/** Spark dialect (reference: sql_sources.py:296-313) — in our engine
  * Spark IS the warehouse, so this is the identity dialect. */
class SparkSqlSource extends SqlSource {
  val typeMap: Map[String, String] = Map(
    "INTEGER" -> "INT64", "DOUBLE" -> "FLOAT", "STRING" -> "STRING",
    "ARRAY" -> "STRING", "STRUCT" -> "STRING")
  def mapType(t: String): String = typeMap.getOrElse(t.toUpperCase, "STRING")
}

/** reference: sql_sources.py:315-359 (SQLSourceRegistry) */
object SqlSourceRegistry {
  private val sources: Map[String, () => SqlSource] = Map(
    "snowflake" -> (() => new SnowflakeSource),
    "teradata" -> (() => new TeradataSource),
    "spark_sql_emr" -> (() => new SparkSqlSource))

  def getSourceClass(provider: String): Option[SqlSource] =
    sources.get(provider).map(_.apply())

  def validateConfig(provider: String, config: Map[String, Any]): Seq[String] = {
    if (!sources.contains(provider))
      return Seq(s"Unsupported SQL provider: $provider")
    config.get("query").foreach { q =>
      if (String.valueOf(q).trim.toUpperCase.startsWith("WITH"))
        return Seq("CTEs (WITH clauses) are not supported")
    }
    val required =
      if (config.contains("query")) Seq("query", "timestamp_field")
      else if (config.contains("table")) Seq("table", "timestamp_field")
      else return Seq("Either 'query' or 'table' must be specified")
    required.filterNot(config.contains).map(f => s"Missing required field: $f")
  }
}

/** The Spark-native path: exact output schema from Catalyst's analyzed
  * plan, then mapped to the reference's 3-type spec surface (SURVEY.md
  * §2.8 M4/M5). Strict mode replays the reference's rejection rules.
  */
object CatalystInference {

  /** Spark DataType → spec dtype surface. */
  def toSpecDtype(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => "INT64"
    case _: FloatType | _: DoubleType | _: DecimalType             => "FLOAT"
    case _                                                         => "STRING"
  }

  /** Syntax check without touching any table (parser only). */
  def parses(spark: SparkSession, sql: String): Boolean =
    try { spark.sessionState.sqlParser.parsePlan(sql); true }
    catch { case _: Exception => false }

  /** Analyzed output schema of a query (tables must be resolvable),
    * projected to the spec dtype surface. */
  def inferSchema(spark: SparkSession, sql: String): Seq[FieldSpec] =
    spark.sql(sql).schema.fields.toSeq.map { f =>
      FieldSpec(f.name, toSpecDtype(f.dataType))
    }

  /** Reconcile a declared spec schema against the analyzed plan schema of
    * the compiled view — the replacement for string-based inference.
    * Returns reference-style error strings.
    */
  def reconcile(declared: Seq[FieldSpec], analyzed: StructType): Seq[String] = {
    val byName = analyzed.fields.map(f => f.name -> f.dataType).toMap
    declared.flatMap { f =>
      byName.get(f.name) match {
        case None => Some(s"Feature '${f.name}' not produced by source query")
        case Some(dt) =>
          val actual = toSpecDtype(dt)
          if (actual != f.dtype)
            Some(s"Feature '${f.name}' dtype mismatch: declared ${f.dtype}, source yields $actual")
          else None
      }
    }
  }
}
