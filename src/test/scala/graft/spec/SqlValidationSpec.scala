package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's SQL-corpus golden assertions
  * (reference: tests/test_sql_sources.py, tests/test_snowflake_sources.py,
  * tests/test_teradata_sources.py, tests/test_validators.py:4-62).
  */
class SqlValidationSpec extends AnyFunSuite {

  private val source = new SqlSource

  test("schema inference: aliased + simple + qualified columns, in order") {
    val query = """
    SELECT
        id,
        users.name,
        orders.status,
        COUNT(*) AS order_count,
        SUM(amount) AS total,
        CASE
            WHEN amount > 100 THEN 'high'
            ELSE 'low'
        END AS category
    FROM orders
    JOIN users ON users.id = orders.user_id
    GROUP BY id, users.name, orders.status"""
    val schema = source.inferSchema(query)
    assert(schema.map(_.name) ===
      Seq("ID", "NAME", "STATUS", "ORDER_COUNT", "TOTAL", "CATEGORY"))
  }

  test("unaliased aggregate/CASE expressions are dropped from the schema") {
    val invalid = """
    SELECT
        id,
        orders.status,
        COUNT(*),
        SUM(amount),
        CASE WHEN amount > 100 THEN 'high' ELSE 'low' END
    FROM orders
    GROUP BY id, orders.status"""
    val schema = source.inferSchema(invalid)
    assert(schema.map(_.name).sorted === Seq("ID", "STATUS"))
  }

  test("CTE / missing FROM / bad characters raise reference error messages") {
    val cte = intercept[IllegalArgumentException](source.inferSchema(
      "WITH t AS (SELECT id FROM users)\n    SELECT * FROM t"))
    assert(cte.getMessage.contains("CTEs (WITH clauses) are not supported"))

    val noFrom = intercept[IllegalArgumentException](
      source.inferSchema("SELECT id, name"))
    assert(noFrom.getMessage === "Query must contain FROM clause")

    val badChar = intercept[IllegalArgumentException](
      source.inferSchema("SELECT id; name FROM users"))
    assert(badChar.getMessage === "Invalid SELECT statement")

    val notSelect = intercept[IllegalArgumentException](
      source.inferSchema("INVALID SQL SYNTAX"))
    assert(notSelect.getMessage === "Query must start with SELECT")

    val selectFrom = intercept[IllegalArgumentException](
      source.inferSchema("SELECT FROM"))
    assert(selectFrom.getMessage === "Query must contain FROM clause")
  }

  test("column parsing table (reference test_column_parsing)") {
    assert(source.parseColumn("customer_id") === (Some("CUSTOMER_ID"), "CUSTOMER_ID"))
    assert(source.parseColumn("orders.status") === (Some("STATUS"), "ORDERS.STATUS"))
    assert(source.parseColumn("public.users.email") === (Some("EMAIL"), "PUBLIC.USERS.EMAIL"))
    assert(source.parseColumn("COUNT(*)") === (None, "COUNT(*)"))
    assert(source.parseColumn("user_id + 1") === (None, "USER_ID + 1"))
    assert(source.parseColumn("orders.status AS order_status") ===
      (Some("ORDER_STATUS"), "ORDERS.STATUS"))
    assert(source.parseColumn("COUNT(*) AS total_orders") ===
      (Some("TOTAL_ORDERS"), "COUNT(*)"))
    assert(source.parseColumn(
      "CASE WHEN amount > 100 THEN 'high' ELSE 'low' END AS category") ===
      (Some("CATEGORY"), "CASE WHEN AMOUNT > 100 THEN 'HIGH' ELSE 'LOW' END"))
  }

  test("type inference: COUNT/ROW_NUMBER/RANK→INT64, SUM/AVG/MIN/MAX→FLOAT, else STRING") {
    assert(source.inferType("COUNT(*)") === "INT64")
    assert(source.inferType("RANK() OVER (...)") === "INT64")
    assert(source.inferType("SUM(AMOUNT)") === "FLOAT")
    assert(source.inferType("AVG(X) OVER (...)") === "FLOAT")
    assert(source.inferType("CUSTOMER_ID") === "STRING")
  }

  test("snowflake: SYS_ filter, array aggs → STRING, type map") {
    val sf = new SnowflakeSource
    val arrayAgg = """
    SELECT
        user_id,
        ARRAY_AGG(DISTINCT category) WITHIN GROUP (ORDER BY category) as categories,
        ARRAY_AGG(OBJECT_CONSTRUCT('product', product_name, 'qty', quantity))
            as purchase_details
    FROM purchases
    GROUP BY user_id"""
    val schema = sf.inferSchema(arrayAgg)
    val names = schema.map(_.name)
    assert(names.contains("CATEGORIES") && names.contains("PURCHASE_DETAILS"))
    assert(schema.forall(_.dtype === "STRING"))
    assert(sf.mapType("NUMBER") === "FLOAT")
    assert(sf.inferSchema(
      "SELECT\n sys_internal_id,\n user_id\nFROM t").map(_.name) === Seq("USER_ID"))
  }

  test("teradata: complex nested-subquery query accepted; window fn types") {
    val td = new TeradataSource
    val complex = """
    SELECT
        ds.date_key,
        cm.customer_id,
        cm.segment_code,
        SUM(ZEROIFNULL(t.daily_transactions)) as transaction_count,
        SUM(ZEROIFNULL(t.daily_amount)) as daily_amount,
        MAX(cm.segment_rank) as customer_rank
    FROM (
        SELECT CAST('2023-01-01' AS DATE) as date_key
        UNION ALL
        SELECT date_key + INTERVAL '1' DAY
        FROM date_spine
        WHERE date_key < CAST('2024-01-01' AS DATE)
    ) ds
    GROUP BY ds.date_key, cm.customer_id, cm.segment_code"""
    assert(td.inferSchema(complex).map(_.name).toSet ===
      Set("DATE_KEY", "CUSTOMER_ID", "SEGMENT_CODE",
        "TRANSACTION_COUNT", "DAILY_AMOUNT", "CUSTOMER_RANK"))

    val window = """
    SELECT
        customer_id,
        order_date,
        amount,
        AVG(amount) OVER (PARTITION BY customer_id ORDER BY order_date
            ROWS BETWEEN 30 PRECEDING AND CURRENT ROW) as moving_avg_amount,
        RANK() OVER (PARTITION BY customer_id ORDER BY amount DESC) as amount_rank
    FROM orders"""
    val ws = td.inferSchema(window)
    assert(ws.map(_.name).toSet === Set(
      "CUSTOMER_ID", "ORDER_DATE", "AMOUNT", "MOVING_AVG_AMOUNT", "AMOUNT_RANK"))
    val types = ws.map(f => f.name -> f.dtype).toMap
    assert(types("AMOUNT_RANK") === "INT64")
    assert(types("MOVING_AVG_AMOUNT") === "FLOAT")

    assert(td.mapType("INTEGER") === "INT64")
    assert(td.mapType("DECIMAL(10,2)") === "FLOAT")
    assert(td.mapType("VARCHAR(255)") === "STRING")
    assert(td.mapType("DATE") === "STRING")
    assert(td.mapType("TIMESTAMP") === "STRING")
    assert(td.mapType("NUMBER") === "FLOAT")
    assert(td.mapType("UNKNOWN_TYPE") === "STRING")

    assert(td.validateQuery("SELECT customer_id FROM customers"))
    assert(!td.validateQuery("SELECT FROM"))
  }

  test("registry config validation (reference SQLSourceRegistry)") {
    assert(SqlSourceRegistry.validateConfig("snowflake",
      Map("query" -> "SELECT * FROM table", "timestamp_field" -> "ts")).isEmpty)
    assert(SqlSourceRegistry.validateConfig("snowflake",
      Map("table" -> "my_table", "timestamp_field" -> "ts")).isEmpty)
    val missing = SqlSourceRegistry.validateConfig("snowflake",
      Map("query" -> "SELECT * FROM table"))
    assert(missing.size === 1 && missing.head.contains("timestamp_field"))
    assert(SqlSourceRegistry.validateConfig("invalid", Map()) ===
      Seq("Unsupported SQL provider: invalid"))
    val cte = SqlSourceRegistry.validateConfig("snowflake",
      Map("query" -> "WITH x AS (SELECT 1) SELECT * FROM x", "timestamp_field" -> "ts"))
    assert(cte.head.contains("CTEs (WITH clauses) are not supported"))
    assert(SqlSourceRegistry.validateConfig("teradata", Map()) ===
      Seq("Either 'query' or 'table' must be specified"))
    assert(SqlSourceRegistry.getSourceClass("snowflake").exists(_.isInstanceOf[SnowflakeSource]))
    assert(SqlSourceRegistry.getSourceClass("invalid").isEmpty)
  }

  test("legacy boolean validator (reference validators.SQLValidator)") {
    val invalidQueries = Seq(
      "\nSELECT\n    customer_id,\n    COUNT(*),\n    SUM(amount) / 100,\n    MAX(order_date)\nFROM orders\nGROUP BY customer_id",
      "\nSELECT\n    orders.\nFROM orders",
      "\nSELECT\n    amount + tax,\n    EXTRACT(month FROM date)\nFROM orders")
    invalidQueries.foreach { q =>
      assert(!LegacySqlValidator.validateSql(q), s"expected invalid: $q")
    }
    val validQueries = Seq(
      """
        SELECT
            customer_id,
            orders.order_id,
            COUNT(*) as order_count,
            SUM(amount) as total_amount,
            amount + tax as total_with_tax,
            EXTRACT(month FROM date) as order_month
        FROM orders
        GROUP BY customer_id
        """,
      """
        SELECT
            t.product_id,
            COUNT(DISTINCT order_id) as order_count,
            AVG(amount) as avg_amount
        FROM transactions t
        GROUP BY t.product_id
        """)
    validQueries.foreach { q =>
      assert(LegacySqlValidator.validateSql(q), s"expected valid: $q")
    }
    assert(!LegacySqlValidator.validateConfig(
      Map("query" -> "SELECT a FROM t", "timestamp_field" -> "ts")))
    assert(LegacySqlValidator.validateConfig(
      Map("query" -> "SELECT a FROM t", "timestamp_field" -> "ts", "database" -> "db")))
  }

  test("structured INVALID_SQL errors carry the reference enum code") {
    val s = new SqlSource
    // the reference's format contract is line-shaped: SELECT list lines,
    // then a FROM line (sql_sources.py:8-50)
    assert(s.validateQueryStructured("SELECT\n a AS x\nFROM t") === Nil)

    val star = s.validateQueryStructured("SELECT * FROM t", path = "sources.s1.query")
    assert(star.size === 1)
    assert(star.head.code === ValidationCodes.InvalidSql)
    assert(star.head.path === "sources.s1.query")
    assert(star.head.message === "SELECT * is not supported")

    val cte = s.validateQueryStructured("WITH x AS (SELECT a FROM t) SELECT a FROM x")
    assert(cte.head.code === ValidationCodes.InvalidSql)
    assert(cte.head.message === "CTEs (WITH clauses) are not supported")

    val noFrom = s.validateQueryStructured("SELECT a")
    assert(noFrom.head.code === ValidationCodes.InvalidSql)
    assert(noFrom.head.context("query") === "SELECT a")
  }
}
