package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-function surface coverage: string, date, and math built-ins, pivot,
  * HAVING, exact percentile — each oracle-checked against DuckDB. The
  * reference hardcodes its few scalar ops inline (SURVEY §2c); a complete
  * engine exposes the standard function surface, and these queries pin the
  * cross-engine semantics of the commonly-used subset.
  */
object FunctionQueries {

  val queries: Map[String, Tables => DataFrame] = Map(
    // String functions over customer names.
    "q_string_funcs" -> { t =>
      t.customer.select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub"),
        length(col("c_name")).cast("long").as("len"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined"),
        translate(col("c_name"), "#", "_").as("tr"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        reverse(col("c_name")).as("rev"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("lev"))
        .orderBy("c_custkey")
    },

    // Date/time functions over orders.
    "q_date_funcs" -> { t =>
      t.orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"))
        .orderBy("o_orderkey")
    },

    // Math functions over lineitem.
    // sort FIRST (output contract is this ORDER BY anyway): the range
    // exchange spreads the per-row math + the wide result materialization
    // across cores — the 600k-row lineitem parquet scans as ONE partition
    // (single row group), so projection-then-sort runs the map single-task.
    "q_math_funcs" -> { t =>
      t.lineitem.orderBy("l_orderkey", "l_linenumber").select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 6).as("absd"),
        ceil(col("l_quantity")).as("ceilq"),
        floor(col("l_quantity")).as("floorq"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrtp"),
        round(ln(col("l_extendedprice") + 1), 6).as("lnp"),
        round(pow(col("l_tax") + 1, 2), 6).as("powt"),
        signum(col("l_discount") - 0.04).cast("double").as("sgn"))
    },

    // Pivot: per-user event-type counts as columns.
    "q_pivot" -> { t =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = t.events.groupBy("user_id").pivot("event_type", types).count()
      types.foldLeft(pivoted)((df, c) => df.withColumn(c, coalesce(col(c), lit(0L))))
        .orderBy("user_id")
    },

    // HAVING: customers whose order volume exceeds a threshold.
    "q_having" -> { t =>
      t.orders
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spend"))
        .where(col("n_orders") >= 12)
        .orderBy("o_custkey")
    },

    // Exact percentile (median) per event type.
    "q_median" -> { t =>
      t.events
        .groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("median_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Array function surface over tokenised documents.
    "q_array_funcs" -> { t =>
      t.documents
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n"),
          array_contains(col("toks"), "spark").as("has_spark"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(sort_array(col("toks")), 1).as("min_tok"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          concat_ws("|", slice(sort_array(col("toks"), asc = false), 1, 3)).as("top3_desc"))
        .orderBy("doc_id")
    },

    // Regex function surface over event props.
    // sort-first (see EventQueries.eventsSorted): the ORDER BY contract is
    // satisfied before the projection, whose work then spreads across the
    // range exchange instead of running on the single scan partition.
    "q_regex_funcs" -> { t =>
      t.events.orderBy("event_id").select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_str"),
        col("props").rlike("[0-9]{2}").as("two_digits"),
        regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"),
        size(regexp_extract_all(col("props"), lit("[0-9]"), lit(0))).cast("long").as("n_digits"))
    },

    // Conditional/null-handling surface.
    "q_conditional_funcs" -> { t =>
      t.events.orderBy("event_id")
        .withColumn("maybe", when(col("value") > 50, col("value")))
        .select(
          col("event_id"),
          coalesce(col("maybe"), lit(-1.0)).as("coalesced"),
          nullif(col("event_type"), lit("view")).as("nullified"),
          greatest(col("value"), col("user_id").cast("double")).as("hi"),
          least(col("value"), col("user_id").cast("double")).as("lo"),
          isnull(col("maybe")).as("was_null"))
    },

    // Date truncation + aggregation by calendar month.
    "q_date_trunc" -> { t =>
      t.orders
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("month")
    },

    // Unpivot (melt): wide → long over part attributes.
    "q_unpivot" -> { t =>
      t.part
        .unpivot(
          ids = Array(col("p_partkey")),
          values = Array(col("p_size").cast("double").as("p_size"),
                         col("p_retailprice")),
          variableColumnName = "attr",
          valueColumnName = "val")
        .orderBy("p_partkey", "attr")
    },

    // Generator surface: posexplode (explode with ordinal position).
    "q_posexplode" -> { t =>
      t.documents
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
        .orderBy("doc_id", "pos")
    },

    // ANSI-safe try_* arithmetic: NULL instead of error on overflow / ÷0.
    "q_try_funcs" -> { t =>
      t.events.orderBy("event_id").select(
        col("event_id"),
        try_divide(col("value"), (col("user_id") % 3).cast("double")).as("t_div"),
        try_add(col("event_id"), col("user_id")).as("t_add"),
        try_multiply(col("event_id"), lit(2L)).as("t_mul"),
        try_element_at(split(col("props"), " "),
          (col("user_id") % 4 + 1).cast("int")).as("t_elem"))
    },

    // Lambda higher-order-function surface (transform/filter/exists/
    // aggregate/zip_with) over token arrays. Fine for a one-pass scalar
    // query; pairwise hot paths avoid interpreted lambdas (ARCHITECTURE §
    // measured findings 1-3).
    "q_hof_funcs" -> { t =>
      val toks = split(col("text"), " ")
      t.documents
        .withColumn("toks", toks)
        .withColumn("lens", transform(col("toks"), x => length(x)))
        .select(
          col("doc_id"),
          size(filter(col("toks"), x => length(x) >= 5)).cast("long").as("n_long"),
          aggregate(col("lens"), lit(0L), (acc, x) => acc + x).as("sum_lens"),
          exists(col("toks"), x => length(x) >= 8).as("has_long"),
          concat_ws("|",
            slice(zip_with(col("toks"), col("lens"),
              (tok, l) => concat(tok, lit(":"), l.cast("string"))), 1, 3)).as("z3"))
        .orderBy("doc_id")
    },

    // Calendar arithmetic surface: month-clamped shifts, month/week
    // boundaries, next-weekday search (the oracle reconstructs next_day
    // from ISO day-of-week arithmetic, DuckDB lacking it).
    "q_calendar_funcs" -> { t =>
      t.orders.select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("plus3mo"),
        date_add(col("o_orderdate"), 30).as("plus30d"),
        last_day(col("o_orderdate")).as("month_end"),
        next_day(col("o_orderdate"), "Monday").as("next_monday"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"))
        .orderBy("o_orderkey")
    },

    // URL function surface: parse_url component extraction + percent
    // encoding over URLs assembled in-plan (the oracle replicates with
    // regexes, DuckDB having no parse_url).
    "q_url_funcs" -> { t =>
      val url = concat(lit("https://ex.example/"), col("event_type"),
        lit("/"), col("event_id").cast("string"),
        lit("?u="), col("user_id").cast("string"), lit("&v=2"))
      t.events.orderBy("event_id")
        .withColumn("url", url)
        .select(
          col("event_id"),
          col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("u")).as("q_u"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT c_custkey,
        |upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |substr(c_name, 1, 8) AS sub, length(c_name) AS len,
        |c_mktsegment || '-' || c_name AS joined,
        |translate(c_name, '#', '_') AS tr,
        |lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |reverse(c_name) AS rev,
        |levenshtein(c_mktsegment, 'BUILDING') AS lev
        |FROM customer ORDER BY c_custkey""".stripMargin.replaceAll("\\s+", " "),

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |dayofmonth(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
        |strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin.replaceAll("\\s+", " "),

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |round(abs(l_discount - 0.05), 6) AS absd,
        |CAST(ceil(l_quantity) AS BIGINT) AS ceilq,
        |CAST(floor(l_quantity) AS BIGINT) AS floorq,
        |round(sqrt(l_extendedprice), 6) AS sqrtp,
        |round(ln(l_extendedprice + 1), 6) AS lnp,
        |round(pow(l_tax + 1, 2), 6) AS powt,
        |CAST(sign(l_discount - 0.04) AS DOUBLE) AS sgn
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin.replaceAll("\\s+", " "),

    "q_pivot" ->
      """SELECT user_id,
        |count(*) FILTER (event_type = 'click') AS click,
        |count(*) FILTER (event_type = 'error') AS error,
        |count(*) FILTER (event_type = 'purchase') AS purchase,
        |count(*) FILTER (event_type = 'signup') AS signup,
        |count(*) FILTER (event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\\s+", " "),

    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin.replaceAll("\\s+", " "),

    "q_median" ->
      """SELECT event_type, round(median(value), 6) AS median_value, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replaceAll("\\s+", " "),

    "q_array_funcs" ->
      """SELECT doc_id,
        |len(string_split(text, ' ')) AS n,
        |list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |string_split(text, ' ')[1] AS first_tok,
        |list_sort(string_split(text, ' '))[1] AS min_tok,
        |len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |array_to_string(list_reverse_sort(string_split(text, ' '))[1:3], '|') AS top3_desc
        |FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_regex_funcs" ->
      """SELECT event_id,
        |regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
        |regexp_matches(props, '[0-9]{2}') AS two_digits,
        |regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled,
        |len(regexp_extract_all(props, '[0-9]')) AS n_digits
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_conditional_funcs" ->
      """SELECT event_id,
        |coalesce(CASE WHEN value > 50 THEN value END, -1.0) AS coalesced,
        |nullif(event_type, 'view') AS nullified,
        |greatest(value, CAST(user_id AS DOUBLE)) AS hi,
        |least(value, CAST(user_id AS DOUBLE)) AS lo,
        |(CASE WHEN value > 50 THEN value END) IS NULL AS was_null
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_date_trunc" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin.replaceAll("\\s+", " "),

    "q_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin.replaceAll("\\s+", " "),

    "q_posexplode" ->
      """SELECT doc_id,
        |unnest(range(0, len(string_split(text, ' ')))) AS pos,
        |unnest(string_split(text, ' ')) AS tok
        |FROM documents ORDER BY doc_id, pos""".stripMargin.replaceAll("\\s+", " "),

    "q_try_funcs" ->
      """SELECT event_id,
        |CASE WHEN CAST(user_id % 3 AS DOUBLE) = 0 THEN NULL
        |     ELSE value / CAST(user_id % 3 AS DOUBLE) END AS t_div,
        |event_id + user_id AS t_add,
        |event_id * 2 AS t_mul,
        |string_split(props, ' ')[CAST(user_id % 4 + 1 AS INT)] AS t_elem
        |FROM events ORDER BY event_id""".stripMargin.replaceAll("\\s+", " "),

    "q_hof_funcs" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id,
        |CAST(len(list_filter(t, x -> length(x) >= 5)) AS BIGINT) AS n_long,
        |CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS sum_lens,
        |len(list_filter(t, x -> length(x) >= 8)) > 0 AS has_long,
        |array_to_string([t[i] || ':' || CAST(length(t[i]) AS VARCHAR)
        |                 for i in range(1, least(len(t), 3) + 1)], '|') AS z3
        |FROM tok ORDER BY doc_id""".stripMargin.replaceAll("\\s+", " "),

    "q_calendar_funcs" ->
      """SELECT o_orderkey,
        |CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30d,
        |last_day(o_orderdate) AS month_end,
        |CAST(o_orderdate + to_days(CAST(CASE WHEN (9 - (dayofweek(o_orderdate) + 1)) % 7 = 0
        |  THEN 7 ELSE (9 - (dayofweek(o_orderdate) + 1)) % 7 END AS INT)) AS DATE) AS next_monday,
        |weekofyear(o_orderdate) AS iso_week,
        |dayofyear(o_orderdate) AS doy
        |FROM orders ORDER BY o_orderkey""".stripMargin.replaceAll("\\s+", " "),

    "q_url_funcs" ->
      """WITH u AS (
        |  SELECT event_id,
        |    'https://ex.example/' || event_type || '/' || CAST(event_id AS VARCHAR)
        |      || '?u=' || CAST(user_id AS VARCHAR) || '&v=2' AS url
        |  FROM events)
        |SELECT event_id, url,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]u=([^&#]*)', 1) AS q_u
        |FROM u ORDER BY event_id""".stripMargin.replaceAll("\\s+", " ")
  )
}
