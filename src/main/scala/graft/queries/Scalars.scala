package graft.queries

import org.apache.spark.sql.functions._

/** Scalar-function family: string, date/time, math, conditional, array
  * (higher-order), and JSON functions — all `org.apache.spark.sql.functions`
  * built-ins (codegen'd; no UDFs in the hot path).
  *
  * Cross-engine gotchas handled here: DuckDB integer functions return
  * BIGINT/HUGEINT where Spark returns INT (both sides cast explicitly);
  * `sum` of doubles is order-sensitive (rounded); regexes are kept to the
  * common Java/RE2 subset.
  */
object Scalars {

  val defs: Map[String, Q] = Map(
    "q_scalar_string" -> ((s, dir) => {
      tbl(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).as("name_len"),
          size(split(col("p_name"), " ")).as("n_words"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), "a", "@").as("type_sub"))
        .orderBy("p_partkey")
    }),
    "q_scalar_date" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          date_add(to_date(col("o_orderdate")), 30).as("due_date"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("1998-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_98"))
        .orderBy("o_orderkey")
    }),
    "q_scalar_math" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q_scalar_cond" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_label"),
          (col("o_totalprice") > 150000).as("is_large"))
        .orderBy("o_orderkey")
    }),
    // Higher-order array functions over a synthesized sequence.
    "q_scalar_array" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .select(col("l_linenumber")).distinct()
        .withColumn("arr", sequence(lit(1), col("l_linenumber")))
        .select(
          col("l_linenumber"),
          aggregate(transform(col("arr"), x => x * 2), lit(0), (acc, x) => acc + x)
            .cast("long").as("sum_doubled"),
          size(filter(col("arr"), x => x % 2 === 0)).as("n_even"),
          array_contains(col("arr"), 3).as("has_three"),
          element_at(col("arr"), 1).as("first_el"),
          element_at(col("arr"), -1).as("last_el"))
        .orderBy("l_linenumber")
    }),
    // Map type: construction, lookup, cardinality (scalar outputs so the
    // DuckDB compare stays hash-stable).
    "q_scalar_map" -> ((s, dir) => {
      val m = map(
        lit("size"), col("p_size").cast("double"),
        lit("retail"), col("p_retailprice"))
      tbl(s, dir, "part")
        .select(
          col("p_partkey"),
          element_at(m, "size").as("size_val"),
          element_at(m, "retail").as("retail_val"),
          size(m).as("m_size"))
        .orderBy("p_partkey")
    }),
    "q_json_get" -> ((s, dir) => {
      tbl(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    }),
    "q_json_agg" -> ((s, dir) => {
      tbl(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("k_bucket")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scalar_string" ->
      """SELECT p_partkey,
         upper(p_name) AS name_upper,
         lower(p_brand) AS brand_lower,
         substring(p_name, 1, 5) AS name_pfx,
         CAST(length(p_name) AS INT) AS name_len,
         CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
         regexp_extract(p_name, '^(\w+)', 1) AS first_word,
         p_brand || '/' || p_type AS brand_type,
         regexp_replace(p_type, 'a', '@', 'g') AS type_sub
         FROM part ORDER BY p_partkey""",
    "q_scalar_date" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS yr,
         CAST(month(o_orderdate) AS INT) AS mo,
         CAST(day(o_orderdate) AS INT) AS dom,
         CAST(quarter(o_orderdate) AS INT) AS qtr,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS due_date,
         last_day(CAST(o_orderdate AS DATE)) AS month_end,
         CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98
         FROM orders ORDER BY o_orderkey""",
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
         round(abs(l_discount - 0.05), 4) AS disc_dev,
         CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
         CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
         round(power(l_quantity, 2), 2) AS qty_sq,
         round(sqrt(l_quantity), 6) AS qty_sqrt,
         greatest(l_tax, l_discount) AS max_rate,
         least(l_tax, l_discount) AS min_rate
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_scalar_cond" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 200000 THEN 'big'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'small' END AS bucket,
         coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
         o_totalprice > 150000 AS is_large
         FROM orders ORDER BY o_orderkey""",
    "q_scalar_array" ->
      """SELECT l_linenumber,
         CAST(list_sum(list_transform(range(1, l_linenumber + 1), x -> x * 2)) AS BIGINT) AS sum_doubled,
         CAST(len(list_filter(range(1, l_linenumber + 1), x -> x % 2 = 0)) AS INT) AS n_even,
         list_contains(range(1, l_linenumber + 1), 3) AS has_three,
         CAST(range(1, l_linenumber + 1)[1] AS INT) AS first_el,
         CAST(range(1, l_linenumber + 1)[-1] AS INT) AS last_el
         FROM (SELECT DISTINCT l_linenumber FROM lineitem)
         ORDER BY l_linenumber""",
    "q_scalar_map" ->
      """SELECT p_partkey,
         (MAP {'size': CAST(p_size AS DOUBLE), 'retail': p_retailprice})['size'][1] AS size_val,
         (MAP {'size': CAST(p_size AS DOUBLE), 'retail': p_retailprice})['retail'][1] AS retail_val,
         CAST(cardinality(MAP {'size': CAST(p_size AS DOUBLE), 'retail': p_retailprice}) AS INT) AS m_size
         FROM part ORDER BY p_partkey""",
    "q_json_get" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events ORDER BY event_id""",
    "q_json_agg" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY k_bucket ORDER BY k_bucket"""
  )
}
