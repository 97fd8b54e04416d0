package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, IntegerType}
import graft.Tables

/** SURVEY.md §2.7: scalar function families — string, date/time, math,
  * array (incl. higher-order lambdas), map/JSON.
  *
  * Reference implements none (SURVEY.md §0); the families cover what its
  * category's transform stage (SURVEY §3.1 step 3) plus the LLM-pipeline
  * north star need. All built-in `functions._` — codegen'd, no UDFs, so
  * every expression stays inside WholeStageCodegen at scale.
  *
  * Dialect-parity notes are inline; the traps (1-based substring, isodow
  * vs dayofweek, floor→LONG vs DOUBLE, CAST rounds vs truncates) are from
  * SURVEY §2.0.
  */
object ScalarFns {
  import graft.QueryFn

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    "q_fn_string" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 8).as("sub"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_name"), " ", "_").as("repl"),
          lpad(col("p_brand"), 12, "*").as("pad"),
          trim(concat(lit("  "), col("p_type"), lit("  "))).as("trimmed"),
          split(col("p_name"), " ").getItem(0).as("first_tok"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("ct"),
          when(col("p_name").like("s%"), 1).otherwise(0).as("starts_s"))
        .orderBy("p_partkey")),

    "q_fn_date" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dd"),
          to_date(col("o_orderdate")).as("od"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate")))
            .as("days_to_2k"),
          add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          // Spark weekday(): Monday=0; DuckDB isodow: Monday=1.
          (weekday(col("o_orderdate")) + lit(1)).as("dow"))
        .orderBy("o_orderkey")),

    "q_fn_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          // Spark floor() is already LONG; DuckDB needs CAST (stays DOUBLE).
          floor(col("l_extendedprice")).as("flr"),
          ceil(col("l_extendedprice")).as("cl"),
          Det.r(abs(col("l_discount") - 0.05), 6).as("ab"),
          Det.r(sqrt(col("l_extendedprice")), 6).as("sq"),
          Det.r(log(col("l_extendedprice")), 6).as("logv"),
          Det.r(exp(col("l_discount")), 6).as("ex"),
          Det.r2(pow(col("l_quantity"), 2.0)).as("pw"),
          pmod(col("l_orderkey"), lit(7)).as("md"),
          signum(col("l_discount") - 0.04).cast("int").as("sg"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // Higher-order array functions over the 64-d embedding column —
    // the codegen-friendly path for vector math (SURVEY §2.7 q_fn_array):
    // aggregate/transform/filter run inside the row, no explode shuffle.
    "q_fn_array" -> ((s, d) => {
      val dbl = transform(col("embedding"), x => x.cast("double"))
      t(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          Det.r(aggregate(slice(dbl, 1, 8), lit(0.0), (acc, x) => acc + x), 6)
            .as("s8"),
          Det.r(array_max(dbl), 6).as("mx"),
          Det.r(array_min(dbl), 6).as("mn"),
          size(filter(dbl, x => x > 0)).as("npos"),
          Det.r(aggregate(transform(dbl, x => x * x), lit(0.0),
            (acc, x) => acc + x), 6).as("norm_sq"))
        .orderBy("vec_id")
    }),

    "q_fn_map_json" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"),
          get_json_object(col("props"), "$.k").cast("int").as("k_json"))
        .select(col("event_id"),
          array_join(map_keys(col("m")), ",").as("key_list"),
          element_at(col("m"), "k").as("k_map"),
          col("k_json"))
        .orderBy("event_id")),

    // Bitwise family: and/or/xor, shifts, popcount — pure integer math,
    // codegen'd, map-only (the hash/partitioning primitives a sharded
    // pipeline builds on).
    "q_fn_bitwise" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("andv"),
          col("o_orderkey").bitwiseOR(lit(16L)).as("orv"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("xorv"),
          shiftleft(col("o_orderkey"), 2).as("shl"),
          shiftright(col("o_orderkey"), 2).as("shr"),
          bit_count(col("o_orderkey")).cast("int").as("bits"))
        .orderBy("o_orderkey"))
  )

  val oracles: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey,
                upper(p_name) AS up,
                substring(p_name, 1, 8) AS sub,
                length(p_name) AS len,
                regexp_replace(p_name, ' ', '_', 'g') AS repl,
                lpad(p_brand, 12, '*') AS pad,
                trim('  ' || p_type || '  ') AS trimmed,
                string_split(p_name, ' ')[1] AS first_tok,
                regexp_extract(p_name, '([a-z]+)', 1) AS rex,
                p_brand || ':' || p_type AS ct,
                CASE WHEN p_name LIKE 's%' THEN 1 ELSE 0 END AS starts_s
         FROM part ORDER BY p_partkey""",
    "q_fn_date" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(dayofmonth(o_orderdate) AS INT) AS dd,
                CAST(o_orderdate AS DATE) AS od,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2k,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
                CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS epoch_s,
                CAST(isodow(o_orderdate) AS INT) AS dow
         FROM orders ORDER BY o_orderkey""",
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                CAST(floor(l_extendedprice) AS BIGINT) AS flr,
                CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
                floor(abs(l_discount - 0.05) * 1000000 + 0.5) / 1000000 AS ab,
                floor(sqrt(l_extendedprice) * 1000000 + 0.5) / 1000000 AS sq,
                floor(ln(l_extendedprice) * 1000000 + 0.5) / 1000000 AS logv,
                floor(exp(l_discount) * 1000000 + 0.5) / 1000000 AS ex,
                floor(pow(l_quantity, 2.0) * 100 + 0.5) / 100 AS pw,
                ((l_orderkey % 7) + 7) % 7 AS md,
                CAST(sign(l_discount - 0.04) AS INT) AS sg
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_fn_array" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         SELECT vec_id,
                CAST(len(v) AS INT) AS dim,
                floor(list_reduce(list_prepend(0.0, v[1:8]), (a, b) -> a + b) * 1000000 + 0.5) / 1000000 AS s8,
                floor(list_aggregate(v, 'max') * 1000000 + 0.5) / 1000000 AS mx,
                floor(list_aggregate(v, 'min') * 1000000 + 0.5) / 1000000 AS mn,
                CAST(len(list_filter(v, x -> x > 0)) AS INT) AS npos,
                floor(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b) * 1000000 + 0.5) / 1000000 AS norm_sq
         FROM e ORDER BY vec_id""",
    "q_fn_map_json" ->
      """SELECT event_id,
                array_to_string(json_keys(props), ',') AS key_list,
                CAST(props->>'k' AS INT) AS k_map,
                CAST(props->>'k' AS INT) AS k_json
         FROM events ORDER BY event_id""",
    "q_fn_bitwise" ->
      """SELECT o_orderkey,
                o_orderkey & 255 AS andv,
                o_orderkey | 16 AS orv,
                xor(o_orderkey, o_custkey) AS xorv,
                o_orderkey << 2 AS shl,
                o_orderkey >> 2 AS shr,
                CAST(bit_count(o_orderkey) AS INT) AS bits
         FROM orders ORDER BY o_orderkey"""
  )
}
