package graft.ops

import graft.util.Det
import graft.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2b: q_string_funcs, q_date_funcs,
  * q_math_funcs, q_json_funcs, q_array_funcs).
  *
  * Generalizes the reference's scalar surface — string split + alias
  * (`demo-etl-2a-notebook.py:53`), key concat / int cast at the DynamoDB sink
  * (`process_tsv.py:81-87`) — into the full built-in function families.
  * Everything here is a single parquet scan + codegen'd projection: no
  * shuffle except the final presentation sort.
  *
  * Cross-engine parity notes (vs the DuckDB oracle):
  *  - Spark `length`/`year`/... return INT where DuckDB returns BIGINT → the
  *    oracle casts to INTEGER.
  *  - float array elements are widened to double before arithmetic, and
  *    results rounded to 4dp (both engines do IEEE-exact widening).
  */
object Scalars {

  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        upper(col("c_mktsegment")).as("useg"),
        substring(col("c_name"), 10, 6).as("name_id"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
        length(col("c_name")).as("name_len"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        split_part(col("c_name"), lit("#"), lit(2)).as("id_part"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("xlated"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        reverse(col("c_mktsegment")).as("revseg"))
      .orderBy("c_custkey")

  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        fmtTs(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_02"),
        fmtDate(date_add(col("o_orderdate"), 30)).as("plus30"))
      .orderBy("o_orderkey")

  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Det.q(col("l_extendedprice"), 1).as("r1"),
        abs(col("l_discount") - 0.05).as("absd"),
        ceil(col("l_quantity")).as("cl"),
        floor(col("l_tax") * 100).as("fl"),
        Det.q4(pow(col("l_quantity"), 2.0)).as("q2"),
        Det.q4(log(col("l_extendedprice"))).as("lnp"))
      .orderBy("l_orderkey", "l_linenumber", "r1", "absd", "cl", "fl", "q2", "lnp")

  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))
      .withColumn("k_bucket", col("k_int") % 10)
      .orderBy("event_id")

  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        Det.q4(element_at(col("embedding"), 1).cast("double")).as("e1"),
        Det.q4(aggregate(
            transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x)).as("ssum"),
        Det.q4(array_max(col("embedding")).cast("double")).as("emax"),
        size(slice(col("embedding"), 1, 8)).as("first8"))
      .orderBy("vec_id")

  /** Null-handling family: nullif / coalesce / nvl2-style CASE over a
    * genuinely nullable join result. */
  def nullHandling(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "P")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("p_cnt")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("p_cnt"), lit(0L)).as("p_orders"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(hidden)")).as("seg_shown"),
        when(col("p_cnt").isNull, lit("none")).otherwise(lit("some")).as("has_p"))
      .orderBy("c_custkey")

  /** Bitwise family over event ids (hash-bucketing arithmetic). */
  def bitwiseFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("lo_byte"),
        col("event_id").bitwiseOR(lit(4096L)).as("with_flag"),
        col("event_id").bitwiseXOR(col("user_id")).as("xored"),
        shiftleft(col("event_id"), 2).as("shl2"),
        shiftright(col("event_id"), 3).as("shr3"))
      .orderBy("event_id")

  /** Generator: one row per step of a per-row sequence (explode over
    * `sequence`, the generator shape beyond the flagship's explode-split). */
  def generateSeries(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)
      .select(col("r_regionkey"), col("r_name"),
        explode(sequence(lit(0), col("r_regionkey"))).as("i"))
      .orderBy("r_regionkey", "i")

  /** Regex family: replace / extract-all / match over document prefixes.
    * Patterns stick to greedy character classes, which evaluate identically
    * under Java regex (Spark) and RE2 (DuckDB). */
  def regexpFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        regexp_replace(substring(col("text"), 1, 80), "[aeiou]", "_").as("devowel"),
        size(regexp_extract_all(substring(col("text"), 1, 200),
          lit("[a-z]{6,}"), lit(0))).as("n_long_words"),
        col("text").rlike("data").as("mentions_data"),
        regexp_extract(substring(col("text"), 1, 120), "([a-z]+) join", 1).as("before_join"))
      .orderBy("doc_id")

  /** Calendar arithmetic beyond q_date_funcs: month-stepping, month-end,
    * day-of-week (Spark: 1=Sunday; the oracle shifts DuckDB's 0=Sunday),
    * ISO week, quarter, and fractional months_between (mirrored in SQL via
    * Spark's documented (day1-day2)/31 rule, simplified by the day-1
    * anchor). */
  def dateArith(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        fmtDate(add_months(col("o_orderdate"), 3)).as("plus3mo"),
        fmtDate(last_day(col("o_orderdate"))).as("month_end"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        quarter(col("o_orderdate")).as("qtr"),
        Det.q4(months_between(lit("2000-01-01").cast("timestamp"),
          col("o_orderdate"))).as("mo_to_2000"))
      .orderBy("o_orderkey")

  /** Generator variants beyond plain explode: posexplode (element +
    * 1-based position) and explode_outer (rows with an empty array
    * survive with nulls). The long-word filter makes genuinely empty
    * arrays so the outer semantics are exercised. */
  def explodeVariants(s: SparkSession, d: String): DataFrame = {
    val longWords = filter(split(col("text"), " "), w => length(w) >= 8)
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode_outer(longWords).as(Seq("pos", "word")))
      .select(col("doc_id"), (col("pos") + 1).as("pos1"), col("word"))
      .orderBy(col("doc_id").asc, col("pos1").asc_nulls_first)
  }

  /** Error-tolerant casting over a deliberately dirty column — the typed
    * normalization stage after an all-string TSV ingest (the reference's R1
    * schema). Every third id is corrupted with a non-numeric prefix;
    * try_cast yields null there instead of failing the job, and the
    * downstream coalesce shows the standard quarantine-or-default split. */
  def tryCastDirty(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("raw_id",
        when(col("c_custkey") % 3 === 0, concat(lit("x"), split_part(col("c_name"), lit("#"), lit(2))))
          .otherwise(split_part(col("c_name"), lit("#"), lit(2))))
      .select(
        col("c_custkey"), col("raw_id"),
        expr("try_cast(raw_id AS BIGINT)").as("parsed_id"),
        coalesce(expr("try_cast(raw_id AS BIGINT)"), lit(-1L)).as("id_or_default"),
        expr("try_cast(raw_id AS BIGINT)").isNull.as("quarantined"))
      .orderBy("c_custkey")

  /** Collated comparison (Spark 4 collation support): deterministically
    * re-case half the corpus's 12-char prefixes, then count distinct
    * values under binary vs `UTF8_LCASE` collation per language — the
    * case-insensitive count collapses the synthesized case variants. The
    * fixture text is pure ASCII, where UTF8_LCASE equality coincides with
    * `lower()` equality — which is exactly what the oracle states (DuckDB
    * has no Spark collations). Scalar counts keep the result deterministic
    * (a collated groupBy's representative value would not be). */
  def collation(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 2 === 0, upper(substring(col("text"), 1, 12)))
          .otherwise(substring(col("text"), 1, 12)).as("pfx"))
      .selectExpr("lang", "pfx", "collate(pfx, 'UTF8_LCASE') AS pfx_ci")
      .groupBy("lang")
      .agg(
        countDistinct(col("pfx")).as("n_case_sensitive"),
        countDistinct(col("pfx_ci")).as("n_case_insensitive"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_collation"    -> (collation _),
    "q_string_funcs" -> (stringFuncs _),
    "q_regexp_funcs" -> (regexpFuncs _),
    "q_date_arith"   -> (dateArith _),
    "q_explode_variants" -> (explodeVariants _),
    "q_try_cast"     -> (tryCastDirty _),
    "q_null_handling" -> (nullHandling _),
    "q_bitwise"      -> (bitwiseFuncs _),
    "q_generate_series" -> (generateSeries _),
    "q_date_funcs"   -> (dateFuncs _),
    "q_math_funcs"   -> (mathFuncs _),
    "q_json_funcs"   -> (jsonFuncs _),
    "q_array_funcs"  -> (arrayFuncs _),
  )

  val oracle: Map[String, String] = Map(
    "q_regexp_funcs" ->
      """SELECT doc_id,
        |       regexp_replace(substring(text, 1, 80), '[aeiou]', '_', 'g') AS devowel,
        |       CAST(len(regexp_extract_all(substring(text, 1, 200), '[a-z]{6,}')) AS INTEGER) AS n_long_words,
        |       regexp_matches(text, 'data') AS mentions_data,
        |       regexp_extract(substring(text, 1, 120), '([a-z]+) join', 1) AS before_join
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_try_cast" ->
      """WITH r AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 3 = 0
        |              THEN 'x' || split_part(c_name, '#', 2)
        |              ELSE split_part(c_name, '#', 2) END AS raw_id
        |  FROM customer
        |)
        |SELECT c_custkey, raw_id,
        |       TRY_CAST(raw_id AS BIGINT) AS parsed_id,
        |       coalesce(TRY_CAST(raw_id AS BIGINT), -1) AS id_or_default,
        |       TRY_CAST(raw_id AS BIGINT) IS NULL AS quarantined
        |FROM r
        |ORDER BY c_custkey""".stripMargin,
    "q_explode_variants" ->
      """WITH l AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), w -> length(w) >= 8) AS lw
        |  FROM documents
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS pos1, lw[i] AS word
        |FROM l, unnest(range(1, len(lw) + 1)) AS t(i)
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS INTEGER), NULL FROM l WHERE len(lw) = 0
        |ORDER BY doc_id ASC, pos1 ASC NULLS FIRST""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
        |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |       floor(((2000 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
        |             + CASE WHEN day(o_orderdate) = 1 THEN 0.0
        |                    ELSE (1 - day(o_orderdate)) / 31.0 END) * 10000 + 0.5) / 10000 AS mo_to_2000
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_collation" ->
      """WITH p AS (
        |  SELECT lang,
        |         CASE WHEN doc_id % 2 = 0 THEN upper(substring(text, 1, 12))
        |              ELSE substring(text, 1, 12) END AS pfx
        |  FROM documents
        |)
        |SELECT lang,
        |       count(DISTINCT pfx) AS n_case_sensitive,
        |       count(DISTINCT lower(pfx)) AS n_case_insensitive
        |FROM p GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       lower(c_name) AS lname,
        |       upper(c_mktsegment) AS useg,
        |       substring(c_name, 10, 6) AS name_id,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       concat_ws('-', c_mktsegment, c_custkey) AS seg_key,
        |       CAST(length(c_name) AS INTEGER) AS name_len,
        |       trim('  ' || c_mktsegment || '  ') AS trimmed,
        |       split_part(c_name, '#', 2) AS id_part,
        |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS xlated,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |       reverse(c_mktsegment) AS revseg
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_bitwise" ->
      """SELECT event_id,
        |       event_id & 255 AS lo_byte,
        |       event_id | 4096 AS with_flag,
        |       xor(event_id, user_id) AS xored,
        |       event_id << 2 AS shl2,
        |       event_id >> 3 AS shr3
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_generate_series" ->
      """SELECT r_regionkey, r_name, CAST(i AS INTEGER) AS i
        |FROM region, unnest(range(r_regionkey + 1)) AS t(i)
        |ORDER BY r_regionkey, i""".stripMargin,
    "q_null_handling" ->
      """SELECT c_custkey,
        |       COALESCE(p_cnt, 0) AS p_orders,
        |       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
        |       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(hidden)') AS seg_shown,
        |       CASE WHEN p_cnt IS NULL THEN 'none' ELSE 'some' END AS has_p
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, COUNT(*) AS p_cnt FROM orders
        |           WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(month(o_orderdate) AS INTEGER) AS mo,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_02,
        |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor((l_extendedprice) * 10 + 0.5) / 10 AS r1,
        |       abs(l_discount - 0.05) AS absd,
        |       CAST(ceil(l_quantity) AS BIGINT) AS cl,
        |       CAST(floor(l_tax * 100) AS BIGINT) AS fl,
        |       floor((pow(l_quantity, 2.0)) * 10000 + 0.5) / 10000 AS q2,
        |       floor((ln(l_extendedprice)) * 10000 + 0.5) / 10000 AS lnp
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, r1, absd, cl, fl, q2, lnp""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id, event_type,
        |       CAST(props->>'$.k' AS INTEGER) AS k_int,
        |       CAST(props->>'$.k' AS INTEGER) % 10 AS k_bucket
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS INTEGER) AS dim,
        |       floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS e1,
        |       floor((list_sum(CAST(embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 AS ssum,
        |       floor((CAST(list_aggregate(embedding, 'max') AS DOUBLE)) * 10000 + 0.5) / 10000 AS emax,
        |       CAST(len(embedding[1:8]) AS INTEGER) AS first8
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
  )
}
