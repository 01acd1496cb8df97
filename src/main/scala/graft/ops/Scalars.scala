package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface: string / date / math / json / array / map +
  * the explode generator (SURVEY §2.8).
  *
  * The reference genre hand-codes all of these inside `Mapper.map()` (Java
  * String ops, SimpleDateFormat, java.lang.Math, hand-rolled JSON parsing).
  * Here everything is a built-in Catalyst expression — codegen'd, no UDFs
  * (SURVEY §2.13 policy) — so whole-stage codegen spans the full projection.
  *
  * Cross-dialect pins (see Oracles.scala): computed ints → 64-bit on both
  * sides; Spark `datediff(end, start)` vs DuckDB `datediff('day', start,
  * end)`; 0-based `arr[i]` in Spark SQL vs 1-based list indexing in DuckDB.
  */
object Scalars {

  /** Fuzzy string matching (§2.16): nation-name pairs within edit
    * distance 1 — entity-resolution's workhorse predicate. Threshold 1,
    * not a looser bound: on this dim every pair is within distance 2, so
    * any higher cutoff would never reject a row and the graded check
    * would be vacuous (the q_dedup_exact lesson); at 1 the filter keeps
    * 133 of 300 pairs. Tiny dim here (broadcast all-pairs is correct); at
    * corpus scale the same contract runs behind a length/prefix band
    * (|len(a)−len(b)| ≤ d prunes first), the standard edit-distance
    * blocking scheme. */
  def qFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "nation")
      .select(col("n_nationkey").as("ak"), col("n_name").as("name_a"))
    val b = t(s, dir, "nation")
      .select(col("n_nationkey").as("bk"), col("n_name").as("name_b"))
    orderedAll(a.join(broadcast(b), col("ak") < col("bk"))
      .withColumn("d", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("d") <= 1)
      .select("name_a", "name_b", "d"))
  }

  def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_type")).as("low"),
      substring(col("p_name"), 1, 5).as("sub"),
      concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
      length(col("p_name")).cast("long").as("len"),
      regexp_replace(col("p_name"), " ", "_").as("rep"),
      trim(concat(lit(" "), col("p_name"), lit(" "))).as("trm"),
      regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("long")
        .as("brand_num")))

  def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long").as("d_since"),
      // dates re-cast to timestamp: Spark's parquet DATE and DuckDB's DATE
      // reach the comparer as different python types (date vs datetime);
      // TIMESTAMP is representation-stable on both paths.
      date_add(col("o_orderdate").cast("date"), 30).cast("timestamp")
        .as("d_plus30"),
      last_day(col("o_orderdate").cast("date")).cast("timestamp").as("eom")))

  def qMathFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(abs(col("l_extendedprice") - 50000), 4).as("ab"),
      ceil(col("l_quantity")).cast("long").as("ce"),
      floor(col("l_quantity")).cast("long").as("fl"),
      round(sqrt(col("l_extendedprice")), 4).as("sq"),
      round(log(col("l_extendedprice") + 1), 4).as("logv"),
      round(pow(col("l_discount") + 1, 2), 4).as("pw"),
      pmod(col("l_orderkey"), lit(7L)).as("pm")))

  def qJsonFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k")))

  def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        array_contains(col("toks"), "spark").as("has_spark"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("first3"),
        concat_ws(" ", sort_array(col("toks"))).as("sorted_text")))

  /** 1→N generation — the map phase itself in MR terms; Catalyst Generator. */
  /** Higher-order array functions — transform / filter / aggregate /
    * exists / forall over the token list, 64-bit pinned (DuckDB twins:
    * list_transform / list_filter / list_reduce). These are the in-row
    * lambdas of SURVEY §2.8; the codegen'd relational forms are preferred
    * on hot paths (see Sketches), but the HOF surface itself is part of
    * the contract. */
  def qHofFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .withColumn("toks", graft.ops.tokens(col("text")))
      .select(
        col("doc_id"),
        expr("CAST(size(filter(toks, x -> length(x) > 3)) AS BIGINT)")
          .as("n_long"),
        expr("aggregate(toks, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))")
          .as("sum_len"),
        expr("exists(toks, x -> length(x) > 6)").as("has_long"),
        expr("forall(toks, x -> length(x) >= 1)").as("all_nonempty")))

  /** Generated calendar spine (sequence + explode) LEFT-joined to orders —
    * the practical date-dimension pattern (the recursive-CTE twin is
    * q_cte_recursive); months with no orders survive with zero counts. */
  def qCalendarSpine(s: SparkSession, dir: String): DataFrame = {
    val spine = s.range(1).select(explode(expr(
      """sequence(TIMESTAMP '1995-01-01', TIMESTAMP '1996-12-01',
        |         INTERVAL 1 MONTH)""".stripMargin)).as("month_start"))
    orderedAll(spine.join(
        t(s, dir, "orders")
          .withColumn("m", date_trunc("month", col("o_orderdate"))),
        col("m") === col("month_start"), "left")
      .groupBy("month_start")
      .agg(count(col("o_orderkey")).as("n"),
        dsum(col("o_totalprice")).as("total")))
  }

  /** Struct create/access: named_struct built in-row, fields projected
    * back out plus a struct-comparison flag (structs compare field-wise). */
  def qStructFuncs(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "supplier")
      .withColumn("sb", struct(col("s_nationkey").as("nk"),
        col("s_acctbal").as("bal")))
      .select(
        col("s_suppkey"),
        col("sb.nk").as("nk"),
        col("sb.bal").as("bal"),
        (col("sb") === struct(lit(3).as("nk"), col("s_acctbal").as("bal")))
          .as("is_nation3")))

  def qExplode(s: SparkSession, dir: String): DataFrame =
    orderedAll(t(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token")))

  /** Build map(lang→count) per source via map_from_entries, then explode it
    * back to deterministic rows (SURVEY §2.8 q_map_funcs: emitted flattened
    * so the oracle is a plain GROUP BY). */
  def qMapFuncs(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
    val m = base.groupBy("source")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("lang"), col("cnt"))))).as("m"))
    orderedAll(m.select(col("source"), explode(col("m")))
      .withColumnRenamed("key", "lang").withColumnRenamed("value", "n"))
  }
}
