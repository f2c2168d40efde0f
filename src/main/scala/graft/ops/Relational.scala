package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.expr.Exprs._
import graft.tables.Tables._
import graft.ops.Out._

/** Core relational surface (SURVEY §2.1-§2.7) re-expressed over the driver
  * corpus. Each query is a pure declarative DataFrame plan — scans prune
  * columns and push predicates into parquet, joins pick broadcast vs
  * sort-merge via Catalyst/AQE, aggregation is partial+final hash agg.
  *
  * Reference cites are to /root/reference (the pandas+BigQuery pipeline);
  * these queries exercise the same operator semantics on the TPC-H-ish corpus
  * so the DuckDB oracle can gate them.
  */
object Relational {

  /** q01: groupBy aggregation (TPC-H Q1 flavor). Implied capability per
    * SURVEY §2.5; partial aggregation map-side keeps the shuffle tiny at
    * 100 TB (32 groups regardless of input rows). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        lsum(col("l_quantity")).as("sum_qty"),
        lsum(col("l_extendedprice")).as("sum_base_price"),
        lsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("sum_disc_price"),
        lavg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .sortedSmall(col("l_returnflag"), col("l_linestatus"))

  val q01Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |${dsumSql("l_quantity")} AS sum_qty,
       |${dsumSql("l_extendedprice")} AS sum_base_price,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS sum_disc_price,
       |${davgSql("l_quantity")} AS avg_qty,
       |COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: filter + projection (P1-P3; reference `main.py:153,201`). Both the
    * predicate and the 4-column projection reach the parquet scan
    * (PushedFilters / ReadSchema). */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-03-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .sortedWide("l_orderkey", "l_linenumber")

  val q02Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-03-01'
      |  AND l_discount > 0.05 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03: 3-way inner join + agg + topN (J1; TPC-H Q3 flavor). customer is
    * a dimension → broadcast; lineitem⋈orders shuffles on orderkey. */
  def q03TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(lsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Oracle: String =
    s"""SELECT l_orderkey, o_orderdate,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q04: left-semi join (P4/J3; reference `main.py:243-246` isin). At scale
    * this is a shuffle-semi (or broadcast-semi when the filter side is
    * small) — never a collected IN-list. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(lineitem(s, dir).filter(col("l_quantity") >= 48)
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .sortedWide("o_orderkey")

  val q04Oracle: String =
    """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |WHERE o_orderkey IN
      |  (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 48)
      |ORDER BY o_orderkey""".stripMargin

  /** q05: left-anti join (P5/J2; reference new-game dedup `main.py:176`).
    * pandas `~isin` = null-insensitive anti-join, exactly Spark left_anti. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .sortedWide("c_custkey")

  val q05Oracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS
      |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q06: the reference's surrogate-key derivation (E2+E3+E5+E6,
    * `main.py:102`): strip separators, last-7 slice, ddHHyyyyMM date part.
    * lpad guarantees ≥7 chars so the negative-start slice is engine-agnostic. */
  def q06SurrogateKey(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"),
        concat(
          substring(lpad(regexp_replace(col("o_orderpriority"), "-", ""),
            7, "0"), -7, 7),
          keyDateFormat(col("o_orderdate"))).as("sk"))
      .sortedWide("o_orderkey")

  val q06Oracle: String =
    """SELECT o_orderkey,
      |  substr(lpad(replace(o_orderpriority, '-', ''), 7, '0'), -7, 7)
      |    || strftime(o_orderdate, '%d%H%Y%m') AS sk
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q07: the reference's snapshot-delta pipeline (J1+E1+P3+P1,
    * `main.py:193-207`): old-vs-new inner join on the key, column diff,
    * keep positive deltas, project. Old = shipped before the cutoff. */
  def q07SnapshotDelta(s: SparkSession, dir: String): DataFrame = {
    // Logically the reference's old⋈new inner join (J1); executed as a
    // single-pass conditional aggregation — one scan + one shuffle instead
    // of two aggregations + a join. `qty_old IS NOT NULL` reproduces the
    // inner join's "key existed in the old snapshot" semantics. At 100 TB
    // this halves both scan bytes and shuffle volume.
    val cutoff = lit("1999-01-01").cast("timestamp")
    lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(lsum(col("l_quantity")).as("qty_new"),
        lsum(when(col("l_shipdate") < cutoff, col("l_quantity")))
          .as("qty_old"))
      .withColumn("qty_diff", col("qty_new") - col("qty_old"))
      .filter(col("qty_old").isNotNull && col("qty_diff") > 0)
      .select("l_orderkey", "qty_diff")
      .sortedWide("l_orderkey")
  }

  val q07Oracle: String = {
    val oldSum = dsumSql(
      "CASE WHEN l_shipdate < TIMESTAMP '1999-01-01' THEN l_quantity END")
    s"""WITH agg AS (
       |  SELECT l_orderkey, ${dsumSql("l_quantity")} AS qty_new,
       |    $oldSum AS qty_old
       |  FROM lineitem GROUP BY l_orderkey)
       |SELECT l_orderkey, qty_new - qty_old AS qty_diff
       |FROM agg
       |WHERE qty_old IS NOT NULL AND qty_new - qty_old > 0
       |ORDER BY l_orderkey""".stripMargin
  }

  /** q08: window functions (SURVEY §2.6 — lag() is the declarative twin of
    * the reference's snapshot diff). Partition by customer, deterministic
    * intra-partition order via (date, key). */
  def q08WindowLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .sortedWide(col("o_custkey"), col("rn"))
  }

  val q08Oracle: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    lag(o_totalprice, 1) OVER w AS prev_price,
      |    row_number() OVER w AS rn
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_orderdate, o_orderkey))
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** q09: global top-K (orderBy+limit; SURVEY §2.6). Spark plans this as
    * TakeOrderedAndProject — per-partition top-K then a K-row merge, no full
    * sort at 100 TB. */
  def q09TopK(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val q09Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** q10: groupBy + HAVING (implied aggregation surface, SURVEY §2.5). */
  def q10GroupHaving(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_count"),
        lsum(col("o_totalprice")).as("total_spent"))
      .filter(col("order_count") >= 15)
      .sortedWide("o_custkey")

  val q10Oracle: String =
    s"""SELECT o_custkey, COUNT(*) AS order_count,
       |${dsumSql("o_totalprice")} AS total_spent
       |FROM orders GROUP BY o_custkey
       |HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin

  /** q11: union + distinct (SURVEY §2.6 — the reference's union is sink-side
    * append, K1/K2; here as an explicit relational op). */
  def q11UnionDistinct(s: SparkSession, dir: String): DataFrame =
    customer(s, dir).select(col("c_mktsegment").as("val"))
      .union(orders(s, dir).select(col("o_orderpriority").as("val")))
      .distinct()
      .sortedSmall("val")

  val q11Oracle: String =
    """SELECT DISTINCT val FROM (
      |  SELECT c_mktsegment AS val FROM customer
      |  UNION ALL
      |  SELECT o_orderpriority AS val FROM orders)
      |ORDER BY val""".stripMargin

  /** q12: conditional aggregation (CASE WHEN inside agg; TPC-H Q12 flavor). */
  def q12CaseAgg(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).select("o_orderkey", "o_orderpriority")
    lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .sortedSmall("l_linestatus")
  }

  val q12Oracle: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate < TIMESTAMP '1999-01-01'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** q13: scalar string function gallery (E2-E5: substring, replace, length,
    * concat, cast — reference `main.py:95-105`). */
  def q13StringFuncs(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 10)).as("name10"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        concat(col("p_brand"), lit("#"), col("p_size").cast("string"))
          .as("brand_size"))
      .sortedWide("p_partkey")

  val q13Oracle: String =
    """SELECT p_partkey,
      |  upper(substr(p_name, 1, 10)) AS name10,
      |  length(p_name) AS name_len,
      |  replace(p_type, ' ', '_') AS type_us,
      |  p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q14: date bucketing + time-series aggregation (E7/E9 surface). */
  def q14MonthlyRevenue(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        lsum(col("o_totalprice")).as("revenue"))
      .sortedSmall("month")

  val q14Oracle: String =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS revenue
       |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** q15: 5-table star join (flagship; TPC-H Q5 flavor). Dimensions
    * (region/nation/customer) broadcast; the fact join shuffles once on
    * orderkey. This is the plan shape that must survive 100 TB: one shuffle,
    * all dims broadcast, partial agg before the final 25-group exchange. */
  def q15StarJoin(s: SparkSession, dir: String): DataFrame = {
    val r = region(s, dir)
    val n = nation(s, dir)
    val c = customer(s, dir)
    val o = orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    lineitem(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(lsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .sortedSmall(col("r_name"), col("n_name"))
  }

  val q15Oracle: String =
    s"""SELECT r_name, n_name,
       |${dsumSql("l_extendedprice*(1-l_discount)", 6)} AS revenue,
       |COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** q16: merge-upsert semantics (K4, reference `main.py:256-287`
    * UPDATE-FROM): target left-joins the update set on the key; matched rows
    * take updated columns via coalesce. This is the read-join-overwrite MERGE
    * strategy for plain parquet (Delta MERGE plans the same join). */
  def q16MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val target = orders(s, dir)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val updates = orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("u_orderkey"),
        (col("o_totalprice") * 1.1).as("u_totalprice"))
    target.join(updates, col("o_orderkey") === col("u_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("u_totalprice"), col("o_totalprice"))
          .as("merged_price"),
        when(col("u_orderkey").isNotNull, lit("updated"))
          .otherwise(lit("kept")).as("merge_action"))
      .sortedWide("o_orderkey")
  }

  val q16Oracle: String =
    """SELECT o_orderkey,
      |  COALESCE(u.u_totalprice, o.o_totalprice) AS merged_price,
      |  CASE WHEN u.u_orderkey IS NOT NULL
      |       THEN 'updated' ELSE 'kept' END AS merge_action
      |FROM orders o LEFT JOIN (
      |  SELECT o_orderkey AS u_orderkey, o_totalprice * 1.1 AS u_totalprice
      |  FROM orders WHERE o_orderstatus = 'O') u
      |ON o.o_orderkey = u.u_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q17: hierarchical aggregation (ROLLUP) — subtotal + grand-total rows.
    * Group keys are COALESCE'd to 'ALL' so the output is null-free (engine-
    * portable ordering/hashing). */
  def q17Rollup(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(lsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n_rows"))
      .sortedSmall("rflag", "lstatus")

  val q17Oracle: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
       |COALESCE(l_linestatus, 'ALL') AS lstatus,
       |${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rflag, lstatus""".stripMargin

  /** q18: pivot — wide conditional aggregation (linestatus → columns). */
  def q18Pivot(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(lsum(col("l_quantity")))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .sortedSmall("l_returnflag")

  val q18Oracle: String = {
    def c(v: String) = dsumSql(s"CASE WHEN l_linestatus = '$v' THEN l_quantity END")
    s"""SELECT l_returnflag, ${c("F")} AS qty_f, ${c("O")} AS qty_o
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** q19: exact multi-column distinct counts (expansion-based in Spark —
    * each COUNT(DISTINCT x) plans an expand + two-phase agg). */
  def q19DistinctExact(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        countDistinct(col("l_orderkey")).as("nd_orders"))
      .sortedSmall("l_returnflag")

  val q19Oracle: String =
    """SELECT l_returnflag,
      |COUNT(DISTINCT l_partkey) AS nd_parts,
      |COUNT(DISTINCT l_suppkey) AS nd_supps,
      |COUNT(DISTINCT l_orderkey) AS nd_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q20: approximate distinct (HyperLogLog++) — the sketch path that
    * replaces q19's expand at 100 TB (constant memory per group, one pass,
    * mergeable partials). DuckDB's HLL produces different estimates, so the
    * oracle gates the *contract* rather than the raw sketch value: the
    * query emits whether each estimate lands within 5% of the exact count
    * (rsd is configured at 2%), which DuckDB asserts as constant-true. */
  def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    def ok(apx: Column, exact: Column): Column =
      abs(apx - exact).cast("double") / exact <= 0.05
    // One distinct-column per aggregation: mixing two countDistincts in a
    // single agg makes Catalyst Expand the scan per distinct column (2×
    // the rows through the hash aggregate); two single-distinct passes
    // joined on the 3-row group key are cheaper and each stays a plain
    // two-level (partial distinct, merge) aggregation. The HLL sketch
    // rides whichever pass shares its column. (Re-measured round 15: the
    // fused Expand variant is 2.7× SLOWER — 1.37 → 3.68 s warm at sf0.1 —
    // the wider first-level distinct keys cost more than the saved scan.)
    def pass(keyCol: String, apx: String, nd: String): DataFrame =
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col(keyCol), 0.02).as(apx),
          countDistinct(col(keyCol)).as(nd))
    pass("l_partkey", "apx_parts", "nd_parts")
      .join(pass("l_suppkey", "apx_supps", "nd_supps"), "l_returnflag")
      .select(col("l_returnflag"),
        ok(col("apx_parts"), col("nd_parts")).as("parts_within_tol"),
        ok(col("apx_supps"), col("nd_supps")).as("supps_within_tol"))
      .sortedSmall("l_returnflag")
  }

  val q20Oracle: String =
    """SELECT l_returnflag,
      |  true AS parts_within_tol, true AS supps_within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q21: correlated scalar subquery, expressed through the engine's SQL
    * front-end (ops.Sql → Catalyst decorrelates it into an aggregate +
    * join). Decimal avg keeps the threshold engine-exact. */
  def q21ScalarSubquery(s: SparkSession, dir: String): DataFrame =
    Sql.run(s, dir,
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(AVG(CAST(o2.o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)

  val q21Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(AVG(CAST(o2.o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q22: set difference (EXCEPT) — customers with open orders but no
    * finished ones. Spark plans EXCEPT as a left-anti join under distinct. */
  def q22Except(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .sortedWide("o_custkey")
  }

  val q22Oracle: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** q23: date arithmetic — fulfillment lag in days per order (datediff on
    * midnight-aligned timestamps; E7/E9 surface). */
  def q23FulfillmentDays(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("first_ship"))
      .join(orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"),
        datediff(col("first_ship"), col("o_orderdate")).cast("long")
          .as("lag_days"))
      .sortedWide("o_orderkey")

  val q23Oracle: String =
    """SELECT o_orderkey,
      |  CAST(date_diff('day', o_orderdate, first_ship) AS BIGINT)
      |    AS lag_days
      |FROM (SELECT l_orderkey, MIN(l_shipdate) AS first_ship
      |      FROM lineitem GROUP BY l_orderkey) f
      |JOIN orders ON f.l_orderkey = o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q24: exact quantiles (percentile_cont interpolation — sort-based
    * distributed aggregate; the sketch twin would be approx_percentile). */
  def q24Quantiles(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"))
      .sortedSmall("l_returnflag")

  val q24Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q25: ntile + cumulative distribution — the ranking-window surface
    * beyond q08's lag/row_number (customer spend quartiles). A bare
    * `Window.orderBy` would drag every row to one partition; instead the
    * total order comes from [[Rank.withGlobalRankN]] (range-repartition +
    * per-partition row_number + broadcast offsets) and ntile/cume_dist are
    * arithmetic on the unique rank. */
  def q25SpendQuartiles(s: SparkSession, dir: String): DataFrame = {
    val spend = orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(lsum(col("o_totalprice")).as("spent"))
    val (ranked, n) =
      Rank.withGlobalRankN(spend, Seq(col("spent").desc, col("o_custkey")), "_r")
    ranked
      .select(col("o_custkey"), col("spent"),
        Rank.ntileFromRank(col("_r"), n, 4).as("quartile"),
        round(Rank.cumeDistFromRank(col("_r"), n), 6).as("cd"))
      .filter(col("quartile") === 1)
      .sortedWide("o_custkey")
  }

  val q25Oracle: String =
    s"""WITH spend AS (
       |  SELECT o_custkey, ${dsumSql("o_totalprice")} AS spent
       |  FROM orders GROUP BY o_custkey),
       |r AS (
       |  SELECT o_custkey, spent,
       |    ntile(4) OVER w AS quartile,
       |    round(cume_dist() OVER w, 6) AS cd
       |  FROM spend
       |  WINDOW w AS (ORDER BY spent DESC, o_custkey))
       |SELECT * FROM r WHERE quartile = 1 ORDER BY o_custkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01PricingSummary, Some(q01Oracle)),
    Q("q02_filter_project", q02FilterProject, Some(q02Oracle)),
    Q("q03_top_revenue", q03TopRevenue, Some(q03Oracle)),
    Q("q04_semi_join", q04SemiJoin, Some(q04Oracle)),
    Q("q05_anti_join", q05AntiJoin, Some(q05Oracle)),
    Q("q06_surrogate_key", q06SurrogateKey, Some(q06Oracle)),
    Q("q07_snapshot_delta", q07SnapshotDelta, Some(q07Oracle)),
    Q("q08_window_lag", q08WindowLag, Some(q08Oracle)),
    Q("q09_topk", q09TopK, Some(q09Oracle)),
    Q("q10_group_having", q10GroupHaving, Some(q10Oracle)),
    Q("q11_union_distinct", q11UnionDistinct, Some(q11Oracle)),
    Q("q12_case_agg", q12CaseAgg, Some(q12Oracle)),
    Q("q13_string_funcs", q13StringFuncs, Some(q13Oracle)),
    Q("q14_monthly_revenue", q14MonthlyRevenue, Some(q14Oracle)),
    Q("q15_star_join", q15StarJoin, Some(q15Oracle)),
    Q("q16_merge_upsert", q16MergeUpsert, Some(q16Oracle)),
    Q("q17_rollup", q17Rollup, Some(q17Oracle)),
    Q("q18_pivot", q18Pivot, Some(q18Oracle)),
    Q("q19_distinct_exact", q19DistinctExact, Some(q19Oracle)),
    Q("q20_approx_distinct", q20ApproxDistinct, Some(q20Oracle)),
    Q("q21_scalar_subquery", q21ScalarSubquery, Some(q21Oracle)),
    Q("q22_except", q22Except, Some(q22Oracle)),
    Q("q23_fulfillment_days", q23FulfillmentDays, Some(q23Oracle)),
    Q("q24_quantiles", q24Quantiles, Some(q24Oracle)),
    Q("q25_spend_quartiles", q25SpendQuartiles, Some(q25Oracle)))
}
