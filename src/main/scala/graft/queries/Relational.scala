package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** The relational operator surface of the reference (SURVEY.md §2.B) —
  * module SQL there delegates to SQLite; here each category is expressed
  * Spark-first with the DataFrame API and verified against a DuckDB oracle.
  *
  * Float determinism: any aggregated arithmetic is routed through
  * DECIMAL(10,2) on BOTH sides (Spark + DuckDB oracle SQL). Decimal math is
  * exact in both engines (no precision cap is hit at these widths), so
  * results hash-match regardless of aggregation order — a raw double sum
  * would differ in ULPs between engines. Per-row double arithmetic is fine
  * (IEEE ops on identical inputs are deterministic).
  */
object Relational {

  case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  private def dec(c: Column): Column = c.cast(DecimalType(10, 2))
  private def dbl(c: Column): Column = c.cast("double")
  /** DuckDB-side equivalent of dec() */
  private def sqlDec(col: String) = s"CAST($col AS DECIMAL(10,2))"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.df(s, dir, name)

  /** HLL numerator alpha_64 * m^2 * 2^55, computed once and inlined as the
    * SAME literal on both engines (shortest round-trip repr → identical
    * double after parsing). */
  private val hllC: Double = 0.709 * 4096.0 * math.pow(2.0, 55)

  /** Bucketed-layout artifacts for q_join_bucketed: written once per
    * (session, dir) — the gate's steady-state cost is the exchange-free
    * join, not the layout build. Table names carry a dir hash because the
    * external catalog is shared across sessions of one SparkContext. */
  private val bucketedReady = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Boolean]

  // q_tpch_q15's / q_tpch_q11_shape's persisted aggregates (two consumers
  // each), one retained run per (session, corpus), swept on re-entry —
  // the shared GateCache discipline
  private val q15Caches = GateCache.frame()
  private val q11Caches = GateCache.frame()

  private[graft] def bucketedName(dir: String, table: String): String =
    s"graft_b_${table}_${(dir.hashCode & Int.MaxValue).toHexString}"

  private[graft] def ensureBucketed(s: SparkSession, dir: String): Unit =
    bucketedReady.getOrElseUpdate((s, dir), {
      val wh = graft.TempDirs.create("graft-bucketed").toString
      val ln = bucketedName(dir, "lineitem"); val on = bucketedName(dir, "orders")
      s.sql(s"DROP TABLE IF EXISTS $ln"); s.sql(s"DROP TABLE IF EXISTS $on")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.format("parquet").mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem").saveAsTable(ln)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.format("parquet").mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders").saveAsTable(on)
      true
    })

  val all: Map[String, Q] = Map(

    // ---- aggregation: GROUP BY + sum/avg/count (TPC-H Q1 shape) ----
    "q1_agg" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
            dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
            dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
            dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      // the final DOUBLE casts hop through VARCHAR: DuckDB's direct
      // DECIMAL→DOUBLE cast double-rounds once the unscaled value exceeds
      // 2^53 (hugeint→double, then /10^scale), which surfaces at sf1-scale
      // sums with scale-6 money products; string parsing is correctly
      // rounded, matching Spark's (already correctly rounded) cast
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(CAST(sum(${sqlDec("l_quantity")}) AS VARCHAR) AS DOUBLE) AS sum_qty,
              |  CAST(CAST(sum(${sqlDec("l_extendedprice")}) AS VARCHAR) AS DOUBLE) AS sum_base_price,
              |  CAST(CAST(sum(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
              |  CAST(CAST(sum(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")}) * (1 + ${sqlDec("l_tax")})) AS VARCHAR) AS DOUBLE) AS sum_charge,
              |  count(*) AS count_order
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- projection + filter + per-row expression (pushdown check) ----
    "q_proj_filter" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 30 &&
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1.0 - l_discount) AS revenue
             |FROM lineitem
             |WHERE l_quantity > 30 AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- inner equi-join; customer is data-proportional (not a dim), so
    // no broadcast hint: AQE picks broadcast at small SF and switches to a
    // shuffle join when the build side would not fit at scale ----
    "q_join_inner" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- left outer join + grouped agg with COALESCE(total) semantics ----
    "q_join_left" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(dbl(sum(dec(col("o_totalprice")))), lit(0.0)).as("total_spent"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
              |  COALESCE(CAST(sum(${sqlDec("o_totalprice")}) AS DOUBLE), 0.0) AS total_spent
              |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              |GROUP BY c_custkey, c_name
              |ORDER BY c_custkey""".stripMargin)),

    // ---- full outer join: both null directions exercised ----
    // per-user event counts vs a customer band chosen so the result has
    // matched rows, user-only rows AND customer-only rows; keys coalesce
    // into one output column
    "q_join_full" -> Q(
      (s, dir) => {
        val u = t(s, dir, "events").groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        val c = t(s, dir, "customer")
          .filter(col("c_custkey") >= 100 && col("c_custkey") < 200)
          .select(col("c_custkey"), col("c_name"))
        u.join(c, col("user_id") === col("c_custkey"), "full_outer")
          .select(coalesce(col("user_id"), col("c_custkey")).as("k"),
            col("n_events"), col("c_name"))
          .orderBy(col("k"))
      },
      Some("""SELECT coalesce(user_id, c_custkey) AS k, n_events, c_name
             |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) u
             |FULL JOIN (SELECT c_custkey, c_name FROM customer
             |           WHERE c_custkey >= 100 AND c_custkey < 200) c
             |  ON user_id = c_custkey
             |ORDER BY k""".stripMargin)),

    // ---- left semi join (EXISTS) ----
    "q_join_semi" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        c.join(o, Seq("c_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- left anti join (NOT EXISTS) ----
    "q_join_anti" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        c.join(o, Seq("c_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- multi-way join through dims (TPC-H Q5 shape, dims broadcast) ----
    "q_join_multi" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        // nation/region are true fixed-size dims → broadcast; customer
        // grows with the data → let AQE decide the build side at runtime
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(s"""SELECT r_name, n_name,
              |  CAST(sum(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue,
              |  count(*) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name, n_name
              |ORDER BY r_name, n_name""".stripMargin)),

    // ---- ORDER BY + LIMIT (top-k) ----
    "q_topk" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- DISTINCT ----
    "q_distinct" -> Q(
      (s, dir) =>
        t(s, dir, "customer").select(col("c_mktsegment")).distinct()
          .orderBy(col("c_mktsegment")),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // ---- group_concat (SQLite whitelist fn) => sorted collect_list join ----
    "q_group_concat" -> Q(
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  count(*) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // ---- global aggregate: min/max/count/count distinct/avg ----
    "q_agg_stats" -> Q(
      (s, dir) =>
        t(s, dir, "orders").agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_customers"),
          (dbl(sum(dec(col("o_totalprice")))) / count(lit(1))).as("avg_price")),
      Some(s"""SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
              |  count(*) AS n_rows, count(DISTINCT o_custkey) AS n_customers,
              |  CAST(sum(${sqlDec("o_totalprice")}) AS DOUBLE) / count(*) AS avg_price
              |FROM orders""".stripMargin)),

    // ---- window: row_number ranking within partition ----
    "q_window_rank" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal FROM (
             |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) WHERE rn <= 3
             |ORDER BY c_mktsegment, rn""".stripMargin)),

    // ---- window: rank-family surface (ntile / percent_rank / cume_dist /
    // first+last value). Ratios are single divisions of exact integers
    // ((rank−1)/(n−1), rows≤/n) — deterministic across engines; the order
    // key includes c_custkey so ties can't reshuffle frames ----
    "q_window_ntile" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "customer")
          .filter(col("c_custkey") < 200)
          .select(col("c_mktsegment"), col("c_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            first(col("c_custkey")).over(wf).as("poorest"),
            last(col("c_custkey")).over(wf).as("richest"))
          .orderBy(col("c_mktsegment"), col("c_custkey"))
      },
      Some("""SELECT c_mktsegment, c_custkey,
             |  ntile(4) OVER w AS quartile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd,
             |  first_value(c_custkey) OVER wf AS poorest,
             |  last_value(c_custkey) OVER wf AS richest
             |FROM customer WHERE c_custkey < 200
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
             |  wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY c_mktsegment, c_custkey""".stripMargin)),

    // ---- window: running aggregate over deterministic row order ----
    // (pre-aggregate to a unique (l_suppkey, l_orderkey) key first: the raw
    // (l_orderkey, l_linenumber) pairs are not unique in the synthetic data,
    // so a running sum ordered by them would be tie-order-dependent)
    "q_window_running" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"), col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"))).as("qty"))
          .select(col("l_suppkey"), col("l_orderkey"),
            dbl(sum(col("qty")).over(w)).as("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"))
      },
      Some(s"""SELECT l_suppkey, l_orderkey,
              |  CAST(sum(qty) OVER (
              |    PARTITION BY l_suppkey ORDER BY l_orderkey
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
              |FROM (SELECT l_suppkey, l_orderkey, sum(${sqlDec("l_quantity")}) AS qty
              |      FROM lineitem GROUP BY 1, 2)
              |ORDER BY l_suppkey, l_orderkey""".stripMargin)),

    // ---- single-pass quantile sketch: 64-bin integer histogram ----
    // The scale alternative to exact percentiles (q_percentiles sorts per
    // group): one map-side binned count with O(bins) state, then p50/p95/
    // p99 read off the cumulative histogram. All binning is BIGINT
    // arithmetic on exact cents, so both engines place every row in the
    // same bin and the answer is bit-identical. Error is bounded by one
    // bin width — the knob a 100 TB profile turns (more bins, same state
    // story) ----
    "q_quantile_sketch" -> Q(
      (s, dir) => {
        val cents = (col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long")
        val c = t(s, dir, "lineitem").select(cents.as("c"))
        val bounds = c.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
          count(lit(1)).as("total"))
        val hist = c.crossJoin(broadcast(bounds))
          .select(expr("(c - mn) DIV ((mx - mn) DIV 64 + 1)").as("bin"),
            col("mn"), expr("(mx - mn) DIV 64 + 1").as("w"), col("total"))
          .groupBy("bin", "mn", "w", "total").agg(count(lit(1)).as("n"))
        // ≤65 rows: the global window is over the HISTOGRAM, not the data
        val cum = hist.withColumn("cum", sum(col("n")).over(
          Window.orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val pcts = {
          import s.implicits._
          Seq(50L, 95L, 99L).toDF("pct")
        }
        cum.crossJoin(broadcast(pcts))
          .filter(col("cum") * 100 >= col("total") * col("pct"))
          .groupBy("pct")
          .agg(min(col("mn") + col("bin") * col("w")).as("approx_cents"))
          .orderBy(col("pct"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
             |  FROM lineitem),
             |bounds AS (SELECT min(c) AS mn, max(c) AS mx, count(*) AS total FROM c),
             |hist AS (
             |  SELECT (c - mn) // ((mx - mn) // 64 + 1) AS bin, mn,
             |         (mx - mn) // 64 + 1 AS w, total, count(*) AS n
             |  FROM c, bounds GROUP BY 1, 2, 3, 4),
             |cum AS (
             |  SELECT bin, mn, w, total, sum(n) OVER (ORDER BY bin) AS cum FROM hist),
             |pcts AS (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS pct)
             |SELECT pct, min(mn + bin * w) AS approx_cents
             |FROM cum, pcts WHERE cum * 100 >= total * pct
             |GROUP BY pct ORDER BY pct""".stripMargin)),

    // ---- HLL-style distinct sketch, bit-exact across engines: 64 buckets
    // from a 60-bit md5 hash, rank = leading-zero count of the remaining
    // 54 bits via an integer CASE ladder (no float logs — both engines
    // compare exact integers), per-bucket max rank folds map-side, and the
    // 2^-rank sum is scaled to an exact BIGINT before the one double
    // division. O(m) state per aggregation: the way you count distincts
    // over 100 TB without a count-distinct shuffle ----
    "q_distinct_sketch" -> Q(
      (s, dir) => {
        val h = graft.functions.VectorExpressions
          .md5_60(s, col("l_partkey").cast("string"))
        val w = shiftright(col("h"), 6)
        // rho = leading zeros of the 54-bit w + 1; w = 0 -> 55
        val rho = (0 until 54).foldLeft[Column](lit(null)) { (acc, i) =>
          if (i == 0) when(w >= (1L << 53), 1)
          else acc.when(w >= (1L << (53 - i)), i + 1)
        }.otherwise(55)
        t(s, dir, "lineitem").select(h.as("h"))
          .select((col("h") % 64).as("bucket"), rho.cast("long").as("rho"))
          .groupBy("bucket").agg(max(col("rho")).as("r"))
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))")).as("z"),
            count(lit(1)).as("filled"))
          .select((lit(hllC) / col("z").cast("double")).as("est_distinct"),
            col("filled"))
      },
      Some(s"""WITH hashed AS (
              |  SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
              |  FROM lineitem),
              |ranked AS (
              |  SELECT h % 64 AS bucket,
              |    CASE ${(0 until 54).map(i =>
                     s"WHEN (h >> 6) >= ${1L << (53 - i)} THEN ${i + 1}").mkString(" ")}
              |    ELSE 55 END AS rho
              |  FROM hashed),
              |folded AS (SELECT bucket, max(rho) AS r FROM ranked GROUP BY bucket)
              |SELECT $hllC / CAST(sum(1::BIGINT << (55 - r)) AS DOUBLE) AS est_distinct,
              |  count(*) AS filled
              |FROM folded""".stripMargin)),

    // ---- gap sessionization, batch form (the oracle-checked twin of the
    // streaming flatMapGroupsWithState sessionize): lag marks session
    // starts, a running sum numbers them, one groupBy folds the bounds.
    // Tie-safety: tied timestamps diff to 0, which never marks a boundary,
    // and the RANGE-default running sum gives tied rows the same sid — so
    // the result is order-independent without a unique tiebreak column ----
    "q_sessionize" -> Q(
      (s, dir) => {
        val gapUs = 3600L * 1000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        val e = t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("tus"))
        val prev = lag(col("tus"), 1).over(w)
        val marks = e.withColumn("new_sess",
          when(prev.isNull || col("tus") - prev > gapUs, 1L).otherwise(0L))
        marks.withColumn("sid", sum(col("new_sess")).over(w))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("tus")).as("session_start"),
            max(col("tus")).as("session_end"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"), col("sid"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
             |marks AS (
             |  SELECT user_id, tus,
             |    CASE WHEN lag(tus) OVER w IS NULL
             |           OR tus - lag(tus) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
             |sess AS (
             |  SELECT user_id, tus,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus) AS BIGINT) AS sid
             |  FROM marks)
             |SELECT user_id, sid, min(tus) AS session_start,
             |  max(tus) AS session_end, count(*) AS n_events
             |FROM sess GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin)),

    // ---- window: lag/lead + ntile over a unique ordering ----
    "q_window_lag" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          ntile(4).over(w).cast("long").as("quartile"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_orderkey, 1) OVER w AS prev_order,
             |  lead(o_orderkey, 1) OVER w AS next_order,
             |  ntile(4) OVER w AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- set op: INTERSECT ----
    // ---- set ops: ALL variants (duplicate-preserving bag semantics) ----
    "q_setop_all" -> Q(
      (s, dir) => {
        val a = t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
        val b = t(s, dir, "orders").select((col("o_custkey") % 100).as("k"))
        a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n_inter"))
          .join(a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n_except")),
            Seq("k"), "full_outer")
          .select(col("k"), coalesce(col("n_inter"), lit(0L)).as("n_inter"),
            coalesce(col("n_except"), lit(0L)).as("n_except"))
          .orderBy(col("k"))
      },
      Some("""WITH a AS (SELECT l_suppkey AS k FROM lineitem),
             |b AS (SELECT o_custkey % 100 AS k FROM orders),
             |i AS (SELECT k, count(*) AS n_inter FROM (
             |        SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY 1),
             |e AS (SELECT k, count(*) AS n_except FROM (
             |        SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY 1)
             |SELECT k, coalesce(n_inter, 0) AS n_inter,
             |  coalesce(n_except, 0) AS n_except
             |FROM i FULL JOIN e USING (k) ORDER BY k""".stripMargin)),

    // ---- TPC-H Q3 shape: shipping-priority flagship (3-table join →
    // grouped revenue → top-10). The classic OLAP plan: both filters
    // push to their scans, customer broadcasts, revenue aggregates
    // partially, and the top-10 compiles to TakeOrderedAndProject ----
    "q_tpch_q3" -> Q(
      (s, dir) => {
        val cut = "1996-06-30"
        val c = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit(cut).cast("timestamp"))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        // customer is NOT hint-broadcast: it is a real dimension that
        // grows with scale — the planner/AQE picks broadcast when the
        // filtered side is actually small (round-1 lesson: pin only
        // bounded dims)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dbl(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
            dec(col("l_discount"))))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1996-06-30'
              |  AND l_shipdate > TIMESTAMP '1996-06-30'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // ---- TPC-H Q5 shape: local-supplier volume (6-table join graph).
    // The join-order stress gate: two tiny dims broadcast through
    // nation/region, customer and supplier hash-join the fact pipeline,
    // and the same-nation predicate (c_nationkey = s_nationkey) prunes
    // cross-nation pairs inside the join, not in a post-filter ----
    "q_tpch_q5" -> Q(
      (s, dir) => {
        val lo = "1996-01-01"; val hi = "1997-01-01"
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
            col("o_orderdate") < lit(hi).cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
          .select(col("r_regionkey"))
        // only nation/region are pinned broadcasts (bounded forever);
        // supplier and customer scale with the data, so their join
        // strategy stays planner-chosen
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dbl(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
            dec(col("l_discount"))))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1997-01-01'
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // ---- TPC-H Q18 shape: large-volume orders (who ordered > 300 units
    // in one order). The group-then-semi-join stress gate: the inner
    // HAVING aggregate over the FULL lineitem table reduces to an
    // orderkey set BEFORE any join happens (partial-agg collapses it
    // map-side), the set left-semi-joins the fact pipeline, and only the
    // surviving orders re-aggregate. At 100 TB the first aggregate is the
    // only full-table pass; everything after is O(qualifying orders) ----
    "q_tpch_q18" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        val big = l.groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"))).as("q"))
          .filter(col("q") > lit(300).cast(DecimalType(10, 2)))
          .select(col("l_orderkey").as("big_orderkey"))
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
        o.join(big, o("o_orderkey") === col("big_orderkey"), "left_semi")
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
          .limit(100)
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
              |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS sum_qty
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE o_orderkey IN (
              |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
              |  HAVING sum(${sqlDec("l_quantity")}) > 300)
              |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
              |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin)),

    // ---- TPC-H Q17 shape: small-quantity-order revenue (the correlated
    // per-group-average subquery). The correlation decorrelates into one
    // per-partkey aggregate joined back to the fact rows; the "quantity
    // below 20% of this part's average" test cross-multiplies to
    // 5·q·cnt < sum in exact cents, so the threshold carries no float
    // division. At 100 TB both sides of the join partial-aggregate; the
    // brand filter pushes to the part scan and prunes the fact join ----
    "q_tpch_q17" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_extendedprice"),
            floor(col("l_quantity") * 100).cast("long").as("qc"))
        val agg = l.groupBy(col("l_partkey").as("a_partkey"))
          .agg(sum(col("qc")).as("s"), count(lit(1)).as("c"))
        val p = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
          .select(col("p_partkey"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(agg, col("l_partkey") === col("a_partkey"))
          .filter(col("qc") * 5 * col("c") < col("s"))
          .agg(count(lit(1)).as("n_below"),
            (dbl(sum(dec(col("l_extendedprice")))) / 7.0).as("avg_yearly"))
      },
      Some(s"""WITH agg AS (
              |  SELECT l_partkey AS a_partkey,
              |    sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS s,
              |    count(*) AS c
              |  FROM lineitem GROUP BY 1)
              |SELECT count(*) AS n_below,
              |  CAST(sum(${sqlDec("l_extendedprice")}) AS DOUBLE) / 7.0 AS avg_yearly
              |FROM lineitem
              |JOIN part ON p_partkey = l_partkey
              |JOIN agg ON a_partkey = l_partkey
              |WHERE p_brand = 'Brand#13'
              |  AND CAST(floor(l_quantity * 100) AS BIGINT) * 5 * c < s""".stripMargin)),

    // ---- TPC-H Q10 shape: returned-item revenue per customer in one
    // quarter — 4-way join, wide group-by, top-20. The big fact side
    // filters (quarter + returnflag) push to both scans, nation stays a
    // planner-chosen broadcast, and the top-20 compiles to
    // TakeOrderedAndProject like q3 ----
    "q_tpch_q10" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val c = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
        val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(dbl(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
            dec(col("l_discount"))))).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1996-04-01'
              |GROUP BY c_custkey, c_name, c_acctbal, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // ---- TPC-H Q13 shape: customer order-count distribution. The two
    // hard parts this gate witnesses: (1) the predicate lives in the
    // LEFT JOIN's ON clause, not WHERE — a customer whose every order is
    // urgent must survive with count 0, so filtering before the join is
    // required and filtering after it is wrong; (2) the double
    // aggregation (per-customer count, then histogram of counts). The
    // fixture has no o_comment, so the reference's NOT LIKE
    // '%special%requests%' becomes a priority-class exclusion. At 100 TB
    // the orders side filters and partial-aggregates to one row per
    // custkey BEFORE the join with customer; the second aggregate is
    // O(distinct counts) ----
    "q_tpch_q13" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"))
        // reduce-before-join: orders collapses to (custkey, n) first, so
        // the left join carries one row per customer, not one per order
        val perCust = t(s, dir, "orders")
          .filter(!col("o_orderpriority").like("1%"))
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        c.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("n"), lit(0L)).as("c_count"))
          .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ---- TPC-H Q21 shape: suppliers who kept orders waiting — the
    // EXISTS + NOT EXISTS lineitem self-join, the hardest correlated
    // shape in the suite. The fixture has no receipt/commit dates, so
    // "late" becomes l_returnflag = 'R' (the supplier's line came back);
    // the region filter stands in for the reference's single-nation
    // filter at fixture scale. Both correlated subqueries decorrelate
    // into ONE per-orderkey aggregate over lineitem: n_supp >= 2 is the
    // EXISTS (another supplier in the order) and n_ret_supp = 1 is the
    // NOT EXISTS (no OTHER supplier was late — l1's own supplier is the
    // one). At 100 TB that single partial-aggregated pass replaces two
    // full self-joins of the fact table; everything downstream is
    // O(flagged lineitems) ----
    "q_tpch_q21" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
        val perOrder = l.groupBy(col("l_orderkey").as("po_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("n_ret_supp"))
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        val n = t(s, dir, "nation").filter(col("n_regionkey") === 0)
          .select(col("n_nationkey"))
        l.filter(col("l_returnflag") === "R")
          .join(perOrder, col("l_orderkey") === col("po_orderkey"))
          .filter(col("n_supp") >= 2 && col("n_ret_supp") === 1)
          .join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
          .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
             |  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
             |      AND l3.l_returnflag = 'R')
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)),

    // ---- TPC-H Q4 shape: order-priority checking — the grouped EXISTS.
    // The correlated EXISTS decorrelates into a LEFT SEMI join against
    // the filtered lineitem side, so the fact table contributes each
    // qualifying orderkey once (no row multiplication to undo) and the
    // count groups over the tiny priority domain. "Late" adapts to the
    // fixture as returnflag = 'R' (no commit/receipt dates) ----
    "q_tpch_q4" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderpriority"))
        val late = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- TPC-H Q6 shape: the pure predicate-band aggregate (forecast
    // revenue change) — no join at all, three range predicates that ALL
    // push to the parquet scan, one map-side-combined aggregate. The
    // simplest query in the suite and the purest pushdown witness ----
    "q_tpch_q6" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
            .as("revenue")),
      Some(s"""SELECT count(*) AS n,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       ${sqlDec("l_discount")}) AS DOUBLE) AS revenue
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate < TIMESTAMP '1997-01-01'
              |  AND l_discount BETWEEN 0.03 AND 0.07
              |  AND l_quantity < 24""".stripMargin)),

    // ---- TPC-H Q7 shape: volume shipping between two nation groups —
    // the DIRECTIONAL pair predicate ((A,B) OR (B,A)) over a double
    // nation join (supplier's nation and customer's nation are different
    // role-playing copies of the same dim), grouped by both directions
    // and the shipment year. The fixture's single-nation pairs are empty
    // at small SF, so the groups adapt to region pairs; both nation
    // copies stay pinned broadcasts (bounded forever) ----
    "q_tpch_q7" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
              dec(col("l_discount")))).as("rev"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        val n1 = t(s, dir, "nation")
          .select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation"),
            col("n_regionkey").as("r1"))
        val n2 = t(s, dir, "nation")
          .select(col("n_nationkey").as("n2k"), col("n_name").as("cust_nation"),
            col("n_regionkey").as("r2"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1k"))
          .join(broadcast(n2), col("c_nationkey") === col("n2k"))
          .filter((col("r1") === 0 && col("r2") === 1) ||
            (col("r1") === 1 && col("r2") === 0))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(count(lit(1)).as("n"), dbl(sum(col("rev"))).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
              |  count(*) AS n,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem
              |JOIN orders ON o_orderkey = l_orderkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE (n1.n_regionkey = 0 AND n2.n_regionkey = 1)
              |   OR (n1.n_regionkey = 1 AND n2.n_regionkey = 0)
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- TPC-H Q8 shape: national market share — a per-year RATIO of
    // conditional sums over the widest join graph in the suite (fact +
    // orders + part + customer + two dim hops). The share numerator
    // conditions on the SUPPLIER side while the population filters on
    // the CUSTOMER side; decimal until the one rounded double division
    // per year ----
    "q_tpch_q8" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
              dec(col("l_discount")))).as("vol"))
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        val cn = t(s, dir, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_regionkey").as("crk"))
        val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
          .select(col("r_regionkey"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val sn = t(s, dir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_regionkey").as("srk"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(cn), col("c_nationkey") === col("cnk"))
          .join(broadcast(r), col("crk") === col("r_regionkey"), "left_semi")
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(sn), col("s_nationkey") === col("snk"))
          .groupBy(col("o_year"))
          .agg(round(dbl(sum(when(col("srk") === 0, col("vol"))
              .otherwise(lit(0).cast(DecimalType(10, 2))))) /
            dbl(sum(col("vol"))), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some(s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
              |  round(
              |    CAST(sum(CASE WHEN sn.n_regionkey = 0
              |      THEN ${sqlDec("l_extendedprice")} *
              |           (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})
              |      ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) /
              |    CAST(sum(${sqlDec("l_extendedprice")} *
              |         (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE),
              |  6) AS mkt_share
              |FROM lineitem
              |JOIN part ON p_partkey = l_partkey
              |JOIN orders ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation cn ON c_nationkey = cn.n_nationkey
              |JOIN region ON cn.n_regionkey = r_regionkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation sn ON s_nationkey = sn.n_nationkey
              |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              |GROUP BY 1 ORDER BY o_year""".stripMargin)),

    // ---- TPC-H Q15 shape: top supplier — aggregate-then-argmax via the
    // scalar max subquery. Per-supplier quarterly revenue reduces FIRST
    // (partial-aggregated, O(suppliers) rows out), the 1-row max
    // cross-joins back, and the equality test runs on exact DECIMAL so
    // ties (all max suppliers) surface identically in both engines ----
    "q_tpch_q15" -> Q(
      (s, dir) => {
        // the per-supplier aggregate has two consumers (the 1-row max
        // frame and the main branch) — persist it so the filtered
        // lineitem scan+aggregate runs ONCE, not twice (the previous
        // invocation's cache is swept on re-entry)
        q15Caches.evict(s, dir)
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
            dec(col("l_discount")))).as("total"))
          .persist()
        rev.count() // settle so both consumers read the cache
        q15Caches.put(s, dir, rev)
        val top = rev.agg(max(col("total")).as("mx"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        rev.crossJoin(broadcast(top))
          .filter(col("total") === col("mx"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), dbl(col("total")).as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, sum(${sqlDec("l_extendedprice")} *
              |    (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS total
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
              |FROM supplier JOIN rev ON s_suppkey = l_suppkey
              |WHERE total = (SELECT max(total) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)),

    // ---- TPC-H Q14 shape: promoted-revenue share in one month — the
    // conditional-aggregation ratio. Both numerator and denominator
    // come out of ONE aggregate over the joined month (no second pass);
    // money stays DECIMAL until the single final double division,
    // rounded to 6 before it can leak float tail into the gate hash ----
    "q_tpch_q14" -> Q(
      (s, dir) => {
        val rev = (dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(10, 2)) - dec(col("l_discount")))).as("rev")
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_partkey"), rev)
        val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            dbl(sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(lit(0).cast(DecimalType(10, 2))))) /
            dbl(sum(col("rev"))), 6).as("promo_share"))
      },
      Some(s"""SELECT round(100.0 *
              |    CAST(sum(CASE WHEN p_type = 'PROMO'
              |      THEN ${sqlDec("l_extendedprice")} *
              |           (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})
              |      ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) /
              |    CAST(sum(${sqlDec("l_extendedprice")} *
              |         (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE),
              |  6) AS promo_share
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)),

    // ---- TPC-H Q19 shape: discounted revenue under DISJUNCTIVE
    // part+lineitem predicates — three OR'd conjunctions that mix both
    // sides of the join. The planner must extract the common
    // l_partkey = p_partkey equi-key for the hash join and evaluate the
    // disjunction as a residual — a naive reading plans a nested-loop
    // over the cross product. Brand/size/quantity bands adapt to the
    // fixture's value ranges ----
    "q_tpch_q19" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
              dec(col("l_discount")))).as("rev"))
        val p = t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        l.join(p, col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#17" && col("p_size").between(10, 25) &&
            col("l_quantity").between(15, 35)) ||
          (col("p_brand") === "Brand#21" && col("p_size").between(20, 40) &&
            col("l_quantity").between(30, 50))))
          .agg(count(lit(1)).as("n"), dbl(sum(col("rev"))).as("revenue"))
      },
      Some(s"""SELECT count(*) AS n,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              |       AND l_quantity BETWEEN 1 AND 20)
              |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 25
              |       AND l_quantity BETWEEN 15 AND 35)
              |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 40
              |       AND l_quantity BETWEEN 30 AND 50)""".stripMargin)),

    // ---- TPC-H Q22 shape: above-average-balance customers with no
    // qualifying orders — the scalar-subquery threshold + anti-join.
    // The average is never materialized as a float: the segment's
    // (sum, count) pair cross-joins in as one row and the test
    // cross-multiplies in exact DECIMAL (bal·cnt > sum), the q17
    // discipline — an avg() double would make borderline membership
    // aggregation-order-dependent across engines. The fixture has no
    // phone column and every customer has orders, so "country code
    // prefix" becomes a segment set and the anti-join excludes
    // customers with URGENT orders ----
    "q_tpch_q22" -> Q(
      (s, dir) => {
        val seg = t(s, dir, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY") &&
            col("c_acctbal") > 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            dec(col("c_acctbal")).as("bal"))
        val stats = seg.agg(sum(col("bal")).as("s"), count(lit(1)).as("cnt"))
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority").like("1%")).select(col("o_custkey"))
        seg.crossJoin(broadcast(stats))
          .filter(col("bal") * col("cnt") > col("s"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"), dbl(sum(col("bal"))).as("totacctbal"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""WITH seg AS (
              |  SELECT c_custkey, c_mktsegment,
              |    ${sqlDec("c_acctbal")} AS bal
              |  FROM customer
              |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
              |    AND c_acctbal > 0),
              |stats AS (SELECT sum(bal) AS s, count(*) AS cnt FROM seg)
              |SELECT c_mktsegment, count(*) AS numcust,
              |  CAST(sum(bal) AS DOUBLE) AS totacctbal
              |FROM seg, stats
              |WHERE bal * cnt > s
              |  AND NOT EXISTS (SELECT 1 FROM orders
              |    WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%')
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- TPC-H Q20 shape: the nested agg-threshold semi-join chain —
    // suppliers of a name-filtered part family whose stock exceeds half
    // the quantity they shipped in one year, restricted to one region.
    // The fixture has no partsupp table, so a deterministic SURROGATE is
    // derived identically on both engines: ONE pass over lineitem yields
    // both the distinct (part, supp) pairs AND the date-banded shipped
    // quantity (a conditional aggregate — no second fact scan), and
    // ps_availqty is key-derived integer arithmetic. The classic
    // correlated subquery ("availqty > ½ · (SELECT sum(qty) WHERE
    // l_partkey = ps_partkey AND l_suppkey = ps_suppkey)") decorrelates
    // into that per-(part,supp) aggregate — no correlated re-scan of the
    // fact table per partsupp row, which is the difference between one
    // shuffle and a quadratic plan at 100 TB. The ½ threshold
    // cross-multiplies (2·availqty > qty) so no float division exists;
    // pairs with no in-band shipments have NULL band_qty and fail the
    // comparison in both engines — exactly the empty-correlated-subquery
    // semantics of the original ----
    "q_tpch_q20_shape" -> Q(
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .agg(sum(when(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
            dec(col("l_quantity")))).as("band_qty"))
          .withColumn("ps_availqty",
            (col("ps_partkey") * 7 + col("ps_suppkey") * 11) % 1000 + 1)
        val redParts = t(s, dir, "part")
          .filter(col("p_name").like("red%")).select(col("p_partkey"))
        // redParts grows with the part table (scale-proportional), so no
        // broadcast hint: AQE broadcasts it at small SF and falls back to
        // a shuffle semi-join when the part family no longer fits
        val qualSupp = ps
          .join(redParts,
            col("ps_partkey") === col("p_partkey"), "left_semi")
          .filter(col("ps_availqty") * 2 > col("band_qty"))
          .select(col("ps_suppkey")).distinct()
        val nat = t(s, dir, "nation").filter(col("n_regionkey") === 0)
          .select(col("n_nationkey"))
        t(s, dir, "supplier")
          .join(broadcast(nat),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .join(qualSupp, col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH ps AS (
              |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
              |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
              |              AND l_shipdate < TIMESTAMP '1998-01-01'
              |        THEN ${sqlDec("l_quantity")} END) AS band_qty
              |  FROM lineitem GROUP BY 1, 2),
              |ps2 AS (
              |  SELECT ps_partkey, ps_suppkey, band_qty,
              |    (ps_partkey * 7 + ps_suppkey * 11) % 1000 + 1 AS ps_availqty
              |  FROM ps)
              |SELECT s_suppkey, s_name FROM supplier
              |WHERE s_nationkey IN
              |    (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
              |  AND s_suppkey IN (
              |    SELECT ps_suppkey FROM ps2
              |    WHERE ps_partkey IN
              |        (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              |      AND ps_availqty * 2 > band_qty)
              |ORDER BY s_suppkey""".stripMargin)),

    // ---- TPC-H Q11 shape: group-share-vs-global-scalar HAVING — per-part
    // inventory value within a nation group, kept only when the part's
    // share of the GLOBAL group value clears a threshold. Same derived
    // partsupp surrogate as q_tpch_q20_shape (distinct (part,supp) pairs
    // from lineitem; availqty and per-unit cost-in-cents key-derived), so
    // value arithmetic is EXACT Long integer math end to end: the share
    // test cross-multiplies (value·1000 > total) instead of comparing
    // float fractions, and the global scalar folds in as a broadcast
    // 1-row aggregate over the PERSISTED per-part frame — the grouped
    // pass runs once for both consumers, the q15 discipline ----
    "q_tpch_q11_shape" -> Q(
      (s, dir) => {
        q11Caches.evict(s, dir)
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .distinct()
          .withColumn("availqty",
            (col("ps_partkey") * 7 + col("ps_suppkey") * 11) % 1000 + 1)
          .withColumn("cost_cents",
            (col("ps_partkey") * 13 + col("ps_suppkey") * 5) % 10000)
        val nat = t(s, dir, "nation").filter(col("n_regionkey") <= 1)
          .select(col("n_nationkey"))
        val supp = t(s, dir, "supplier")
          .join(broadcast(nat),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select(col("s_suppkey"))
        // supplier grows with SF — hint-free semi-join (AQE decides)
        val grp = ps
          .join(supp,
            col("ps_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy(col("ps_partkey"))
          .agg(sum(col("availqty") * col("cost_cents")).as("value_cents"))
          .persist()
        grp.count() // settle: the total and the main branch both read it
        q11Caches.put(s, dir, grp)
        val tot = grp.agg(sum(col("value_cents")).as("t"))
        grp.crossJoin(broadcast(tot))
          .filter(col("value_cents") * 1000 > col("t"))
          .select(col("ps_partkey"),
            (col("value_cents").cast("double") / 100).as("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
      },
      Some("""WITH ps AS (
             |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
             |  FROM lineitem),
             |ps2 AS (
             |  SELECT ps_partkey, ps_suppkey,
             |    (ps_partkey * 7 + ps_suppkey * 11) % 1000 + 1 AS availqty,
             |    (ps_partkey * 13 + ps_suppkey * 5) % 10000 AS cost_cents
             |  FROM ps),
             |grp AS (
             |  SELECT ps_partkey,
             |    CAST(sum(availqty * cost_cents) AS BIGINT) AS value_cents
             |  FROM ps2
             |  WHERE ps_suppkey IN (
             |    SELECT s_suppkey FROM supplier WHERE s_nationkey IN
             |      (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1))
             |  GROUP BY 1),
             |tot AS (SELECT sum(value_cents) AS t FROM grp)
             |SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100 AS value
             |FROM grp, tot
             |WHERE value_cents * 1000 > t
             |ORDER BY value DESC, ps_partkey""".stripMargin)),

    // ---- TPC-H Q2 shape: cheapest supplier per part within a region —
    // the correlated MIN-subquery ("cost = (SELECT min(cost) ... WHERE
    // ps_partkey = p_partkey AND <region>)"). Spark-first decorrelation:
    // a window MIN over ps_partkey on the region-filtered cost table —
    // ONE pass, one shuffle on partkey, no join-back and no second scan
    // (the classic rewrite materializes the per-part min and rejoins;
    // the window form does it in place). Same derived partsupp surrogate
    // as the q20/q11 shapes ----
    "q_tpch_q2_shape" -> Q(
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .distinct()
          .withColumn("cost_cents",
            (col("ps_partkey") * 13 + col("ps_suppkey") * 5) % 10000)
        val nat = t(s, dir, "nation").filter(col("n_regionkey") === 0)
          .select(col("n_nationkey"), col("n_name"))
        val sup = t(s, dir, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val parts = t(s, dir, "part")
          .filter(col("p_size").between(10, 30) && col("p_type") === "LARGE")
          .select(col("p_partkey"), col("p_brand"))
        val regional = ps.join(sup, col("ps_suppkey") === col("s_suppkey"))
        val withMin = regional.withColumn("minc",
          min(col("cost_cents")).over(Window.partitionBy(col("ps_partkey"))))
        withMin.filter(col("cost_cents") === col("minc"))
          .join(parts, col("ps_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"),
            (col("cost_cents").cast("double") / 100).as("supplycost"))
          .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (
             |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
             |  FROM lineitem),
             |ps2 AS (
             |  SELECT ps_partkey, ps_suppkey,
             |    (ps_partkey * 13 + ps_suppkey * 5) % 10000 AS cost_cents
             |  FROM ps),
             |regional AS (
             |  SELECT ps_partkey, cost_cents, s_name, s_acctbal, n_name,
             |    min(cost_cents) OVER (PARTITION BY ps_partkey) AS minc
             |  FROM ps2
             |  JOIN supplier ON ps_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 0)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             |  CAST(cost_cents AS DOUBLE) / 100 AS supplycost
             |FROM regional
             |JOIN part ON ps_partkey = p_partkey
             |WHERE cost_cents = minc
             |  AND p_size BETWEEN 10 AND 30 AND p_type = 'LARGE'
             |ORDER BY s_acctbal DESC, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // ---- TPC-H Q9 shape: product-line profit by nation and year — the
    // signature two-key (partkey, suppkey) join of the fact table against
    // partsupp for the unit cost, composed with the part-name filter and
    // the supplier-nation / order-year rollup. Revenue stays DECIMAL;
    // cost stays exact Long cents (integral l_quantity casts exactly in
    // both engines); profit is one final IEEE-identical double expression ----
    "q_tpch_q9_shape" -> Q(
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .distinct()
          .withColumn("cost_cents",
            (col("ps_partkey") * 13 + col("ps_suppkey") * 5) % 10000)
        val gearParts = t(s, dir, "part")
          .filter(col("p_name").like("%gear%")).select(col("p_partkey"))
        val l = t(s, dir, "lineitem")
          .join(gearParts, col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
              dec(col("l_discount")))).as("rev"),
            col("l_quantity").cast("long").as("qty"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val nat = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
        l.join(ps, col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), col("o_year"))
          .agg(dbl(sum(col("rev"))).as("revenue"),
            sum(col("cost_cents") * col("qty")).as("cost_cents_total"))
          .select(col("nation"), col("o_year"), col("revenue"),
            (col("revenue") - col("cost_cents_total").cast("double") / 100)
              .as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""WITH ps AS (
              |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              |  FROM lineitem),
              |ps2 AS (
              |  SELECT ps_partkey, ps_suppkey,
              |    (ps_partkey * 13 + ps_suppkey * 5) % 10000 AS cost_cents
              |  FROM ps),
              |base AS (
              |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
              |    ${sqlDec("l_extendedprice")} *
              |      (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")}) AS rev,
              |    cost_cents * CAST(l_quantity AS BIGINT) AS cost
              |  FROM lineitem
              |  JOIN ps2 ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  WHERE l_partkey IN
              |    (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'))
              |SELECT nation, o_year,
              |  CAST(sum(rev) AS DOUBLE) AS revenue,
              |  CAST(sum(rev) AS DOUBLE) - CAST(sum(cost) AS DOUBLE) / 100 AS profit
              |FROM base GROUP BY 1, 2
              |ORDER BY nation, o_year DESC""".stripMargin)),

    // ---- TPC-H Q16 shape: supplier-count distribution over part
    // attributes with the NOT-IN supplier exclusion — count(DISTINCT
    // suppkey) per (brand, type, size) after an anti-join against the
    // excluded-supplier set (key-derived surrogate for "complaints").
    // The distinct-count shuffles once on the group key; the anti-join
    // set is O(suppliers/7) ----
    "q_tpch_q16_shape" -> Q(
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .distinct()
        val parts = t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            !col("p_type").like("PROMO%") &&
            col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        val excluded = t(s, dir, "supplier")
          .filter((col("s_suppkey") * 13) % 7 === 0).select(col("s_suppkey"))
        ps.join(excluded, col("ps_suppkey") === col("s_suppkey"), "left_anti")
          .join(parts, col("ps_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""WITH ps AS (
             |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
             |  FROM lineitem)
             |SELECT p_brand, p_type, p_size,
             |  count(DISTINCT ps_suppkey) AS supplier_cnt
             |FROM ps
             |JOIN part ON ps_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
             |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
             |  AND ps_suppkey NOT IN
             |    (SELECT s_suppkey FROM supplier WHERE (s_suppkey * 13) % 7 = 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // ---- TPC-H Q12 shape: shipping-mode vs order-priority two-tier
    // conditional counting. The fixture lacks l_shipmode and the commit/
    // receipt dates, so all three derive deterministically from keys
    // (identical integer/date arithmetic both engines: DATE + int days);
    // the derived receipt CAN precede the derived commit, so the
    // late-delivery predicate chain (ship < commit < receipt, receipt in
    // the year band) is a real filter, not a tautology ----
    "q_tpch_q12_shape" -> Q(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .withColumn("shipmode",
            element_at(typedlit(Seq("MAIL", "SHIP", "RAIL", "AIR", "TRUCK")),
              ((col("l_orderkey") * 3 + col("l_linenumber")) % 5 + 1).cast("int")))
          .withColumn("commitd", date_add(col("l_shipdate").cast("date"),
            ((col("l_orderkey") + col("l_linenumber")) % 30 + 1).cast("int")))
          .withColumn("receiptd", date_add(col("commitd"),
            ((col("l_orderkey") * 7 + col("l_linenumber")) % 20 - 5).cast("int")))
          .filter(col("shipmode").isin("MAIL", "SHIP") &&
            col("commitd") < col("receiptd") &&
            col("l_shipdate").cast("date") < col("commitd") &&
            col("receiptd") >= lit("1996-01-01").cast("date") &&
            col("receiptd") < lit("1997-01-01").cast("date"))
          .select(col("l_orderkey"), col("shipmode"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        l.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("shipmode"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy(col("shipmode"))
      },
      Some("""WITH l AS (
             |  SELECT l_orderkey,
             |    (['MAIL', 'SHIP', 'RAIL', 'AIR', 'TRUCK'])[
             |      CAST((l_orderkey * 3 + l_linenumber) % 5 + 1 AS INT)] AS shipmode,
             |    CAST(l_shipdate AS DATE) AS shipd,
             |    CAST(l_shipdate AS DATE) +
             |      CAST((l_orderkey + l_linenumber) % 30 + 1 AS INT) AS commitd,
             |    CAST(l_shipdate AS DATE) +
             |      CAST((l_orderkey + l_linenumber) % 30 + 1 AS INT) +
             |      CAST((l_orderkey * 7 + l_linenumber) % 20 - 5 AS INT) AS receiptd
             |  FROM lineitem)
             |SELECT shipmode,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM l JOIN orders ON l_orderkey = o_orderkey
             |WHERE shipmode IN ('MAIL', 'SHIP')
             |  AND commitd < receiptd AND shipd < commitd
             |  AND receiptd >= DATE '1996-01-01' AND receiptd < DATE '1997-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q_setop_intersect" -> Q(
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey").as("k"))
          .intersect(t(s, dir, "orders").select(col("o_custkey").as("k")))
          .orderBy(col("k")),
      Some("""SELECT c_custkey AS k FROM customer
             |INTERSECT SELECT o_custkey FROM orders ORDER BY k""".stripMargin)),

    // ---- set op: EXCEPT ----
    "q_setop_except" -> Q(
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey").as("k"))
          .except(t(s, dir, "orders").select(col("o_custkey").as("k")))
          .orderBy(col("k")),
      Some("""SELECT c_custkey AS k FROM customer
             |EXCEPT SELECT o_custkey FROM orders ORDER BY k""".stripMargin)),

    // ---- set op: UNION ALL + re-aggregate ----
    "q_union_all" -> Q(
      (s, dir) =>
        t(s, dir, "events").select(col("event_type").as("tag"))
          .unionAll(t(s, dir, "orders").select(col("o_orderstatus").as("tag")))
          .groupBy(col("tag")).agg(count(lit(1)).as("n"))
          .orderBy(col("tag")),
      Some("""SELECT tag, count(*) AS n FROM (
             |  SELECT event_type AS tag FROM events
             |  UNION ALL SELECT o_orderstatus FROM orders)
             |GROUP BY tag ORDER BY tag""".stripMargin)),

    // ---- scalar string/numeric functions (SQLite whitelist surface) ----
    "q_scalar_funcs" -> Q(
      (s, dir) =>
        t(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          regexp_replace(col("p_brand"), "#", "-").as("brand2"),
          instr(col("p_name"), "a").cast("long").as("a_pos"),
          coalesce(nullif(col("p_size"), lit(0)), lit(-1)).as("size2"),
          abs(col("p_retailprice") * lit(-1.0)).as("abs_price"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS up_name, length(p_name) AS name_len,
             |  substring(p_type, 1, 5) AS type5, replace(p_brand, '#', '-') AS brand2,
             |  instr(p_name, 'a') AS a_pos, coalesce(nullif(p_size, 0), -1) AS size2,
             |  abs(p_retailprice * -1.0) AS abs_price
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- date functions (strftime/date/unixepoch family) ----
    "q_date_funcs" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(year(col("l_shipdate")).cast("long").as("y"),
            month(col("l_shipdate")).cast("long").as("m"))
          .agg(count(lit(1)).as("n"),
            dbl(sum(dec(col("l_quantity")))).as("qty"))
          .orderBy(col("y"), col("m")),
      Some(s"""SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
              |  count(*) AS n, CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty
              |FROM lineitem GROUP BY 1, 2 ORDER BY y, m""".stripMargin)),

    // ---- JSON extraction (-> / ->> / json_extract family) ----
    "q_json_extract" -> Q(
      (s, dir) =>
        t(s, dir, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- HAVING ----
    "q_having" -> Q(
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 3)
          .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey, count(*) AS n FROM customer
             |GROUP BY c_nationkey HAVING count(*) > 3
             |ORDER BY c_nationkey""".stripMargin)),

    // ---- IN subquery (rewrites to semi join) ----
    "q_subquery_in" -> Q(
      (s, dir) => {
        val rich = t(s, dir, "customer")
          .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        t(s, dir, "orders")
          .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- correlated EXISTS through spark.sql (Catalyst decorrelates to a
    // semi join — the declarative form, distinct from q_subquery_in's
    // explicit left_semi) ----
    "q_subquery_exists" -> Q(
      (s, dir) => {
        Tables.load(s, dir)
        s.sql("""SELECT s_suppkey, s_name FROM supplier s
                |WHERE EXISTS (SELECT 1 FROM lineitem l
                |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
                |ORDER BY s_suppkey""".stripMargin)
      },
      Some("""SELECT s_suppkey, s_name FROM supplier s
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
             |ORDER BY s_suppkey""".stripMargin)),

    // ---- skew-salted join: the big side routes each row to one of S
    // sub-keys, the small side is replicated S ways, so one hot join key
    // (event_type has a handful of values over ALL events — maximal skew)
    // spreads over S reducers instead of one. The salt is pure routing:
    // the result is identical to the plain join the oracle runs ----
    "q_join_skew_salt" -> Q(
      (s, dir) => {
        val S = 8
        val dim = t(s, dir, "events").groupBy(col("event_type"))
          .agg(dbl(min(col("value"))).as("base"))
        val saltedDim = dim.crossJoin(
          s.range(S).select(col("id").cast("int").as("salt")))
        val ev = t(s, dir, "events").select(col("event_type"), col("value"),
          pmod(col("event_id"), lit(S)).cast("int").as("salt"))
        ev.join(saltedDim, Seq("event_type", "salt"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            dbl(sum(dec(col("value")) - dec(col("base")))).as("excess"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH dim AS (
              |  SELECT event_type, CAST(min(value) AS DOUBLE) AS base
              |  FROM events GROUP BY 1)
              |SELECT e.event_type, count(*) AS n,
              |  CAST(sum(${sqlDec("e.value")} - ${sqlDec("d.base")}) AS DOUBLE) AS excess
              |FROM events e JOIN dim d ON e.event_type = d.event_type
              |GROUP BY 1 ORDER BY e.event_type""".stripMargin)),

    // ---- bucketed co-located join: the 100-TB shuffle eliminator.
    // Both fact tables are re-written ONCE into a bucketed layout (8
    // buckets on the join key, sorted within buckets) and the join then
    // runs with NO exchange on either side — each task zips bucket i of
    // lineitem with bucket i of orders (PlanAuditSpec pins the
    // exchange-free SortMergeJoin with broadcast disabled). This is the
    // layout decision that matters most at scale: a 100-TB fact-fact
    // join on unbucketed data shuffles 100 TB; on co-bucketed data it
    // shuffles NOTHING, every run, forever. The one-time layout write is
    // itself the shard-export shape (a single repartition-by-key pass).
    "q_join_bucketed" -> Q(
      (s, dir) => {
        // phase-split: the one-off co-bucketed re-land vs the
        // exchange-free join it buys (the bench headline otherwise
        // charges the layout write to every run)
        graft.PhaseTimings.reset("q_join_bucketed")
        graft.PhaseTimings.timed("q_join_bucketed", "layout_build") {
          ensureBucketed(s, dir)
        }
        val l = s.table(bucketedName(dir, "lineitem"))
        val o = s.table(bucketedName(dir, "orders"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            dbl(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(10, 2)) -
              dec(col("l_discount"))))).as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority, count(*) AS n_items,
              |  CAST(sum(${sqlDec("l_extendedprice")} *
              |       (CAST(1 AS DECIMAL(10,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- null-safe join equality (<=> / IS NOT DISTINCT FROM) ----
    // SQLite modules compare with IS, where NULL matches NULL — a plain
    // equi-join silently drops those rows. Band customers and orders
    // into nullable buckets (nullif manufactures NULLs from real data)
    // and join null-safely: the NULL bucket must pair up like any other.
    // Spark plans <=> as a normal hash join key (no null-filter pushed),
    // so the shape stays an equi-join at any scale ----
    "q_join_nullsafe" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(nullif(pmod(col("c_custkey"), lit(5)), lit(0)).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_cust"))
        val o = t(s, dir, "orders")
          .select(nullif(pmod(col("o_custkey"), lit(5)), lit(0)).as("obucket"))
          .groupBy("obucket").agg(count(lit(1)).as("n_ord"))
        c.join(o, col("bucket") <=> col("obucket"))
          .select(col("bucket"), col("n_cust"), col("n_ord"))
          .orderBy(col("bucket").asc_nulls_first)
      },
      Some("""SELECT bucket, n_cust, n_ord
             |FROM (SELECT nullif(c_custkey % 5, 0) AS bucket, count(*) AS n_cust
             |      FROM customer GROUP BY 1) c
             |JOIN (SELECT nullif(o_custkey % 5, 0) AS obucket, count(*) AS n_ord
             |      FROM orders GROUP BY 1) o
             |  ON bucket IS NOT DISTINCT FROM obucket
             |ORDER BY bucket NULLS FIRST""".stripMargin)),

    // ---- explicit NULLS FIRST/LAST ordering ----
    // The cross-engine trap the oracle gate exists to catch: Spark sorts
    // nulls FIRST ascending by default, DuckDB sorts them LAST — an
    // ORDER BY without an explicit placement hash-matches on null-free
    // data and silently diverges the first time a null arrives. Every
    // order-sensitive query in this repo states placement when nulls are
    // possible; this gate pins both placements in one result ----
    "q_order_nulls" -> Q(
      (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_custkey") <= 50)
          .select(col("c_custkey"),
            nullif(pmod(col("c_custkey"), lit(7)), lit(0)).as("k7"))
          .orderBy(col("k7").asc_nulls_first, col("c_custkey").desc),
      Some("""SELECT c_custkey, nullif(c_custkey % 7, 0) AS k7
             |FROM customer WHERE c_custkey <= 50
             |ORDER BY k7 ASC NULLS FIRST, c_custkey DESC""".stripMargin)),

    // ---- arg-max aggregate (max_by / arg_max) with a DETERMINISTIC
    // tiebreak: the ordering key packs exact cents with the unique
    // event_id (cents·10⁸ + id), so equal values resolve identically on
    // both engines instead of leaving the winner to aggregation order —
    // the same discipline every other order-sensitive gate follows ----
    "q_agg_argmax" -> Q(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"), col("user_id"), col("event_id"),
            (floor(col("value") * 100).cast("long") * 100000000L +
              col("event_id")).as("ord"))
          .groupBy("event_type")
          .agg(max_by(col("user_id"), col("ord")).as("top_user"),
            min_by(col("user_id"), col("ord")).as("bottom_user"),
            max(col("ord")).as("max_ord"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  arg_max(user_id, ord) AS top_user,
             |  arg_min(user_id, ord) AS bottom_user,
             |  max(ord) AS max_ord
             |FROM (SELECT event_type, user_id, event_id,
             |        CAST(floor(value * 100) AS BIGINT) * 100000000 + event_id AS ord
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- correlated-aggregate comparison (above-brand-average), exact ----
    "q_above_avg" -> Q(
      (s, dir) => {
        val p = t(s, dir, "part")
        val stats = p.groupBy(col("p_brand").as("b"))
          .agg(sum(dec(col("p_retailprice"))).as("s"), count(lit(1)).as("n"))
        p.join(broadcast(stats), p("p_brand") === stats("b"))
          .filter(dec(col("p_retailprice")) * col("n") > col("s"))
          .select(col("p_partkey"), col("p_name"), col("p_brand"))
          .orderBy(col("p_partkey"))
      },
      Some(s"""SELECT p_partkey, p_name, p_brand
              |FROM part JOIN (
              |  SELECT p_brand AS b, sum(${sqlDec("p_retailprice")}) AS s, count(*) AS n
              |  FROM part GROUP BY 1) ON p_brand = b
              |WHERE ${sqlDec("p_retailprice")} * n > s
              |ORDER BY p_partkey""".stripMargin)),

    // ---- CTE (WITH clause) through the SQL front-end ----
    "q_cte" -> Q(
      (s, dir) => {
        Tables.load(s, dir)
        s.sql(s"""WITH spend AS (
                 |  SELECT o_custkey, sum(${sqlDec("o_totalprice")}) AS spent
                 |  FROM orders GROUP BY o_custkey)
                 |SELECT c_custkey, c_name, CAST(spent AS DOUBLE) AS spent
                 |FROM customer JOIN spend ON c_custkey = o_custkey
                 |WHERE spent > 400000
                 |ORDER BY c_custkey""".stripMargin)
      },
      Some(s"""WITH spend AS (
              |  SELECT o_custkey, sum(${sqlDec("o_totalprice")}) AS spent
              |  FROM orders GROUP BY o_custkey)
              |SELECT c_custkey, c_name, CAST(spent AS DOUBLE) AS spent
              |FROM customer JOIN spend ON c_custkey = o_custkey
              |WHERE spent > 400000
              |ORDER BY c_custkey""".stripMargin)),

    // ---- CASE expression ----
    "q_case_expr" -> Q(
      (s, dir) =>
        t(s, dir, "orders").select(
          col("o_orderkey"),
          when(col("o_totalprice") > 400000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 400000 THEN 'big'
             |       WHEN o_totalprice > 150000 THEN 'mid'
             |       ELSE 'small' END AS bucket
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- exact ordered statistics: interpolated percentiles per group ----
    "q_percentiles" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.9)").as("p90"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |  quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.9) AS p90,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- ROLLUP with grouping() markers (subtotal hierarchy) ----
    "q_rollup" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dbl(sum(dec(col("l_quantity")))).as("qty"),
            count(lit(1)).as("n"),
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"))
          .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty, count(*) AS n,
              |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)),

    // CUBE completes the multi-dimensional aggregate family next to
    // ROLLUP and GROUPING SETS: all 2^d grouping combinations in one
    // expand + aggregate pass (no per-combination rescans).
    "q_cube" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dbl(sum(dec(col("l_quantity")))).as("qty"),
            count(lit(1)).as("n"),
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"))
          .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty, count(*) AS n,
              |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
              |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)),

    // ---- PIVOT: long-to-wide reshaping with an EXPLICIT column list ----
    // (the list matters at scale: Spark's pivot without values runs a
    // distinct-scan job first AND caps out at 10k columns — declaring the
    // domain keeps it one pass. Compiles to an ordinary groupBy over
    // conditional aggregates: one shuffle of |days|×|types| partial rows,
    // exactly what the hand-written CASE form pays, which is also how the
    // oracle states it.)
    "q_pivot" -> Q(
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("event_type"))
          .groupBy(col("day"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0, types)
          .orderBy(col("day"))
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
             |  count(*) FILTER (event_type = 'click') AS click,
             |  count(*) FILTER (event_type = 'error') AS error,
             |  count(*) FILTER (event_type = 'purchase') AS purchase,
             |  count(*) FILTER (event_type = 'signup') AS signup,
             |  count(*) FILTER (event_type = 'view') AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- UNPIVOT: wide-to-long, the inverse reshape of q_pivot ----
    // (a pure map-side Expand — each input row emits one row per measure
    // column with zero shuffle; the only exchange is the gate's display
    // order. The melt shape feeds every "metric, value" downstream
    // consumer without N self-unions over the fact table.)
    "q_unpivot" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "metric", "val")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
             |         l_quantity AS val FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
             |  FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |  FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
             |WHERE l_orderkey < 1000
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // ---- explicit GROUPING SETS: disjoint subtotal shapes in one pass ----
    // (rollup covers the prefix lattice; this is the general form — the
    // planner expands the sets into one Expand + single aggregation, so a
    // 100 TB input is scanned ONCE for all three groupings)
    "q_grouping_sets" -> Q(
      (s, dir) => {
        Tables.load(s, dir)
        s.sql(s"""SELECT l_returnflag, l_linestatus,
                 |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty,
                 |  count(*) AS n,
                 |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                 |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
                 |FROM lineitem
                 |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                 |                        (l_linestatus), ())
                 |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty,
              |  count(*) AS n,
              |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |                        (l_linestatus), ())
              |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)),

    // ---- recursive CTE (WITH RECURSIVE; SURVEY §7.4 hard-part) ----
    // a recursive month spine drives a left join over lineitem — recursion
    // plus join/aggregation in one plan, identical SQL on both engines
    "q_recursive_cte" -> Q(
      (s, dir) => {
        Tables.load(s, dir)
        s.sql(s"""WITH RECURSIVE m(n) AS (
                 |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
                 |SELECT n, count(l_orderkey) AS cnt,
                 |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty
                 |FROM m LEFT JOIN lineitem
                 |  ON month(l_shipdate) = n AND year(l_shipdate) = 1996
                 |GROUP BY n ORDER BY n""".stripMargin)
      },
      Some(s"""WITH RECURSIVE m(n) AS (
              |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
              |SELECT n, count(l_orderkey) AS cnt,
              |  CAST(sum(${sqlDec("l_quantity")}) AS DOUBLE) AS qty
              |FROM m LEFT JOIN lineitem
              |  ON month(l_shipdate) = n AND year(l_shipdate) = 1996
              |GROUP BY n ORDER BY n""".stripMargin)),

    // ---- json_each analog: iterate a JSON object into key/value rows ----
    // (SQLite's json_each is a table-valued function; the Spark-native
    // form is explode over a parsed map. DuckDB 1.0 lacks the json_each
    // TVF, so the oracle enumerates the single key this dataset carries.)
    "q_json_each" -> Q(
      (s, dir) =>
        t(s, dir, "events").select(
          col("event_id"),
          explode(from_json(col("props"), "map<string,bigint>", Map.empty[String, String]))
            .as(Seq("key", "val")))
          .orderBy(col("event_id"), col("key")),
      Some("""SELECT event_id, 'k' AS key,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS val
             |FROM events ORDER BY event_id, key""".stripMargin)),

    // ---- time-bucketed aggregation over the event stream table ----
    "q_events_hourly" -> Q(
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            dbl(sum(dec(col("value")))).as("total_value"))
          .orderBy(col("h"), col("event_type")),
      Some(s"""SELECT date_trunc('hour', ts) AS h, event_type,
              |  count(*) AS n, CAST(sum(${sqlDec("value")}) AS DOUBLE) AS total_value
              |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)),

    // ---- value-distribution histogram: fixed-width bins per event type
    // — the distribution-profiling primitive behind drift monitoring and
    // winsorize-threshold sanity checks. Bin math is DECIMAL floor-division
    // (exact — a raw double divide could land x.9999… in the wrong bin on
    // one engine); one partial-aggregated shuffle on (type, bin), output
    // is O(types × bins) however large the log ----
    "q_events_histogram" -> Q(
      (s, dir) => {
        val bin = floor(dec(col("value")) / lit(50).cast(DecimalType(10, 2)))
          .cast("long")
        t(s, dir, "events")
          .groupBy(col("event_type"), bin.as("bin"))
          .agg(count(lit(1)).as("n"),
            dbl(min(dec(col("value")))).as("lo"),
            dbl(max(dec(col("value")))).as("hi"))
          .orderBy(col("event_type"), col("bin"))
      },
      Some(s"""SELECT event_type,
              |  CAST(floor(${sqlDec("value")} / CAST(50 AS DECIMAL(10,2))) AS BIGINT) AS bin,
              |  count(*) AS n,
              |  CAST(min(${sqlDec("value")}) AS DOUBLE) AS lo,
              |  CAST(max(${sqlDec("value")}) AS DOUBLE) AS hi
              |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin))
  )
}
