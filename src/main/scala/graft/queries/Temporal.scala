package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Temporal join operators over the event stream — operators Spark has no
  * native form for, composed the way they survive scale (SURVEY §2 custom-
  * operator guidance: compose existing ops before dropping to custom
  * plans).
  *
  * - **As-of join**: each purchase joined to the latest click at-or-before
  *   it per user. Implemented as a union + running `last(..., ignoreNulls)`
  *   window — ONE shuffle on (user), no join blow-up, and the window state
  *   is O(1) per row. At 100 TB this is the textbook distributed as-of:
  *   shuffle both sides once by key, sort within partition, single pass.
  * - **Banded range join**: event pairs within ±6h. A naive theta join is
  *   O(n²) per user; bucketing each side to fixed 6h bands turns it into
  *   an equi-join on (user, band) with each left row probing 3 adjacent
  *   bands, then an exact |dt| filter — the standard banded range-join
  *   decomposition whose cost is O(matches), not O(pairs).
  *
  * Time math runs on epoch microseconds (exact integers) so results are
  * engine-independent; the DuckDB oracle uses its native ASOF JOIN and a
  * plain interval theta join respectively, so the decompositions are
  * verified against first-principles semantics.
  */
object Temporal {

  private val bandUs = 6L * 3600 * 1000000 // 6 hours in microseconds

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))

  val all: Map[String, Q] = Map(

    // ---- as-of join: latest click at-or-before each purchase, per user ----
    "q_asof_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        // dedupe clicks per (user, ts) so the at-or-before pick is unique
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("ts_us"), col("click_id"),
            lit(0).as("tag"), lit(null).cast("long").as("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"),
            lit(null).cast("long").as("click_id"), lit(1).as("tag"), col("event_id"))
        // clicks sort before purchases at equal ts => p.ts >= c.ts inclusive
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("tag"), col("click_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionAll(purchases)
          .withColumn("last_click",
            last(when(col("tag") === 0,
              struct(col("ts_us").as("cts"), col("click_id").as("cid"))), ignoreNulls = true)
              .over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"),
            col("last_click.cid").as("click_id"),
            col("last_click.cts").as("click_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
             |clicks AS (
             |  SELECT user_id, ts_us, max(event_id) AS click_id
             |  FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us),
             |purch AS (
             |  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, c.click_id, c.ts_us AS click_ts_us
             |FROM purch p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
             |ORDER BY p.event_id""".stripMargin)),

    // ---- as-of join with a tolerance bound: attribute only within 1h ----
    // The attribution-window variant (click credited to a purchase only
    // if it happened within the last hour) — a bound DuckDB's native
    // ASOF lacks, so the oracle states it as ASOF + a CASE null-out,
    // while the Spark side nulls the same pairs off the one-pass window
    // pick. Same O(n log n)-per-user cost as the unbounded as-of; the
    // tolerance is a per-row comparison, not a join-shape change.
    "q_asof_tolerance" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val tolUs = 3600000000L // 1 hour in microseconds
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("ts_us"), col("click_id"),
            lit(0).as("tag"), lit(null).cast("long").as("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"),
            lit(null).cast("long").as("click_id"), lit(1).as("tag"), col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("tag"), col("click_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionAll(purchases)
          .withColumn("last_click",
            last(when(col("tag") === 0,
              struct(col("ts_us").as("cts"), col("click_id").as("cid"))), ignoreNulls = true)
              .over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"),
            when(col("ts_us") - col("last_click.cts") <= tolUs,
              col("last_click.cid")).as("click_id"),
            when(col("ts_us") - col("last_click.cts") <= tolUs,
              col("last_click.cts")).as("click_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
             |clicks AS (
             |  SELECT user_id, ts_us, max(event_id) AS click_id
             |  FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us),
             |purch AS (
             |  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id,
             |  CASE WHEN p.ts_us - c.ts_us <= 3600000000 THEN c.click_id END AS click_id,
             |  CASE WHEN p.ts_us - c.ts_us <= 3600000000 THEN c.ts_us END AS click_ts_us
             |FROM purch p ASOF LEFT JOIN clicks c
             |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
             |ORDER BY p.event_id""".stripMargin)),

    // ---- forward as-of join: EARLIEST view at-or-after each purchase ----
    // The mirror of q_asof_join (which DuckDB's native ASOF only does
    // backward): same union + one-pass window shape, frame flipped to
    // [current, ∞) and first() instead of last(). Views sort after
    // purchases at equal ts, so the pick is at-or-after inclusive. Two
    // first() calls go non-null on exactly the same rows, so they read
    // the same view — no struct needed.
    "q_asof_forward" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(min(col("event_id")).as("view_id"))
          .select(col("user_id"), col("ts_us"), col("view_id"),
            lit(1).as("tag"), lit(null).cast("long").as("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"),
            lit(null).cast("long").as("view_id"), lit(0).as("tag"), col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("tag"), col("view_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        views.unionAll(purchases)
          .withColumn("next_ts",
            first(when(col("tag") === 1, col("ts_us")), ignoreNulls = true).over(w))
          .withColumn("next_id",
            first(when(col("tag") === 1, col("view_id")), ignoreNulls = true).over(w))
          .filter(col("tag") === 0)
          .select(col("event_id"), col("user_id"),
            col("next_id").as("view_id"), col("next_ts").as("view_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
             |views AS (
             |  SELECT user_id, ts_us, min(event_id) AS view_id
             |  FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_us),
             |u AS (
             |  SELECT user_id, ts_us, view_id, 1 AS tag, NULL AS event_id FROM views
             |  UNION ALL
             |  SELECT user_id, ts_us, NULL, 0, event_id
             |  FROM ev WHERE event_type = 'purchase'),
             |m AS (
             |  SELECT user_id, ts_us, tag, event_id,
             |    first_value(CASE WHEN tag = 1 THEN ts_us END IGNORE NULLS) OVER w AS next_ts,
             |    first_value(CASE WHEN tag = 1 THEN view_id END IGNORE NULLS) OVER w AS next_id
             |  FROM u
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, view_id
             |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT CAST(event_id AS BIGINT) AS event_id, user_id,
             |  CAST(next_id AS BIGINT) AS view_id, next_ts AS view_ts_us
             |FROM m WHERE tag = 0 ORDER BY event_id""".stripMargin)),

    // ---- banded range join: purchase/error pairs within +-6h per user ----
    "q_range_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_ts"))
        // banding MUST be exact integer division: epoch micros (~1.7e18)
        // exceed double's 2^53 mantissa, so floor(x / band) in float can
        // band a boundary-aligned timestamp off by one and silently drop a
        // matching pair
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
            col("ts_us").as("e_ts"), expr(s"ts_us DIV $bandUs").as("e_band"))
        // each purchase probes its own band plus both neighbors: any error
        // within +-band is guaranteed to land in one of the three
        val probed = purchases
          .withColumn("band", explode(array(
            expr(s"p_ts DIV $bandUs") - 1,
            expr(s"p_ts DIV $bandUs"),
            expr(s"p_ts DIV $bandUs") + 1)))
        probed.join(errors,
            probed("user_id") === errors("e_user") && probed("band") === errors("e_band"))
          .filter(abs(col("p_ts") - col("e_ts")) <= bandUs)
          .select(col("p_id"), col("user_id"), col("e_id"),
            (col("e_ts") - col("p_ts")).as("dt_us"))
          .orderBy(col("p_id"), col("e_id"))
      },
      Some(s"""WITH ev AS (
              |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
              |SELECT a.event_id AS p_id, a.user_id, b.event_id AS e_id,
              |  b.ts_us - a.ts_us AS dt_us
              |FROM ev a JOIN ev b
              |  ON a.user_id = b.user_id
              | AND a.event_type = 'purchase' AND b.event_type = 'error'
              | AND abs(a.ts_us - b.ts_us) <= $bandUs
              |ORDER BY p_id, e_id""".stripMargin))
  )
}
