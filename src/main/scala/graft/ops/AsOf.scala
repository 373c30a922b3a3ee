package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** As-of (point-in-time) join — the canonical time-series operator Spark
  * lacks natively: for every left row, the single right row with the
  * greatest right-time ≤ left-time within the same key.
  *
  * Composed from built-ins (preference (a) of the custom-operator
  * ladder): tag both sides, UNION them, pack the carried right columns
  * into ONE struct, and run a single `last(struct, ignoreNulls)` window
  * over (key ORDER BY time, side) rows-unbounded-preceding — a single
  * shuffle on the key, no range-condition join explosion, no custom
  * SparkPlan needed. Ties (equal times) sort the right row first, so
  * "≤" matches. Packing the right row atomically matters: filling each
  * column independently would let a NULL field in the matched right row
  * silently inherit its value from an older right row.
  *
  * At 100 TB this is the shape you want: both sides shuffle once by key,
  * each partition does a linear merge — same cost class as a sort-merge
  * join, versus the quadratic blow-up of the naive
  * `l.key = r.key AND r.t <= l.t` range join + argmax.
  */
object AsOf {

  /** Left as-of join. `rightCols` are carried from the right side (they
    * must not collide with left column names).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select((key +: time +: rightCols).map(col).toIndexedSeq: _*)
      .select(col(key), col(time), struct(rightCols.map(col): _*).as("__r"))
      .withColumn("__side", lit(0))
    // left rows get __r = NULL via unionByName; the struct is carried (or
    // not) as one value, so genuine NULL fields inside a matched right
    // row survive instead of being back-filled from older rows.
    val combined = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal times → "≤"
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = combined.withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select((left.columns.map(col).toIndexedSeq ++
        rightCols.map(c => col("__r").getField(c).as(c))): _*)
  }

  /** Oracle-checked query: every event joined to the user's most recent
    * signup event at-or-before its timestamp (DuckDB twin: native
    * `ASOF LEFT JOIN`).
    */
  def asofLastSignup(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.ref("events")
    val left = e.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val right = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"), col("ts").as("signup_ts"))
    asofJoin(left, right, "user_id", "ts",
        Seq("signup_event_id", "signup_ts"))
      .orderBy("event_id")
  }

  val asofLastSignupSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |s AS (SELECT user_id, ts AS signup_ts, event_id AS signup_event_id
      |      FROM e WHERE event_type = 'signup')
      |SELECT e.event_id, e.user_id, e.ts, e.event_type,
      |       s.signup_event_id, s.signup_ts
      |FROM e ASOF LEFT JOIN s
      |  ON e.user_id = s.user_id AND e.ts >= s.signup_ts
      |ORDER BY e.event_id""".stripMargin

  /** Forward as-of join: for every left row, the single right row with
    * the SMALLEST right-time ≥ left-time within the key — the "next
    * event after" lookup (e.g. time-to-conversion). Same single-shuffle
    * window shape as asofJoin, mirrored: `first(struct, ignoreNulls)`
    * over rows-unbounded-FOLLOWING, with right rows sorting after left
    * rows at equal times so "≥" matches.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(0))
    val r = right.select((key +: time +: rightCols).map(col).toIndexedSeq: _*)
      .select(col(key), col(time), struct(rightCols.map(col): _*).as("__r"))
      .withColumn("__side", lit(1))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // left rows (side 0) sort before right rows at equal times → "≥"
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = combined.withColumn("__r", first(col("__r"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 0)
      .select((left.columns.map(col).toIndexedSeq ++
        rightCols.map(c => col("__r").getField(c).as(c))): _*)
  }

  /** Oracle-checked forward query: every view event joined to the
    * user's NEXT purchase at-or-after it (DuckDB twin: native ASOF with
    * `<=`).
    */
  def asofNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val e = c.ref("events")
    val left = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"), col("ts").as("purchase_ts"))
    asofJoinForward(left, right, "user_id", "ts",
        Seq("purchase_event_id", "purchase_ts"))
      .orderBy("event_id")
  }

  val asofNextPurchaseSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |v AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_event_id
      |      FROM e WHERE event_type = 'purchase')
      |SELECT v.event_id, v.user_id, v.ts,
      |       p.purchase_event_id, p.purchase_ts
      |FROM v ASOF LEFT JOIN p
      |  ON v.user_id = p.user_id AND v.ts <= p.purchase_ts
      |ORDER BY v.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j4_asof" -> (asofLastSignup _),
    "j5_asof_forward" -> (asofNextPurchase _))

  val oracles: Map[String, String] = Map(
    "j4_asof" -> asofLastSignupSql,
    "j5_asof_forward" -> asofNextPurchaseSql)
}
