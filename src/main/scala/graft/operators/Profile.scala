package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling — the data-quality summary every pipeline runs
  * before trusting a new drop: per-column row/null/distinct counts and
  * min/max, computed in ONE pass over the table.
  *
  * Scale posture (100 TB): the whole profile is a single aggregation —
  * no per-column scans, no driver iteration. Count/min/max are
  * partial-aggregable; the distinct counts are the one genuinely
  * expensive part (Spark expands multi-distinct into one Expand +
  * shuffle per distinct column), which is the honest cost of EXACT
  * distinct counts — the approx variant (HLL, like `approx_user_count`)
  * is the drop-in when ±2% suffices. The result is column-count-sized:
  * the unpivot to one-row-per-column happens on a single aggregated row.
  */
object Profile {

  /** Column kinds drive which min/max surface is used: numerics report
    * min_num/max_num (double), strings min_str/max_str, timestamps
    * format to ISO strings (identical formatting on both engines). */
  case class ColSpec(name: String, kind: String)

  /** Plan shape: MELT (one narrow (column_name, num_val, str_val) row
    * per cell) → two-level aggregation. Level 1 groups by (column, value)
    * — all stats ride as GROUP KEYS, so it stays a HashAggregate whose
    * map side already collapses to distinct values; level 2 rolls the
    * value-count table up per column. The naive alternative — one agg
    * with 6 `count(DISTINCT col)` — plans an Expand (×columns, FULL-width
    * rows) feeding SortAggregates (string min/max buffers are immutable,
    * so hash agg can't hold them): measured 5× slower at sf0.1. Timestamp
    * and numeric values profile through their surfaced representation
    * (ISO string / double), which is what the min/max columns report
    * anyway. */
  def tableProfile(df: DataFrame, cols: Seq[ColSpec]): DataFrame = {
    val melted = df.select(explode(array(cols.map { c =>
      val (numV, strV) = c.kind match {
        case "num" => (col(c.name).cast("double"), lit(null).cast("string"))
        case "str" => (lit(null).cast("double"), col(c.name).cast("string"))
        case "ts" => (lit(null).cast("double"),
          date_format(col(c.name), "yyyy-MM-dd HH:mm:ss"))
      }
      struct(lit(c.name).as("column_name"),
        numV.as("num_val"), strV.as("str_val"))
    }: _*)).as("m")).select("m.*")
    val agg = melted
      .groupBy("column_name", "num_val", "str_val")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("column_name")
      .agg(
        sum("cnt").as("n_rows"),
        coalesce(sum(when(col("num_val").isNull && col("str_val").isNull,
          col("cnt"))), lit(0L)).as("n_nulls"),
        count(when(col("num_val").isNotNull || col("str_val").isNotNull,
          lit(1))).as("n_distinct"),
        min("num_val").as("min_num"), max("num_val").as("max_num"),
        min("str_val").as("min_str"), max("str_val").as("max_str"))
    // an EMPTY table must still profile as one row per column (n_rows=0,
    // like the oracle's global aggregates) — the melt alone would lose
    // the column list exactly when a data drop is empty
    val colList = {
      val spark = df.sparkSession
      import spark.implicits._
      cols.map(_.name).toDF("column_name")
    }
    colList.join(agg, Seq("column_name"), "left")
      .select(col("column_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }

  /** The oracled instance: the full `orders` table profile. */
  val OrdersCols: Seq[ColSpec] = Seq(
    ColSpec("o_orderkey", "num"), ColSpec("o_custkey", "num"),
    ColSpec("o_orderstatus", "str"), ColSpec("o_totalprice", "num"),
    ColSpec("o_orderdate", "ts"), ColSpec("o_orderpriority", "str"))

  def tableProfileOrders(spark: SparkSession, sfDir: String): DataFrame =
    tableProfile(graft.sources.Tables.load(spark, sfDir, "orders"), OrdersCols)
}
