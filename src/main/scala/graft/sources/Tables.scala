package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver testdata tables.
  *
  * `events.parquet` carries TIMESTAMP(NANOS) (pyarrow ns), which Spark's
  * parquet reader rejects by default. We read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
  * timestamps — exactly what DuckDB does when casting its TIMESTAMP_NS to
  * TIMESTAMP — so both engines see identical `ts` values. The oracle SQL
  * mirrors this with `CAST(ts AS TIMESTAMP)`.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // ts DIV 1000: integer division (a double division would lose
      // precision above 2^53 — epoch-nanos is ~1.7e18).
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
