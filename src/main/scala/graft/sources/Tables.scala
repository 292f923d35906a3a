package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver testdata tables.
  *
  * `events.parquet` has shipped with two `ts` encodings across driver data
  * refreshes: TIMESTAMP(NANOS) (pyarrow ns — Spark's reader rejects it
  * unless nanos are read as long via
  * `spark.sql.legacy.parquet.nanosAsLong`, then we truncate to micros) and
  * TIMESTAMP(MICROS) `isAdjustedToUTC=false` (read as TIMESTAMP_NTZ).
  * Both normalize to a session-TZ TimestampType with microsecond values —
  * exactly what DuckDB yields for `CAST(ts AS TIMESTAMP)` on the same file
  * (the oracle SQL mirrors this) — so both engines see identical `ts`
  * values regardless of the file's encoding. Dispatch is on the inferred
  * schema, not the file path, so mixed-vintage directories keep working.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // epoch-nanos as long. ts DIV 1000: integer division (a double
        // division would lose precision above 2^53 — epoch-nanos ~1.7e18).
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // wall-clock micros; reinterpret in the session TZ (UTC in
        // Verify/tests) so downstream TimestampType logic is unchanged.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
    else df
  }
}
