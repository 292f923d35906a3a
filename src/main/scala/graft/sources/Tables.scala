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

  /** The inference error Spark raises for TIMESTAMP(NANOS) parquet
    * without the legacy flag (ILLEGAL_PARQUET_TYPE naming the NANOS
    * type). */
  private def isNanosVintage(e: Exception): Boolean = {
    val m = String.valueOf(e.getMessage)
    m.contains("NANOS") || m.contains("nanosAsLong")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df =
      try spark.read.parquet(path)
      catch {
        case e: Exception if isNanosVintage(e) =>
          // TIMESTAMP(NANOS) vintage: readable only with the legacy
          // flag, which must REMAIN set afterwards — it is consulted
          // again at execution time for this relation's decode. Setting
          // it unconditionally on every load (the old code) silently
          // flipped how an EMBEDDING application's own unrelated nanos
          // parquet reads decode for the rest of the session (LongType
          // instead of failing loudly) — r17 data-plane review #3; now
          // only a directory that actually ships nanos pays that.
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
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
