package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-user SQL entrypoint — the whole library behind one command, no
  * Scala required (r10 verdict item 8):
  *
  * {{{
  *   sbt "runMain graft.Sql /root/testdata/sf0.01 \
  *     \"SELECT * FROM span_dedup WHERE NOT pass_span LIMIT 10\""
  * }}}
  *
  * Binds the parquet tables and every [[SparkEntry]] query as temp views
  * ([[GraftViews]]) plus the custom kernels as SQL functions
  * ([[GraftFunctions]]), then executes the statement(s) and prints the
  * results. Multiple `;`-separated statements run in order against the
  * same session.
  *
  * Registration is SCOPED to the statement text: only library views
  * whose names appear as words in the SQL are materialized as views
  * (binding all 100+ costs seconds — a few build driver-side artifacts;
  * the raw tables and SQL functions always bind). A name inside a
  * string literal over-selects harmlessly.
  */
object Sql {

  /** Register the views the statement needs and run it. The returned
    * frame is lazy — callers decide whether to show/collect. */
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    val words = "[a-z0-9_]+".r.findAllIn(sql.toLowerCase).toSet
    GraftViews.register(spark, sfDir,
      only = SparkEntry.queries.keySet.filter(words))
    spark.sql(sql)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.Sql <sfDir> \"<sql>[; <sql>...]\" [maxRows]")
    val sfDir = args(0)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors() - 1).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try
      args(1).split(";").map(_.trim).filter(_.nonEmpty).foreach { stmt =>
        run(spark, sfDir, stmt).show(maxRows, truncate = false)
      }
    finally spark.stop()
  }
}
