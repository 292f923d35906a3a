package graft

import org.apache.spark.sql.SparkSession

/** Plan audit helper: print the formatted physical plan of named queries
  * (all of them with no args). `runMain graft.Explain [-exec] [name ...]`.
  * With `-exec` the query is EXECUTED first and the final adaptive plan is
  * printed — the only way to see what AQE actually did (exchange/stage
  * reuse, runtime join strategy changes, coalesced partitions). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val exec = args.contains("-exec")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ad-hoc session confs for plan experiments, e.g.
    // SPARK_GRAFT_CONF=spark.graft.components.localEdgeLimit=0
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val named = args.toSeq.filterNot(_ == "-exec")
    val names = if (named.nonEmpty) named else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        df.queryExecution.toRdd.count()
        println(df.queryExecution.executedPlan.toString)
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
