package graft
import org.apache.spark.sql.functions._
object DbgPush {
  def main(args: Array[String]): Unit = {
    val spark = Testing.spark
    val dir = "/tmp/push_dbg"
    spark.range(0, 5000).select(col("id"),
      concat(lit("k"), col("id")).as("key")).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    for (n <- Seq(384, 512, 640, 768, 1024)) {
      val keys = (0 until n).map(i => s"k$i": Any).toArray
      try {
        val c = graft.streaming.PipelineStreams
          .pushKeysIntoScanChunked(spark, base, "key", keys, n).count()
        println(s"DEPTH=$n OK count=$c")
      } catch { case e: Throwable =>
        println(s"DEPTH=$n FAIL ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
