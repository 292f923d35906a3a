package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe grouped prefix computation — the two-phase "zipWithIndex"
  * pattern replacing `Window.partitionBy(group).orderBy(keys)` for running
  * counts/sums over the RAW log.
  *
  * Why: the log model's windows partition by `part_id` (the topic's
  * partition count, e.g. 4) — at 100 TB that funnels the entire table into
  * 4 sort tasks (round-1 verdict's scale-killer). Here instead:
  *
  *  1. range-repartition by (group, sortKeys) into `numTasks` partitions
  *     (parallelism decoupled from group cardinality) and sort within each;
  *  2. pass 1: per-task, per-group row counts / value sums — a tiny
  *     O(tasks × groups) driver collect;
  *  3. prefix-sum those bases in task order on the driver, broadcast back;
  *  4. pass 2: per-task running totals + broadcast base = exact global
  *     exclusive prefix per group.
  *
  * Both passes share one RDD, so the range shuffle is written once and the
  * second pass re-reads shuffle files (no second scan of the source).
  * Output values are independent of the sampled range boundaries, so
  * results are deterministic even though boundary placement isn't.
  *
  * The reference assigns offsets at ingest with an atomic fetch_add
  * (`flyq-server/src/core/partition_state.rs:27-29`); this is the batch
  * recompute of the same assignment at cluster parallelism.
  */
object OrderedIndex {

  /** Adds `outCol` = the exclusive prefix (sum of `valueCol`, or row count
    * when None) over rows strictly before the current row in the
    * (groupCols, sortCols) total order, per group. valueCol=None gives the
    * dense 0-based per-group index. */
  def withExclusivePrefix(df: DataFrame,
                          groupCols: Seq[String],
                          sortCols: Seq[String],
                          valueCol: Option[String],
                          outCol: String,
                          numTasks: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numTasks > 0) numTasks
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyExprs: Seq[Column] = (groupCols ++ sortCols).map(col)
    val sorted =
      if (keyExprs.isEmpty) df
      else df.repartitionByRange(n, keyExprs: _*).sortWithinPartitions(keyExprs: _*)
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val vIdx = valueCol.map(schema.fieldIndex)
    val rdd = sorted.rdd

    def valueOf(r: Row): Long = vIdx match {
      case Some(i) => r.getLong(i)
      case None => 1L
    }

    // pass 1: per-task per-group totals (tiny)
    val counts: Array[(Int, Seq[(Seq[Any], Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          val k = gIdx.map(r.get)
          m.update(k, m.getOrElse(k, 0L) + valueOf(r))
        }
        Iterator.single(pid -> m.toSeq)
      }.collect()

    // driver-side prefix sum across tasks, per group
    val running = mutable.HashMap.empty[Seq[Any], Long]
    val bases = Array.fill(rdd.getNumPartitions)(Map.empty[Seq[Any], Long])
    counts.sortBy(_._1).foreach { case (pid, groups) =>
      bases(pid) = groups.map { case (k, c) =>
        val b = running.getOrElse(k, 0L)
        running.update(k, b + c)
        k -> b
      }.toMap
    }
    val basesB = spark.sparkContext.broadcast(bases)

    // pass 2: base + local running total (exclusive)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val base = basesB.value(pid)
      val local = mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        val k = gIdx.map(r.get)
        val prefix = base.getOrElse(k, 0L) + local.getOrElse(k, 0L)
        local.update(k, local.getOrElse(k, 0L) + valueOf(r))
        Row.fromSeq(r.toSeq :+ prefix)
      }
    }
    spark.createDataFrame(out,
      StructType(schema.fields :+ StructField(outCol, LongType, nullable = false)))
  }
}
