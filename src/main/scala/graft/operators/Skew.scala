package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot join keys — the explicit form of what
  * the scaladocs across Dedup/Similarity point at ("hot buckets are an
  * AQE skew-join case"). AQE's OptimizeSkewedJoin splits oversized
  * sort-merge partitions at runtime; salting is the PLANNED alternative
  * when the hot keys are known or the join must stay broadcast-free:
  * the probe side scatters each key over `salts` sub-keys, the build
  * side replicates rows `salts`×, and the equi-join key becomes
  * (key, salt) — so one hot key fans out across `salts` tasks instead
  * of funneling into one.
  *
  * Cost model: build side grows `salts`× (use on the SMALL side of a
  * fact⋈dim join that is too big to broadcast but far smaller than the
  * fact), shuffle volume of the probe side is unchanged, and no task
  * sees more than ~1/salts of any key's rows.
  */
object Skew {

  /** Inner equi-join of `probe` (large, possibly skewed) with `build`
    * (smaller, replicated) on `key`, salted `salts` ways.
    *
    * `saltBy` must be deterministic per probe ROW (stage retries replay
    * it) but need not relate to the key — a unique id column is ideal;
    * anything uniform works. Output columns = probe.* ++ build.* minus
    * the duplicate key (like a plain `join(..., Seq(key))`). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs already carry a __salt column — it would be silently replaced")
    val p = probe.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  // ---- hot-key diagnostic (the measurement that picks `salts`) ----
  /** Hot threshold: a key is hot when its row count reaches
    * SkewHotFactor × the mean rows-per-key — evaluated integer-exactly
    * as cnt · n_keys ≥ factor · n_rows. */
  val SkewHotFactor = 2L
  val SkewTopK = 20

  /** Join-key skew report over `orders.o_custkey` — the diagnostic you
    * run BEFORE choosing between a plain shuffle join, AQE skew
    * splitting, and [[saltedJoin]]: the top-k heaviest keys with their
    * share of the table, the integer-exact hot flag, and the salt
    * count that would level each hot key back to the mean
    * (ceil(cnt / avg), the `salts` argument saltedJoin wants).
    *
    * Scale shape: ONE partial-aggregable groupBy on the join key
    * (map-side combine collapses each partition to its distinct keys),
    * a 1-row broadcast totals crossJoin, and a TakeOrderedAndProject —
    * the full key set is never sorted or collected. */
  def skewReport(spark: org.apache.spark.sql.SparkSession,
                 sfDir: String): DataFrame = {
    val c = graft.sources.Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    val t = c.agg(count(lit(1)).as("n_keys"),
      sum("cnt").cast("long").as("n_rows"))
    c.crossJoin(broadcast(t))
      .withColumn("is_hot",
        col("cnt") * col("n_keys") >= lit(SkewHotFactor) * col("n_rows"))
      .withColumn("recommended_salts", when(col("is_hot"),
          expr("(cnt * n_keys + n_rows - 1) div n_rows"))
        .otherwise(lit(1L)))
      .orderBy(col("cnt").desc, col("o_custkey"))
      .limit(SkewTopK)
      // rank = row position within TakeOrderedAndProject's one sorted
      // partition (same fold as bm25Search — the row_number window here
      // was the source of every "No Partition Defined" warning in the
      // bench logs); plan shape enforced by PlanGuard below
      .transform(PlanGuard.positionRank)
      .select(col("srank"), col("o_custkey"), col("cnt"),
        round(col("cnt") / col("n_rows"), 6).as("key_share"),
        col("is_hot"), col("recommended_salts"))
  }
}
