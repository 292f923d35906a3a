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
}
