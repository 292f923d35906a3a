package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-style MERGE (upsert/delete) — apply a change batch to a base
  * table in one pass: `delete` removes the keyed row, `update` replaces
  * the payload columns, `insert` adds a new row. The shape every
  * incremental ingestion pipeline needs when the corpus is maintained as
  * periodically-merged snapshots rather than rewritten from scratch.
  *
  * Scale posture (100 TB): ONE equi shuffle — a full-outer join on the
  * key. Spark cannot broadcast a FULL OUTER join, so both sides hash-
  * exchange once (the honest cost of one-pass merge-with-insert
  * semantics); with base and batch bucketed by the key the join is
  * co-located and shuffle-free, which is how a maintained snapshot
  * should be laid out anyway. Callers who cannot bucket and whose
  * batches carry no inserts can split delete/update into a broadcast
  * left-anti + left join instead. No windows, no driver state.
  */
object Merge {

  /** Apply a change batch to `base`. `changes` carries the key column, an
    * `op` column ('insert' | 'update' | 'delete'), and the same payload
    * columns as `base` (NULL payload on deletes). At most one change per
    * key (enforce upstream — last-write-wins compaction of a change log
    * is a groupBy max_by on ingest sequence, not this operator's job).
    * Output adds `src`: 'base' (untouched), 'updated', or 'inserted'.
    *
    * Edge semantics are UPSERT-shaped, like SQL MERGE's WHEN [NOT]
    * MATCHED arms collapsed to one rule: an 'update' whose key is absent
    * from the base still lands (labeled 'updated'), an 'insert' whose key
    * already exists replaces the payload (labeled 'inserted'), and a
    * 'delete' of an absent key is a no-op. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   payload: Seq[String]): DataFrame = {
    val b = payload.foldLeft(base.select(col(key) +: payload.map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"b_$c")
    }
    val ch = payload.foldLeft(changes.select(
      col(key) +: col("op") +: payload.map(col): _*)) { (d, c) =>
      d.withColumnRenamed(c, s"c_$c")
    }
    b.join(ch, Seq(key), "full")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(col(key) +:
        payload.map(c => when(col("op").isNotNull, col(s"c_$c"))
          .otherwise(col(s"b_$c")).as(c)) :+
        when(col("op") === "update", lit("updated"))
          .when(col("op") === "insert", lit("inserted"))
          .otherwise(lit("base")).as("src"): _*)
  }

  /** The benched/oracled instance: a deterministic change batch over
    * `customer` derived from the doc-hash of the key (bucket 0 → delete,
    * 1-2 → update with a +1000.00 balance adjustment and a re-segment,
    * 3 → insert of a new key). Insert keys live in the NEGATIVE key
    * space (−k − 1): customer keys are positive at every TPC-H scale, so
    * a synthetic insert can never collide with a base key — an additive
    * offset would collide as soon as custkey exceeded it (sf ≥ 7),
    * breaking applyChanges' one-change-per-key precondition. All payload
    * math is exact decimals, so the merged snapshot hashes identically
    * on both engines. */
  def insertKey(k: Column): Column = -k - 1

  def changeBatch(base: DataFrame): DataFrame = {
    val bucket = Curation.docHash(col("c_custkey")) % 10
    base
      .withColumn("bucket", bucket)
      .filter(col("bucket") <= 3)
      .select(
        when(col("bucket") === 3, insertKey(col("c_custkey")))
          .otherwise(col("c_custkey")).as("c_custkey"),
        when(col("bucket") === 0, lit("delete"))
          .when(col("bucket") === 3, lit("insert"))
          .otherwise(lit("update")).as("op"),
        when(col("bucket") === 0, lit(null).cast("string"))
          .when(col("bucket") === 3,
            concat(lit("Customer#INS"), col("c_custkey").cast("string")))
          .otherwise(col("c_name")).as("c_name"),
        when(col("bucket") === 0, lit(null).cast("decimal(12,2)"))
          .when(col("bucket") === 3, lit(0).cast("decimal(12,2)"))
          .otherwise((col("c_acctbal").cast("decimal(12,2)") + 1000)
            .cast("decimal(12,2)")).as("c_acctbal"),
        when(col("bucket") === 0, lit(null).cast("string"))
          .when(col("bucket") === 3, lit("NEW"))
          .otherwise(lit("REBALANCED")).as("c_mktsegment"))
  }

  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.sources.Tables.load(spark, sfDir, "customer")
      .withColumn("c_acctbal", col("c_acctbal").cast("decimal(12,2)"))
    applyChanges(base, changeBatch(base), "c_custkey",
      Seq("c_name", "c_acctbal", "c_mktsegment"))
      // decimal math above, double at the surface: the stringified scales
      // would differ across engines ('1.6' vs '1.60') — verify gotcha
      .withColumn("c_acctbal", col("c_acctbal").cast("double"))
  }

  /** SCD Type-2 history from the SAME change batch as [[mergeUpsert]]
    * (type-1 overwrites in place; type-2 keeps every version with a
    * validity interval — the audit/backfill answer to "what did this row
    * say when the model trained"). Version 0 rows are the base snapshot;
    * an update or delete CLOSES them at batch sequence 1 (`valid_to`);
    * updates and inserts open version-1 rows with a NULL `valid_to`.
    * Deletes leave no current row — exactly one current row per
    * surviving key, none for deleted keys (spec-pinned; the oracle pins
    * every interval).
    *
    * Scale: one full-outer join on the key (the merge_upsert shape) and
    * a batch-sized union — history grows by |changes| per batch, the
    * base is never rewritten beyond interval closing. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.sources.Tables.load(spark, sfDir, "customer")
      .withColumn("c_acctbal", col("c_acctbal").cast("decimal(12,2)"))
    val payload = Seq("c_name", "c_acctbal", "c_mktsegment")
    val ch = changeBatch(base)
    val chP = payload.foldLeft(ch) { (d, c) =>
      d.withColumnRenamed(c, s"c_$c")
    }
    val v0 = base.select(col("c_custkey") +: payload.map(col): _*)
      .join(chP.select(col("c_custkey"), col("op")), Seq("c_custkey"), "left")
      .select(col("c_custkey") +: payload.map(col) :+
        lit(0L).as("version") :+ lit(0L).as("valid_from") :+
        when(col("op").isNotNull, lit(1L)).cast("long").as("valid_to") :+
        col("op").isNull.as("is_current"): _*)
    val v1 = chP.filter(col("op") =!= "delete")
      .select(col("c_custkey") +:
        payload.map(c => col(s"c_$c").as(c)) :+
        lit(1L).as("version") :+ lit(1L).as("valid_from") :+
        lit(null).cast("long").as("valid_to") :+
        lit(true).as("is_current"): _*)
    v0.unionAll(v1)
      .withColumn("c_acctbal", col("c_acctbal").cast("double"))
  }
}
