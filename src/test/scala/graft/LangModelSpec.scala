package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LangModel, TextAnalysis}

/** Bigram-LM quality scoring invariants (the oracle pins exact values). */
class LangModelSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("lm_bigram_score: every doc present, bigram counts conserved, scores ≤ 0") {
    val d = graft.sources.Tables.load(spark, sf, "documents")
    val s = LangModel.lmBigramScore(spark, sf).cache()
    assert(s.count() === d.count())
    // the model is trained on the scored corpus, so every bigram
    // occurrence joins: n_bigrams == max(0, n_words - 1)
    val words = d.select($"doc_id",
      greatest(size(TextAnalysis.tokens($"text")).cast("long") - 1, lit(0L))
        .as("expect_bg"))
    assert(s.join(words, Seq("doc_id"))
      .filter($"n_bigrams" =!= $"expect_bg").count() === 0)
    // MLE log-probs: cb ≤ cu always, so every sum is ≤ 0
    assert(s.filter($"lm_micro_sum" > 0).count() === 0)
    assert(s.filter($"n_bigrams" > 0 && $"lm_avg_nats" > 0).count() === 0)
    s.unpersist()
  }

  test("lm_bigram_score: pass flag is the integer threshold, and splits the corpus") {
    val s = LangModel.lmBigramScore(spark, sf).cache()
    assert(s.filter($"pass_lm" =!= ($"n_bigrams" > 0 &&
      $"lm_micro_sum" >= lit(LangModel.PassAvgMicroNats) * $"n_bigrams"))
      .count() === 0)
    assert(s.filter($"pass_lm").count() > 0)
    assert(s.filter(!$"pass_lm").count() > 0)
    s.unpersist()
  }

  test("lm model sanity on a hand corpus: repeated transition scores higher") {
    // "a b a b a b" has only high-probability transitions; "a c b a"
    // mixes rare ones. Score the tiny corpus through the same pipeline
    // shape by hand: P(b|a)=2/3 in doc1's favor.
    val docs = Seq((1L, "a b a b a b"), (2L, "a c b a")).toDF("doc_id", "text")
    val toks = docs.select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
    val bgs = toks.select($"doc_id", explode(
      transform(sequence(lit(0), size($"toks") - 2),
        i => concat(element_at($"toks", i + 1), lit(" "),
          element_at($"toks", i + 2)))).as("bg"))
    val model = bgs.groupBy("bg").agg(count(lit(1)).as("cb"))
      .withColumn("w1", split($"bg", " ").getItem(0))
    val ctx = model.groupBy("w1").agg(sum("cb").as("cu"))
    val lp = model.join(ctx, Seq("w1"))
      .select($"bg", (log($"cb".cast("double") / $"cu")).as("lp"))
    val perDoc = bgs.join(lp, Seq("bg")).groupBy("doc_id")
      .agg(avg("lp").as("avg_lp")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(perDoc(1L) > perDoc(2L))
  }

  test("lm_quality_buckets: tercile cuts match a plain-Scala recomputation") {
    val rows = LangModel.lmQualityBuckets(spark, sf).collect().map { x =>
      val si = x.fieldIndex("score_q")
      (x.getAs[Long]("doc_id"), x.getAs[String]("lang"),
        if (x.isNullAt(si)) None else Some(x.getLong(si)),
        x.getAs[String]("bucket"))
    }
    assert(rows.nonEmpty)
    rows.filter(_._3.isEmpty).foreach(x => assert(x._4 === "unscored"))
    val scored = rows.filter(_._3.nonEmpty)
    assert(scored.nonEmpty)
    scored.groupBy(_._2).foreach { case (lang, ds) =>
      val scores = ds.map(_._3.get).sorted
      val n = scores.length.toLong
      val distinct = scores.distinct
      val t1 = distinct.find(s => scores.count(_ <= s) * 3L >= n).get
      val t2 = distinct.find(s => scores.count(_ <= s) * 3L >= 2L * n).get
      ds.foreach { case (id, _, s, b) =>
        val exp =
          if (s.get <= t1) "tail" else if (s.get <= t2) "middle" else "head"
        assert(b === exp, s"doc $id lang $lang score ${s.get}")
      }
      // the cuts carve real terciles: each lower band holds ≥ its third
      assert(scores.count(_ <= t1) * 3L >= n)
      assert(scores.count(_ <= t2) * 3L >= 2L * n)
      // and all three bands are non-degenerate when scores vary
      if (distinct.length >= 3)
        assert(Set("tail", "middle", "head").subsetOf(
          ds.map(_._4).toSet), s"$lang missing a band")
    }
  }
}
