package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}

/** Invariant tests for the corpus-composition operators (the oracle pins
  * exact values; these pin the semantic contracts). */
class SamplingSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("source_mix_plan: shares sum to 1, rates clamp at 1, dominant lang downsampled") {
    val p = Sampling.sourceMixPlan(spark, sf).cache()
    val sums = p.agg(
      round(sum("doc_share"), 4).as("ds"),
      round(sum("tok_share"), 4).as("ts")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-3)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-3)
    assert(p.filter($"sample_rate" > 1.0 || $"sample_rate" <= 0.0).count() === 0)
    // the most frequent language must be downsampled below 1 whenever the
    // distribution is non-uniform (it is, in every generated testdata SF)
    val top = p.orderBy($"n_docs".desc).head()
    assert(top.getAs[Double]("sample_rate") < 1.0)
  }

  test("stratified_sample: deterministic, per-lang acceptance matches the planned rate") {
    val s1 = Sampling.stratifiedSample(spark, sf).cache()
    val s2 = Sampling.stratifiedSample(spark, sf)
    // re-running produces the identical decision set (hash-mod, not rand())
    assert(s1.exceptAll(s2).count() === 0)
    assert(s1.filter($"bucket" < 0 || $"bucket" >= Sampling.SampleBuckets).count() === 0)
    // langs at rate 1.0 keep everything; downsampled langs keep a strict subset
    val plan = Sampling.sourceMixPlan(spark, sf)
      .select($"lang", $"sample_rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val perLang = s1.groupBy("lang").agg(
      sum(when($"sampled", 1).otherwise(0)).as("kept"),
      count(lit(1)).as("n")).collect()
    perLang.foreach { r =>
      val (lang, kept, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (plan(lang) >= 1.0) assert(kept === n, s"lang $lang must keep all")
      else {
        assert(kept < n, s"lang $lang must drop some")
        // md5 buckets are uniform: acceptance within ±15 pp of the rate
        assert(math.abs(kept.toDouble / n - plan(lang)) < 0.15,
          s"lang $lang kept ${kept.toDouble / n} vs rate ${plan(lang)}")
      }
    }
  }

  test("shard_pack agrees with the window formulation and rotates like segments") {
    val got = Sampling.shardPack(spark, sf).cache()
    val want = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang",
        size(TextAnalysis.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum("n_tokens").over(
          Window.partitionBy("lang").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id",
        floor($"tokens_before" / Sampling.ShardTokenBudget).cast("long"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // shards are dense from 0 within each language and non-decreasing in
    // doc order (the segment-rotation invariant)
    val perLang = got.groupBy("lang").agg(
      min("shard_id").as("mn"), max("shard_id").as("mx"),
      countDistinct("shard_id").as("n"))
    assert(perLang.filter($"mn" =!= 0 || $"n" =!= $"mx" + 1).count() === 0)
    // at least one language actually rotates at this budget
    assert(got.filter($"shard_id" > 0).count() > 0)
  }

  test("quality_topk_sample agrees with the window formulation") {
    val got = Sampling.qualityTopkSample(spark, sf)
      .select("lang", "qrank", "doc_id", "quality_score")
    val want = TextAnalysis.textStats(spark, sf)
      .withColumn("qrank", row_number().over(
        Window.partitionBy("lang")
          .orderBy($"quality_score".desc, $"doc_id")).cast("long"))
      .filter($"qrank" <= Sampling.QualityTopK)
      .select("lang", "qrank", "doc_id", "quality_score")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("top_terms agrees with the window formulation and its counts recount") {
    val got = TextAnalysis.topTerms(spark, sf).cache()
    val tc = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("term_count"))
    val dfreq = tc.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val want = tc.join(dfreq, Seq("term"))
      .withColumn("term_rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy($"term_count".desc, $"doc_freq", $"term")).cast("long"))
      .filter($"term_rank" <= TextAnalysis.TopTermsK)
      .select("doc_id", "term_rank", "term", "term_count", "doc_freq")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // ranks are dense from 1 within every doc
    val ranks = got.groupBy("doc_id").agg(
      count(lit(1)).as("n"), min("term_rank").as("mn"), max("term_rank").as("mx"))
    assert(ranks.filter($"mn" =!= 1 || $"mx" =!= $"n").count() === 0)
  }

  test("writeShards: one parquet file per shard, nothing lost on read-back") {
    val out = java.nio.file.Files.createTempDirectory("shards_out").toString
    val manifest = graft.operators.Sampling.writeShards(spark, sf, out).cache()
    val plan = graft.operators.Sampling.shardPack(spark, sf)
      .groupBy("lang", "shard_id").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // manifest matches the packer's plan exactly
    val got = manifest.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === plan)
    // exactly ONE data file inside every shard directory
    plan.keys.foreach { case (lang, shard) =>
      val dir = new java.io.File(s"$out/lang=$lang/shard_id=$shard")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$dir has ${files.length} files")
    }
    // full corpus survives the round trip
    val total = spark.read.parquet(out).count()
    assert(total === graft.sources.Tables.load(spark, sf, "documents").count())
    manifest.unpersist()
  }

  test("sequence_pack: contiguous token stream, exact chunk geometry") {
    val r = Sampling.sequencePack(spark, sf)
      .orderBy("doc_id").collect()
    assert(r.nonEmpty)
    // the concatenated stream is gapless: each doc starts exactly where
    // the previous one (plus its EOS) ended
    var expectedOffset = 0L
    r.foreach { row =>
      assert(row.getAs[Long]("tokens_before") === expectedOffset,
        s"doc ${row.getAs[Long]("doc_id")}")
      expectedOffset += row.getAs[Long]("n_tok_sep")
    }
    r.foreach { row =>
      val off = row.getAs[Long]("seq_offset")
      val n = row.getAs[Long]("n_tok_sep")
      val spans = row.getAs[Long]("seqs_spanned")
      assert(off >= 0 && off < Sampling.SeqLen)
      // chunk geometry: spans is exactly the number of SeqLen windows the
      // doc's [off, off + n) token range touches
      assert(spans === (off + n - 1) / Sampling.SeqLen + 1, row.toString)
    }
    // the packing must actually split docs across boundaries (that's the
    // property distinguishing it from shard_pack's doc-aligned rotation)
    assert(r.exists(_.getAs[Long]("seqs_spanned") > 1))
  }

  test("chunk_windows: exact geometry, tail clipping, driver-recomputed md5") {
    // ground truth recomputed in the DRIVER from the raw texts (JVM regex
    // + MessageDigest — independent of the Spark expression pipeline; the
    // DuckDB oracle separately pins cross-engine parity)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def norm(s: String): String =
      s.replaceAll("[ \t\n\r\f]+", " ").trim.toLowerCase
    val toksById = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)).split(" ", -1).toSeq)
      .toMap
    val byDoc = Sampling.chunkWindows(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === toksById.keySet, "every doc emits >= 1 chunk")
    val W = Sampling.ChunkWindow.toLong; val S = Sampling.ChunkStride.toLong
    for ((id, rs) <- byDoc) {
      val toks = toksById(id); val n = toks.length.toLong
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx")).toSeq
      assert(sorted.map(_.getAs[Long]("chunk_idx")) ===
        (0L until sorted.length).toSeq, s"doc $id: contiguous chunk_idx")
      assert(sorted.length === (n - 1) / S + 1, s"doc $id: chunk count")
      sorted.foreach { r =>
        val start = r.getAs[Long]("tok_start")
        val len = r.getAs[Long]("n_chunk_tokens")
        assert(start === r.getAs[Long]("chunk_idx") * S)
        assert(len === math.min(W, n - start), s"doc $id @$start")
        assert(r.getAs[String]("chunk_md5") ===
          md5hex(toks.slice(start.toInt, (start + len).toInt).mkString(" ")),
          s"doc $id @$start: fingerprint")
      }
      // the tail chunk ends exactly at the document's last token
      val last = sorted.last
      assert(last.getAs[Long]("tok_start") +
        last.getAs[Long]("n_chunk_tokens") === n, s"doc $id: tail clip")
    }
    // the overlap property is non-degenerate on real data
    assert(byDoc.values.exists(_.length >= 2), "some doc spans 2+ chunks")
  }

  test("importance_sample: deterministic Gumbel draw, tilted toward the quality target") {
    // sf0.01 — at sf0.001 the corpus is smaller than DsirK and the
    // selection property is degenerate
    val sf01 = "/root/testdata/sf0.01"
    val s1 = Sampling.importanceSample(spark, sf01).cache()
    assert(s1.count() === Sampling.DsirK)
    // the draw is a pure function of the corpus (hash-Gumbel, not rand())
    assert(s1.exceptAll(Sampling.importanceSample(spark, sf01)).count() === 0)
    // the Gumbel perturbation stays on its designed micro-nat scale:
    // key − w = floor(−ln(−ln u)·10⁶) with u ∈ (2⁻³³, 1), so the noise is
    // bounded while the weights are free to dominate it
    val noise = s1.select(($"key_micro" - $"w_micro").as("g"))
    assert(noise.filter($"g" < -4000000L || $"g" > 25000000L).count() === 0)
    // importance resampling must SHIFT the draw toward the target: the
    // LM-pass set's share of the sample well above its corpus share
    // (per-doc weights are Σ per-bigram log-ratios — several nats for
    // pass-typical docs vs strongly negative for tail docs — orders of
    // magnitude above the O(1)-nat Gumbel noise)
    val pass = graft.operators.LangModel.lmBigramScore(spark, sf01)
    val corpusShare =
      pass.filter($"pass_lm").count().toDouble / pass.count()
    val sampleShare =
      s1.filter($"pass_lm").count().toDouble / Sampling.DsirK
    info(s"pass_lm share: corpus $corpusShare, sample $sampleShare")
    assert(sampleShare > corpusShare + 0.2,
      s"sample share $sampleShare vs corpus share $corpusShare")
    s1.unpersist()
  }

  test("applySampleDecision: a language absent from the plan still gets " +
      "its decision row, default KEEP (r17 operators review #1)") {
    val docs = Seq((1L, "en"), (2L, "xx")).toDF("doc_id", "lang")
    val plan = Seq(("en", 5000L)).toDF("lang", "keep_below")
    val got = Sampling.applySampleDecision(docs, plan)
      .select("doc_id", "lang", "keep_below", "sampled")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size === 2, "no doc may vanish from the decision output")
    assert(got(2L)._2 === Sampling.SampleBuckets.toLong)
    assert(got(2L)._3, "an unseen language defaults to keep " +
      "(the plan's own rate limit as reference docs -> 0)")
  }
}
