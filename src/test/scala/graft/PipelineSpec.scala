package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, MultiModal, Similarity, TextAnalysis}
import graft.operators.MultiModal.MediaRecord

/** Invariant tests for the LLM-pipeline block (the oracle pins exact
  * values; these pin the semantic contracts). */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("dedup_exact keeps exactly one doc per content-hash group") {
    val d = Dedup.dedupExact(spark, sf).cache()
    val perGroup = d.groupBy("text_hash").agg(
      sum(when($"is_kept", 1).otherwise(0)).as("kept"),
      count(lit(1)).as("n"), max("group_size").as("gs"))
    assert(perGroup.filter($"kept" =!= 1 || $"n" =!= $"gs").count() === 0)
  }

  test("minhash pairs are ordered, deduped, and above threshold") {
    val p = Dedup.dedupMinhashPairs(spark, sf).cache()
    assert(p.filter($"doc_a" >= $"doc_b").count() === 0)
    assert(p.filter($"jaccard" < Dedup.JaccardThreshold).count() === 0)
    assert(p.groupBy("doc_a", "doc_b").count().filter($"count" > 1).count() === 0)
  }

  test("minhash LSH finds word-shuffled duplicates (high-recall smoke)") {
    // doc pairs with IDENTICAL distinct word sets (jaccard 1.0) always share
    // all band keys, so every such pair must be in the verified output
    val w = Dedup.dedupExact(spark, sf) // just for doc ids
    val words = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id",
        array_join(array_sort(array_distinct(TextAnalysis.tokens($"text"))), " ").as("wkey"))
    val identical = words.as("a").join(words.as("b"),
        $"a.wkey" === $"b.wkey" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
    val found = Dedup.dedupMinhashPairs(spark, sf).select("doc_a", "doc_b")
    assert(identical.exceptAll(found).count() === 0)
  }

  test("dedup_similar_keep drops exactly the docs appearing as doc_b") {
    val pairs = Dedup.dedupMinhashPairs(spark, sf)
    val keep = Dedup.dedupSimilarKeep(spark, sf).cache()
    val droppedIds = pairs.select($"doc_b".as("doc_id")).distinct()
    assert(keep.filter(!$"is_kept").select("doc_id")
      .exceptAll(droppedIds).count() === 0)
    assert(droppedIds.exceptAll(
      keep.filter(!$"is_kept").select("doc_id")).count() === 0)
  }

  test("simhash is a 16-bit fingerprint with consistent collision counts") {
    val s = Dedup.simhashFingerprint(spark, sf).cache()
    assert(s.filter($"simhash" < 0 || $"simhash" > 65535).count() === 0)
    val bad = s.groupBy("simhash").agg(count(lit(1)).as("n"), max("n_same_fp").as("m"))
      .filter($"n" =!= $"m")
    assert(bad.count() === 0)
  }

  test("doc_fingerprint sample is a subset of the gram hashes") {
    val f = Dedup.docFingerprint(spark, sf).cache()
    assert(f.filter($"n_fp" > $"n_grams").count() === 0)
    assert(f.filter($"n_fp" > 0 && $"fp_min" > $"fp_max").count() === 0)
    assert(f.filter($"n_fp" === 0 && $"fp_sum" =!= 0).count() === 0)
  }

  test("embedding_topk: dense ranks, bounded cosine, per-query ordering") {
    val t = Similarity.embeddingTopK(spark, sf).cache()
    assert(t.filter($"cos_sim" < -1.000001 || $"cos_sim" > 1.000001).count() === 0)
    val ranks = t.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
    assert(ranks.filter($"mn" =!= 1 || $"mx" =!= $"n").count() === 0)
    // no self-matches
    assert(t.filter($"q_id" === $"vec_id").count() === 0)
  }

  test("ANN cosine agrees with exact top-k on shared (q, neighbor) pairs") {
    val exact = Similarity.embeddingTopK(spark, sf)
      .select($"q_id", $"vec_id", $"cos_sim".as("c_exact"))
    val ann = Similarity.embeddingAnnLsh(spark, sf)
      .select($"q_id", $"vec_id", $"cos_sim".as("c_ann"))
    val joined = exact.join(ann, Seq("q_id", "vec_id")).cache()
    assert(joined.filter($"c_exact" =!= $"c_ann").count() === 0)
  }

  test("HLL sketch stays within its error bound against the exact count") {
    val rows = TextAnalysis.approxUserCount(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") <= 0.1,
        s"event_type ${r.getAs[String]("event_type")}")
    }
  }

  test("frame sampling and resize planning ride the decoded features") {
    val media = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", TextAnalysis.normText($"text").as("ntext"))
      .as[(Long, String)]
      .map { case (id, t) => MediaRecord(id, "text", t.getBytes("UTF-8")) }
    val feats = MultiModal.decodeFeatures(media).cache()
    val frames = MultiModal.sampleFrames(feats, stride = 5)
    val perMedia = frames.groupBy("media_id").count()
      .join(feats.select($"media_id", $"n_frames"), "media_id")
    // every-5th sampling: count = ceil(n_frames / 5); timestamps at 40ms
    assert(perMedia.filter($"count" =!= ceil($"n_frames" / lit(5.0))).count() === 0)
    assert(frames.filter($"ts_ms" =!= $"frame_idx" * 40L).count() === 0)
    val resized = MultiModal.resizeMeta(feats, maxDim = 128)
    val joined = resized.join(feats.select($"media_id", $"width".as("w0"),
      $"height".as("h0")), "media_id")
    assert(joined.filter($"width" > 128 || $"height" > 128).count() === 0)
    assert(joined.filter($"scale" > 1.0).count() === 0) // never upscale
    // aspect preserved within rounding: |w/h - w0/h0| small
    assert(joined.filter(abs($"width" / $"height".cast("double")
      - $"w0" / $"h0".cast("double")) > 0.1).count() === 0)
  }

  test("typed decode pipeline matches the relational multimodal query") {
    val media = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", TextAnalysis.normText($"text").as("ntext"))
      .as[(Long, String)]
      .map { case (id, t) => MediaRecord(id, "text", t.getBytes("UTF-8")) }
    val decoded = MultiModal.decodeFeatures(media)
      .select($"media_id".as("doc_id"), $"bytes",
        $"width".cast("long").as("w"), $"height".cast("long").as("h"),
        $"n_frames".cast("long").as("f"))
    val q = MultiModal.multimodalFeatures(spark, sf)
    val bad = q.join(decoded, Seq("doc_id"))
      .filter($"media_bytes" =!= $"bytes" || $"fake_width" =!= $"w" ||
        $"fake_height" =!= $"h" || $"est_frames" =!= $"f")
    assert(bad.count() === 0)
    assert(decoded.count() === q.count())
  }
}
