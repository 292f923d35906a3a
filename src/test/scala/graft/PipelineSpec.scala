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

  test("minhash_recall: pooled truth has no false positives and the verdict holds") {
    val r = Dedup.minhashRecall(spark, sf).head()
    val nTruth = r.getAs[Long]("n_truth")
    val nA = r.getAs[Long]("n_a")
    val nB = r.getAs[Long]("n_b")
    assert(nTruth > 0, "corpus must contain verified near-dup pairs")
    assert(nA <= nTruth && nB <= nTruth)
    assert(r.getAs[Long]("n_missed_by_a") === nTruth - nA)
    assert(r.getAs[Long]("n_missed_by_b") === nTruth - nB)
    assert(r.getAs[Boolean]("recall_ok"), s"recall_a=${r.getAs[Double]("recall_a")}")
    // no false positives in the pooled truth: every pair either leg found
    // really is at-or-above the threshold — recomputed here with Spark
    // built-ins (array_intersect over the word sets), independent of the
    // TextHashes.jaccard_long kernel both legs verify with
    val w = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", array_distinct(TextAnalysis.tokens($"text")).as("ws"))
    val truth = Dedup.dedupMinhashPairs(spark, sf).select("doc_a", "doc_b")
      .unionByName(Dedup.verifiedPairsB(spark, sf).select("doc_a", "doc_b"))
      .distinct()
    val bad = truth
      .join(w.as("wa"), $"doc_a" === $"wa.doc_id")
      .join(w.as("wb"), $"doc_b" === $"wb.doc_id")
      .withColumn("j", size(array_intersect($"wa.ws", $"wb.ws")) /
        (size($"wa.ws") + size($"wb.ws") -
          size(array_intersect($"wa.ws", $"wb.ws"))).cast("double"))
      .filter(round($"j", 6) < Dedup.JaccardThreshold)
    assert(bad.count() === 0)
    assert(truth.count() === nTruth)
  }

  test("ngram_recall: pooled truth has no false positives and the verdict holds") {
    val r = Dedup.ngramRecall(spark, sf).head()
    val nTruth = r.getAs[Long]("n_truth")
    val nA = r.getAs[Long]("n_a")
    val nB = r.getAs[Long]("n_b")
    assert(nTruth > 0 && nA <= nTruth && nB <= nTruth)
    // theory calibration: expected catch ≤ truth size, and the observed
    // counts sit within 3σ of the LSH-theory prediction
    assert(r.getAs[Double]("expected_catch") <= nTruth.toDouble)
    assert(r.getAs[Boolean]("consistent_a"),
      s"n_a=$nA expected=${r.getAs[Double]("expected_catch")} σ=${r.getAs[Double]("sigma_catch")}")
    assert(r.getAs[Boolean]("consistent_b"),
      s"n_b=$nB expected=${r.getAs[Double]("expected_catch")} σ=${r.getAs[Double]("sigma_catch")}")
    // truth has no false positives: every rep pair either family found is
    // at-or-above the 0.5 threshold when its Jaccard is recomputed with
    // Spark built-ins over the gram-hash sets
    val gd = Dedup.ngramDocs(spark, sf)
    val g = gd.select($"doc_id", $"hgs")
    val truth = Dedup.ngramRepPairs(gd, Dedup.ngramReps(spark, sf))
      .select("doc_a", "doc_b")
      .unionByName(Dedup.ngramRepPairs(gd, Dedup.ngramReps(spark, sf),
        Dedup.NumHashes).select("doc_a", "doc_b"))
      .distinct()
    val bad = truth
      .join(g.as("ga"), $"doc_a" === $"ga.doc_id")
      .join(g.as("gb"), $"doc_b" === $"gb.doc_id")
      .withColumn("j", size(array_intersect($"ga.hgs", $"gb.hgs")) /
        (size($"ga.hgs") + size($"gb.hgs") -
          size(array_intersect($"ga.hgs", $"gb.hgs"))).cast("double"))
      .filter(round($"j", 6) < Dedup.NgramJaccardThreshold)
    assert(bad.count() === 0)
    assert(truth.count() === nTruth)
  }

  test("near_dup_recall: observed catches match SRP banding theory") {
    val rows = Similarity.nearDupRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_caught") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("cos_bucket") >= 7L) // ≥ floor(0.35·20)
    }
    val caught = rows.map(_.getAs[Long]("n_caught")).sum
    // theory calibration (acos is JVM-side only — not bit-portable to the
    // oracle): a truth pair at cosine c survives one SRP band of P planes
    // with p^P, p = 1-acos(c)/π, and any of B independent bands with
    // 1-(1-p^P)^B; the observed total must sit within 4σ + slack of the
    // summed expectation
    val nVecs = graft.sources.Tables.load(spark, sf, "embeddings").count()
    val planes = Similarity.nearDupPlanesPerBand(nVecs)
    val truth = Similarity.nearDupPoolTruth(spark, sf)
      .select("cos").collect().map(_.getDouble(0))
    assert(truth.length === rows.map(_.getAs[Long]("n_truth")).sum)
    val probs = truth.map { c =>
      val p = 1.0 - math.acos(math.min(c, 1.0)) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, planes), Similarity.NearDupBands)
    }
    val expected = probs.sum
    val sd = math.sqrt(probs.map(q => q * (1 - q)).sum)
    assert(math.abs(caught - expected) <= 4 * sd + 3.0,
      s"caught=$caught expected=$expected sd=$sd planes=$planes n=${truth.length}")
  }

  test("simhash hamming pairs: ordered, bounded, and exhaustive for identical word sets") {
    val p = Dedup.dedupSimhashPairs(spark, sf).cache()
    assert(p.filter($"doc_a" >= $"doc_b").count() === 0)
    assert(p.filter($"hamming" > Dedup.SimHammingMax || $"hamming" < 0).count() === 0)
    assert(p.groupBy("doc_a", "doc_b").count().filter($"count" > 1).count() === 0)
    // identical distinct word sets → identical 64-bit fingerprint →
    // collide on EVERY block triple with hamming 0: recall there is exact,
    // not probabilistic (the pigeonhole guarantee degenerates to equality)
    val words = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id",
        array_join(array_sort(array_distinct(TextAnalysis.tokens($"text"))), " ").as("wkey"))
      .filter(org.apache.spark.sql.functions.length($"wkey") > 0)
    val identical = words.as("a").join(words.as("b"),
        $"a.wkey" === $"b.wkey" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
    assert(identical.count() > 0) // the corpus must actually exercise this
    val zero = p.filter($"hamming" === 0).select("doc_a", "doc_b")
    assert(identical.exceptAll(zero).count() === 0)

    // the fused one-digest kernel must be value-identical to the
    // two-kernel composition it replaces
    import graft.functions.TextHashes
    val w = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", array_distinct(TextAnalysis.tokens($"text")).as("ws"))
      .filter(size($"ws") >= Dedup.MinWords)
    val fused = w.select($"doc_id", TextHashes.simhash64($"ws").as("sh"))
      .select($"doc_id", $"sh.sh_lo".as("lo"), $"sh.sh_hi".as("hi"))
    val composed = w.select($"doc_id",
      TextHashes.simhash_bits(TextHashes.hash32_array($"ws"), 32).as("lo"),
      TextHashes.simhash_bits(TextHashes.hash32_array_at($"ws", 4), 32).as("hi"))
    assert(fused.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(fused).count() === 0)
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

  test("dedup_components: local union-find ≡ distributed fixpoint ≡ brute-force closure") {
    val key = Dedup.ComponentsLocalEdgeLimitKey
    // local (driver union-find) path — sf0.001's pair count is far below
    // any sane limit, so the default takes it
    val local = Dedup.dedupComponents(spark, sf)
      .select("doc_id", "component_id", "is_kept").cache()
    // distributed fixpoint path, forced by a zero edge limit
    spark.conf.set(key, "0")
    val shufflePartsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val dist =
      try Dedup.dedupComponents(spark, sf)
        .select("doc_id", "component_id", "is_kept").cache()
      finally spark.conf.unset(key)
    // the loop sizes its own frames with explicit repartition — the
    // session-global shuffle conf must come back (and stay) untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") === shufflePartsBefore)
    assert(local.exceptAll(dist).count() === 0)
    assert(dist.exceptAll(local).count() === 0)
    // brute-force transitive closure on the driver (pairs are tiny at sf0.001)
    val pairs = Dedup.dedupMinhashPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { v =>
      if (!label.contains(v)) { // BFS from each unvisited vertex, min label
        val queue = scala.collection.mutable.Queue(v)
        val seen = scala.collection.mutable.Set(v)
        while (queue.nonEmpty) {
          val x = queue.dequeue()
          adj(x).foreach(n => if (seen.add(n)) queue.enqueue(n))
        }
        val m = seen.min
        seen.foreach(label(_) = m)
      }
    }
    val got = local.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    label.foreach { case (v, m) => assert(got(v) === m, s"doc $v") }
    // docs not in any pair are their own singleton component
    got.foreach { case (v, m) =>
      if (!label.contains(v)) assert(m === v, s"singleton $v")
    }
  }

  test("ngram LSH recall pinned against the unblocked all-pairs formulation") {
    // ADVICE round-3 #2: the banded oracle SQL is generated from the same
    // constants as the Spark plan, so a shared banding bug would pass
    // correctness by construction. This pins the banded output against an
    // INDEPENDENT all-pairs ground truth at small scale: every emitted
    // pair must be a true ≥-threshold pair (precision 1.0 — banding only
    // prunes candidates, the Jaccard verify is exact), and recall over the
    // word-shuffle duplicate range (s ≥ 0.8, where 8 bands of 2 give
    // 1-(1-s²)⁸ ≈ 0.9998) must be total.
    val banded = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b", "ngram_jaccard").cache()
    val g = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        graft.operators.TextAnalysis.normText(col("text")).as("ntext"))
      .withColumn("n_chars_norm", length(col("ntext")).cast("long"))
      .filter(col("n_chars_norm") >= Dedup.NgramMinChars)
      .withColumn("hgs", graft.functions.TextHashes.hash32_array(
        graft.functions.TextHashes.char_grams_distinct(col("ntext"), 3)))
      .select(col("doc_id"), col("lang"), col("n_chars_norm"), col("hgs"))
    // unblocked ground truth: all pairs within the residual predicates
    // (lang, n_chars_norm) — the banding is the only thing under test
    val truth = g.as("a").join(g.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.n_chars_norm") === col("b.n_chars_norm") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", round(graft.functions.TextHashes.jaccard_long(
        col("a.hgs"), col("b.hgs")), 6))
      .filter(col("j") >= Dedup.NgramJaccardThreshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("j").as("ngram_jaccard")).cache()
    // precision: banded ⊆ truth, with identical jaccard values
    assert(banded.exceptAll(truth).count() === 0)
    // recall at the duplicate band: every true pair with j ≥ 0.8 is found
    val missedHigh = truth.filter(col("ngram_jaccard") >= 0.8)
      .exceptAll(banded).count()
    assert(missedHigh === 0)
    // overall recall at the 0.5 threshold stays above the analytic floor
    val nTruth = truth.count()
    val nFound = banded.count()
    assert(nTruth > 0)
    assert(nFound.toDouble / nTruth >= 0.85,
      s"recall ${nFound.toDouble / nTruth} below 0.85 ($nFound/$nTruth)")
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

  test("embedding_dedup_keep: components match the brute-force closure over near-dup pairs") {
    val keep = Similarity.embeddingDedupKeep(spark, sf).cache()
    val pairs = Similarity.embeddingNearDup(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { v =>
      if (!label.contains(v)) {
        val queue = scala.collection.mutable.Queue(v)
        val seen = scala.collection.mutable.Set(v)
        while (queue.nonEmpty) adj(queue.dequeue()).foreach(n =>
          if (seen.add(n)) queue.enqueue(n))
        val m = seen.min
        seen.foreach(label(_) = m)
      }
    }
    val got = keep.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    label.foreach { case (v, m) =>
      assert(got(v)._1 === m, s"vec $v")
      assert(got(v)._2 === (v == m), s"vec $v kept")
    }
    got.foreach { case (v, (m, kept)) =>
      if (!label.contains(v)) { assert(m === v); assert(kept) }
    }
  }

  test("IVF+PQ: codes bounded, cosine bounded, ranks dense, deterministic") {
    val enc = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("codes", graft.functions.VectorOps.pq_encode(
        col("v"), Similarity.PqSubspaces, Similarity.PqCodebookSize,
        Similarity.PqSubDim, Similarity.PqSeed))
      .select(col("vec_id"), explode(col("codes")).as("code"))
    assert(enc.filter(
      col("code") < 0 || col("code") >= Similarity.PqCodebookSize).count() === 0)
    val t = Similarity.embeddingAnnPq(spark, sf).cache()
    assert(t.filter(col("cos_sim") < -1.000001 || col("cos_sim") > 1.000001)
      .count() === 0)
    val ranks = t.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
    assert(ranks.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() === 0)
    assert(t.filter(col("q_id") === col("vec_id")).count() === 0)
    // deterministic: re-running produces the identical result set
    val t2 = Similarity.embeddingAnnPq(spark, sf)
    assert(t.exceptAll(t2).count() === 0)
  }

  test("ann_recall measures every (method, k) cell with sane, floored values") {
    val r = Similarity.annRecall(spark, sf).cache()
    // full grid: one row per method × k, even for methods that miss everything
    assert(r.count() === Similarity.RecallMethods.size * Similarity.RecallKs.size)
    assert(r.filter($"recall" < 0 || $"recall" > 1).count() === 0)
    // n_exact is k × n_queries (exact top-k always fills all k slots here)
    val nq = Similarity.embeddingTopK(spark, sf).select("q_id").distinct().count()
    Similarity.RecallKs.foreach { k =>
      assert(r.filter($"k" === k && $"n_exact" =!= k * nq).count() === 0, s"k=$k")
    }
    // recall floors — measured on the fixed testdata (ivf@10 0.24,
    // lsh@10 0.22, pq@10 0.14 at sf0.001); floors at ~half measured so a
    // genuine recall collapse fails but testdata regeneration noise passes.
    // Values are honestly LOW: the synthetic embeddings are near-random, so
    // true neighbors sit near 70° where 4-plane SRP collision ≈ 0.14 and
    // single-probe IVF cells rarely contain them — exactly what this
    // measurement exists to expose.
    val at10 = r.filter($"k" === 10).collect()
      .map(row => row.getString(0) -> row.getDouble(4)).toMap
    assert(at10("ivf") >= 0.12, s"ivf@10 ${at10("ivf")}")
    assert(at10("lsh") >= 0.10, s"lsh@10 ${at10("lsh")}")
    assert(at10("pq") >= 0.07, s"pq@10 ${at10("pq")}")
  }

  test("multi-probe IVF: candidate superset, recall never below single-probe") {
    // every single-probe result's (q_id, vec_id) also appears in the
    // multi-probe candidate set's top-k UNLESS displaced by a strictly
    // better candidate — so recall@k is monotone. Assert it measured.
    val r = Similarity.annRecall(spark, sf).collect()
      .map(x => (x.getAs[String]("method"), x.getAs[Long]("k")) ->
        x.getAs[Long]("n_hit")).toMap
    Similarity.RecallKs.foreach { k =>
      assert(r(("ivf2", k.toLong)) >= r(("ivf", k.toLong)),
        s"multi-probe recall@$k fell below single-probe")
    }
    // and the probe side really fans out: some query must rank results
    // from a cell that is not its own top-1 cell
    val own = Similarity.embeddingAnnIvf(spark, sf)
      .select("q_id", "vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val multi = Similarity.embeddingAnnIvfMultiprobe(spark, sf)
      .select("q_id", "vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert((multi -- own).nonEmpty,
      "multi-probe found nothing beyond the single-probe cells")
  }

  test("k-means PQ codebooks: pure swap, trained recall not below synthetic") {
    // the explicit synthetic book must be BIT-IDENTICAL to the default
    // generator path — proves the trained-book seam changes nothing but
    // the codeword values
    val syn = Similarity.embeddingAnnPq(spark, sf).cache()
    val synExplicit = Similarity.embeddingAnnPq(
      spark, sf, Some(Similarity.syntheticPqBook))
    assert(syn.exceptAll(synExplicit).count() === 0)
    assert(synExplicit.exceptAll(syn).count() === 0)
    // recall@10 vs the exact ground truth: Lloyd's must not LOWER recall
    // (measured on this data: synthetic 0.14, trained 0.22)
    val exact = Similarity.embeddingTopK(spark, sf)
      .select("q_id", "vec_id").cache()
    val nExact = exact.count()
    def recall10(d: org.apache.spark.sql.DataFrame): Double =
      d.select("q_id", "vec_id").join(exact, Seq("q_id", "vec_id"))
        .count().toDouble / nExact
    val trainedBook = Similarity.trainPqCodebooks(spark, sf)
    val rSyn = recall10(syn)
    val rTrained = recall10(
      Similarity.embeddingAnnPq(spark, sf, Some(trainedBook)))
    info(s"recall@10 synthetic=$rSyn trained=$rTrained")
    // small tolerance: trainPqCodebooks' partial sums are partition-order
    // dependent at the ulp level, so a tie-adjacent codeword flip could
    // legitimately move recall a hair — a strict >= would be flaky, not a
    // regression signal (round-6 ADVICE)
    assert(rTrained >= rSyn - 0.02,
      s"trained codebooks lowered recall: $rTrained < $rSyn - 0.02")
  }

  test("ann_recall_trained: measured pq_t quality bound, one training per session") {
    val rows = Similarity.annRecallTrainedDetail(spark, sf).collect()
    // full grid: {pq, pq_t} x {1, 5, 10}
    assert(rows.length === 6)
    val r10 = rows.map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("recall")).toMap
    // the round-7 verdict bound, now on the SHIPPED query's own output:
    // trained recall@10 within 0.02 of (practically: above) synthetic
    assert(r10(("pq_t", 10L)) >= r10(("pq", 10L)) - 0.02,
      s"trained pq recall ${r10(("pq_t", 10L))} below synthetic ${r10(("pq", 10L))} - 0.02")
    // the query-facing verdict row: claim 'true' at the headline k, 'na'
    // (no claim) at granularity-dominated smaller ks
    val verdicts = Similarity.annRecallTrained(spark, sf).collect()
    assert(verdicts.length === Similarity.RecallKs.length)
    verdicts.foreach { r =>
      val v = r.getAs[String]("trained_within_margin")
      if (r.getAs[Long]("k") == Similarity.RecallKs.max.toLong)
        assert(v === "true", r.toString)
      else assert(v === "na", r.toString)
    }
    // the trained book is cached per (session, input): the second call
    // returns the SAME array instance — no second 6-iteration Lloyd chain
    assert(Similarity.trainedBook(spark, sf) eq Similarity.trainedBook(spark, sf))
  }

  test("HLL sketch stays within its error bound against the exact count") {
    val rows = TextAnalysis.approxUserCountDetail(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") <= TextAnalysis.HllRelErrBound,
        s"event_type ${r.getAs[String]("event_type")}")
    }
    // the query-facing projection's verdict column agrees with Detail
    assert(TextAnalysis.approxUserCount(spark, sf)
      .filter(!col("within_bound")).count() === 0)
  }

  test("GK percentile sketch honors its RANK guarantee against exact") {
    val rows = TextAnalysis.approxValuePercentilesDetail(spark, sf).collect()
    assert(rows.length ===
      5 * TextAnalysis.PercentileQs.length) // 5 event types × 3 quantiles
    // GK's guarantee is rank-based, not value-based: the returned value's
    // rank is within ε of the target, so the verdict column asserts
    // containment in the exact [q-0.02, min(q+0.02, 1)] value envelope
    // (computed in-query since round 9 — the oracle twin recomputes the
    // envelope and pins within_envelope = TRUE).
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_envelope"),
        s"(${r.getAs[String]("event_type")}, q=${r.getAs[Double]("q")}): " +
          s"${r.getAs[Double]("approx_value")} outside " +
          s"[${r.getAs[Double]("env_lo")}, ${r.getAs[Double]("env_hi")}]")
      // the envelope itself must be a genuine interval around the target
      assert(r.getAs[Double]("env_lo") <= r.getAs[Double]("exact_value") &&
        r.getAs[Double]("exact_value") <= r.getAs[Double]("env_hi"))
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

  test("ImageIoDecoder decodes real PNG and JPEG bytes distributed") {
    // real image payloads, generated with the same stdlib the decoder
    // uses — dimensions derived from the id so every row checks a
    // different header
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val media = spark.createDataset((1L to 40L).map { id =>
      val fmt = if (id % 2 == 0) "png" else "jpg"
      MediaRecord(id, fmt, imageBytes(16 + id.toInt, 9 + 2 * id.toInt, fmt))
    })
    val feats = MultiModal.decodeFeatures(media, MultiModal.ImageIoDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.length === 40)
    feats.foreach { f =>
      assert(f.width === 16 + f.media_id.toInt, s"width of ${f.media_id}")
      assert(f.height === 9 + 2 * f.media_id.toInt, s"height of ${f.media_id}")
      assert(f.n_frames === 1)
      assert(f.bytes > 0)
    }
    // undecodable payloads fail loudly, not with fabricated dimensions
    val junk = spark.createDataset(Seq(
      MediaRecord(99L, "junk", Array[Byte](1, 2, 3, 4))))
    val err = intercept[org.apache.spark.SparkException] {
      MultiModal.decodeFeatures(junk, MultiModal.ImageIoDecoder).collect()
    }
    assert(err.getMessage != null)
  }

  test("ImageIoDecoder reports animated GIF frame counts") {
    // build a real 3-frame animated GIF with the stdlib sequence writer
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    (0 until 3).foreach { i =>
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, i * 1000)
      w.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "gif", out.toByteArray)))
    val f = MultiModal.decodeFeatures(media, MultiModal.ImageIoDecoder)
      .collect().head
    assert((f.width, f.height, f.n_frames) === ((8, 6, 3)))
  }

  test("WavDecoder reads real WAV headers distributed") {
    import javax.sound.sampled._
    def wavBytes(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val af = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * af.getFrameSize)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), af, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "wav", wavBytes(8000f, 1, 1600)),   // 200 ms mono
      MediaRecord(2L, "wav", wavBytes(44100f, 2, 44100)))) // 1 s stereo
    val got = MultiModal.decodeAudioFeatures(media, MultiModal.WavDecoder)
      .collect().sortBy(_.media_id)
    assert(got.map(f => (f.sample_rate, f.channels, f.n_samples,
      f.duration_ms)).toSeq ===
      Seq((8000, 1, 1600L, 200L), (44100, 2, 44100L, 1000L)))
    // undecodable payloads fail loudly, like the image path
    val junk = spark.createDataset(Seq(
      MediaRecord(9L, "mp3ish", Array[Byte](9, 9, 9, 9))))
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeAudioFeatures(junk, MultiModal.WavDecoder).collect()
    }
  }

  test("Mp3Decoder walks real generated MPEG frames (ID3v2 + v1 tags tolerated)") {
    // hand-assembled Layer III frames — the public ISO/IEC 11172-3 header
    // layout, zero-filled payloads (a header walk never reads them)
    def mp3Frame(ver: Int, brIdx: Int, srIdx: Int, pad: Int,
                 mono: Boolean): Array[Byte] = {
      val srTab = Map(3 -> Array(44100, 48000, 32000),
        2 -> Array(22050, 24000, 16000), 0 -> Array(11025, 12000, 8000))
      val br = (if (ver == 3)
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      else
        Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
        )(brIdx) * 1000
      val spf = if (ver == 3) 1152 else 576
      val len = spf / 8 * br / srTab(ver)(srIdx) + pad
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte
      f(1) = (0xe0 | (ver << 3) | (1 << 1)).toByte // layer III = 0b01
      f(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      f(3) = (if (mono) 0xc0 else 0x00).toByte
      f
    }
    def id3v2(size: Int): Array[Byte] = {
      val t = new Array[Byte](10 + size)
      t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4
      t(6) = ((size >> 21) & 0x7f).toByte; t(7) = ((size >> 14) & 0x7f).toByte
      t(8) = ((size >> 7) & 0x7f).toByte; t(9) = (size & 0x7f).toByte
      t
    }
    val id3v1 = { val t = new Array[Byte](128)
      t(0) = 'T'; t(1) = 'A'; t(2) = 'G'; t }
    // 40 MPEG1 stereo frames at 44100 behind an ID3v2 tag, ID3v1 trailer
    val mpeg1 = id3v2(57) ++
      (1 to 40).flatMap(i => mp3Frame(3, 9, 0, i % 2, mono = false)) ++ id3v1
    // 25 MPEG2 mono frames at 16000
    val mpeg2 = (1 to 25).flatMap(_ => mp3Frame(2, 4, 2, 0, mono = true)).toArray
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "mp3", mpeg1), MediaRecord(2L, "mp3", mpeg2)))
    val got = MultiModal.decodeAudioFeatures(media, MultiModal.Mp3Decoder)
      .collect().sortBy(_.media_id)
    assert(got.map(f => (f.sample_rate, f.channels, f.n_samples,
      f.duration_ms)).toSeq === Seq(
      (44100, 2, 40L * 1152, 40L * 1152 * 1000 / 44100),
      (16000, 1, 25L * 576, 25L * 576 * 1000 / 16000)))
    // mid-stream corruption fails loudly, not a silent truncated count
    // (byte 144 is the SECOND frame's sync byte: 576/8*32000/16000 = 144)
    val corrupt = mpeg2.clone(); corrupt(144) = 0x00
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeAudioFeatures(spark.createDataset(Seq(
        MediaRecord(9L, "mp3", corrupt))), MultiModal.Mp3Decoder).collect()
    }
    // a TRUNCATED final frame (partial download) must fail, not pass as
    // a complete stream with a fabricated duration
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeAudioFeatures(spark.createDataset(Seq(
        MediaRecord(8L, "mp3", mpeg2.dropRight(40)))),
        MultiModal.Mp3Decoder).collect()
    }
    // ID3v2.4 footer flag: 10 extra bytes after the tag body, not
    // counted in the syncsafe size — a conformant file must decode
    val withFooter = {
      val t = id3v2(20); t(5) = 0x10.toByte
      t ++ new Array[Byte](10) ++ mp3Frame(3, 9, 0, 0, mono = false)
    }
    val ft = MultiModal.decodeAudioFeatures(spark.createDataset(Seq(
      MediaRecord(7L, "mp3", withFooter))), MultiModal.Mp3Decoder).collect()
    assert(ft.head.n_samples === 1152L)
  }

  test("AdtsAacDecoder walks real generated ADTS frames") {
    def adtsFrame(srIdx: Int, chCfg: Int, blocks: Int,
                  payload: Int): Array[Byte] = {
      val len = 7 + payload
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte
      f(1) = 0xf1.toByte // MPEG-4, layer 0, no CRC
      f(2) = ((1 << 6) | (srIdx << 2) | ((chCfg >> 2) & 1)).toByte // LC profile
      f(3) = (((chCfg & 3) << 6) | ((len >> 11) & 3)).toByte
      f(4) = ((len >> 3) & 0xff).toByte
      f(5) = (((len & 7) << 5) | 0x1f).toByte
      f(6) = (0xfc | (blocks - 1)).toByte
      f
    }
    // 48kHz stereo (srIdx 3, chCfg 2), 30 single-block frames; then a
    // 22050 Hz mono stream with TWO raw data blocks per frame
    val a = (1 to 30).flatMap(i => adtsFrame(3, 2, 1, 50 + i % 3)).toArray
    val b = (1 to 10).flatMap(_ => adtsFrame(7, 1, 2, 90)).toArray
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "aac", a), MediaRecord(2L, "aac", b)))
    val got = MultiModal.decodeAudioFeatures(media, MultiModal.AdtsAacDecoder)
      .collect().sortBy(_.media_id)
    assert(got.map(f => (f.sample_rate, f.channels, f.n_samples)).toSeq ===
      Seq((48000, 2, 30L * 1024), (22050, 1, 10L * 2048)))
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeAudioFeatures(spark.createDataset(Seq(
        MediaRecord(9L, "aac", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))),
        MultiModal.AdtsAacDecoder).collect()
    }
    // truncated final ADTS frame fails loudly, same rule as MP3
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeAudioFeatures(spark.createDataset(Seq(
        MediaRecord(8L, "aac", b.dropRight(20)))),
        MultiModal.AdtsAacDecoder).collect()
    }
  }

  test("Mp4Decoder walks real generated ISO-BMFF boxes to the video track") {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length); b.put(typ.getBytes("US-ASCII")); b.put(body)
      b.array()
    }
    def u32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](84) // version 0 layout
      System.arraycopy(u32(w.toLong << 16), 0, b, 76, 4)
      System.arraycopy(u32(h.toLong << 16), 0, b, 80, 4)
      box("tkhd", b)
    }
    def hdlr(kind: String): Array[Byte] =
      box("hdlr", new Array[Byte](8) ++ kind.getBytes("US-ASCII") ++
        new Array[Byte](13))
    def stts(counts: Seq[(Long, Long)]): Array[Byte] =
      box("stts", u32(0L) ++ u32(counts.length.toLong) ++
        counts.flatMap { case (n, d) => u32(n) ++ u32(d) })
    def trak(kind: String, w: Int, h: Int,
             counts: Seq[(Long, Long)]): Array[Byte] =
      box("trak", tkhd(w, h) ++ box("mdia", hdlr(kind) ++
        box("minf", box("stbl", stts(counts)))))
    // a sound track FIRST, then the video track — the walk must pick
    // the 'vide' handler, not the first trak
    val mp4 = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov",
        trak("soun", 0, 0, Seq((48000L * 10, 1L))) ++
        trak("vide", 1920, 1080, Seq((200L, 512L), (50L, 256L)))) ++
      box("mdat", new Array[Byte](32))
    val media = spark.createDataset(Seq(MediaRecord(1L, "mp4", mp4)))
    val got = MultiModal.decodeFeatures(media, MultiModal.Mp4Decoder)
      .collect()
    assert(got.map(f => (f.width, f.height, f.n_frames)).toSeq ===
      Seq((1920, 1080, 250)))
    // frame sampling rides the same features unchanged
    val frames = MultiModal.sampleFrames(
      MultiModal.decodeFeatures(media, MultiModal.Mp4Decoder), stride = 50)
    assert(frames.count() === 5)
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeFeatures(spark.createDataset(Seq(
        MediaRecord(9L, "mp4", new Array[Byte](64)))),
        MultiModal.Mp4Decoder).collect()
    }
    // a hostile stts declaring more entries than its box holds must
    // fail, not read sample counts from sibling boxes
    val evil = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", box("trak", tkhd(64, 64) ++ box("mdia", hdlr("vide") ++
        box("minf", box("stbl",
          box("stts", u32(0L) ++ u32(1000L) ++ u32(5L) ++ u32(1L)))))))
    intercept[org.apache.spark.SparkException] {
      MultiModal.decodeFeatures(spark.createDataset(Seq(
        MediaRecord(8L, "mp4", evil))), MultiModal.Mp4Decoder).collect()
    }
    // a truncated tkhd (body shorter than the v0 width/height offsets)
    // must fail the malformed contract, not read sibling-box bytes as
    // dimensions — direct decoder call, pinning the message class
    val shortTkhd = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", box("trak", box("tkhd", new Array[Byte](40)) ++
        box("mdia", hdlr("vide") ++ box("minf", box("stbl",
          stts(Seq((5L, 1L))))))))
    val e1 = intercept[IllegalArgumentException] {
      MultiModal.Mp4Decoder(shortTkhd)
    }
    assert(e1.getMessage.contains("tkhd"))
    // a stream ending 8-15 bytes past a size==1 (largesize) header must
    // fail the malformed-box contract, not throw a raw
    // ArrayIndexOutOfBoundsException from reading the 64-bit size
    val truncLarge = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", Array.emptyByteArray) ++
      (u32(1L) ++ "mdat".getBytes("US-ASCII") ++ u32(0L)) // 4 of 8 size bytes
    val e2 = intercept[IllegalArgumentException] {
      MultiModal.Mp4Decoder(truncLarge)
    }
    assert(e2.getMessage.contains("malformed box"))
    // an undersized hdlr box (handler type outside the body) fails too
    val shortHdlr = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", box("trak", tkhd(64, 64) ++
        box("mdia", box("hdlr", new Array[Byte](8)))))
    val e3 = intercept[IllegalArgumentException] {
      MultiModal.Mp4Decoder(shortHdlr)
    }
    assert(e3.getMessage.contains("hdlr"))
  }

  test("dedup_threshold_sweep: monotone falloff, anchored at the pair table") {
    val s = Dedup.dedupThresholdSweep(spark, sf)
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(s.map(_._1).toSeq === Dedup.SweepThresholds)
    // the base threshold row counts exactly the verified pair table
    assert(s.head._2 === Dedup.ngramJaccard(spark, sf).count())
    // raising the threshold can only shrink pairs and affected docs
    s.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"$a -> $b")
    }
  }

  test("embedding_sq: codes in range, reconstruction nearly lossless") {
    val nVecs = graft.sources.Tables.load(spark, sf, "embeddings").count()
    val s = Similarity.embeddingSq(spark, sf).cache()
    assert(s.count() === nVecs)
    assert(s.filter($"code_0" < 0 || $"code_0" >= Similarity.SqLevels ||
      $"code_63" < 0 || $"code_63" >= Similarity.SqLevels).count() === 0)
    // 8-bit uniform quantization of unit-ish vectors: cosine to the
    // original stays ≥ 0.999 (measured 0.9999 on the testdata)
    assert(s.filter($"recon_cos" < 0.999).count() === 0)
    s.unpersist()
  }

  test("kmeans_iterate: objective non-decreasing across Lloyd steps") {
    def meanCos(iters: Int): Double = {
      val rows = Similarity.kmeansIterate(spark, sf, iters)
        .select("cos_to_centroid").collect().map(_.getDouble(0))
      rows.sum / rows.length
    }
    val c1 = meanCos(1)
    val c2 = meanCos(2)
    val c3 = meanCos(3)
    // spherical k-means: each step's reassignment + mean-centroid update
    // cannot lower the mean cosine (2^-20 quantization → tiny tolerance)
    assert(c2 >= c1 - 1e-6, s"$c1 -> $c2")
    assert(c3 >= c2 - 1e-6, s"$c2 -> $c3")
  }

  test("kmeans_refine: total assignment, seed-set cells, consistent move flags") {
    val nVecs = graft.sources.Tables.load(spark, sf, "embeddings").count()
    val r = Similarity.kmeansRefine(spark, sf).cache()
    assert(r.count() === nVecs)
    assert(r.select("vec_id").distinct().count() === nVecs)
    // both assignments live in the deterministic seed-cell id space
    val seedPred = ($"cell1" % Similarity.CentroidMod) === Similarity.CentroidRem
    assert(r.filter(!seedPred).count() === 0)
    assert(r.filter($"moved" =!= ($"cell0" =!= $"cell1")).count() === 0)
    assert(r.filter($"cos_to_centroid" < -1 || $"cos_to_centroid" > 1).count() === 0)
    // a refinement step refines: some vectors move, most don't
    val moved = r.filter($"moved").count()
    assert(moved > 0 && moved < nVecs / 2, s"moved=$moved")
    r.unpersist()
  }

  test("approx_heavy_terms: MG guarantee holds — all heavies caught, bounded error") {
    import graft.operators.TextAnalysis
    val r = TextAnalysis.approxHeavyTermsDetail(spark, sf).collect()
    assert(r.nonEmpty)
    // the corpus must actually exercise the guarantee somewhere
    assert(r.map(_.getAs[Long]("n_true_heavy")).sum > 0)
    r.foreach { row =>
      assert(row.getAs[Boolean]("all_caught"), row.toString)
      assert(row.getAs[Long]("n_sketch_items") <= TextAnalysis.HeavyK)
      val thr = row.getAs[Long]("support_threshold")
      if (!row.isNullAt(row.fieldIndex("max_underestimate")))
        assert(row.getAs[Long]("max_underestimate") <= thr, row.toString)
    }
    // the query-facing projection's verdict columns agree with Detail
    assert(TextAnalysis.approxHeavyTerms(spark, sf)
      .filter(!col("all_caught") || !col("underest_bounded")).count() === 0)
  }

  test("centrality_keep matches a plain-Scala integer PageRank replay") {
    val pairs = Dedup.dedupMinhashPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = deg.keys.map(_ -> Dedup.PrBase).toMap
    (1 to Dedup.PrIters).foreach { _ =>
      val s = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (u, v) => s(v) += rank(u) / deg(u) }
      rank = deg.keys.map(v => v -> (Dedup.PrTeleport +
        Dedup.PrDampNum * s(v) / Dedup.PrDampDen)).toMap
    }
    val got = Dedup.centralityKeep(spark, sf).cache()
    val gotRank = got.select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRank.keySet === rank.keySet)
    rank.foreach { case (v, r) => assert(gotRank(v) === r, s"doc $v") }
    // exactly one canonical per component present in the graph
    val perComp = got.groupBy("component_id")
      .agg(sum(when($"is_canonical", 1).otherwise(0)).as("n_canon"))
    assert(perComp.filter($"n_canon" =!= 1).count() === 0)
    // the distributed join-loop path (forced by a zero edge limit, the
    // dedup_components pattern) must produce bit-identical ranks to the
    // driver path the default limit takes
    spark.conf.set(Dedup.ComponentsLocalEdgeLimitKey, "0")
    try {
      val dist = Dedup.centralityKeep(spark, sf)
      assert(got.exceptAll(dist).count() === 0)
      assert(dist.exceptAll(got).count() === 0)
    } finally spark.conf.unset(Dedup.ComponentsLocalEdgeLimitKey)
    got.unpersist()
  }

  test("normalize_text: NFC composes decomposed plants, preserves ligatures") {
    import graft.operators.TextAnalysis
    // plant classes 0/1 are decomposed (combining marks) — NFC must
    // shorten; class 2 is precomposed É + the ﬁ ligature — canonical
    // composition must NOT touch either (NFC is not NFKC); class 3 is
    // the empty plant (pure-ASCII corpus text, NFC is the identity)
    val byClass = TextAnalysis.normalizeText(spark, sf)
      .withColumn("cls", $"doc_id" % TextAnalysis.NormPlants.size)
      .groupBy("cls")
      .agg(sum(($"n_chars_raw" - $"n_chars_nfc")).as("shrunk"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cls") ->
        (r.getAs[Long]("shrunk"), r.getAs[Long]("n"))).toMap
    assert(byClass(0L)._1 === byClass(0L)._2, s"class 0: $byClass")
    assert(byClass(1L)._1 === byClass(1L)._2, s"class 1: $byClass")
    assert(byClass(2L)._1 === 0L && byClass(3L)._1 === 0L, s"$byClass")
    // the composed accented letters survive the unicode-class fold into
    // the hashed text: two docs differing only in (planted) accents must
    // produce different norm_md5 — the fold is \p{L}-aware, not ASCII
    val kernel = graft.functions.TextHashes.nfc(lit("Cafe\u0301 \uFB01n"))
    val one = spark.range(1).select(kernel.as("s")).head.getString(0)
    assert(one === "Caf\u00E9 \uFB01n")
  }
}
