package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup}
import graft.operators.TextAnalysis.tokens

/** Invariant tests for the corpus-curation block (the oracle pins exact
  * values at sf0.01; these pin semantic contracts and cross-check the
  * imperative kernels against declarative Spark on sf0.001). */
class CurationSpec extends AnyFunSuite {

  lazy val spark = Testing.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("quality_filter: is_kept iff all four rules pass, n_failed consistent") {
    val q = Curation.qualityFilter(spark, sf).cache()
    val bad = q.filter(
      $"is_kept" =!= ($"pass_word_count" && $"pass_word_len" &&
        $"pass_stopword" && $"pass_repetition") ||
        $"n_failed" =!= (lit(4) - $"pass_word_count".cast("int")
          - $"pass_word_len".cast("int") - $"pass_stopword".cast("int")
          - $"pass_repetition".cast("int")))
    assert(bad.count() === 0)
    assert(q.count() > 0)
  }

  test("max_count kernel matches explode → groupBy → max") {
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
    val kernel = d.select($"doc_id",
      graft.functions.TextHashes.max_count($"toks").as("mf"))
    val declarative = d.select($"doc_id", explode($"toks").as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max($"c").as("mf2"))
    assert(kernel.join(declarative, "doc_id")
      .filter($"mf" =!= $"mf2").count() === 0)
  }

  test("decontaminate matches a declarative brute-force gram overlap") {
    val n = Curation.DecontamGramLen
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("is_eval",
        Curation.isEvalId($"doc_id"))
      // declarative twin of WordGramsHashed: sequence is DESCENDING when
      // stop < start, hence the size guard
      .withColumn("grams", when(size($"toks") >= n,
        array_distinct(transform(sequence(lit(1), size($"toks") - (n - 1)),
          i => graft.operators.Dedup.hash32(
            array_join(slice($"toks", i, lit(n)), " ")))))
        .otherwise(array().cast("array<bigint>")))
    val evalGrams = d.filter($"is_eval")
      .select(explode($"grams").as("g")).distinct()
    val expected = d.filter(!$"is_eval")
      .select($"doc_id", explode($"grams").as("g"))
      .join(evalGrams, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("exp_hits"))
    val got = Curation.decontaminate(spark, sf)
    val joined = got.join(expected, Seq("doc_id"), "left").cache()
    assert(joined.filter(
      $"n_eval_grams_hit" =!= coalesce($"exp_hits", lit(0L))).count() === 0)
    assert(got.count() ===
      d.filter(!$"is_eval").count()) // one row per train doc
  }

  test("pii_scrub: scrubbed text has zero residual matches, counts match plant") {
    val scr = Curation.scrubPii(
      Curation.withPlantedPii(graft.sources.Tables.load(spark, sf, "documents")),
      "aug_text").cache()
    val residual = scr.filter(
      size(regexp_extract_all($"scrubbed", lit(Curation.EmailPattern), lit(0))) > 0 ||
        size(regexp_extract_all($"scrubbed", lit(Curation.PhonePattern), lit(0))) > 0 ||
        size(regexp_extract_all($"scrubbed", lit(Curation.IpPattern), lit(0))) > 0)
    assert(residual.count() === 0)
    // each planted bucket yields exactly one PII item of its type
    val byBucket = scr
      .withColumn("b", Curation.docHash($"doc_id") % 4)
      .filter(
        ($"b" === 0 && ($"n_emails" =!= 1 || $"n_phones" =!= 0 || $"n_ips" =!= 0)) ||
          ($"b" === 1 && ($"n_phones" =!= 1 || $"n_emails" =!= 0 || $"n_ips" =!= 0)) ||
          ($"b" === 2 && ($"n_ips" =!= 1 || $"n_emails" =!= 0 || $"n_phones" =!= 0)) ||
          ($"b" === 3 && $"n_pii" =!= 0))
    assert(byBucket.count() === 0)
  }

  test("incremental_dedup: flags agree with the verified pair table") {
    val r = Curation.incrementalDedup(spark, sf).cache()
    val isBatch = (c: org.apache.spark.sql.Column) =>
      Curation.docHash(c) % Curation.IncrBatchMod === 0
    // every batch doc appears exactly once
    assert(r.groupBy("doc_id").count().filter($"count" > 1).count() === 0)
    assert(r.filter(!isBatch($"doc_id")).count() === 0)
    // near flags = batch ids adjacent to a base id in verifiedPairs
    val pairs = Dedup.verifiedPairs(spark, sf)
    val expectedNear = pairs.filter(isBatch($"doc_a") && !isBatch($"doc_b"))
      .select($"doc_a".as("doc_id"))
      .union(pairs.filter(isBatch($"doc_b") && !isBatch($"doc_a"))
        .select($"doc_b".as("doc_id")))
      .distinct()
    val gotNear = r.filter($"is_near_dup").select("doc_id")
    assert(gotNear.exceptAll(expectedNear).count() === 0)
    assert(expectedNear.exceptAll(gotNear).count() === 0)
    // accepted = neither flag
    assert(r.filter($"is_accepted" === ($"is_exact_dup" || $"is_near_dup"))
      .count() === 0)
  }

  test("narrow curation ops plan with zero exchanges; decontaminate broadcasts eval grams") {
    // quality_filter and pii_scrub must stay single-scan narrow
    // projections — an Exchange appearing here is a scale regression
    Seq(Curation.qualityFilter(spark, sf), Curation.piiScrub(spark, sf))
      .foreach { d =>
        val plan = d.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan.take(1200))
      }
    // decontaminate's corpus side probes a broadcast eval gram set — a
    // SortMergeJoin against the gram set would shuffle the corpus
    val dplan = Curation.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(dplan.contains("BroadcastHashJoin"), dplan.take(1200))
    assert(!dplan.contains("SortMergeJoin"), dplan.take(1200))
  }

  test("curate_corpus: drop_reason follows stage precedence, final_kept consistent") {
    val c = Curation.curateCorpus(spark, sf).cache()
    val expectedReason = when($"is_eval", "eval_holdout")
      .when(!$"pass_quality", "quality")
      .when($"is_contaminated", "contaminated")
      .when($"is_duplicate", "duplicate")
      .when(!$"is_sampled", "sampled_out")
      .otherwise("kept")
    assert(c.filter($"drop_reason" =!= expectedReason).count() === 0)
    assert(c.filter($"final_kept" =!= ($"drop_reason" === "kept")).count() === 0)
    // one row per corpus doc
    assert(c.count() ===
      graft.sources.Tables.load(spark, sf, "documents").count())
    // stage flags agree with the standalone operators
    val qf = Curation.qualityFilter(spark, sf)
      .select($"doc_id", $"is_kept".as("exp_q"))
    assert(c.join(qf, "doc_id").filter($"pass_quality" =!= $"exp_q")
      .count() === 0)
    val ss = graft.operators.Sampling.stratifiedSample(spark, sf)
      .select($"doc_id", $"sampled".as("exp_s"))
    assert(c.join(ss, "doc_id").filter($"is_sampled" =!= $"exp_s")
      .count() === 0)
  }

  test("repetition_stats kernel matches the declarative gram chain") {
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
    val kernel = d.select($"doc_id",
      graft.functions.TextHashes.repetition_stats($"toks").as("rs"))
      .select($"doc_id", $"rs.n_bigrams".as("nb"), $"rs.top_bigram".as("tg"),
        $"rs.top_bigram_count".as("tc"), $"rs.n_5grams".as("n5"),
        $"rs.dup_5gram_occ".as("d5"))
    def grams(w: Int) = d.select($"doc_id", explode(
      transform(sequence(lit(0), size($"toks") - w),
        i => concat_ws(" ", slice($"toks", (i + 1).cast("int"), lit(w)))))
      .as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val big = grams(2).withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy($"c".desc, $"g")))
      .groupBy("doc_id")
      .agg(sum("c").as("nb2"),
        max(when($"rn" === 1, $"g")).as("tg2"),
        max(when($"rn" === 1, $"c")).as("tc2"))
    val five = grams(5).groupBy("doc_id")
      .agg(sum("c").as("n52"),
        coalesce(sum(when($"c" > 1, $"c")), lit(0L)).as("d52"))
    val joined = kernel.join(big, "doc_id").join(five, "doc_id")
    assert(joined.filter($"nb" =!= $"nb2" || $"tg" =!= $"tg2" ||
      $"tc" =!= $"tc2" || $"n5" =!= $"n52" || $"d5" =!= $"d52").count() === 0)
    assert(joined.count() > 0)
  }

  test("repetition_stats edge cases: tie-break and short docs") {
    def stats(words: String*) = Seq(words).toDF("toks")
      .select(graft.functions.TextHashes.repetition_stats($"toks").as("rs"))
      .select($"rs.*").collect().head
    // "b a" and "a b" each occur once → tie broken to smallest gram
    val tie = stats("b", "a", "b")
    assert(tie.getAs[String]("top_bigram") === "a b")
    assert(tie.getAs[Long]("top_bigram_count") === 1L)
    assert(tie.getAs[Long]("n_bigrams") === 2L)
    // repeated bigram wins over lexicographic order
    val rep = stats("z", "z", "z", "a", "b")
    assert(rep.getAs[String]("top_bigram") === "z z")
    assert(rep.getAs[Long]("top_bigram_count") === 2L)
    // fewer than 5 tokens → no 5-grams; fewer than 2 → no bigrams
    assert(rep.getAs[Long]("n_5grams") === 1L)
    assert(rep.getAs[Long]("dup_5gram_occ") === 0L)
    val one = stats("solo")
    assert(one.getAs[Long]("n_bigrams") === 0L)
    assert(one.isNullAt(one.fieldIndex("top_bigram")))
    assert(one.getAs[Long]("top_bigram_count") === 0L)
    // duplicated 5-grams counted with multiplicity
    val d5 = stats("a", "b", "c", "d", "e", "a", "b", "c", "d", "e", "a",
      "b", "c", "d", "e")
    assert(d5.getAs[Long]("dup_5gram_occ") > 0L)
  }

  test("property: repetition_stats matches a plain-Scala reference on random docs (seeded)") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(31))(vocab(rnd.nextInt(vocab.size))))
    }
    def expected(toks: Seq[String]) = {
      def grams(w: Int) = toks.sliding(w).filter(_.size == w)
        .map(_.mkString(" ")).toSeq
      val bg = grams(2)
      val top = bg.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (g, c) => (-c, g) }.headOption
      val g5 = grams(5).groupBy(identity).view.mapValues(_.size)
      (bg.size.toLong, top.map(_._1).orNull, top.map(_._2.toLong).getOrElse(0L),
        g5.values.sum.toLong, g5.values.filter(_ > 1).sum.toLong)
    }
    val got = docs.toDF("id", "toks")
      .select($"id", graft.functions.TextHashes.repetition_stats($"toks").as("rs"))
      .select($"id", $"rs.*").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getAs[String]("top_bigram"),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    docs.foreach { case (id, toks) =>
      assert(got(id) === expected(toks), s"doc $id toks=$toks")
    }
  }

  test("line_dedup: chunk accounting consistent, shared spans removed, unique docs intact") {
    // cached for the multi-assertion reads below, UNPERSISTED at the end:
    // a lingering cache entry would make the later plan-assertion test
    // resolve its fresh frame through InMemoryRelation, whose printed
    // plan double-counts the Generates
    val ld = Curation.lineDedup(spark, sf).cache()
    try {
    // accounting: kept + dup = total, kept words ≤ chunk words
    assert(ld.filter($"n_dup_chunks" < 0 || $"n_dup_chunks" > $"n_chunks")
      .count() === 0)
    // a doc with zero dup chunks reconstructs to its full normalized text
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id",
        graft.operators.TextAnalysis.normText($"text").as("ntext"))
    val intact = ld.filter($"n_dup_chunks" === 0).join(d, "doc_id")
    assert(intact.filter(md5($"ntext") =!= $"kept_hash").count() === 0)
    // near-dup docs (minhash pairs) must lose at least one shared chunk
    val pairs = Dedup.dedupMinhashPairs(spark, sf)
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val dupDocs = ld.join(pairs, "doc_id")
    if (dupDocs.count() > 0)
      assert(dupDocs.filter($"n_dup_chunks" > 0).count() > 0)
    } finally ld.unpersist(blocking = true)
  }

  test("plan: quality_repetition is a zero-shuffle single scan") {
    val plan = Curation.qualityRepetition(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetition kernel must not shuffle grams:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size === 1)
  }

  test("span_dedup: islands coverage equals distinct covered positions") {
    val W = Curation.SpanWindowWords
    val sd = Curation.spanDedup(spark, sf).cache()
    try {
      // accounting invariants
      assert(sd.filter($"n_dup_windows" > $"n_windows" ||
        $"n_spans" > $"n_dup_windows" ||
        $"n_dup_tokens" > $"n_tokens" ||
        ($"n_spans" > 0 && $"n_dup_tokens" < $"n_spans" * W)).count() === 0)
      // docs shorter than W can never be flagged
      assert(sd.filter($"n_tokens" < W &&
        ($"n_windows" =!= 0 || $"n_dup_tokens" =!= 0 || !$"pass_span"))
        .count() === 0)
      // independent check of the gaps-and-islands arithmetic: the merged
      // span token count must equal the count of DISTINCT token positions
      // covered by any duplicated window
      val toks = graft.sources.Tables.load(spark, sf, "documents")
        .select($"doc_id", tokens($"text").as("toks"))
      val wins = Curation.spanWindows(toks)
      val dupH = wins.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
        .filter($"nd" >= Curation.SpanDupMinDocs).select("h")
      val cov = wins.join(dupH, Seq("h"), "left_semi")
        .select($"doc_id", explode(sequence($"pos", $"pos" + (W - 1))).as("t"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("cov"))
      assert(sd.join(cov, Seq("doc_id"), "left")
        .filter($"n_dup_tokens" =!= coalesce($"cov", lit(0L))).count() === 0)
      // near-dup docs share ≥ W-token runs somewhere in the corpus
      val pairs = Dedup.dedupMinhashPairs(spark, sf)
        .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
      val dupDocs = sd.join(pairs, "doc_id")
      if (dupDocs.count() > 0)
        assert(dupDocs.filter($"n_dup_windows" > 0).count() > 0)
    } finally sd.unpersist(blocking = true)
  }

  test("span_scrub: reconstruction consistent with span_dedup accounting") {
    val sd = Curation.spanDedup(spark, sf)
      .select($"doc_id", $"n_tokens", $"n_dup_tokens")
    val sc = Curation.spanScrub(spark, sf).cache()
    try {
      // kept + dup = total, and both ops agree on the dup token count
      assert(sc.filter($"n_kept_tokens" + $"n_dup_tokens" =!= $"n_tokens")
        .count() === 0)
      assert(sc.select($"doc_id", $"n_dup_tokens".as("scrub_dup"))
        .join(sd, "doc_id")
        .filter($"scrub_dup" =!= $"n_dup_tokens").count() === 0)
      // a doc with no duplicated spans reconstructs to its full
      // normalized text, hash-verified
      val d = graft.sources.Tables.load(spark, sf, "documents")
        .select($"doc_id",
          graft.operators.TextAnalysis.normText($"text").as("ntext"))
      val intact = sc.filter($"n_dup_tokens" === 0).join(d, "doc_id")
      assert(intact.count() > 0)
      assert(intact.filter(md5($"ntext") =!= $"kept_hash").count() === 0)
    } finally sc.unpersist(blocking = true)
  }

  test("winnowing guarantee: shared run >= W+K-1 matches at ANY alignment") {
    val W = Curation.SpanWindowWords
    val K = Curation.WinnowK
    // the exact shared run the guarantee covers, embedded at K different
    // offsets — the alignments a naive stride-K sampler on both sides
    // would miss entirely (offsets disagree mod K)
    val run = (1 to (W + K - 1)).map(i => s"shared$i").mkString(" ")
    val rows = (0 until K).map { o =>
      (100L + o, ((1 to (3 + o)).map(i => s"pad${o}x$i") :+ run).mkString(" "))
    }
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      .select($"doc_id", tokens($"text").as("toks"))
    val fp = Curation.winnowFingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
    for (a <- rows.map(_._1); b <- rows.map(_._1) if a < b)
      assert(fp(a).intersect(fp(b)).nonEmpty,
        s"docs $a and $b share a ${W + K - 1}-token run but no fingerprint")
    // density sanity: the selection is a strict subset of the windows
    val full = Curation.spanWindows(df).groupBy("doc_id")
      .agg(countDistinct("h").as("nh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.map(_._1).foreach { id => assert(fp(id).size <= full(id)) }
  }

  test("winnow kernel matches the declarative form: real docs + boundary shapes") {
    val W = Curation.SpanWindowWords
    val K = Curation.WinnowK
    // boundary shapes: empty, < W tokens, exactly W (one window, < K),
    // W+K-2 (nw = K-1, the keep-everything rule's last case), W+K-1
    // (nw = K, first deque selection), repeated identical tokens (digest
    // ties inside the winnowing window), and a long mixed doc
    val edge = Seq(
      900L -> "",
      901L -> (1 until W).map(i => s"t$i").mkString(" "),
      902L -> (1 to W).map(i => s"t$i").mkString(" "),
      903L -> (1 to (W + K - 2)).map(i => s"t$i").mkString(" "),
      904L -> (1 to (W + K - 1)).map(i => s"t$i").mkString(" "),
      905L -> Seq.fill(W + 3 * K)("same").mkString(" "),
      906L -> (1 to 120).map(i => s"w${i % 17}").mkString(" "))
    val edgeDf = edge.toDF("doc_id", "text")
      .select($"doc_id", tokens($"text").as("toks"))
    val real = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
    for (df <- Seq(edgeDf, real)) {
      val a = Curation.winnowFingerprints(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
      val b = Curation.winnowFingerprintsDeclarative(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
      assert(a.keySet === b.keySet)
      // exact value AND order identity — the kernel's first-occurrence
      // distinct must reproduce array_distinct over the selection order
      a.keys.foreach { id => assert(a(id) === b(id), s"doc $id") }
    }
    // null ELEMENTS (reachable via the SQL-registered winnow_fps, never
    // via tokens()): the kernel must skip them exactly as the
    // declarative concat_ws does — same value, no NPE
    val withNull = Seq((1L,
      Seq("a", "b", null, "c", "d", "e", "f", "g", "h", "i", "j")))
      .toDF("doc_id", "toks")
    val na = Curation.winnowFingerprints(withNull).collect()
      .map(_.getSeq[String](2)).head
    val nb = Curation.winnowFingerprintsDeclarative(withNull).collect()
      .map(_.getSeq[String](2)).head
    assert(na === nb && na.nonEmpty)
  }

  test("property: span islands match a plain-Scala reference on random docs " +
      "with planted shared runs (seeded)") {
    val W = Curation.SpanWindowWords
    val rnd = new scala.util.Random(77177)
    // planted shared runs at random alignments and W±1 boundary lengths:
    // runs of W-1 (below detection), W, W+1, and longer — some shared by
    // 2 docs, some by many
    val sharedRuns = (0 until 8).map { r =>
      val len = Seq(W - 1, W, W + 1, W + rnd.nextInt(10))(r % 4)
      (0 until len).map(i => s"run${r}tok$i")
    }
    val docs = (0 until 120).map { i =>
      var toks = Vector.fill(rnd.nextInt(40))(s"u${i}w${rnd.nextInt(50)}")
      val nPlant = rnd.nextInt(3)
      (0 until nPlant).foreach { _ =>
        val run = sharedRuns(rnd.nextInt(sharedRuns.size))
        val at = if (toks.isEmpty) 0 else rnd.nextInt(toks.size + 1)
        toks = toks.take(at) ++ run ++ toks.drop(at)
      }
      (i.toLong, toks)
    }
    // plain-Scala oracle: windows → cross-doc duplicated keys → per-doc
    // maximal islands (merge while pos ≤ prevPos + W) → coverage + scrub
    val winKeys = docs.map { case (id, toks) =>
      id -> toks.sliding(W).filter(_.size == W).map(_.mkString(" ")).toVector
    }.toMap
    val keyDocs = winKeys.toSeq.flatMap { case (id, ks) => ks.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = docs.map { case (id, toks) =>
      val dupPos = winKeys(id).zipWithIndex.collect {
        case (k, i) if keyDocs(k) >= 2 => i + 1 // 1-based
      }
      var islands = Vector.empty[(Long, Long, Long)] // (s, e, nwin)
      dupPos.foreach { p =>
        islands.lastOption match {
          case Some((s, e, n)) if p <= e + W => // overlaps-or-adjacent
            islands = islands.init :+ ((s, p.toLong, n + 1))
          case _ => islands = islands :+ ((p.toLong, p.toLong, 1L))
        }
      }
      val covered = islands.flatMap { case (s, e, _) => s.toInt to (e.toInt + W - 1) }.toSet
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !covered(i + 1) => t
      }
      id -> ((islands.toSet, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .select($"doc_id", tokens($"text").as("toks"))
    val got = Curation.dupSpans(df).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, _) =>
      assert(got.getOrElse(id, Set.empty) === expected(id)._1,
        s"doc $id islands")
    }
    // scrub cross-check on the same corpus: coverage count + exact rebuild
    // (the md5-verified end-to-end path, here verified against the
    // reference REBUILD STRING, catching off-by-ones at both ends)
    val spansPerDoc = Curation.dupSpans(df).groupBy("doc_id")
      .agg(array_sort(collect_list(struct($"s", $"e"))).as("sp"),
        sum($"e" - $"s" + W).as("n_dup_tokens"))
    spansPerDoc.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === expected(id)._2, s"doc $id coverage")
    }
    val scrub = Curation.spanScrubToks(df).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("kept_text")).toMap
    docs.foreach { case (id, _) =>
      assert(scrub(id) === expected(id)._3, s"doc $id rebuild")
    }
  }

  test("span_dedup_winnow: flagged docs are a subset of span_dedup's") {
    val w = Curation.spanDedupWinnow(spark, sf).cache()
    try {
      assert(w.filter($"n_dup_fp" > $"n_fp" || $"n_fp" > $"n_windows" &&
        $"n_windows" >= Curation.WinnowK).count() === 0)
      // winnowing can only surface runs full span_dedup also sees: every
      // doc with a duplicated fingerprint has a duplicated window
      val sd = Curation.spanDedup(spark, sf)
        .select($"doc_id", $"n_dup_windows")
      assert(w.filter($"n_dup_fp" > 0).join(sd, "doc_id")
        .filter($"n_dup_windows" === 0).count() === 0)
    } finally w.unpersist(blocking = true)
  }

  test("plan: span_dedup windows are per-doc partitioned, joins equi") {
    val plan = Curation.spanDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("No Partition Defined"),
      s"islands window must partition by doc_id:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup must stay equi-join:\n$plan")
  }

  test("plan: line_dedup evaluates the chunk explode at most twice") {
    // the streaming gates' persist-once boiler sliver shares this
    // query's logical subplan, so CacheManager substitutes the cached
    // frame when a StreamingSpec test ran first in the session — and the
    // printed InMemoryRelation section double-counts the Generates.
    // Evict session caches so the count reads the FRESH plan (the gates
    // rebuild on next use; that is the persist-once contract).
    graft.streaming.PipelineStreams.clearCaches(spark)
    val plan = Curation.lineDedup(spark, sf)
      .queryExecution.executedPlan.toString
    // one explode feeds the boilerplate count, one the kept rebuild; the
    // total-chunk branch is arithmetic on the token array (no Generate)
    assert("Generate".r.findAllIn(plan).size <= 2,
      s"chunk explode evaluated more than twice:\n$plan")
  }

  test("bm25_search: ranked output, selective term dominates") {
    val r = graft.operators.Search.bm25Search(spark, sf).cache()
    val rows = r.collect()
    assert(rows.length > 0 && rows.length <= graft.operators.Search.BmTopK)
    // srank is 1..n in score-desc order
    assert(rows.map(_.getAs[Long]("srank")).toSeq ===
      (1L to rows.length).toSeq)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)
    assert(scores.forall(_ > 0.0))
    // docs containing the selective term 'dup' outrank those without it
    // whenever any are present (idf dominance)
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(array_contains($"toks", "dup"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    if (d.nonEmpty && rows.exists(r => d(r.getAs[Long]("doc_id")))) {
      val top = rows.head.getAs[Long]("doc_id")
      assert(d(top))
    }
  }

  test("hybrid_search: RRF fusion recomputes from the two legs") {
    import graft.operators.Search
    val sparse = Search.bm25Search(spark, sf)
      .select($"doc_id", $"srank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dense = graft.operators.Similarity.embeddingTopK(spark, sf)
      .filter($"q_id" === Search.HybridDenseQuery)
      .select($"vec_id", $"rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def rrf(d: Long): Double =
      sparse.get(d).map(r => 1.0 / (Search.RrfK + r)).getOrElse(0.0) +
        dense.get(d).map(r => 1.0 / (Search.RrfK + r)).getOrElse(0.0)
    val expected = (sparse.keySet ++ dense.keySet).toSeq
      .map(d => (d, BigDecimal(rrf(d)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (d, s) => (-s, d) }
      .take(Search.BmTopK)
    val got = Search.hybridSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf_score")))
      .toSeq
    assert(got === expected)
    // a doc in BOTH legs must outrank a doc holding the same rank in
    // only one leg — the fusion property that makes hybrid hybrid
    val both = sparse.keySet intersect dense.keySet
    if (both.nonEmpty) {
      val d = both.minBy(rrf)
      val singles = (sparse.keySet union dense.keySet) -- both
      singles.filter(s => sparse.getOrElse(s, Long.MaxValue)
          .min(dense.getOrElse(s, Long.MaxValue)) >=
          sparse.getOrElse(d, Long.MaxValue).min(dense.getOrElse(d, Long.MaxValue)))
        .foreach(s => assert(rrf(d) > rrf(s)))
    }
  }

  test("bm25/docSimilarity top-k: single ordering stage (no Sort under the rank Window)") {
    // round-7 advice #6: the srank Window must ride TakeOrderedAndProject's
    // outputOrdering — a SortExec in either plan means the double-sort is back
    for (q <- Seq("bm25_search", "doc_similarity")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q lost its TakeOrderedAndProject:\n$plan")
      assert(!plan.contains("+- Sort "),
        s"$q re-sorts after the top-k:\n$plan")
    }
  }

  test("bloomSemiFlag: exact membership semantics on synthetic keys") {
    val batch = Seq("a", "b", "c").toDF("k")
    val base = Seq("b", "c", "c", "d").toDF("k")
    val out = Curation.bloomSemiFlag(batch, base, "k", "hit")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out === Map("a" -> false, "b" -> true, "c" -> true))
    // batch row count is preserved (left join, no dup explosion from the
    // base side's repeated keys)
    assert(Curation.bloomSemiFlag(batch, base, "k", "hit").count() === 3)
  }

  test("quality_signals: family flags tie out to their source queries") {
    val s = Curation.qualitySignals(spark, sf).cache()
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(s.count() === nDocs)
    assert(s.filter($"is_high_quality" =!= ($"n_failed_families" === 0))
      .count() === 0)
    // each flag equals its source query's verdict for every doc
    val g = Curation.qualityFilter(spark, sf)
      .select($"doc_id", ($"n_failed" === 0).as("expect"))
    assert(s.join(g, Seq("doc_id"))
      .filter($"pass_gopher" =!= $"expect").count() === 0)
    // the composed verdict is stricter than any single family
    assert(s.filter($"is_high_quality").count() <=
      s.filter($"pass_gopher").count())
    assert(s.filter($"is_high_quality").count() > 0)
    s.unpersist()
  }

  test("curation_report: reasons partition the corpus, shares sum to 1") {
    val r = Curation.curationReport(spark, sf).cache()
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(r.agg(sum("n_docs")).head().getLong(0) === nDocs)
    val shareSum = r.agg(sum("share")).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    assert(r.filter($"drop_reason" === "kept").count() === 1)
    r.unpersist()
  }

  test("bloomLiteral: zero false negatives, measured FPR within 3x design fpp") {
    val members = spark.range(0, 5000)
      .select(concat(lit("k"), col("id")).as("k"))
    val mc = Curation.bloomLiteral(members, "k").get
    // a bloom NEVER false-negatives — every member must pass
    assert(members.filter(mc).count() === 5000)
    // measured FPR on 20k disjoint keys: expected 1% ± binomial noise;
    // 3x the design fpp is ~40σ of headroom, so this only fails on a
    // genuinely mis-sized filter (wrong n or fpp plumbing)
    val non = spark.range(100000, 120000)
      .select(concat(lit("k"), col("id")).as("k"))
    val fpr = non.filter(mc).count().toDouble / 20000
    assert(fpr <= 3 * Curation.BloomFpp,
      s"measured FPR $fpr vs design ${Curation.BloomFpp}")
  }

  test("bloomSemiFlag edge cases: empty batch, empty base") {
    val someKeys = Seq("a", "b").toDF("k")
    val noKeys = Seq.empty[String].toDF("k")
    assert(Curation.bloomSemiFlag(noKeys, someKeys, "k", "hit").count() === 0)
    val vsEmptyBase = Curation.bloomSemiFlag(someKeys, noKeys, "k", "hit")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(vsEmptyBase === Map("a" -> false, "b" -> false))
  }

  test("bloom_dedup: equals the plain semi-join, bloom sits in the base scan") {
    val withSplit = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", Curation.wordSetHash($"text").as("th"))
      .withColumn("in_batch",
        Curation.docHash($"doc_id") % Curation.IncrBatchMod === 0)
    val plain = withSplit.filter($"in_batch").as("s")
      .join(withSplit.filter(!$"in_batch").select("th").distinct().as("b"),
        Seq("th"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Curation.bloomDedup(spark, sf).cache()
    assert(out.filter($"is_exact_dup").collect()
      .map(_.getLong(0)).toSet === plain)
    assert(plain.nonEmpty, "testdata should have cross-split word-set dups")
    // the bloom prefilter must be in the executed plan (base-side scan)
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), planStr.take(1500))
    out.unpersist()
  }

  test("semantic_decontaminate: matches a plain-Scala exact recomputation") {
    import graft.operators.Curation
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"),
        Curation.isEvalId($"vec_id").as("is_eval"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getBoolean(2)))
    val evalVs = emb.filter(_._3).map(_._2)
    val train = emb.filterNot(_._3)
    assert(evalVs.nonEmpty && train.nonEmpty)
    // left-to-right double folds, the same arithmetic as the kernels
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def n2(a: Array[Double]): Double = dot(a, a)
    val expected = train.map { case (id, v, _) =>
      val cs = evalVs.map(q => dot(v, q) / (math.sqrt(n2(v)) * math.sqrt(n2(q))))
      val hits = cs.count(_ >= Curation.SemDecontamCosine).toLong
      id -> ((hits, BigDecimal(cs.max)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Curation.semanticDecontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_eval_sem_hits"), r.getAs[Double]("max_eval_cos"),
          r.getAs[Boolean]("is_clean"))))
    assert(got.length === train.length)
    got.foreach { case (id, (hits, maxCos, clean)) =>
      val (eHits, eMax) = expected(id)
      assert(hits === eHits, s"doc $id hits")
      assert(math.abs(maxCos - eMax) < 1e-9, s"doc $id maxCos $maxCos vs $eMax")
      assert(clean === (hits === 0L))
    }
  }

  test("doc_similarity: ranked pairs match recomputation from the postings") {
    import graft.operators.Search
    val r = Search.docSimilarity(spark, sf).collect()
    assert(r.nonEmpty && r.length <= Search.SimTopK)
    assert(r.map(_.getAs[Long]("srank")).toSeq === (1L to r.length).toSeq)
    // independent recomputation: postings from the artifact, df band,
    // all-pairs integer dot, same (weight desc, a, b) order
    val tc = graft.operators.TextAnalysis.termCounts(spark, sf)
      .collect().map(x => (x.getAs[String]("term"),
        x.getAs[Long]("doc_id"), x.getAs[Long]("term_count")))
    val byTerm = tc.groupBy(_._1).filter { case (_, ps) =>
      ps.length >= Search.SimDfMin && ps.length <= Search.SimDfMax }
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((_, ps) <- byTerm; a <- ps; b <- ps if a._2 < b._2) {
      val k = (a._2, b._2)
      val (n, w) = acc.getOrElse(k, (0L, 0L))
      acc(k) = (n + 1, w + a._3 * b._3)
    }
    val expTop = acc.toSeq
      .sortBy { case ((a, b), (_, w)) => (-w, a, b) }.take(Search.SimTopK)
      .map { case ((a, b), (n, w)) => (a, b, n, w) }
    val gotTop = r.map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"),
      x.getAs[Long]("n_shared_terms"), x.getAs[Long]("dot_weight"))).toSeq
    assert(gotTop === expTop)
  }

  test("bpe_count kernel matches regexp_count: real docs + boundary shapes") {
    // the classes of '[a-z]+|[0-9]+|[^a-z0-9 ]' are disjoint, so the
    // kernel's run-length state machine must equal the regex count on
    // EVERY string: empties, pure runs, class alternations, multi-byte
    // code points (each non-ASCII code point is one 'other' match), and
    // the real corpus after the shared normalization
    val edge = Seq(
      950L -> "",
      951L -> "abc",
      952L -> "abc123def",
      953L -> "a1b2c3!",
      954L -> "  spaced   out  ",
      955L -> "!!!...,,,",
      956L -> "caf\u00e9 na\u00efve \u4e2d\u6587 \ud83d\ude00x9",
      957L -> (("a" * 5000) + "!" + ("9" * 5000)))
    import graft.operators.TextAnalysis.normText
    val edgeDf = edge.toDF("doc_id", "text")
    val real = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    for (df <- Seq(edgeDf, real)) {
      val rows = df.select($"doc_id",
          graft.functions.TextHashes.bpe_count(normText($"text")).as("k"),
          regexp_count(normText($"text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("r"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"doc ${r.getLong(0)}"))
    }
  }

  test("scrubPii counts follow the redaction basis: a phone nested in an " +
      "email is not double-counted (r17 operators review #6)") {
    val d = Seq(
      (1L, "call 555-123-4567@mail.com now"), // phone inside the email
      (2L, "mail a@b.co or dial 555-123-4567"),
      (3L, "host 10.1.2.3 up")
    ).toDF("doc_id", "text")
    val got = Curation.scrubPii(d, "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "n_pii", "scrubbed")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    // the email swallows the digits; the phone pass sees none left
    assert(got(1L) === ((1L, 0L, 0L, 1L, "call <EMAIL> now")))
    assert(got(2L) === ((1L, 1L, 0L, 2L, "mail <EMAIL> or dial <PHONE>")))
    assert(got(3L) === ((0L, 0L, 1L, 1L, "host <IP> up")))
  }

  test("semanticDecontaminate with an EMPTY eval holdout reports every " +
      "train doc all-clean like its n-gram twin (r17 operators review #2)") {
    // vec_ids >= DecontamEvalIdBound are never eval -> empty holdout
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-ev").toString
    Seq((5000L, Array(1.0f, 0.0f)), (5001L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Curation.semanticDecontaminate(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_eval_sem_hits"), r.getAs[Boolean]("is_clean"))))
      .toMap
    assert(got === Map(5000L -> ((0L, true)), 5001L -> ((0L, true))),
      "every train doc must get its all-clean row, not vanish")
  }
}
