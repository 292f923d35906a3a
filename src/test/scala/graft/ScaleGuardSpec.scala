package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Similarity}

/** Pins the round-8 scale guards: the fixed-size membership predicates
  * that keep eval/query/centroid sets benchmark-sized as the corpus
  * grows, the adaptive SRP band sizing, and interpreted-vs-codegen
  * equivalence for the vector kernels that gained `doGenCode`.
  */
class ScaleGuardSpec extends AnyFunSuite {
  private lazy val spark = Testing.spark
  import spark.implicits._

  /** Run `body` with codegen fully disabled (NO_CODEGEN factory mode +
    * whole-stage off), so expressions evaluate via nullSafeEval — with
    * whole-stage off alone, projections still use generated
    * MutableProjections and doGenCode would be exercised on both sides. */
  private def interpretedOnly[A](body: => A): A = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  // ---- adaptive planes-per-band ----

  test("nearDupPlanesPerBand: floor at the oracle SF, log2 growth above") {
    // ≤512 vectors → the NumPlanes floor, so the static DuckDB twin
    // (generated with NumPlanes) stays exact at sf0.01 (500 vectors)
    assert(Similarity.nearDupPlanesPerBand(1) === Similarity.NumPlanes)
    assert(Similarity.nearDupPlanesPerBand(500) === Similarity.NumPlanes)
    assert(Similarity.nearDupPlanesPerBand(512) === Similarity.NumPlanes)
    // ceil(log2(n/32)) above the floor
    assert(Similarity.nearDupPlanesPerBand(2000) === 6)
    assert(Similarity.nearDupPlanesPerBand(20000) === 10)
    // expected bucket occupancy n/2^planes never exceeds the target
    for (n <- Seq(513L, 1000L, 5000L, 20000L, 1000000L)) {
      val p = Similarity.nearDupPlanesPerBand(n)
      assert(n.toDouble / (1L << p) <= Similarity.NearDupTargetBucket.toDouble)
    }
  }

  // ---- fixed-size membership predicates ----

  test("isQueryVec/isCentroidVec: unchanged at oracle SFs, capped beyond") {
    val ids = spark.range(0, 100000).toDF("vec_id")
    val nQ = ids.filter(Similarity.isQueryVec(col("vec_id"))).count()
    val nC = ids.filter(Similarity.isCentroidVec(col("vec_id"))).count()
    // caps bind: fixed counts no matter how far the id range grows
    assert(nQ === Similarity.QueryCap)
    assert(nC === Similarity.CentroidCap)
    // below the bound the rule is the original mod rule (oracle SFs
    // sf0.01/sf0.1 have vec_id < 2000, so results there are unchanged)
    val below = ids.filter(col("vec_id") < Similarity.QueryMod.toLong * Similarity.QueryCap)
    assert(below.filter(Similarity.isQueryVec(col("vec_id"))).count() ===
      below.filter(col("vec_id") % Similarity.QueryMod === 0).count())
    // query and centroid sets stay disjoint (different remainders)
    assert(ids.filter(Similarity.isQueryVec(col("vec_id")) &&
      Similarity.isCentroidVec(col("vec_id"))).count() === 0)
  }

  test("isEvalId: fixed id pool, so the holdout stops growing with the corpus") {
    val small = spark.range(0, Curation.DecontamEvalIdBound).toDF("doc_id")
    val large = spark.range(0, 50 * Curation.DecontamEvalIdBound).toDF("doc_id")
    val nSmall = small.filter(Curation.isEvalId(col("doc_id"))).count()
    val nLarge = large.filter(Curation.isEvalId(col("doc_id"))).count()
    assert(nSmall > 0)
    assert(nLarge === nSmall) // 50x the ids, same holdout
  }

  test("banded near-dup plans as equi-joins — no nested-loop, no cartesian") {
    val sf = "/root/testdata/sf0.001"
    for (d <- Seq(Similarity.embeddingNearDup(spark, sf),
        graft.streaming.PipelineStreams.embeddingNearDupStream(
          spark,
          graft.sources.Tables.load(spark, sf, "embeddings")
            .select(col("vec_id"), col("embedding")), sf))) {
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    }
  }

  // ---- interpreted vs codegen equivalence for the vector kernels ----

  test("PQ kernels: codegen equals interpreted, synthetic and trained books") {
    import graft.functions.VectorOps
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(48)(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("id", "v")
    val trained = Some(Array.fill(8 * 16 * 8)(rnd.nextGaussian() * 0.3))
    def probe(book: Option[Array[Double]]) = {
      val codes = VectorOps.pq_encode(col("v"), 8, 16, 8, 11L, book)
      df.select(
        codes.as("codes"),
        VectorOps.pq_adc_dot(col("v"), codes, 8, 16, 8, 11L, book).as("adc"),
        VectorOps.pq_recon_n2(codes, 8, 16, 8, 11L, book).as("rn2"))
    }
    for (book <- Seq(None, trained)) {
      val out = probe(book)
      val a = out.collect()
      val b = interpretedOnly(out.collect())
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
      assert(a.forall(_.getDouble(2) > 0d)) // reconstructed norm nonzero
    }
  }

  test("DotSeq/Norm2Seq/SrpBucket: codegen equals interpreted, float and double") {
    import graft.functions.VectorOps
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(64)(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()),
        Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("id", "vd", "vf")
    def band(c: org.apache.spark.sql.Column, off: Int) =
      VectorOps.srp_bucket(c, 10, 64, off)
    val out = df.select(
      VectorOps.dot_seq(col("vd"), col("vd")).as("dd"),
      VectorOps.norm2_seq(col("vd")).as("nd"),
      VectorOps.norm2_seq(col("vf")).as("nf"),
      band(col("vd"), 0).as("b0"),
      band(col("vd"), 10).as("b1"),
      band(col("vf"), 0).as("bf"))
    // force both evaluation paths: codegen (default) vs fully
    // interpreted eval of the same expressions
    val a = out.collect()
    val b = interpretedOnly(out.collect())
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // dot(v,v) ≡ norm2(v) bit-for-bit (same fold order)
    a.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // bands are genuinely different hash families
    assert(a.exists(r => r.getLong(3) !== r.getLong(4)))
  }

  test("PlanGuard.positionRank: ranks the TakeOrderedAndProject order, " +
      "fails loudly when the plan re-lowers") {
    import graft.operators.PlanGuard
    val df = spark.range(100).toDF("id")
    val ranked = PlanGuard.positionRank(
      df.orderBy(col("id").desc).limit(5)).collect()
    assert(ranked.map(_.getAs[Long]("srank")).toSeq === (1L to 5L))
    // srank agrees with the row_number-over-full-sort formulation
    assert(ranked.map(_.getAs[Long]("id")).toSeq === (99L to 95L by -1))
    // an unlimited sort does NOT lower to TakeOrderedAndProject — the
    // guard must refuse rather than emit partition-encoded ids
    intercept[IllegalArgumentException] {
      PlanGuard.positionRank(df.orderBy(col("id").desc))
    }
  }

  test("boundedCollect: under-cap returns all rows, over-cap refuses fast") {
    import graft.operators.PlanGuard
    val df = spark.range(10).toDF("id")
    assert(PlanGuard.boundedCollect(df, "t", cap = 20).length === 10)
    // the refusal pulls at most cap+1 rows — a maintenance frame that
    // degenerated to record granularity fails with the pointer message,
    // it does not OOM the driver first
    val e = intercept[IllegalArgumentException] {
      PlanGuard.boundedCollect(df, "t", cap = 5)
    }
    assert(e.getMessage.contains("metadata collect exceeded"))
  }

  test("MinHashSigs: empty input → null on BOTH paths, non-nullable child") {
    import graft.functions.TextHashes
    // array() over literals is a NON-nullable child — the corner where an
    // un-overridden `nullable` made the generated path throw
    // IllegalStateException while the interpreted path returned null
    // (round-8 advice). Both paths must agree: null for the empty gram
    // set, a real signature otherwise.
    val as = Seq(97L, 228L); val bs = Seq(13L, 924L)
    val out = spark.range(3).select(
      TextHashes.minhash_sigs(array().cast("array<long>"),
        as, bs, graft.operators.Dedup.MinHashPrime).as("s_empty"),
      TextHashes.minhash_sigs(array(col("id"), col("id") + 7L),
        as, bs, graft.operators.Dedup.MinHashPrime).as("s_full"))
    val a = out.collect()
    val b = interpretedOnly(out.collect())
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.isNullAt(0), "empty gram set must have no signature")
      assert(!r.isNullAt(1) && r.getSeq[Long](1).length === as.length)
    }
  }
}
