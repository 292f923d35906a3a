package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text relevance search over the corpus — the consumer workload the
  * persist-once inverted-index artifact ([[TextAnalysis.termCounts]])
  * exists for: probe the (doc_id, term, term_count) postings on the query
  * terms, score the matched documents with BM25 (Robertson/Spärck Jones;
  * the Lucene `ln(1 + (N - df + 0.5)/(df + 0.5))` idf form that stays
  * positive for every df), return the top-k.
  *
  * Cross-engine float parity: every arithmetic step is written with the
  * SAME operand order and associativity as the DuckDB twin — IEEE
  * +,*,/ are correctly rounded, so both engines produce bit-identical
  * doubles there; `ln` is evaluated on only one argument per query term
  * (a function of the corpus-constant (N, df)), and the per-term partial
  * scores are summed in fixed query-term order before the shared
  * `round(·, 6)`.
  *
  * Scale shape: the candidate set is the union of the query terms'
  * posting lists (a sliver of the corpus for selective queries), pivoted
  * per document by a partial-aggregable groupBy; doc lengths come from
  * the same artifact; (N, total_len) and the per-term document
  * frequencies are 1-row broadcast crossJoins (the [[Sampling]] totals
  * pattern). The final top-k is a TakeOrderedAndProject over candidates
  * only — the full corpus is never scored, sorted, or shuffled.
  */
object Search {

  /** Fixed example query: one selective term (`dup` — planted in the
    * near-duplicate docs, df ≈ 5% of the corpus) and two common ones, so
    * the idf weighting visibly drives the ranking. */
  val BmQueryTerms: Seq[String] = Seq("dup", "spark", "merge")
  val BmK1 = 1.2
  val BmB = 0.75
  val BmTopK = 10

  def bm25Search(spark: SparkSession, sfDir: String): DataFrame = {
    val tc = TextAnalysis.termCounts(spark, sfDir)
    val terms = BmQueryTerms
    val dl = tc.groupBy("doc_id")
      .agg(sum("term_count").cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("long").as("total_len"))
    val dfExprs = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("df"))).as(s"df_$i")
    }
    val dfs = tc.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .agg(dfExprs.head, dfExprs.tail: _*)
    val matched = tc.filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"),
        terms.zipWithIndex.map { case (t, i) =>
          max(when(col("term") === t, col("term_count"))).as(s"tf_$i")
        }: _*)

    // avgdl and the per-term BM25 partials — operand order mirrored
    // token-for-token by OracleSql.bm25 so the doubles are bit-identical
    val avgdl = col("total_len") / col("n_docs").cast("double")
    def partial(i: Int): Column = {
      val tf = col(s"tf_$i")
      val dfT = col(s"df_$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      when(tf.isNotNull,
        idf * ((tf * lit(BmK1 + 1)) /
          (tf + lit(BmK1) * (lit(1 - BmB) + lit(BmB) * (col("dl") / avgdl)))))
        .otherwise(lit(0.0))
    }
    val score = terms.indices.map(partial)
      .reduceLeft[Column]((a, b) => a + b)

    PlanGuard.positionRank(matched
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .crossJoin(broadcast(dfs))
      .withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(BmTopK))
      .select(col("srank"), col("doc_id"), col("n_hit_terms").cast("long"),
        col("dl"), col("score"))
  }

  // ---- Hybrid retrieval (sparse + dense, RRF fusion) ----
  /** Reciprocal-rank-fusion constant (Cormack/Clarke/Büttcher's
    * published k = 60 — public knowledge; the standard hybrid-retrieval
    * fusion every production RAG stack runs). */
  val RrfK = 60
  /** The dense side's query vector: the FIRST vector of the fixed ANN
    * query pool (vec_id ≡ doc_id — the corpus convention
    * [[graft.operators.Curation.semanticDecontaminate]] established). */
  val HybridDenseQuery = 0L

  /** Hybrid search: the sparse BM25 top-k ([[bm25Search]], fixed term
    * query) fused with the dense exact-cosine top-k
    * ([[graft.operators.Similarity.embeddingTopK]], query vector
    * [[HybridDenseQuery]]) by reciprocal-rank fusion —
    * score(d) = Σ_lists 1/(k + rank_list(d)) over the lists containing
    * d. Ranks, not scores, are fused (RRF's point: BM25 scores and
    * cosines are incommensurable), ties to the lower doc_id; absent-
    * list ranks surface as 0 (integer, oracle-stable) rather than NULL.
    *
    * Scale: composes two already-bounded top-k slivers (≤ BmTopK and
    * ≤ TopK rows) — the fusion join and re-rank are constant-size no
    * matter the corpus; the heavy lifting stays in the two retrieval
    * legs, each independently scale-audited. */
  def hybridSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val sparse = bm25Search(spark, sfDir)
      .select(col("doc_id"), col("srank").as("bm25_rank"))
    val dense = graft.operators.Similarity.embeddingTopK(spark, sfDir)
      .filter(col("q_id") === HybridDenseQuery)
      .select(col("vec_id").as("doc_id"), col("rank").as("dense_rank"))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("dense_rank")), lit(0.0)), 6))
    PlanGuard.positionRank(fused
        .orderBy(col("rrf_score").desc, col("doc_id"))
        .limit(BmTopK))
      .select(col("srank"), col("doc_id"), col("rrf_score"),
        coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
        coalesce(col("dense_rank"), lit(0L)).as("dense_rank"))
  }

  // ---- all-pairs document similarity over the posting lists ----
  /** Document-frequency band for similarity terms: hapax terms carry no
    * pair signal (df < 2 can't co-occur) and stop-like terms (df > cap)
    * are the quadratic hazard AND the least discriminative — pruning them
    * is both the classic DISI cost bound and an idf argument. Cap = 10%
    * of the sf0.01 corpus; at production scale the cap is an absolute
    * posting-length bound, not a corpus fraction. */
  val SimDfMin = 2L
  val SimDfMax = 50L
  val SimTopK = 20

  /** Top-k most-similar document PAIRS via a posting-list self-join —
    * the all-pairs similarity workload (related-documents /
    * template-detection) expressed over the same persist-once inverted
    * index as BM25. Similarity is the raw term-count dot product plus the
    * shared-term count, both INTEGER-exact, so the ranking cannot drift
    * cross-engine (no tf-idf doubles in the decision path).
    *
    * Scale shape: candidate pairs are generated per TERM (equi-join on
    * the term key), so cost is Σ_term df² ≤ SimDfMax · Σ df — linear in
    * corpus size for a fixed cap, never N². The pair aggregation is one
    * partial-aggregable shuffle on (doc_a, doc_b); the final top-k is a
    * TakeOrderedAndProject over the aggregated pairs. */
  def docSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val tc = TextAnalysis.termCounts(spark, sfDir)
    val banded = tc.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= SimDfMin && col("df") <= SimDfMax)
      .select("term")
    val p = tc.join(banded, Seq("term"))
    val pairs = p.as("a").join(p.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(col("a.term_count") * col("b.term_count")).cast("long")
          .as("dot_weight"))
    PlanGuard.positionRank(pairs
      .orderBy(col("dot_weight").desc, col("doc_a"), col("doc_b"))
      .limit(SimTopK))
      .select(col("srank"), col("doc_a"), col("doc_b"),
        col("n_shared_terms"), col("dot_weight"))
  }
}
