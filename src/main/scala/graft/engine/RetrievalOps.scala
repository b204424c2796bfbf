package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-lexical retrieval over the documents table — the BM25
  * ranker a data pipeline uses for eval-set retrieval checks and
  * RAG-ish corpus probes, built word-count-shaped: postings for the
  * query terms only, never a dense doc×term matrix.
  *
  * Determinism: the classic BM25 idf is ln((N−df+0.5)/(df+0.5)+1);
  * ln() is not correctly rounded and drifts across engines at the
  * last ulp, so this scorer uses the RATIONAL idf (N−df+0.5)/(df+0.5)
  * — the same ranking signal (monotone in df for fixed N) built
  * purely from correctly-rounded IEEE ops (+, ×, ÷) on exact BIGINT
  * counts, the transcendental-free discipline q144's lift score
  * established. Per-term scores quantize to integer parts-per-billion
  * (floor(x·1e9) — floor of a double is exact in every engine, where
  * ROUND(double, n) is rounding-path-dependent), and the per-doc sum
  * runs in exact BIGINT (order-independent on any partitioning) —
  * bit-identical in any engine that replays the same expression tree.
  * The ppb scale bounds the rational idf to N/df < ~4e9 per corpus
  * slice before the per-term long overflows — beyond that, drop to
  * ppm or split the corpus. */
object RetrievalOps {

  /** Default probe queries — drawn from the synthetic corpus's
    * operator vocabulary; override per corpus. */
  val defaultQueries: Seq[String] = Seq("hash join", "table scan", "stream filter")

  /** The full inverted index: one (w, doc_id, tf) posting per
    * distinct term per doc, over the WHOLE vocabulary — the
    * materialized artifact a serving layer probes instead of ever
    * re-reading the fact table (the reference serves every request
    * from pre-aggregated tables the same way,
    * reference: app/ml_app.py:99-139). One tokenize pass + one
    * word-count shuffle, built once per corpus refresh. */
  def bm25Postings(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(lower(text), '${TextOps.tokenRe}', 0)")).as("w"))
      .groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("tf"))

  /** Per-doc token counts (doc_id, dl) — the index's companion
    * table; N and avgdl are a 2-column aggregate over it. */
  def bm25DocLengths(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(lower(text), '${TextOps.tokenRe}', 0)"))
          .cast("long").as("dl"))

  /** BM25 top-k per query (k1 = 1.2, b = 0.75), probing a stored
    * index — no text pass at query time.
    *
    * Scale shape: the query-term prune is a LITERAL `isin` filter on
    * the postings' term column, so it pushes down to the parquet scan
    * (the stored table is sorted by w — row-group stats skip the
    * non-query vocabulary); everything downstream is candidate-sized.
    * df for the pruned terms is a keyed count over those postings'
    * doc sets (correct global df — the prune selects terms, not
    * documents); doc length joins co-partition on doc_id. Top-k is a
    * per-query window over candidate docs only. Scores are integer
    * ppb BIGINTs (see object doc) — exact map-side-combinable sums. */
  def bm25TopKFromIndex(postings: DataFrame, doclens: DataFrame,
                        queries: Seq[String] = defaultQueries,
                        k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScorePairs(postings, doclens, queryTermPairs(queries), k, k1, b)

  /** (qid, term) pairs from query strings — lowercased, per-query
    * distinct. */
  private def queryTermPairs(queries: Seq[String]): Seq[(Long, String)] =
    queries.zipWithIndex.flatMap { case (q, i) =>
      q.toLowerCase.split("\\s+").toSeq.distinct.map(t => (i.toLong, t)) }

  /** The scoring half of [[bm25TopKFromIndex]] over an explicit
    * (qid, term) pair list — split out so [[queryExpansion]] can
    * re-retrieve with data-derived expansion terms through the same
    * literal-pruned, ppb-exact plan. */
  private def bm25ScorePairs(postings: DataFrame, doclens: DataFrame,
                             terms: Seq[(Long, String)],
                             k: Int, k1: Double, b: Double): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val qterms = broadcast(terms.toDF("qid", "w"))
    // candidate-sized after the prune; checkpointed so df and the
    // score join read it once (for the inline path this also stops
    // the tokenize subtree from running twice)
    val tf = postings.filter(col("w").isin(terms.map(_._2).distinct: _*))
      .localCheckpoint(false)
    val dfw = tf.groupBy(col("w")).agg(count(lit(1)).cast("long").as("df"))
    val corpus = doclens.agg(count(lit(1)).cast("long").as("nn"),
      sum(col("dl")).cast("long").as("sumdl"))
    val scored = tf
      .join(qterms, "w")
      .join(dfw, "w")
      .join(doclens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("sumdl").cast("double") / col("nn"))
      .withColumn("score_t_ppb", floor(
        (((col("nn") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        * lit(1.0e9)))
    val perDoc = scored.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("score_t_ppb")).cast("long").as("score_ppb"),
           count(lit(1)).cast("long").as("n_terms"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_ppb").desc, col("doc_id"))
    perDoc
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("doc_id"), col("score_ppb"), col("n_terms"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Pseudo-relevance-feedback query expansion (RM3's shape, kept
    * transcendental-free): retrieve `fbDocs` feedback docs per query
    * from the stored index, mine their vocabulary for the `fbTerms`
    * most DISTINCTIVE terms — frequency lift (fb_tf/fb_len)/(df/N) as
    * integer ppm, the q144 scoring idea — excluding the original
    * query terms, and re-retrieve with the expanded term set. Output
    * is the expanded ranking in the q145 shape; because the expansion
    * choice feeds the ranking, a hash match certifies the term
    * selection AND the re-retrieval (and, via the recompute oracle,
    * the stored index — again).
    *
    * Scale shape: stage 1 is the q145 plan; the mining stage probes
    * postings by the BROADCAST feedback doc set (queries×fbDocs rows
    * — no postings shuffle) and df-counts only the feedback
    * vocabulary; the expansion set is queries×fbTerms pairs — BOUNDED
    * BY CONSTRUCTION, so collecting it into scan-pushable literals is
    * the IVF-probe pattern, not a driver-side loop. Stage 2 is the
    * q145 plan again with more literals. Every score is exact
    * integer ppm/ppb. */
  def queryExpansion(postings: DataFrame, doclens: DataFrame,
                     queries: Seq[String] = defaultQueries,
                     fbDocs: Int = 5, fbTerms: Int = 3, k: Int = 10,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val baseTerms = queryTermPairs(queries)
    val fb = bm25TopKFromIndex(postings, doclens, queries, fbDocs, k1, b)
      .select(col("qid"), col("doc_id"))
    val fbPost = postings.join(broadcast(fb), "doc_id")
      .groupBy(col("qid"), col("w"))
      .agg(sum(col("tf")).cast("long").as("fb_tf"))
      .localCheckpoint(false) // three consumers: len, candidate df, rank
    val fbLen = fbPost.groupBy(col("qid"))
      .agg(sum(col("fb_tf")).cast("long").as("fb_len"))
    val dfc = postings.join(broadcast(fbPost.select(col("w")).distinct()), "w")
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("df"))
    val corpus = doclens.agg(count(lit(1)).cast("long").as("nn"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("lift_ppm").desc, col("w"))
    val exp = fbPost
      .join(broadcast(baseTerms.toDF("qid", "w")), Seq("qid", "w"), "left_anti")
      .join(fbLen, "qid").join(dfc, "w").crossJoin(broadcast(corpus))
      .withColumn("lift_ppm",
        floor((col("fb_tf") * col("nn")).cast("double") /
              (col("fb_len") * col("df")).cast("double") * lit(1.0e6))
          .cast("long"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= fbTerms)
      .select(col("qid"), col("w"))
    val expTerms = exp.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    bm25ScorePairs(postings, doclens, (baseTerms ++ expTerms).distinct, k, k1, b)
  }

  /** Hybrid retrieval: lexical recall, semantic precision — the
    * two-stage ranker a curation/eval pipeline actually runs. Stage
    * 1 pulls `kLex` BM25 candidates per query from the stored index
    * ([[bm25TopKFromIndex]]); stage 2 reranks those candidates by
    * embedding cosine against the query's SEMANTIC ANCHOR — its
    * BM25 rank-1 document — surfacing docs that say the same thing
    * as the best lexical hit in different words (k of them; the
    * anchor itself is the seed, not a result).
    *
    * Scale shape: stage 2 never touches the corpus — candidates are
    * queries×kLex rows, the anchor frame is queries rows
    * (broadcast), and the embedding join hashes on the CANDIDATE
    * ids only. The cosine is the q46-proven fold (sequential
    * left-to-right double accumulation), so the whole
    * two-stage output stays oracle-replayable. */
  def hybridRerank(postings: DataFrame, doclens: DataFrame, embeddings: DataFrame,
                   queries: Seq[String] = defaultQueries,
                   kLex: Int = 20, k: Int = 10): DataFrame = {
    val lex = bm25TopKFromIndex(postings, doclens, queries, kLex)
      .localCheckpoint(false) // two consumers: anchor row + candidates
    val v = SimilarityOps.withVec(embeddings)
      .select(col("vec_id"), col("vec"), col("norm"))
    val anchors = lex.filter(col("rk") === 1)
      .select(col("qid"), col("doc_id").as("anchor_id"))
      .join(v, col("anchor_id") === col("vec_id"))
      .select(col("qid"), col("anchor_id"), col("vec").as("avec"), col("norm").as("anorm"))
    val cands = lex.filter(col("rk") > 1)
      .select(col("qid"), col("doc_id"), col("score_ppb").as("bm25_ppb"))
      .join(v, col("doc_id") === col("vec_id"))
      .join(broadcast(anchors), "qid")
      .withColumn("cos",
        expr("aggregate(zip_with(avec, vec, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          / (col("anorm") * col("norm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("doc_id"))
    cands
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("doc_id"), col("anchor_id"), col("bm25_ppb"), col("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Reciprocal-rank fusion over the hybrid candidate set — the
    * OTHER standard two-signal ranker beside [[hybridRerank]]'s
    * rerank: instead of replacing the lexical order with the
    * semantic one, RRF BLENDS both ranks,
    * score = 1/(c+lex_rank) + 1/(c+cos_rank), so a document strong
    * in either signal surfaces and a document mid-pack in both beats
    * one great-in-one/awful-in-the-other. Ranks are exact integers;
    * the score is two correctly-rounded IEEE divisions summed in
    * fixed textual order — no transcendentals, oracle-replayable.
    *
    * Scale: identical to [[hybridRerank]] — stage 2 never touches
    * the corpus; everything after the index probe is queries×kLex
    * rows. */
  def rrfFusion(postings: DataFrame, doclens: DataFrame, embeddings: DataFrame,
                queries: Seq[String] = defaultQueries,
                kLex: Int = 20, k: Int = 10, c: Int = 60): DataFrame = {
    val lex = bm25TopKFromIndex(postings, doclens, queries, kLex)
      .localCheckpoint(false) // anchor row + candidates
    val v = SimilarityOps.withVec(embeddings)
      .select(col("vec_id"), col("vec"), col("norm"))
    val anchors = lex.filter(col("rk") === 1)
      .select(col("qid"), col("doc_id").as("anchor_id"))
      .join(v, col("anchor_id") === col("vec_id"))
      .select(col("qid"), col("anchor_id"), col("vec").as("avec"), col("norm").as("anorm"))
    val cands = lex.filter(col("rk") > 1)
      .select(col("qid"), col("doc_id"), col("rk").as("lex_rk"))
      .join(v, col("doc_id") === col("vec_id"))
      .join(broadcast(anchors), "qid")
      .withColumn("cos",
        expr("aggregate(zip_with(avec, vec, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          / (col("anorm") * col("norm")))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("doc_id"))
    val fused = cands
      .withColumn("cos_rk", row_number().over(wc).cast("long"))
      .withColumn("rrf",
        lit(1.0) / (lit(c.toDouble) + col("lex_rk")) +
        lit(1.0) / (lit(c.toDouble) + col("cos_rk")))
    val wf = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("doc_id"), col("lex_rk"), col("cos_rk"),
        col("rrf"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Retrieval quality metrics — the eval harness a retrieval stack
    * ships with: per query, recall@k and the reciprocal rank of the
    * first relevant hit (the MRR component), against a DETERMINISTIC
    * relevance oracle — a doc is relevant iff it contains EVERY term
    * of the query (boolean-AND ground truth derived from the same
    * stored postings, so the metric needs no human labels and
    * replays exactly). All counts are exact integers; recall and RR
    * are one display division each.
    *
    * Scale: the relevance set derives from query-term postings only
    * (the same isin pushdown as the scorer), grouped per (query,
    * doc); the metric join is ranked-rows × relevant-rows, both
    * query-bounded. */
  def retrievalMetrics(postings: DataFrame, doclens: DataFrame,
                       queries: Seq[String] = defaultQueries, k: Int = 10): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val terms = queries.zipWithIndex
      .flatMap { case (q, i) => q.toLowerCase.split("\\s+").toSeq.distinct
        .map(t => (i.toLong, t)) }
    val qterms = broadcast(terms.toDF("qid", "w"))
    val nTerms = broadcast(terms.groupBy(_._1).map { case (q, ts) => (q, ts.size.toLong) }
      .toSeq.toDF("qid", "n_q"))
    val rel = postings.filter(col("w").isin(terms.map(_._2).distinct: _*))
      .join(qterms, "w")
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_match")) // postings are distinct per (w, doc)
      .join(nTerms, "qid")
      .filter(col("n_match") === col("n_q"))
      .select(col("qid"), col("doc_id"))
      .localCheckpoint(false) // relevance counts + hit join read it
    val ranked = bm25TopKFromIndex(postings, doclens, queries, k)
    val nRel = rel.groupBy(col("qid")).agg(count(lit(1)).cast("long").as("n_rel"))
    val hits = ranked.join(rel, Seq("qid", "doc_id"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).cast("long").as("hits_at_k"),
           min(col("rk")).cast("long").as("first_rel_rk"))
    nRel.join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), col("n_rel"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        (coalesce(col("hits_at_k"), lit(0L)).cast("double") / col("n_rel"))
          .as("recall_at_k"),
        coalesce(lit(1.0) / col("first_rel_rk"), lit(0.0))
          .as("reciprocal_rank"))
      .orderBy(col("qid"))
  }

  /** One-shot form: build the index frames inline and probe them —
    * the ad-hoc path when no persisted index exists (see
    * [[graft.queries.RetrievalShared]] for the stored-table path the
    * catalog uses). */
  def bm25TopK(documents: DataFrame,
               queries: Seq[String] = defaultQueries,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromIndex(
      bm25Postings(documents), bm25DocLengths(documents), queries, k, k1, b)

  /** BM25 HARD-NEGATIVE mining — the contrastive-training data step
    * q201's cluster triplets approximate with random negatives: for
    * each anchor document, the top-k documents that score HIGH on
    * the anchor's own salient terms (top-tf, w-tiebroken — drawn
    * from the STORED postings, no text pass) yet are NOT the
    * anchor's near-duplicates (its closure cluster, the positives —
    * excluded and counted per anchor, never silently dropped).
    * Lexically-close-but-different docs are exactly the negatives a
    * retriever/embedding model learns the most from.
    *
    * Scale shape: the anchor-term frame is anchors×termsPerAnchor
    * rows (broadcast); candidate postings prune by a broadcast term
    * semi-join (the dynamic-frame analogue of q145's literal isin
    * prune — at 100 TB the runtime filter reaches the clustered
    * postings scan); scoring is the q145 expression tree verbatim
    * (rational idf, DECIMAL-exact per-doc sum), so the oracle
    * replays it; the rank window is candidate-bounded per anchor.
    * The positive set rides the memoized corpus closure
    * ([[DedupOps.clustersFor]]). */
  def hardNegatives(postings: DataFrame, doclens: DataFrame, clusters: DataFrame,
                    anchors: Seq[Long] = Seq(0L, 20L, 40L, 80L, 120L),
                    termsPerAnchor: Int = 3, k: Int = 10,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val wT = Window.partitionBy(col("doc_id")).orderBy(col("tf").desc, col("w"))
    val qterms = postings.filter(col("doc_id").isin(anchors: _*))
      .withColumn("trk", row_number().over(wT))
      .filter(col("trk") <= termsPerAnchor)
      .select(col("doc_id").as("qid"), col("w"))
      .localCheckpoint(false) // term prune + the score join
    val tf = postings
      .join(broadcast(qterms.select(col("w")).distinct()), "w")
      .localCheckpoint(false) // df rollup + score join
    val dfw = tf.groupBy(col("w")).agg(count(lit(1)).cast("long").as("df"))
    val corpus = doclens.agg(count(lit(1)).cast("long").as("nn"),
      sum(col("dl")).cast("long").as("sumdl"))
    val scored = tf
      .join(broadcast(qterms), "w")
      .join(dfw, "w")
      .join(doclens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("sumdl").cast("double") / col("nn"))
      .withColumn("score_t_ppb", floor(
        (((col("nn") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        * lit(1.0e9)))
    val perDoc = scored.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("score_t_ppb")).cast("long").as("score_ppb"))
    val anchorCl = clusters.filter(col("doc_id").isin(anchors: _*))
      .select(col("doc_id").as("qid"), col("cluster_id").as("qcl"))
    val withCl = perDoc
      .join(broadcast(anchorCl), "qid")
      .join(clusters, "doc_id")
      .withColumn("is_pos", col("cluster_id") === col("qcl"))
    val wQ = Window.partitionBy(col("qid"))
    val wR = Window.partitionBy(col("qid")).orderBy(col("score_ppb").desc, col("doc_id"))
    withCl
      .withColumn("n_excluded",
        sum(when(col("is_pos"), 1L).otherwise(0L)).over(wQ).cast("long"))
      .filter(!col("is_pos"))
      .withColumn("rk", row_number().over(wR).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("doc_id"), col("score_ppb"), col("n_excluded"))
      .orderBy(col("qid"), col("rk"))
  }

  /** INCREMENTAL postings maintenance (q237) — the q235 pattern
    * applied to the lexical index: a batch of new documents produces
    * its postings delta (batch-only tokenize — the stored corpus is
    * never re-scanned for term extraction), and the report reconciles
    * document frequency per TOUCHED term (df before/after, batch tf
    * mass) plus the corpus-stat shift (N, Σdl) every BM25 score
    * depends on. A maintenance job appends [[bm25Postings]] of the
    * batch to the stored table and refreshes (nn, sumdl); this query
    * IS that job's audit row set.
    *
    * Scale: the stored postings are probed with a BROADCAST term
    * semi-join (batch-vocabulary-bounded — the q232 dynamic-prune
    * shape, reaching the term-sorted stored table's row-group stats
    * at 100 TB); everything else is batch-sized. Output is one row
    * per batch-touched term. */
  def bm25IncrementalAppend(postings: DataFrame, doclens: DataFrame,
                            batch: DataFrame): DataFrame = {
    val newPostings = bm25Postings(batch).localCheckpoint(false) // df rollup + term prune
    val dfNew = newPostings.groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("df_new"),
           sum(col("tf")).cast("long").as("tf_new"))
      .localCheckpoint(false) // prune side + report side
    val dfOld = postings
      .join(broadcast(dfNew.select(col("w"))), Seq("w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("df_before"))
    val stats = doclens
      .agg(count(lit(1)).cast("long").as("n_docs_before"),
           sum(col("dl")).cast("long").as("sumdl_before"))
      .crossJoin(bm25DocLengths(batch)
        .agg(count(lit(1)).cast("long").as("n_docs_new"),
             sum(col("dl")).cast("long").as("sumdl_new")))
      .select((col("n_docs_before") + col("n_docs_new")).as("n_docs_after"),
              (col("sumdl_before") + col("sumdl_new")).as("sumdl_after"))
    dfNew.join(dfOld, Seq("w"), "left_outer")
      .na.fill(0L, Seq("df_before"))
      .withColumn("df_after", col("df_before") + col("df_new"))
      .crossJoin(broadcast(stats))
      .select(col("w"), col("df_before"), col("df_new"), col("df_after"),
        col("tf_new"), col("n_docs_after"), col("sumdl_after"))
      .orderBy(col("w"))
  }

  /** Stored-index coverage audit (q239) — the q212 reconciliation
    * applied to the lexical artifacts: does the persisted index pair
    * (postings, doclens) still cover the corpus? One row: corpus
    * size, doclens rows, documents with at least one posting,
    * token-less documents (legitimately absent from postings), and
    * the go/no-go flag `covered` — doclens must match the corpus
    * 1:1 and postings must cover exactly the tokenized documents.
    * The engine reads the STORED tables while the oracle re-derives
    * the expected values from raw text, so a stale or partial index
    * hash-mismatches instead of silently serving. All counts are
    * id-distinct rollups; nothing pairs rows. */
  def postingsCoverageAudit(documents: DataFrame, postings: DataFrame,
                            doclens: DataFrame): DataFrame = {
    val nDocs = documents.agg(count(lit(1)).cast("long").as("n_docs"))
    val nDl = doclens.agg(count(lit(1)).cast("long").as("n_doclens"),
      sum(when(col("dl") === 0, 1L).otherwise(0L)).cast("long").as("n_tokenless"))
    val nPost = postings.select(col("doc_id")).distinct()
      .agg(count(lit(1)).cast("long").as("n_docs_with_postings"))
    nDocs.crossJoin(broadcast(nDl)).crossJoin(broadcast(nPost))
      .withColumn("covered",
        col("n_doclens") === col("n_docs") &&
          col("n_docs_with_postings") === col("n_docs") - col("n_tokenless"))
      .select(col("n_docs"), col("n_doclens"), col("n_docs_with_postings"),
        col("n_tokenless"), col("covered"))
  }

  /** Sparse-vector document similarity over the stored postings —
    * the ALL-PAIRS companion to the embedding-cosine pairs (q47):
    * documents as raw-tf term vectors, cosine via an inverted-index
    * self-join on the term, with COMMON TERMS PRUNED (df > `dfCap`)
    * before the join. The prune is the scale lever: a term with df
    * docs contributes df² join rows, so Σdf² ≤ dfCap × |postings| —
    * the classic all-pairs-similarity bound (common terms carry no
    * discriminative mass anyway; they are this join's stopwords).
    *
    * Arithmetic is exact until the last step: dot and norms are
    * BIGINT tf sums; ONE sqrt + ONE division produce the score
    * (correctly-rounded IEEE in any engine) — bit-stable with no
    * rounding step. Norms are over the PRUNED vocabulary, consistently with
    * the dot product — the score is the cosine in the pruned term
    * space. */
  def sparseCosinePairs(postings: DataFrame, dfCap: Long = 25,
                        threshold: Double = 0.3): DataFrame = {
    val rare = postings.join(
      postings.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select(col("w")),
      Seq("w"))
      .localCheckpoint(false) // feeds the norms rollup AND both join sides
    val norms = rare.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).cast("long").as("n2"))
    val dots = rare.as("a").join(rare.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .agg(sum(col("a.tf") * col("b.tf")).cast("long").as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_i"), col("n2").as("n2_i")), "doc_i")
      .join(norms.select(col("doc_id").as("doc_j"), col("n2").as("n2_j")), "doc_j")
      .withColumn("cosine",
        col("dot").cast("double") /
          sqrt(col("n2_i").cast("double") * col("n2_j").cast("double")))
      .filter(col("cosine") >= threshold)
      .select(col("doc_i"), col("doc_j"), col("dot"), col("cosine"))
      .orderBy(col("doc_i"), col("doc_j"))
  }
}
