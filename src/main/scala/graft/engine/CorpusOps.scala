package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the full training-data path composed
  * from the already-verified stages in ONE declarative plan:
  * near-dup clustering → canonical document per cluster → PII scrub →
  * quality scoring → tokenizer-cost estimate. One row per KEPT
  * document with its cluster size and curation metrics.
  *
  * The q91 catalog form feeds the capped exact-Jaccard edge set
  * (the q61 oracle demonstrator) so the ENTIRE pipeline — recursive
  * transitive closure included — hash-checks against a single DuckDB
  * oracle; the production form swaps in the sketch edge generator
  * ([[DedupOps.nearDedupSketch]]'s merged bucket join) with no other
  * change. Scale posture inherits from the stages: bucketed candidate
  * joins, RDD-co-partitioned components, per-row codegen for every
  * text metric; the final assembly is key-joins on doc_id that AQE
  * broadcasts when the canonical set is small.
  */
object CorpusOps {

  def curate(documents: DataFrame): DataFrame = {
    val edges = DedupOps.jaccardPairs(documents).select(col("doc_i"), col("doc_j"))
    val clusters = DedupOps.connectedComponents(documents.select(col("doc_id")), edges)
    val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
    val canonIds = clusters.filter(col("doc_id") === col("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("n_members"))
    // the kept-docs frame feeds all three metric passes and the final
    // assembly — materialize it once (lazy: the first action pays)
    // instead of re-scanning and re-joining the corpus per branch
    val canon = documents.join(canonIds, "doc_id").localCheckpoint(false)
    val scrub = TextOps.piiScrub(canon)
      .select(col("doc_id"), col("n_emails"), col("n_numbers"), col("clean_fp"))
    val qual = TextOps.qualityScore(canon).select(col("doc_id"), col("quality"))
    val toks = TextOps.tokenEstimate(canon).select(col("doc_id"), col("n_pieces"))
    canon.select(col("doc_id"), col("n_members"))
      .join(scrub, "doc_id")
      .join(qual, "doc_id")
      .join(toks, "doc_id")
      .select(col("doc_id"), col("n_members"), col("n_emails"), col("n_numbers"),
              col("clean_fp"), col("quality"), col("n_pieces"))
      .orderBy(col("doc_id"))
  }
}
