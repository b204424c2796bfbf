package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.engine.{RetrievalOps, Tables}

/** Persisted BM25 inverted index (q145) — the [[SketchShared]]
  * contract applied to retrieval: the postings table (w, doc_id, tf)
  * and the doc-length table (doc_id, dl) are built ONCE per corpus as
  * catalog tables and every retrieval probe reads them; the text
  * corpus is never re-tokenized at query time. This is the serving
  * posture the reference uses everywhere — requests read materialized
  * aggregates, never the fact table
  * (reference: app/ml_app.py:99-139).
  *
  * The postings table is stored clustered by term
  * (repartition(w) + sortWithinPartitions(w)): a probe's literal
  * `isin` prune pushes to the parquet scan and row-group min/max
  * stats on w skip the non-query vocabulary — at 100 TB a probe
  * touches the query terms' row groups, not the index.
  *
  * Session-lifetime memo keyed by the sfDir hash, released by
  * Verify/Bench at end of run; the tables survive the memo (same
  * warehouse ⇒ a restarted serving job reloads with zero text
  * passes — the [[graft.engine.SimilarityOps.ensureIvfTables]]
  * pattern).
  */
object RetrievalShared {
  private var memo: Map[(String, String), DataFrame] = Map.empty

  /** The (w, doc_id, tf) inverted index — one tokenize pass per
    * corpus, ever. */
  def postings(s: SparkSession, dir: String): DataFrame =
    tableFor(s, dir, "bm25_postings",
      () => RetrievalOps.bm25Postings(Tables.documents(s, dir))
        .repartition(col("w")).sortWithinPartitions(col("w")))

  /** The (doc_id, dl) doc-length table; N and avgdl aggregate from
    * it in one 2-column pass. */
  def docLengths(s: SparkSession, dir: String): DataFrame =
    tableFor(s, dir, "bm25_doclen",
      () => RetrievalOps.bm25DocLengths(Tables.documents(s, dir)))

  private def tableFor(s: SparkSession, dir: String, prefix: String,
                       build: () => DataFrame): DataFrame = synchronized {
    val key = (dir, prefix)
    memo.getOrElse(key, {
      val t = s"${prefix}_${Integer.toHexString(dir.hashCode)}"
      if (!s.catalog.tableExists(t)) {
        build().write.mode("overwrite").saveAsTable(t)
      }
      val df = s.read.table(t)
      memo += (key -> df)
      df
    })
  }

  def release(): Unit = synchronized { memo = Map.empty }
}
