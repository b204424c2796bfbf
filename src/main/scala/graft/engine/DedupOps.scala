package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard).
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on the content fingerprint;
  *  - MinHash signatures are a single explode + 32 min-aggregates
  *    (map-side partial combine, one shuffle on doc_id);
  *  - LSH banding turns the quadratic all-pairs problem into an
  *    equi-join on (band, band_hash) — only colliding buckets pay;
  *  - exact Jaccard verification runs only on candidate pairs.
  * Nothing here ever materializes all O(n²) pairs; the only
  * intentionally-bounded query is the exhaustive-pairs oracle
  * demonstrator [[jaccardPairs]], which caps the doc set.
  */
object DedupOps {

  val ShingleSize = 5

  /** Distinct character k-shingles per document. `sequence` is guarded
    * for texts shorter than the shingle size. */
  def shingles(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        explode(array_distinct(expr(
          s"CASE WHEN length(text) >= $ShingleSize " +
          s"THEN transform(sequence(1, length(text) - ${ShingleSize - 1}), i -> substr(text, i, $ShingleSize)) " +
          "ELSE array() END"))).as("shingle"))

  /** Exact dedup: canonical row per content hash (min doc_id wins).
    * One shuffle on md5(text); at 100 TB the same plan with the hash
    * bucketed to storage makes re-dedup incremental. */
  def exactDedup(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp_md5"))
    documents
      .withColumn("fp_md5", md5(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("fp_md5"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Exhaustive n-gram Jaccard similarity on a bounded doc subset —
    * the oracle-checkable ground truth for the LSH path. Joins on
    * shingle, so only co-occurring shingles pay; the doc_id cap keeps
    * the demonstrator O(60²) at any scale factor. */
  def jaccardPairs(documents: DataFrame, maxDocId: Long = 60, threshold: Double = 0.15): DataFrame = {
    val sh = shingles(documents.filter(col("doc_id") < maxDocId)).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_i").withColumnRenamed("n_sh", "n_i"), "doc_i")
      .join(sizes.withColumnRenamed("doc_id", "doc_j").withColumnRenamed("n_sh", "n_j"), "doc_j")
      .withColumn("jaccard",
        round(col("common").cast("double") /
              (col("n_i") + col("n_j") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_i"), col("doc_j"), col("common"), col("jaccard"))
      .orderBy(col("doc_i"), col("doc_j"))
  }

  /** MinHash signatures: k independent permutations approximated by
    * seeded xxhash64; signature i = min over shingles. One aggregate
    * pass, map-side combinable. */
  def minhashSignatures(documents: DataFrame, numHashes: Int = 32): DataFrame = {
    val sh = shingles(documents)
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: hash each band of `rowsPerBand` consecutive minhash
    * values; docs sharing any (band, hash) bucket become candidates.
    * With J ≈ pairwise Jaccard, P(candidate) = 1-(1-J^r)^b — tuned so
    * dissimilar pairs almost never collide, keeping the bucket join
    * linear-ish in n. */
  def lshCandidates(signatures: DataFrame, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val buckets = signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: signatures → banded
    * candidates → signature-estimated Jaccard. Not SQL-expressible
    * (seeded sketch); DedupSpec checks recall against ground truth. */
  def minhashPairs(documents: DataFrame, numHashes: Int = 32): DataFrame = {
    val sigs = minhashSignatures(documents, numHashes).cache()
    val cands = lshCandidates(sigs)
    val eqTerms = (0 until numHashes)
      .map(i => when(col(s"a.mh_$i") === col(s"b.mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands
      .join(sigs.as("a"), col("doc_i") === col("a.doc_id"))
      .join(sigs.as("b"), col("doc_j") === col("b.doc_id"))
      .withColumn("est_jaccard", round(eqTerms.cast("double") / numHashes, 6))
      .select(col("doc_i"), col("doc_j"), col("est_jaccard"))
      .orderBy(col("doc_i"), col("doc_j"))
  }

  /** SimHash: 64-bit signature from per-token hash bit votes; hamming
    * distance over a bounded subset ranks near-duplicates. The bit
    * votes are 64 conditional sums in one aggregate (map-side
    * combinable); pair scoring uses bit_count(xor). */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    val tokens = documents
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9_]+', 0)")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"v_$i"))
    val voted = tokens.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"v_$i") > 0, expr(s"CAST(1 AS BIGINT) << $i")).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    voted.select(col("doc_id"), sig.as("simhash"))
  }

  def simhashPairs(documents: DataFrame, maxDocId: Long = 60, maxHamming: Int = 28): DataFrame = {
    val sigs = simhashSignatures(documents.filter(col("doc_id") < maxDocId))
    sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"), col("hamming"))
      .orderBy(col("doc_i"), col("doc_j"))
  }
}
