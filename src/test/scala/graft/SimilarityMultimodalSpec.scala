package graft

import org.apache.spark.sql.functions._

import graft.engine._

class SimilarityMultimodalSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("brute-force cosine: self-similarity is 1, scores bounded") {
    // score against a copy of the query vector itself must be ~1
    val v = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999999L))
    val scores = SimilarityOps.cosineTopK(emb.unionByName(v), nQueries = 1, k = 10)
      .collect()
    assert(scores.nonEmpty)
    val self = scores.find(_.getLong(1) == 999999L)
    assert(self.isDefined && math.abs(self.get.getDouble(2) - 1.0) < 1e-5,
      "identical vector should rank with score 1")
    assert(scores.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("ANN bucket scores agree with brute-force scores for the same pair") {
    val ann = SimilarityOps.annTopK(emb, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.nonEmpty, "ANN should return candidates with 6 planes")
    val brute = SimilarityOps.cosineTopK(emb, nQueries = 5, k = emb.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { case (pair, score) =>
      assert(brute.contains(pair) && math.abs(brute(pair) - score) < 1e-9,
        s"pair $pair: ann=$score brute=${brute.get(pair)}")
    }
  }

  test("ANN candidates all share the query bucket") {
    val buckets = SimilarityOps.annBuckets(emb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = SimilarityOps.annTopK(emb, nQueries = 5, k = 10).collect()
    ann.foreach { r =>
      assert(buckets(r.getLong(0)) == buckets(r.getLong(1)))
    }
  }

  test("multimodal decode stub is deterministic and shape-correct") {
    val docs = Tables.documents(spark, sf)
    val a = MultimodalOps.decodeFeatures(docs).collect()
    val b = MultimodalOps.decodeFeatures(docs).collect()
    assert(a.length == docs.count())
    assert(a.map(_.getLong(3)).toSeq == b.map(_.getLong(3)).toSeq, "content hashes stable")
    assert(a.forall { r =>
      (4 to 7).forall(i => r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)
    }, "stub features normalized to [0,1]")
  }

  test("media table payload length equals utf-8 byte length") {
    val docs = Tables.documents(spark, sf)
    val rows = MultimodalOps.mediaTable(docs)
      .select(col("media_id"), col("payload"), col("n_bytes"))
      .limit(20).collect()
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length.toLong == r.getLong(2))
    }
  }
}
