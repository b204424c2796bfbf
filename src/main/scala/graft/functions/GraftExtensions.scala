package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's custom Catalyst
  * expressions — the deployment path for a cluster where per-session
  * `register(spark)` calls are not practical: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and `rolling_hash`,
  * `simhash_pack`, `minhash_pack`, `shingle_hashes` resolve in every
  * session's SQL, including pure-SQL clients that never touch Scala.
  * The engine ops themselves stay self-contained by also registering
  * lazily per call (idempotent either way).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "", "", "",
      "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial fingerprint"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_pack"),
      info("simhash_pack", "simhash_pack(array<bigint>) - Charikar SimHash signature"),
      (exprs: Seq[Expression]) => SimHashPack(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_pack"),
      info("minhash_pack", "minhash_pack(array<bigint>, k) - k-lane MinHash signature"),
      (exprs: Seq[Expression]) => MinHashPack(exprs.head,
        MinHashPack.litIntArg(exprs, "minhash_pack"))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(str, k) - distinct k-char shingle hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        MinHashPack.litIntArg(exprs, "shingle_hashes"))))
    ext.injectFunction((
      FunctionIdentifier("bloom_probe"),
      info("bloom_probe", "bloom_probe(str, filter_bytes) - codegen Bloom membership probe"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"bloom_probe expects 2 arguments (got ${exprs.length})")
        BloomProbe(exprs.head, exprs(1))
      }))
  }
}
