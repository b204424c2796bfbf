package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature packing: fold an array of 64-bit shingle hashes
  * into the k-lane signature (lane i = min over shingles of
  * mix64(h ^ seed_i)) in ONE per-row pass.
  *
  * Same motivation as [[SimHashPack]]: a document's (distinct)
  * shingles are one row, so the signature is per-row expression work —
  * the explode → typed-Aggregator plan ([[MinHashAgg]], retained as
  * the reference implementation for the equivalence test) pushed one
  * row per shingle through an ExpressionEncoder and shuffled them to
  * aggregate; this computes in the scan projection with NO shuffle.
  * Identical lane derivation (seed_i = mix64(golden·(i+1)), value =
  * mix64(h ^ seed_i)), so signatures — and every LSH band/candidate
  * downstream — are bit-identical.
  */
case class MinHashPack(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_pack requires array<bigint> and a positive lane count, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_pack"

  override protected def nullSafeEval(input: Any): Any =
    MinHashPack.pack(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashPack.pack($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashPack =
    copy(child = newChild)
}

object MinHashPack {
  private val seedCache = TrieMap.empty[Int, Array[Long]]

  private def seeds(k: Int): Array[Long] =
    seedCache.getOrElseUpdate(k,
      Array.tabulate(k)(i => SketchAggs.mix64(0x9E3779B97F4A7C15L * (i + 1))))

  /** Static entry point shared by interpreted eval and generated code. */
  def pack(hashes: ArrayData, k: Int): ArrayData = {
    val sd = seeds(k)
    val lanes = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var i = 0
        while (i < k) {
          val hi = SketchAggs.mix64(h ^ sd(i))
          if (hi < lanes(i)) lanes(i) = hi
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(lanes)
  }

  /** Extract the required foldable-literal int argument with a clear
    * error (a non-literal would otherwise crash deep inside eval).
    * Shared by the registry builder and [[GraftExtensions]]. */
  private[functions] def litIntArg(exprs: Seq[Expression], fnName: String): Int = {
    require(exprs.length == 2,
      s"$fnName expects exactly 2 arguments (got ${exprs.length})")
    require(exprs(1).foldable,
      s"$fnName's second argument must be a foldable integer literal")
    val v = exprs(1).eval(null)
    require(v != null, s"$fnName's second argument must not be NULL")
    v.asInstanceOf[Number].intValue()
  }

  /** Register `minhash_pack(arr, k)`; k must be a foldable literal.
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_pack",
      exprs => MinHashPack(exprs.head, litIntArg(exprs, "minhash_pack")),
      "built-in")
}
