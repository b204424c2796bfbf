package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Charikar SimHash packing: fold an array of 64-bit token hashes into
  * one 64-bit signature (bit i set iff the +1/−1 votes of the tokens'
  * i-th bits sum positive). Frequency-weighted by construction — every
  * occurrence in the input array votes.
  *
  * This replaces round 2's explode → typed-Aggregator plan for
  * [[graft.engine.DedupOps.simhashSignatures]]: a document's tokens
  * already live in ONE row, so the signature is per-row expression
  * work — no explode (one row per token through an ExpressionEncoder),
  * no hash aggregate, NO SHUFFLE. The vote loop runs once per document
  * inside whole-stage codegen; at 100 TB this is a pure map over the
  * scan, embarrassingly parallel. BENCH_r03 measured the aggregator
  * plan at 20.0 s for sf0.1 (23% of the whole suite); this form is a
  * scan-bound projection.
  */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_pack requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(input: Any): Any =
    SimHashPack.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashPack.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  /** Static entry point shared by interpreted eval and generated code.
    * Null array elements (impossible for regexp_extract_all output, but
    * legal in the type) vote nothing. */
  def pack(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var i = 0
        while (i < 64) {
          votes(i) += (((h >>> i) & 1L) * 2L - 1L).toInt
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Register `simhash_pack` in the session's function registry.
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_pack", exprs => SimHashPack(exprs.head), "built-in")
}
