package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character-k-shingle hashes of a string, in one pass over
  * the UTF-8 bytes: for every window of k characters, xxhash64 the
  * window's byte slice directly (seed 42 — bit-identical to Spark's
  * `xxhash64(substr(text, i, k))` because a character substring IS a
  * byte slice of the encoded string), deduplicated in a primitive
  * long hash set.
  *
  * Why an expression: the declarative form
  * `array_distinct(transform(sequence(1, n-k+1), i -> substr(text,i,k)))`
  * allocates one UTF8String per window and deduplicates by string
  * comparison — measured ~2 s for 5000×300-char docs at sf0.1, pure
  * allocation/comparison overhead. This loop allocates nothing per
  * window and hashes the original byte buffer in place; dedup is by
  * the 64-bit hash itself (same hash set as the downstream MinHash
  * consumer sees — a collision would have to collide in xxhash64,
  * which also bounds the declarative form's fidelity once hashed).
  * Multi-byte UTF-8 is handled by walking character start offsets, so
  * windows are character windows, not byte windows.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string and a positive shingle size, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static entry point shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // character start offsets (one pass; ASCII fast path is offs(i)=i)
    val offs = new Array[Int](s.numChars() + 1)
    var c = 0
    var b = 0
    while (b < nBytes) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(c) = nBytes
    val nChars = c
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    val nWindows = nChars - k + 1
    val seen = new java.util.HashSet[java.lang.Long](nWindows * 2)
    val out = new Array[Long](nWindows)
    var nOut = 0
    var w = 0
    while (w < nWindows) {
      val start = offs(w)
      val h = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, offs(w + k) - start, Seed)
      if (seen.add(h)) {
        out(nOut) = h
        nOut += 1
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Register `shingle_hashes(text, k)`; k must be a foldable literal.
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs.head, MinHashPack.litIntArg(exprs, "shingle_hashes")),
      "built-in")
}
