package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_udf, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a string column:
  * `bloom_probe(str, filter_bytes)`.
  *
  * Replaces the boxed Scala UDF the decontamination path used
  * (VERDICT r6 stretch item): a Scala UDF is a codegen barrier — every
  * row pays UTF8String→String conversion, boxing and a lambda call
  * outside the generated loop. This expression probes the filter
  * INSIDE whole-stage codegen on the raw UTF-8 bytes
  * (`mightContainBinary`), which is exactly what `mightContainString`
  * hashes too, so results are bit-identical to the UDF form —
  * asserted in TextDedupSpec.
  *
  * The filter arrives as a foldable BINARY literal (the same shape
  * Spark's own runtime row-level Bloom filtering uses) and is
  * deserialized lazily ONCE per JVM, not per row; the literal rides
  * the task binary, which Spark broadcasts once per stage — the same
  * distribution the explicit `sparkContext.broadcast` gave the UDF.
  */
case class BloomProbe(left: Expression, right: Expression) extends BinaryExpression {

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe requires (string, foldable binary filter), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(value: Any, filterBytes: Any): Any =
    filter.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the DESERIALIZED filter: the probe in the generated
    // loop is one virtual call on the shared per-stage object
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    val l = left.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.mightContainBinary(${l.value}.getBytes());
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object BloomProbe {
  /** Register `bloom_probe(str, filter_bytes)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe",
      exprs => {
        require(exprs.length == 2, s"bloom_probe expects 2 arguments (got ${exprs.length})")
        BloomProbe(exprs.head, exprs(1))
      },
      "built-in")

  /** Column-level probe: serialize the filter once on the driver and
    * apply the native expression to `column`. */
  def probe(spark: SparkSession, filter: BloomFilter, column: Column): Column = {
    register(spark)
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    call_udf("bloom_probe", column, lit(bos.toByteArray))
  }
}
