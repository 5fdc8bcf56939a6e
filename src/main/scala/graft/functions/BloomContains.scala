package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (the sketch
  * `DataFrameStatFunctions.bloomFilter` builds with a distributed
  * aggregate). Spark's own runtime row-level filtering uses this exact
  * construction internally (`BloomFilterMightContain`), but does not
  * expose it as a function — this expression makes the pattern a
  * library primitive: build a bloom over a huge keyed dataset once,
  * then pre-filter any probe stream with a codegen'd, shuffle-free
  * scalar test. False positives possible (verified downstream by the
  * exact join), false negatives impossible.
  *
  * The serialized filter rides in the plan as a binary literal and is
  * deserialized once per executor via the codegen reference array — for
  * multi-GB blooms prefer an explicit broadcast variable; at the fpp/ndv
  * this engine uses for dedup pre-filters (1% over the corpus hash
  * index) the bits are MBs, which is exactly what Spark's own runtime
  * bloom ships in-plan.
  *
  * String keys hash their UTF-8 bytes — identical to what the builder
  * inserts (`putString` == `putBinary(utf8 bytes)`), so probing the
  * column the bloom was built on is exact-contract.
  */
case class BloomContains(child: Expression, bloomBytes: Array[Byte]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires a string or bigint key, got ${other.catalogString}"
      )
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$bfRef.mightContainBinary($c.getBytes())")
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
