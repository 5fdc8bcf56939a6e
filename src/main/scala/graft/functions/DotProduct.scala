package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Replaces the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, (acc, v) => acc + v)`,
  * which executes as an interpreted CodegenFallback chain with one lambda
  * frame per element. The generated code is a tight primitive loop inside
  * whole-stage codegen — same sequential IEEE fold, bit-identical result.
  *
  * Null semantics: null input array → null (NullIntolerant-style via
  * BinaryExpression's default nullSafeEval dispatch); arrays are assumed
  * to have no null elements (embedding vectors), matching the HOF form's
  * behavior on such data. Lengths are folded to the shorter side, which
  * mirrors zip_with-then-multiply on equal-length inputs.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}"
      )
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Registration + Column-API surface for the engine's native functions. */
object GraftFunctions {

  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  /** Register into an existing session (local/test path). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs =>
        MinHashSignature(
          exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue()
        ),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs =>
        SimHash(
          exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue()
        ),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantize",
      exprs => Quantize(exprs(0)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomContains(exprs(0), exprs(1).eval().asInstanceOf[Array[Byte]]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2",
      exprs => SquaredL2(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => ShingleHashes(exprs(0)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles_pos",
      exprs => ShingleHashes(exprs(0), positional = true),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tdigest",
      buildTDigest,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_argmax_cos",
      ArgmaxCosine.build,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_apply",
      BpeApplyMerges.build,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_count",
      BpeCountTokens.build,
      "built-in"
    )
  }

  /** `graft_tdigest(value, compression, p1, p2, …)` builder shared by
    * the temp-function and extensions registration paths. SQL numeric
    * literals arrive as Decimal, Column-API lits as primitives —
    * accept both.
    */
  private[functions] val buildTDigest: Seq[Expression] => Expression = { exprs =>
    if (exprs.length < 3)
      throw new IllegalArgumentException(
        s"graft_tdigest(value, compression, p1[, p2, …]) needs at least 3 arguments, got ${exprs.length}"
      )
    def asDouble(e: Expression): Double = {
      if (!e.foldable)
        throw new IllegalArgumentException(
          s"graft_tdigest compression/probabilities must be literals, got ${e.sql}"
        )
      e.eval() match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number                             => n.doubleValue()
        case other =>
          throw new IllegalArgumentException(
            s"graft_tdigest expects numeric literals, got $other"
          )
      }
    }
    TDigestAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(
        exprs(0),
        org.apache.spark.sql.types.DoubleType
      ),
      exprs.drop(2).map(asDouble),
      asDouble(exprs(1))
    )
  }

  /** Column-API forms; require [[register]] (or the extensions class)
    * to have run against the session first.
    */
  def graft_dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def graft_minhash(shingleInts: Column, nHashes: Int): Column =
    call_function("graft_minhash", shingleInts, org.apache.spark.sql.functions.lit(nHashes))

  def graft_simhash(tokenHashes: Column, nBits: Int): Column =
    call_function("graft_simhash", tokenHashes, org.apache.spark.sql.functions.lit(nBits))

  def graft_quantize(vec: Column): Column = call_function("graft_quantize", vec)

  def graft_l2(a: Column, b: Column): Column = call_function("graft_l2", a, b)

  def graft_shingles(tokens: Column): Column = call_function("graft_shingles", tokens)

  def graft_shingles_pos(tokens: Column): Column =
    call_function("graft_shingles_pos", tokens)

  /** Mergeable t-digest quantile sketch (see [[TDigestAgg]]); returns
    * `array<double>` of estimates at `probs`.
    */
  def graft_tdigest(
      value: Column,
      probs: Seq[Double],
      compression: Double = TDigest.DefaultCompression
  ): Column =
    call_function(
      "graft_tdigest",
      (value +: org.apache.spark.sql.functions.lit(compression) +:
        probs.map(org.apache.spark.sql.functions.lit(_))): _*
    )

  /** Argmax-cosine coarse assignment against a bounded centroid set
    * (see [[ArgmaxCosine]]); the centroid matrix is evaluated once at
    * plan build and never enters the expression tree.
    */
  def graft_argmax_cos(
      emb: Column,
      nrm: Column,
      centIds: Seq[Long],
      centEmbs: Seq[Seq[Double]],
      centNrms: Seq[Double]
  ): Column =
    call_function(
      "graft_argmax_cos",
      emb,
      nrm,
      org.apache.spark.sql.functions.typedLit(centIds),
      org.apache.spark.sql.functions.typedLit(centEmbs),
      org.apache.spark.sql.functions.typedLit(centNrms)
    )

  /** Full BPE merge-table application (see [[BpeApplyMerges]]); the
    * table is evaluated once at plan build into constructor state —
    * one expression node at any vocabulary size.
    */
  def graft_bpe_apply(sym: Column, merges: Seq[(String, String)]): Column =
    call_function(
      "graft_bpe_apply",
      sym,
      org.apache.spark.sql.functions.typedLit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedLit(merges.map(_._2))
    )

  /** Whitespace-tokenized model-token count under a merge table (see
    * [[BpeCountTokens]]); the table is constructor state, the count is
    * one codegen'd single-pass call per row.
    */
  def graft_bpe_count(text: Column, merges: Seq[(String, String)]): Column =
    call_function(
      "graft_bpe_count",
      text,
      org.apache.spark.sql.functions.typedLit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedLit(merges.map(_._2))
    )

  /** Membership probe against a pre-built bloom filter (see
    * [[BloomContains]]); the serialized bits travel as a binary literal.
    */
  def graft_bloom_contains(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    call_function("graft_bloom_contains", key, org.apache.spark.sql.functions.lit(out.toByteArray))
  }
}

/** SparkSessionExtensions installer for cluster deployments:
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        GraftFunctions.dotInfo,
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
        (exprs: Seq[Expression]) =>
          MinHashSignature(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
        (exprs: Seq[Expression]) =>
          SimHash(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_quantize"),
        new ExpressionInfo(classOf[Quantize].getName, "graft_quantize"),
        (exprs: Seq[Expression]) => Quantize(exprs(0))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_l2"),
        new ExpressionInfo(classOf[SquaredL2].getName, "graft_l2"),
        (exprs: Seq[Expression]) => SquaredL2(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_bloom_contains"),
        new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
        (exprs: Seq[Expression]) =>
          BloomContains(exprs(0), exprs(1).eval().asInstanceOf[Array[Byte]])
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_shingles"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
        (exprs: Seq[Expression]) => ShingleHashes(exprs(0))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_shingles_pos"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles_pos"),
        (exprs: Seq[Expression]) => ShingleHashes(exprs(0), positional = true)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_tdigest"),
        new ExpressionInfo(classOf[TDigestAgg].getName, "graft_tdigest"),
        GraftFunctions.buildTDigest
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_argmax_cos"),
        new ExpressionInfo(classOf[ArgmaxCosine].getName, "graft_argmax_cos"),
        ArgmaxCosine.build
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_bpe_apply"),
        new ExpressionInfo(classOf[BpeApplyMerges].getName, "graft_bpe_apply"),
        BpeApplyMerges.build
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("graft_bpe_count"),
        new ExpressionInfo(classOf[BpeCountTokens].getName, "graft_bpe_count"),
        BpeCountTokens.build
      )
    )
    // Gated on spark.graft.rangeJoin.bucketWidth — a no-op until set.
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
