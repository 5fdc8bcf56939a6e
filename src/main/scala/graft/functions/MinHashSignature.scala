package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: for an `array<long>` of shingle hashes,
  * returns `array<long>` of length `nHashes` where element i is
  * `min over x of ((2i+3)·x + 97i + 11) mod p`, p = 2^31−1.
  *
  * Replaces a nested higher-order-function chain
  * (`transform(sequence(...), i -> array_min(transform(ints, x -> ...)))`)
  * that evaluates one interpreted lambda frame per (element × hash) —
  * the dominant cost of MinHash at scale. Generated code is a single
  * two-level primitive loop; the formula (and thus the result) is
  * IDENTICAL to the HOF form and to the DuckDB oracle.
  *
  * All intermediates stay < 2^34, far from int64 overflow.
  */
case class MinHashSignature(child: Expression, nHashes: Int) extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires array<bigint>, got ${other.catalogString}"
      )
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) {
      val a = 2L * i + 3L
      val b = 97L * i + 11L
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * xs.getLong(j) + b) % P
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      xs => {
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val a = ctx.freshName("a")
        val b = ctx.freshName("b")
        val best = ctx.freshName("best")
        val v = ctx.freshName("v")
        s"""
           |int $n = $xs.numElements();
           |long[] $out = new long[$nHashes];
           |for (int $i = 0; $i < $nHashes; $i++) {
           |  long $a = 2L * $i + 3L;
           |  long $b = 97L * $i + 11L;
           |  long $best = Long.MAX_VALUE;
           |  for (int $j = 0; $j < $n; $j++) {
           |    long $v = ($a * $xs.getLong($j) + $b) % ${P}L;
           |    if ($v < $best) $best = $v;
           |  }
           |  $out[$i] = $best;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
