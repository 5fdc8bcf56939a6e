package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash fingerprint: for an `array<long>` of 28-bit token
  * hashes, returns the bigint whose bit b (0 ≤ b < nBits) is set iff
  * `Σ over tokens of (bit b of hash ? +1 : −1) > 0`.
  *
  * Replaces a `transform(sequence(0,27), b -> aggregate(hashes, ...))`
  * HOF chain that pays one interpreted lambda frame per (token × bit) —
  * the engine's slowest per-row query before this. Generated code is a
  * two-level primitive loop over the same ±1 votes; integer arithmetic
  * throughout, so results are identical to the HOF form and to the
  * DuckDB oracle's `floor(h / 2^b) % 2` formulation (hashes are
  * non-negative, where flooring division and shifting agree).
  */
case class SimHash(child: Expression, nBits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires array<bigint>, got ${other.catalogString}"
      )
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Long](nBits)
    var j = 0
    while (j < n) {
      val h = xs.getLong(j)
      var b = 0
      while (b < nBits) {
        votes(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0L) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      xs => {
        val n = ctx.freshName("n")
        val votes = ctx.freshName("votes")
        val j = ctx.freshName("j")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val out = ctx.freshName("out")
        s"""
           |int $n = $xs.numElements();
           |long[] $votes = new long[$nBits];
           |for (int $j = 0; $j < $n; $j++) {
           |  long $h = $xs.getLong($j);
           |  for (int $b = 0; $b < $nBits; $b++) {
           |    $votes[$b] += ((($h >>> $b) & 1L) * 2L) - 1L;
           |  }
           |}
           |long $out = 0L;
           |for (int $b = 0; $b < $nBits; $b++) {
           |  if ($votes[$b] > 0L) $out |= (1L << $b);
           |}
           |${ev.value} = $out;
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
