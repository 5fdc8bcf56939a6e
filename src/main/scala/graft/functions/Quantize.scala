package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native int8 scalar quantization audit over an `array<double>`:
  * returns `struct(q_min, q_max, q_checksum, mean_abs_err)` where
  * `q = min(floor((v−mn)·255/span), 255)`, checksum is the sequential
  * integer sum of codes and the error term the sequential double fold
  * of `|v − (mn + q·span/255)|` divided by 64.
  *
  * Replaces a HOF chain whose lambdas re-evaluated `array_min`/
  * `array_max` per ELEMENT (the optimizer inlines the aliased range
  * expressions into every reference — 64× redundant scans per row,
  * interpreted). One compiled pass computes the range, a second the
  * codes and error, in exactly the IEEE op order of the HOF form and
  * the DuckDB oracle — results are bit-identical.
  *
  * Empty array → null range, zero checksum/error (mirrors
  * `array_min([]) = null` semantics); constant vector (span 0) → zero
  * checksum/error. Elements are assumed non-null (embedding vectors).
  */
case class Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_quantize requires array<double>, got ${other.catalogString}"
      )
  }

  override def dataType: DataType = StructType(
    Seq(
      StructField("q_min", DoubleType, nullable = true),
      StructField("q_max", DoubleType, nullable = true),
      StructField("q_checksum", LongType, nullable = false),
      StructField("mean_abs_err", DoubleType, nullable = false)
    )
  )

  override def prettyName: String = "graft_quantize"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) {
      InternalRow(null, null, 0L, 0.0)
    } else {
      var mn = xs.getDouble(0)
      var mx = mn
      var j = 1
      while (j < n) {
        val v = xs.getDouble(j)
        if (v < mn) mn = v
        if (v > mx) mx = v
        j += 1
      }
      var qs = 0L
      var err = 0.0
      if (mx > mn) {
        val span = mx - mn
        j = 0
        while (j < n) {
          val v = xs.getDouble(j)
          var q = math.floor(((v - mn) * 255) / span).toLong
          if (q > 255L) q = 255L
          qs += q
          err += math.abs(v - (mn + (q.toDouble * span) / 255))
          j += 1
        }
        err = err / 64
      }
      InternalRow(mn, mx, qs, err)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      xs => {
        val n = ctx.freshName("n")
        val vals = ctx.freshName("vals")
        val mn = ctx.freshName("mn")
        val mx = ctx.freshName("mx")
        val j = ctx.freshName("j")
        val v = ctx.freshName("v")
        val qs = ctx.freshName("qs")
        val err = ctx.freshName("err")
        val span = ctx.freshName("span")
        val q = ctx.freshName("q")
        s"""
           |int $n = $xs.numElements();
           |Object[] $vals = new Object[4];
           |if ($n == 0) {
           |  $vals[2] = 0L; $vals[3] = 0.0;
           |} else {
           |  double $mn = $xs.getDouble(0);
           |  double $mx = $mn;
           |  for (int $j = 1; $j < $n; $j++) {
           |    double $v = $xs.getDouble($j);
           |    if ($v < $mn) $mn = $v;
           |    if ($v > $mx) $mx = $v;
           |  }
           |  long $qs = 0L;
           |  double $err = 0.0;
           |  if ($mx > $mn) {
           |    double $span = $mx - $mn;
           |    for (int $j = 0; $j < $n; $j++) {
           |      double $v = $xs.getDouble($j);
           |      long $q = (long) Math.floor((($v - $mn) * 255) / $span);
           |      if ($q > 255L) $q = 255L;
           |      $qs += $q;
           |      $err += Math.abs($v - ($mn + (((double) $q) * $span) / 255));
           |    }
           |    $err = $err / 64;
           |  }
           |  $vals[0] = $mn; $vals[1] = $mx; $vals[2] = $qs; $vals[3] = $err;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
