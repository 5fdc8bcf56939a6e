package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Argmax-cosine coarse assignment against a BOUNDED centroid set, as
  * one native expression: for an input `(emb array<double>, nrm
  * double)` row, return the `cent_id` with the highest cosine, ties
  * toward the smaller id (the q26 rule — centroids scan in ascending
  * id with a strict `>`).
  *
  * Why an Expression and not a join or a HOF fold: the broadcast
  * cross-join + max_by shape shuffles nothing wider than N but
  * materializes every (vector, centroid) pair as a row carrying BOTH
  * 64-double arrays — ~32 GB of row copies at 100k vectors × 316
  * centroids, measured 10× slower than this loop. A `aggregate()` fold
  * over a centroid-matrix literal avoids the rows but embeds a K×dim
  * literal in the expression tree, and every Catalyst re-analysis /
  * canonicalization pass traverses it — measured 25× slower END-TO-END
  * on the multi-plan ingest path. Here the matrix is plain constructor
  * state: children are just `(emb, nrm)`, canonicalization cost is
  * O(1) (array fields compare by reference — two distinct builds never
  * unify, which only forgoes subexpression sharing), and codegen
  * reaches the matrix via a reference object.
  *
  * Decision parity with the previous max_by(struct(c_cos, -cent_id))
  * aggregate: identical sequential-fold dot, identical `s / (nrm *
  * cent_nrm)` op order, strict `>` over ascending ids ⇔ max over
  * (cos, -id). Zero-norm vectors (NaN cosine) are outside the data
  * contract; under it NaN never wins here whereas Spark's struct
  * ordering sorted NaN last.
  */
case class ArgmaxCosine(
    left: Expression,
    right: Expression,
    centIds: Array[Long],
    centEmbs: Array[Array[Double]],
    centNrms: Array[Double]
) extends BinaryExpression {

  require(
    centIds.length == centEmbs.length && centIds.length == centNrms.length && centIds.nonEmpty,
    "graft_argmax_cos needs a non-empty, aligned centroid set"
  )

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_argmax_cos requires (array<double>, double), got ${l.catalogString}, ${r.catalogString}"
        )
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_argmax_cos"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    var best = Double.NegativeInfinity
    var bid = -1L
    var c = 0
    while (c < centIds.length) {
      val ce = centEmbs(c)
      val n = math.min(emb.numElements(), ce.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += emb.getDouble(i) * ce(i)
        i += 1
      }
      val cos = s / (nrm * centNrms(c))
      if (cos > best) {
        best = cos
        bid = centIds(c)
      }
      c += 1
    }
    bid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val embs = ctx.addReferenceObj("centEmbs", centEmbs, "double[][]")
    val nrms = ctx.addReferenceObj("centNrms", centNrms, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val best = ctx.freshName("best")
        val bid = ctx.freshName("bid")
        val c = ctx.freshName("c")
        val ce = ctx.freshName("ce")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val cos = ctx.freshName("cos")
        s"""
           |double $best = Double.NEGATIVE_INFINITY;
           |long $bid = -1L;
           |for (int $c = 0; $c < $ids.length; $c++) {
           |  double[] $ce = $embs[$c];
           |  int $n = java.lang.Math.min($a.numElements(), $ce.length);
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $a.getDouble($i) * $ce[$i];
           |  }
           |  double $cos = $s / ($b * $nrms[$c]);
           |  if ($cos > $best) { $best = $cos; $bid = $ids[$c]; }
           |}
           |${ev.value} = $bid;
         """.stripMargin
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object ArgmaxCosine {

  /** Registry builder: `graft_argmax_cos(emb, nrm, ids, embs, nrms)` —
    * the three trailing FOLDABLE array literals are evaluated ONCE
    * here, at plan-build time, into plain JVM arrays; the built
    * expression carries them as constructor state, so no K×dim literal
    * survives into the expression tree.
    */
  val build: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 5, s"graft_argmax_cos expects 5 arguments, got ${exprs.length}")
    require(
      exprs.drop(2).forall(_.foldable),
      "graft_argmax_cos centroid arguments must be literals"
    )
    val ids = exprs(2).eval().asInstanceOf[ArrayData].toLongArray()
    val embsData = exprs(3).eval().asInstanceOf[ArrayData]
    val embs = Array.tabulate(embsData.numElements())(i => embsData.getArray(i).toDoubleArray())
    val nrms = exprs(4).eval().asInstanceOf[ArrayData].toDoubleArray()
    ArgmaxCosine(exprs(0), exprs(1), ids, embs, nrms)
  }
}
