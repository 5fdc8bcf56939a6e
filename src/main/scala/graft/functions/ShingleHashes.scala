package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native word-3-gram shingle hashes: for an `array<string>` of tokens,
  * returns the DISTINCT (first-occurrence order) polynomial 3-gram
  * hashes over the tokens' 28-bit md5 ints —
  * `((h(t_i)·8191 + h(t_{i+1})) mod p · 8191 + h(t_{i+2})) mod p`,
  * `h(t)` = first 7 hex chars of md5(t) as an int, p = 2^31−1.
  * Fewer than 3 tokens → empty array.
  *
  * Replaces the interpreted HOF chain
  * `array_distinct(zip_with(zip_with(slice(transform(toks, md5…)…`
  * — five lambda-frame operators per row on the hottest feature stage
  * (every near-dup / LSH / decontamination operator starts here) —
  * with one compiled pass: hash each token once, roll the 3-gram
  * window, dedup into insertion-ordered storage. Values are IDENTICAL
  * to the HOF form and to the DuckDB oracle's `list_distinct`
  * construction (TextQueries/SparkEntry cite the shared formula); all
  * intermediates stay < 2^45.
  */
case class ShingleHashes(child: Expression, positional: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}"
      )
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String =
    if (positional) "graft_shingles_pos" else "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    if (positional) ShingleHashes.computePositional(input.asInstanceOf[ArrayData])
    else ShingleHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (positional) "computePositional" else "compute"
    nullSafeCodeGen(
      ctx,
      ev,
      xs => s"${ev.value} = graft.functions.ShingleHashes.$method($xs);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val P = 2147483647L

  /** One compiled pass: token md5s, rolled 3-grams, insertion-ordered
    * dedup. Called from both the interpreted and the generated path
    * (the generated code stays inside whole-stage codegen; the method
    * call replaces five interpreted lambda frames per row).
    */
  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val th = tokenHashes(xs, n)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - 3) {
      seen.add(((th(i) * 8191 + th(i + 1)) % P * 8191 + th(i + 2)) % P)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Positional variant: one hash PER 3-gram position, duplicates kept,
    * document order preserved — the substring-level dedup signal
    * (cross-doc span detection needs every occurrence, not the set).
    */
  def computePositional(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val th = tokenHashes(xs, n)
    val out = new Array[Long](n - 2)
    var i = 0
    while (i <= n - 3) {
      out(i) = ((th(i) * 8191 + th(i + 1)) % P * 8191 + th(i + 2)) % P
      i += 1
    }
    new GenericArrayData(out)
  }

  // Same construction as Spark's md5() + conv(substr(...,1,7),16,10):
  // lowercase hex of the UTF-8 bytes, first 7 nibbles as an int.
  private def tokenHashes(xs: ArrayData, n: Int): Array[Long] = {
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(xs.getUTF8String(i).getBytes)
      th(i) = java.lang.Long.parseLong(hex.substring(0, 7), 16)
      i += 1
    }
    th
  }
}
