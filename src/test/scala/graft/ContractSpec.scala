package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the correctness gate only checks
  * queries that have BOTH a `queries` entry and an `oracleSql` entry —
  * a missing oracle silently downgrades a query to a weaker
  * rows-only check, so the contract itself is worth a test.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracle SQL entries: ${(o -- q).toSeq.sorted}")
  }

  test("query names are well-formed and numbers are unique") {
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = SparkEntry.queries.keySet.toSeq.map {
      case pat(n) => n.toInt
      case bad    => fail(s"malformed query name: $bad")
    }
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
    assert(nums.min == 1 && nums.max == nums.size, s"numbering has gaps: 1..${nums.max} vs ${nums.size} queries")
  }

  test("oracle SQL never references tables outside the testdata set") {
    val tables = Set(
      "region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings"
    )
    // every FROM/JOIN target must be a known table or a CTE defined in
    // the same statement; the negative lookahead skips the FROM inside
    // EXTRACT(x FROM col) / SUBSTRING(s FROM n) / TRIM(... FROM s),
    // whose operand is immediately followed by ')' or an argument
    // \b blocks backtracking from shortening the identifier to dodge
    // the lookahead
    val fromPat = "(?i)(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*)\\b(?!\\s*[,)])".r
    // with or without a column list: `name AS (` / `name(a, b) AS (`,
    // and with DuckDB's inlining hint: `name AS [NOT] MATERIALIZED (`
    val ctePat =
      "(?i)([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:(?:NOT\\s+)?MATERIALIZED\\s*)?\\(".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      val ctes = ctePat.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromPat.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- ctes -- tables
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
