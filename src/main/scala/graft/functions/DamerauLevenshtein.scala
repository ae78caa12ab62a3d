package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (Lowrance & Wagner 1975)
  * as a native Catalyst expression — [[JaroWinkler]]'s sibling for the
  * blocked-verify step where TYPO classes matter: adjacent transposition
  * ("teh" → "the") costs 1 here but 2 under plain `levenshtein`, so a
  * dedup/linkage threshold of "≤ 2 edits" stops rejecting the single most
  * common human misspelling. Spark ships only `levenshtein`; the
  * custom-`Expression` tier (SURVEY.md §7.2) keeps the DP inside
  * whole-stage codegen — `doGenCode` emits one static call, no UDF
  * boxing, engine-native strict NULL handling.
  *
  * UNRESTRICTED (not OSA): a transposed pair may be edited again — the
  * DP carries the last-seen row per byte value (`da` in the paper), so
  * dl("CA","ABC") = 2 where optimal-string-alignment says 3.
  *
  * Cross-engine contract (verified against DuckDB's
  * `damerau_levenshtein`, which the oracles replay): BYTE-based like the
  * whole DuckDB string-distance family — 'é' vs 'e' is 2 edits over
  * UTF-8 bytes — and unrestricted (DuckDB: dl('CA','ABC') = 2). Output
  * is an exact integer; no float surface at all.
  *
  * Cost: Θ(|a|·|b|) time, Θ(|a|·|b|) ints for the DP block — the
  * verify-step budget: inputs are the SHORT strings (names, titles,
  * tokens) of an LSH/blocking candidate pair, never documents; the
  * quadratic lives per-row inside codegen, embarrassingly parallel.
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.dist(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.DamerauLevenshtein.dist($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Column-facing constructor. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshteinExpr(
      Bridge.expression(a.cast("string")), Bridge.expression(b.cast("string"))))

  /** The static kernel `doGenCode` calls — byte-based unrestricted DL.
    * Standard Lowrance–Wagner DP over a (|a|+2)×(|b|+2) table with the
    * 256-entry last-row dictionary.
    */
  def dist(a: UTF8String, b: UTF8String): Long = {
    val s = a.getBytes; val t = b.getBytes
    val ls = s.length; val lt = t.length
    if (ls == 0) return lt.toLong
    if (lt == 0) return ls.toLong
    val inf = ls + lt
    val w = lt + 2
    // flattened (ls+2) x (lt+2) table; h(i)(j) = h[i*w + j]
    val h = new Array[Int]((ls + 2) * w)
    h(0) = inf
    var i = 0
    while (i <= ls) { h((i + 1) * w) = inf; h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lt) { h(j + 1) = inf; h(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= ls) {
      var db = 0
      j = 1
      while (j <= lt) {
        val k = da(t(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val tra = h(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (tra < best) best = tra
        h((i + 1) * w + j + 1) = best
        j += 1
      }
      da(s(i - 1) & 0xFF) = i
      i += 1
    }
    h((ls + 1) * w + lt + 1).toLong
  }
}
