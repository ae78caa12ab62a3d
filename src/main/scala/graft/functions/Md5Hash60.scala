package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 prefix — the repo-wide deterministic-hash primitive
  * (`Sampling.hash60` and every md5-keyed derivation) without the hex
  * string round-trip.
  *
  * The composed form `conv(substring(md5(s), 1, 15), 16, 10).cast("long")`
  * materializes a 32-char hex string, substrings it, re-parses 15 hex
  * digits into a decimal STRING (`conv` returns StringType), and parses
  * that again into a long — four string allocations and two radix parses
  * per row, sitting in the hottest paths of the engine (the Poisson
  * bootstrap's rows×B draws, MinHash per-WORD hashes, negative sampling,
  * count-min rows, deterministic splits).
  *
  * This expression computes the IDENTICAL value directly from the digest
  * bytes: the first 15 hex characters of the lowercase digest are the
  * first 60 bits big-endian, i.e. `(bytes[0..7] as big-endian long) >>> 4`
  * — one md5 over the UTF-8 bytes, zero intermediate strings. Proven
  * equal to the composed form by Md5Hash60Spec (exhaustive over fixture
  * corpora + property strings), so every DuckDB oracle keeps matching
  * bit-for-bit.
  *
  * Null semantics: null in → null out (same as the composed chain).
  * Input: StringType (call sites keep their explicit `.cast("string")`,
  * so numeric keys format exactly as before).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5hash60 expects a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    // Thread-local digest (round-15 ADVICE): expression trees are
    // immutable and may be shared across concurrently executed plans, so
    // a per-INSTANCE MessageDigest could be stepped from two threads at
    // once and corrupt hashes silently. The codegen path already gets
    // per-task state via addMutableState; this mirrors it for the
    // interpreted path.
    val md = Md5Hash60.localMd.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    Md5Hash60.first60(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val digest = ctx.addMutableState("java.security.MessageDigest", "md5h60",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("d")
      s"""
        $digest.reset();
        byte[] $d = $digest.digest($c.getBytes());
        ${ev.value} = graft.functions.Md5Hash60.first60($d);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {

  private[functions] val localMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of the digest, big-endian — the value of
    * `conv(substring(hex, 1, 15), 16, 10)` on the 32-char hex form.
    */
  def first60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** 60-bit md5 prefix of a string column as a non-negative long. */
  def hash60(c: Column): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c)))
}
