package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic fixed-point base-2 logarithm — the exact-integer
  * primitive the perplexity-filtering pipeline scores with
  * (`ext/TextAnalysis.perplexityScore`).
  *
  * `flog2(x)` returns `≈ 2^16 · log2(x)` computed by the classical
  * binary-digit recurrence: normalize x to a 31-bit mantissa in
  * [2^30, 2^31), then 16 rounds of "square the mantissa, emit the
  * overflow bit" with TRUNCATING integer arithmetic at every step.
  * The result is not exactly floor(2^16·log2 x) — each truncation
  * loses a hair — but every engine running the same integer
  * recurrence produces the SAME hair: the DuckDB oracle replays the
  * 16 rounds as nested subqueries and hash-matches bit for bit,
  * which no shared-libm formulation can promise (pow/log last-ulp
  * behavior is libm-specific). Observed error vs true log2 is under
  * 2^-15 across the positive long range (FixedLog2Spec measures it).
  *
  * Monotonicity note: truncation keeps the recurrence monotone
  * NON-STRICT in x (x < y never yields flog2(x) > flog2(y)), which
  * is the property threshold-bucketing actually needs.
  */
object FixedPointMath {
  /** Fractional bits of [[flog2]]'s fixed-point result. */
  val LogFracBits = 16

  /** ≈ 2^16·log2(x) for x ≥ 1 via truncated mantissa squaring;
    * callers guard x ≤ 0 (the expression returns NULL there). */
  def flog2(x: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e <= 30) x << (30 - e) else x >> (e - 30)
    var f = 0L
    var i = 0
    while (i < LogFracBits) {
      m = (m * m) >> 30 // in [2^30, 2^32): mantissa² renormalized
      if (m >= (1L << 31)) { m >>= 1; f = (f << 1) | 1L }
      else f <<= 1
      i += 1
    }
    (e.toLong << LogFracBits) | f
  }
}

/** fixed_log2(x): [[FixedPointMath.flog2]] as a codegen'd native —
  * NULL for x ≤ 0 (log of a non-positive has no value; the scoring
  * pipeline clamps its probabilities to ≥ 1 before calling). */
case class FixedLog2(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_log2"
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (x <= 0L) null else java.lang.Long.valueOf(FixedPointMath.flog2(x))
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c <= 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.FixedPointMath.flog2($c);
         |}
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): FixedLog2 =
    copy(child = c)
}
