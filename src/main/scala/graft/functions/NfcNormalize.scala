package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, codegen'd expression —
  * canonical composition ("Cafe" + COMBINING ACUTE → "Café") so that
  * visually-identical text hashes identically through the dedup
  * pipeline (exact dedup, fingerprints, shingle ids all operate on
  * bytes; a corpus mixing NFC and NFD sources under-deduplicates
  * without this). Spark has no built-in normalizer; DuckDB's
  * `nfc_normalize` is the oracle counterpart.
  *
  * The hot path is allocation-free: text already in NFC (the
  * overwhelming case — and all-ASCII trivially so) is detected with
  * `Normalizer.isNormalized` and returned as-is, so the scan-speed
  * cost on clean corpora is one quick-check pass per row.
  */
object NfcNormalize {
  /** Static entry point for generated code (object without companion
    * class → static forwarder). */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}

/** nfc_normalize(text): canonical-composition (NFC) form of `text`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkString(child, prettyName)
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
