package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonicalization step a multilingual corpus needs
  * before fingerprinting or exact dedup: visually-identical strings with
  * different codepoint sequences ("é" composed vs "e"+U+0301) must hash
  * equal, or every dedup and join keyed on content silently misses them.
  *
  * `java.text.Normalizer` is JDK-built-in (no dependency), and the
  * generated code calls it directly — no UDF serialization, stays inside
  * whole-stage codegen. NFKC additionally folds compatibility forms
  * (ligatures, full-width digits) — the usual choice for LLM text
  * pipelines; NFC preserves compatibility distinctions and matches
  * DuckDB's `nfc_normalize` for the oracle.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_norm form must be NFC/NFD/NFKC/NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_norm requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.valueOf(form)))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = UTF8String.fromString(
         |  java.text.Normalizer.normalize($in.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def nfc(text: Column): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(text), "NFC"))
  def nfkc(text: Column): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(text), "NFKC"))
}
