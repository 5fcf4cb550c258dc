package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native k=8 MinHash signature of a document: one imperative pass over
  * the text producing `array<string>` of the 8 per-seed minima.
  *
  * Why a custom expression: the composable form needs a 4-stage pipeline
  * of higher-order array functions (split → shingle windows → 2 md5
  * transforms → 8 array_min/transform pairs), every one CodegenFallback —
  * interpreted, per-element boxed, and re-evaluated wherever the
  * optimizer inlines an alias. This expression does the whole signature
  * in one tight loop with two MessageDigest updates per shingle.
  *
  * Semantics are IDENTICAL to the staged form (and so to the q22/q123
  * DuckDB oracle):
  *   - tokens = text.split(" ", -1) — same regex-with-limit−1 contract as
  *     Spark's `split(text, " ")`;
  *   - under 3 tokens → NULL (the staged form's re-split guard rejects
  *     exactly the size<3 windows: tokens cannot contain the separator,
  *     so every window of 3 real tokens re-splits to exactly 3);
  *   - shingle i = toks(i)+" "+toks(i+1)+" "+toks(i+2), i ∈ [0, n−3];
  *   - seed s ∈ [0,8): minimum over shingles of the 8-hex-char slice
  *     [8·(s mod 4), 8·(s mod 4)+8) of lowercase-hex
  *     md5((s/4).toString + "|" + shingle) — ASCII compare, same total
  *     order as UTF8String/varchar binary min.
  */
case class MinhashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val n = toks.length
    if (n < 3) return null
    val md = MinhashSig.digests.get()
    val mins = new Array[String](8)
    val hex = new Array[Char](32)
    var i = 0
    while (i <= n - 3) {
      val sh = new java.lang.StringBuilder(
        toks(i).length + toks(i + 1).length + toks(i + 2).length + 2)
      sh.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      val shBytes = sh.toString.getBytes(UTF_8)
      var pfx = 0
      while (pfx < 2) {
        md.reset()
        md.update(if (pfx == 0) MinhashSig.Pfx0 else MinhashSig.Pfx1)
        md.update(shBytes)
        val dig = md.digest()
        var b = 0
        while (b < 16) {
          val v = dig(b) & 0xff
          hex(2 * b) = MinhashSig.HexChars(v >>> 4)
          hex(2 * b + 1) = MinhashSig.HexChars(v & 0xf)
          b += 1
        }
        var s = 0
        while (s < 4) {
          val slice = new String(hex, 8 * s, 8)
          val k = 4 * pfx + s
          if (mins(k) == null || slice.compareTo(mins(k)) < 0) mins(k) = slice
          s += 1
        }
        pfx += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  private val HexChars = "0123456789abcdef".toCharArray
  private val Pfx0 = "0|".getBytes(UTF_8)
  private val Pfx1 = "1|".getBytes(UTF_8)
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val FnName = "graft_minhash_sig"

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(FnName)
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        FnName, exprs => MinhashSig(exprs.head), "built-in")
  }

  /** Signature column; requires [[register]] on the owning session. */
  def of(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, text)
  }
}
