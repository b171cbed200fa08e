package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.CollationSupport
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) implementations of the portable md5-derived text
  * hashes in [[graft.pipeline.Dedup]] / [[graft.pipeline.TextFns]].
  *
  * The Column-expression forms compose `aggregate`/`transform`/
  * `zip_with` higher-order functions, which Catalyst evaluates
  * INTERPRETED per array element — for SimHash that is 64 lanes × one
  * `conv(substr(md5))` tree per token per document. These expressions
  * compute the identical values (bit-for-bit, verified by
  * TextHashNativeSpec against the Column forms and by the DuckDB
  * oracle gate) in one tight JVM loop per row; codegen emits a single
  * static call, so the surrounding projection stays in whole-stage
  * codegen. Measured ~10× on the p_simhash fingerprint stage at sf0.1.
  *
  * Semantics mirrored exactly:
  *  - lowercase via UTF8String.toLowerCase (what Spark's `lower` does)
  *  - tokens = split "[^a-z0-9]+", empties dropped
  *  - normalization for grams = "\\s+"→" " then trim of ' ' only
  *    (Spark's `trim` strips 0x20, NOT Java's <=0x20)
  *  - gram windows count CODE POINTS (Spark substring semantics)
  */
object TextHash {
  private val ws = Pattern.compile(graft.pipeline.TextFns.WsRe)
  private val nonAlnum = Pattern.compile("[^a-z0-9]+")
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** useICU mirrors spark.sql.icu.caseMappings.enabled (default true
    * in Spark 4). The ICU and JVM mappings disagree on conditional
    * rules — e.g. Σ before ',' is σ under ICU simple mapping but final
    * ς under the JVM path — found by the randomized native-vs-Column
    * equivalence property. Resolved ONCE at expression construction
    * (plan time, on the driver, where the session conf is in scope)
    * and baked into each expression — exactly how Spark fixes a conf
    * for a compiled plan. The old shape read SQLConf.get per ROW in
    * the hot hash path and swallowed any error into a guess of the
    * default, which silently diverged from lower() when the conf
    * wasn't visible where the catch fired.
    */
  private[functions] def resolveUseICU(): Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConf(org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  /** EXACTLY what Spark's `lower()` does under the default UTF8_BINARY
    * collation: `CollationSupport.Lower.exec(s, UTF8_BINARY, useICU)`.
    */
  private[functions] def sparkLower(s: UTF8String,
      useICU: Boolean): UTF8String =
    CollationSupport.Lower.exec(s,
      org.apache.spark.sql.catalyst.util.CollationFactory
        .UTF8_BINARY_COLLATION_ID, useICU)

  private[functions] def digest(): MessageDigest = mdLocal.get()

  /** Lowercased alnum tokens (split "[^a-z0-9]+", empties dropped) —
    * Dedup.tokens.
    */
  private[functions] def tokensOf(text: UTF8String,
      useICU: Boolean): Array[String] = {
    val raw = nonAlnum.split(sparkLower(text, useICU).toString)
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == raw.length) raw
    else {
      val out = new Array[String](n)
      var j = 0
      i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** Lowercase hex encoding of a 16-byte digest. */
  private[functions] def hex(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((digest(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = hexDigits(digest(i) & 0xF).toByte
      i += 1
    }
    out
  }

  /** `trim(regexp_replace(lower(s), "\\s+", " "))` — Dedup.normalize. */
  def normalize(s: UTF8String, useICU: Boolean): String = {
    val collapsed = ws.matcher(sparkLower(s, useICU).toString).replaceAll(" ")
    var from = 0
    var to = collapsed.length
    while (from < to && collapsed.charAt(from) == ' ') from += 1
    while (to > from && collapsed.charAt(to - 1) == ' ') to -= 1
    collapsed.substring(from, to)
  }

  /** Portable SimHash fingerprint as a 64-char '0'/'1' string: token-
    * hash bit b is bit (b%4) of hex digit (b/4) of md5(token), LSB
    * first within each digit (Dedup.simhashMd5).
    */
  def simhashMd5(text: UTF8String, useICU: Boolean): UTF8String = {
    val md = mdLocal.get()
    val sums = new Array[Int](64)
    val toks = nonAlnum.split(sparkLower(text, useICU).toString)
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.nonEmpty) {
        md.reset()
        val digest = md.digest(t.getBytes("UTF-8"))
        // first 16 hex digits = first 8 bytes; digit 2i is the high
        // nibble of byte i, digit 2i+1 the low nibble
        var i = 0
        while (i < 8) {
          val b = digest(i)
          val hi = (b >> 4) & 0xF
          val lo = b & 0xF
          var k = 0
          while (k < 4) {
            sums(8 * i + k) += (if (((hi >> k) & 1) == 1) 1 else -1)
            sums(8 * i + 4 + k) += (if (((lo >> k) & 1) == 1) 1 else -1)
            k += 1
          }
          i += 1
        }
      }
      ti += 1
    }
    val out = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      out(b) = if (sums(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Lexicographic-min md5 (hex) over all `gram`-code-point windows of
    * the normalized text (TextFns.fingerprintMd5). Hex strings order
    * exactly as the unsigned digest bytes, so the min is tracked on
    * raw digests and encoded once.
    */
  def fingerprintMd5(text: UTF8String, gram: Int,
      useICU: Boolean): UTF8String = {
    val md = mdLocal.get()
    val norm = normalize(text, useICU)
    val cps = norm.codePoints().toArray
    var minDigest: Array[Byte] = null
    if (cps.length < gram) {
      md.reset()
      minDigest = md.digest(norm.getBytes("UTF-8"))
    } else {
      val sb = new java.lang.StringBuilder(gram * 2)
      var start = 0
      while (start + gram <= cps.length) {
        sb.setLength(0)
        var j = 0
        while (j < gram) { sb.appendCodePoint(cps(start + j)); j += 1 }
        md.reset()
        val d = md.digest(sb.toString.getBytes("UTF-8"))
        if (minDigest == null || unsignedLess(d, minDigest)) minDigest = d
        start += 1
      }
    }
    UTF8String.fromBytes(hex(minDigest))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Count of differing positions between two equal-length ASCII bit
    * strings (Dedup.hammingBits).
    */
  def hammingBits(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var d = 0
    var i = 0
    while (i < n) { if (ab(i) != bb(i)) d += 1; i += 1 }
    d
  }
}

/** `simhashMd5(text)` as a single codegen'd call. useICU is resolved
  * from the session conf at construction (plan time) — see
  * TextHash.resolveUseICU.
  */
case class SimhashMd5(child: Expression,
    useICU: Boolean = TextHash.resolveUseICU()) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.simhashMd5($c, $useICU)")
  override def nullSafeEval(v: Any): Any =
    TextHash.simhashMd5(v.asInstanceOf[UTF8String], useICU)
  override protected def withNewChildInternal(c: Expression): SimhashMd5 =
    copy(child = c)
}

object SimhashMd5 {
  def apply(text: Column): Column =
    ColumnGlue.column(SimhashMd5(ColumnGlue.expression(text)))
}

/** `fingerprintMd5(text, gram)` as a single codegen'd call. */
case class FingerprintMd5(child: Expression, gram: Int,
    useICU: Boolean = TextHash.resolveUseICU())
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.fingerprintMd5($c, $gram, $useICU)")
  override def nullSafeEval(v: Any): Any =
    TextHash.fingerprintMd5(v.asInstanceOf[UTF8String], gram, useICU)
  override protected def withNewChildInternal(c: Expression)
      : FingerprintMd5 = copy(child = c)
}

object FingerprintMd5 {
  def apply(text: Column, gram: Int): Column =
    ColumnGlue.column(FingerprintMd5(ColumnGlue.expression(text), gram))
}

/** Hamming distance of two bit-string fingerprints, one codegen'd call. */
case class HammingBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.hammingBits($a, $b)")
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.hammingBits(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): HammingBits = copy(l, r)
}

object HammingBits {
  def apply(a: Column, b: Column): Column =
    ColumnGlue.column(HammingBits(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
}
