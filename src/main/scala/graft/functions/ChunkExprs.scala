package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.unsafe.types.UTF8String

/** Row-local chunk metadata WITHOUT materializing chunk text.
  *
  * `TextFns.chunks` builds `array<struct<idx, chunk, n_tokens>>` — a
  * full copy of the document (plus the overlap) as chunk strings, each
  * then md5'd by the gate. Under a full-evaluation sink that copy +
  * hash chain was 17 s at sf0.1 (p_chunks); at 100 TB it writes the
  * corpus a second time just to hash it. When the consumer only needs
  * the hash or the token count (pin chunk boundaries, pack windows),
  * these expressions compute the SAME values in one pass over the
  * text bytes:
  *
  *  - [[ChunkHashes]] → `array<struct<idx, n_tokens, chunk_hash>>`,
  *    `chunk_hash` = md5 hex of exactly the string
  *    `concat_ws(" ", slice(tokens, start, size))` — the digest is fed
  *    token-slice bytes + a space separator incrementally, so the
  *    chunk string never exists (UTF-8 concatenation is byte
  *    concatenation, so the digests are identical).
  *  - [[ChunkSizes]] → `array<struct<idx, n_tokens>>` for packing.
  *
  * Tokenization matches `TextFns.chunks` exactly: split on runs of
  * Java-regex `\s` (the six ASCII whitespace chars — safe to scan
  * bytewise, UTF-8 continuation bytes are ≥ 0x80), empties dropped.
  */
object ChunkNative {
  private val hexDigits = "0123456789abcdef".toCharArray
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' ||
      b == '\r'

  /** Token [start, end) byte offsets; returns (starts, ends, count). */
  private def tokenBounds(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        val s = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        if (n == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(n) = s; ends(n) = i; n += 1
      }
    }
    (starts, ends, n)
  }

  /** Same window arithmetic as TextFns.chunks: starts 0, step, 2·step,
    * …; at least one window (an empty document yields one empty
    * chunk — hash of "").
    */
  private def lastStart(n: Int, size: Int, step: Int): Int =
    math.max(math.ceil((n - size).toDouble / step).toInt, 0)

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  def chunkHashes(text: UTF8String, size: Int, overlap: Int): GenericArrayData = {
    val bytes = text.getBytes
    val (starts, ends, n) = tokenBounds(bytes)
    val step = size - overlap
    val last = lastStart(n, size, step)
    val out = new Array[Any](last + 1)
    var w = 0
    while (w <= last) {
      val s = w * step
      val e = math.min(s + size, n)
      val md = mdLocal.get()
      md.reset()
      var i = s
      while (i < e) {
        if (i > s) md.update(' '.toByte)
        md.update(bytes, starts(i), ends(i) - starts(i))
        i += 1
      }
      out(w) = InternalRow(w.toLong, (e - s).toLong, hex(md.digest()))
      w += 1
    }
    new GenericArrayData(out)
  }

  def chunkSizes(text: UTF8String, size: Int, overlap: Int): GenericArrayData = {
    val bytes = text.getBytes
    val (_, _, n) = tokenBounds(bytes)
    val step = size - overlap
    val last = lastStart(n, size, step)
    val out = new Array[Any](last + 1)
    var w = 0
    while (w <= last) {
      val s = w * step
      val e = math.min(s + size, n)
      out(w) = InternalRow(w.toLong, (e - s).toLong)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** `chunkHashes(text, size, overlap)` →
  * array<struct<idx:long, n_tokens:long, chunk_hash:string>>.
  */
case class ChunkHashes(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression {
  require(size > 0 && overlap >= 0 && overlap < size,
    s"need 0 <= overlap < size, got size=$size overlap=$overlap")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", LongType, false),
    StructField("n_tokens", LongType, false),
    StructField("chunk_hash", StringType, false))), false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ChunkNative.chunkHashes($c, $size, $overlap)")
  override def nullSafeEval(v: Any): Any =
    ChunkNative.chunkHashes(v.asInstanceOf[UTF8String], size, overlap)
  override protected def withNewChildInternal(c: Expression): ChunkHashes =
    copy(child = c)
}

object ChunkHashes {
  def apply(text: Column, size: Int, overlap: Int): Column =
    ColumnGlue.column(ChunkHashes(ColumnGlue.expression(text), size, overlap))
}

/** `chunkSizes(text, size, overlap)` →
  * array<struct<idx:long, n_tokens:long>>.
  */
case class ChunkSizes(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression {
  require(size > 0 && overlap >= 0 && overlap < size,
    s"need 0 <= overlap < size, got size=$size overlap=$overlap")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", LongType, false),
    StructField("n_tokens", LongType, false))), false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ChunkNative.chunkSizes($c, $size, $overlap)")
  override def nullSafeEval(v: Any): Any =
    ChunkNative.chunkSizes(v.asInstanceOf[UTF8String], size, overlap)
  override protected def withNewChildInternal(c: Expression): ChunkSizes =
    copy(child = c)
}

object ChunkSizes {
  def apply(text: Column, size: Int, overlap: Int): Column =
    ColumnGlue.column(ChunkSizes(ColumnGlue.expression(text), size, overlap))
}

/** `SentenceChunks(sentences, budget)` → array<int>: greedy
  * sentence-preserving chunk assignment — consecutive sentences pack
  * into a chunk until adding the next one would push its whitespace
  * token count past `budget`; a chunk always takes at least one
  * sentence, so an over-budget sentence gets its own chunk rather
  * than being split (the sentence-aware alternative to the
  * fixed-token-window [[ChunkNative]] family — boundaries land on
  * sentence ends, the property RAG/pretraining chunkers want).
  * Greedy next-fit is non-associative, but it runs per ROW (per
  * document), so it stays a scan-local projection at any corpus
  * scale; only document length bounds the state.
  */
case class SentenceChunks(child: Expression, budget: Int)
    extends UnaryExpression {
  require(budget > 0, s"budget must be positive, got $budget")
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SentenceChunks.assign($c, $budget)")
  override def nullSafeEval(v: Any): Any =
    SentenceChunks.assign(v.asInstanceOf[ArrayData], budget)
  override protected def withNewChildInternal(c: Expression)
      : SentenceChunks = copy(child = c)
}

object SentenceChunks {
  def apply(sentences: Column, budget: Int): Column =
    ColumnGlue.column(SentenceChunks(
      ColumnGlue.expression(sentences), budget))

  // the RE2 \s set ({\t \n \f \r ' '}) — NOT Character.isWhitespace:
  // the oracle replays token counts with DuckDB's str_split_regex,
  // and Unicode-only whitespace (U+2028, U+001C–1F) would flip chunk
  // boundaries cross-engine. (Java's \s additionally matches \x0B —
  // RE2's is the narrower set, so it is the portable contract.)
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  private def tokens(s: UTF8String): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    var inTok = false
    while (i < str.length) {
      val ws = isWs(str.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  def assign(sentences: ArrayData, budget: Int): ArrayData = {
    val n = sentences.numElements()
    val out = new Array[Any](n)
    var chunk = 0
    var curTok = 0
    var curCount = 0
    var i = 0
    while (i < n) {
      val t = tokens(sentences.getUTF8String(i))
      if (curCount > 0 && curTok + t > budget) {
        chunk += 1; curTok = 0; curCount = 0
      }
      out(i) = chunk
      curTok += t
      curCount += 1
      i += 1
    }
    new GenericArrayData(out)
  }
}
