package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy dedup operators.
  *
  * The builtin-HOF formulations (see [[graft.dedup.Dedup]] scaladoc) are
  * correct but allocate a 64-slot array per token (simhash) or k-slot array
  * per shingle (minhash) inside `aggregate`/`zip_with` — measured ~6s per
  * 5000-doc pass. These expressions compute the same values imperatively in
  * one pass over the bytes, preserving bit-for-bit parity with the HOF
  * versions (same xxhash64 seed chaining as the builtin `xxhash64(...)`).
  *
  * CodegenFallback is acceptable here: the per-row work (hundreds of hash
  * calls) dwarfs the virtual-call overhead, and the expression sits in a
  * projection, not a join/filter hot path.
  */
object TextHashExpressions {

  private val Seed = 42L // builtin xxhash64's fixed seed

  /** Whitespace tokens of a UTF8String, matching Spark's
    * split(trim(c), "\\s+") EXACTLY: Spark's trim strips only ASCII space
    * (0x20, not \n/\t — UTF8String.trim), and Spark's split keeps trailing
    * empty strings (limit -1), so "hello\n" must yield ["hello", ""]. */
  private[expressions] def tokenize(s: UTF8String): Array[String] =
    s.trim().toString.split("\\s+", -1)

  /** The [[SimHash64]] kernel, callable from generated code (top-level
    * objects get Java static forwarders, so codegen emits one static
    * call and the whole projection stays inside whole-stage codegen). */
  def simhashCompute(input: UTF8String): Long = {
    val toks = tokenize(input)
    val counts = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks(ti)), StringType, Seed)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      ti += 1
    }
    val n = toks.length
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 64-bit SimHash, identical to Dedup's HOF formulation: per token
    * h = xxhash64(token); bit i of the result set iff the majority of
    * token-hashes have bit i set. Codegen'd (round-4 verdict #3): the
    * generated code is one static call into [[simhashCompute]] — the
    * per-row cost is the hash loop either way, but the expression no
    * longer breaks the whole-stage-codegen span it sits in. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simhashCompute(input.asInstanceOf[UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.expressions.TextHashExpressions.simhashCompute($c)")

    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** Per-thread MD5 instance: MessageDigest is stateful and not
    * thread-safe, and an Expression instance can be shared across tasks. */
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The oracle-portable 60-bit token hash: first 15 md5-hex chars as a
    * long, i.e. the big-endian first 60 bits of the digest —
    * `longBE(bytes 0..7) >>> 4` equals `parseLong(hexString.take(15), 16)`
    * (14 full hex chars from bytes 0..6 plus the high nibble of byte 7).
    * Bit-parity with Dedup.portableHash (conv/substring/md5 builtins) is
    * spec'd. */
  private[expressions] def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = Md5.get().digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Oracle-portable SimHash over the low `bits` (<= 60) of
    * [[md5Prefix60]] token hashes: the [[SimHash64]] majority vote in the
    * md5 family — bit-identical to the builtin-HOF formulation in
    * Dedup.portableSimhashHof (spec'd), ~40x its throughput (the HOF form
    * allocates a bits-slot array per token). Width 48 is the historical
    * gate form (q32/q44/q94); 60 uses the full md5 prefix (q96). */
  case class PortableSimHash48(child: Expression, bits: Int = 48)
      extends UnaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 60, s"bits must be in (0, 60], got $bits")
    override def dataType: DataType = LongType
    override def prettyName: String = s"portable_simhash$bits"

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      val counts = new Array[Int](bits)
      var ti = 0
      while (ti < toks.length) {
        val h = md5Prefix60(
          toks(ti).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < bits) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        ti += 1
      }
      val n = toks.length
      var out = 0L
      var b = 0
      while (b < bits) {
        if (counts(b) * 2 > n) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): PortableSimHash48 =
      copy(child = c)
  }

  /** k MinHash values over a shingle array, identical to the HOF version:
    * slot i holds min over shingles of xxhash64(i, shingle) — the builtin's
    * left-fold seed chaining hash(s, hash(i, 42)). */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    // per-slot seed: xxhash64's fold state after hashing the int i
    private lazy val slotSeeds: Array[Long] =
      Array.tabulate(k)(i => XxHash64Function.hash(i, IntegerType, Seed))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var si = 0
      val n = arr.numElements()
      while (si < n) {
        val s = arr.getUTF8String(si)
        if (s != null) {
          var i = 0
          while (i < k) {
            val h = XxHash64Function.hash(s, StringType, slotSeeds(i))
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        si += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  }

  /** Rolling-hash content-defined chunking (CDC) — the
    * rsync/LBFS/winnowing family: a Buzhash (cyclic-polynomial rolling
    * hash) slides a `window`-byte window over the document's bytes; a
    * position is a chunk boundary when the low `maskBits` bits of the
    * rolling hash are zero (expected chunk length 2^maskBits), clamped to
    * [minChunk, maxChunk]. Each chunk's bytes are fingerprinted with the
    * builtin-seed xxhash64. Because boundaries depend only on LOCAL window
    * content, an insertion near the front re-chunks only up to the first
    * boundary after the edit — every later chunk hash is unchanged
    * (suffix stability, property-tested). That is what makes chunk
    * fingerprints usable for partial-duplicate and delta detection at
    * corpus scale, where a byte-offset-based chunking would shift every
    * chunk after any edit.
    *
    * Deterministic: the 256-entry byte-mix table is xxhash64-derived, no
    * RNG. Null/empty text → empty array. */
  // deterministic per-byte mix table (Buzhash "T") — shared by the chunk
  // expressions so hash- and text-emitting variants cannot drift
  private lazy val BuzT: Array[Long] =
    Array.tabulate(256)(i => XxHash64Function.hash(i, IntegerType, Seed))
  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  /** The single Buzhash boundary walk behind [[RollingChunks]] and
    * [[RollingChunkTexts]]: exclusive END offsets of each chunk (the last
    * end equals `bytes.length`; empty input → empty array). */
  private[expressions] def chunkEnds(bytes: Array[Byte], window: Int,
      maskBits: Int, minChunk: Int, maxChunk: Int): Array[Int] = {
    val n = bytes.length
    if (n == 0) return Array.emptyIntArray
    val mask: Long = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val in = BuzT(bytes(i) & 0xff)
      h = rotl(h, 1) ^ in
      if (i - start >= window) h ^= rotl(BuzT(bytes(i - window) & 0xff), window)
      val len = i - start + 1
      if ((len >= minChunk && (h & mask) == 0L) || len >= maxChunk || i == n - 1) {
        out += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    out.toArray
  }

  case class RollingChunks(
      child: Expression, window: Int = 16, maskBits: Int = 6,
      minChunk: Int = 16, maxChunk: Int = 256)
      extends UnaryExpression with CodegenFallback {
    require(window > 0 && maskBits >= 0 && minChunk >= window && maxChunk > minChunk,
      s"bad CDC parameters: window=$window maskBits=$maskBits min=$minChunk max=$maxChunk")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "rolling_chunks"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(Array.empty[Any])
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val ends = chunkEnds(bytes, window, maskBits, minChunk, maxChunk)
      val out = new Array[Any](ends.length)
      var start = 0
      var ci = 0
      while (ci < ends.length) {
        out(ci) = XxHash64Function.hash(
          UTF8String.fromBytes(bytes, start, ends(ci) - start), StringType, Seed)
        start = ends(ci)
        ci += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): RollingChunks = copy(child = c)
  }

  /** The chunk TEXTS for the same boundary walk as [[RollingChunks]] —
    * the audit/gate companion: `concat(texts) == document` and per-chunk
    * length bounds become externally checkable booleans (q69), and
    * `xxhash64(texts[i]) == rollingChunks(...)[i]` ties the production
    * hash emission to the text it claims to fingerprint. Chunk boundaries
    * are byte offsets, so a chunk may start/end mid-codepoint; UTF8String
    * concat is byte-level, so reconstruction is still exact. */
  case class RollingChunkTexts(
      child: Expression, window: Int = 16, maskBits: Int = 6,
      minChunk: Int = 16, maxChunk: Int = 256)
      extends UnaryExpression with CodegenFallback {
    require(window > 0 && maskBits >= 0 && minChunk >= window && maxChunk > minChunk,
      s"bad CDC parameters: window=$window maskBits=$maskBits min=$minChunk max=$maxChunk")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "rolling_chunk_texts"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(Array.empty[Any])
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val ends = chunkEnds(bytes, window, maskBits, minChunk, maxChunk)
      val out = new Array[Any](ends.length)
      var start = 0
      var ci = 0
      while (ci < ends.length) {
        out(ci) = UTF8String.fromBytes(bytes, start, ends(ci) - start)
        start = ends(ci)
        ci += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): RollingChunkTexts = copy(child = c)
  }

  /** Fused text → word-shingle array: tokenize once, emit the n-token
    * windows as `" "`-joined strings. Bit-identical to the HOF pipeline
    * `transform(sequence(0, size(toks)-n), i -> concat_ws(" ", slice(toks,
    * i+1, n)))` INCLUDING its null arm — the HOF's `when(...).otherwise(
    * array())` maps null text to an empty array, so this expression is
    * non-nullable and does the same. The HOF builds every shingle through
    * generic array machinery (one transform lambda frame + slice copy +
    * concat_ws pass per shingle); this walks the token array once. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "word_shingles"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(Array.empty[Any])
      val toks = tokenize(v.asInstanceOf[UTF8String])
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder
      var start = 0
      while (start < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(start + j))
          j += 1
        }
        out(start) = UTF8String.fromString(sb.toString)
        start += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  /** Fused text → k MinHash values: tokenize, slide the n-token shingle
    * window, hash each shingle into every slot — one pass, ZERO
    * materialised shingle array. Bit-identical to
    * `MinHashSignature(wordShingles(text, n), k)` (property-tested): the
    * shingle string is the same `" "`-joined token run, the hash the same
    * per-slot seed chain; <n tokens — or null text, which the HOF
    * wordShingles maps to an empty array — yields the all-MaxValue
    * signature like the HOF's empty-array arm (hence non-nullable). Cuts
    * the dominant per-byte cost of LSH dedup (the codegen'd HOF pipeline
    * builds ~|tokens| shingle strings through transform/slice/concat_ws
    * allocation machinery first).
    */
  case class MinHashShingled(child: Expression, n: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "minhash_shingled"

    private lazy val slotSeeds: Array[Long] =
      Array.tabulate(k)(i => XxHash64Function.hash(i, IntegerType, Seed))

    /** Null-tolerant kernel (null text ≡ the HOF empty-shingle arm → the
      * all-MaxValue signature); public so generated code can call it via
      * a reference object — codegen'd per round-4 verdict #3. */
    def computeSig(input: UTF8String): ArrayData = {
      val sig = Array.fill(k)(Long.MaxValue)
      if (input != null) {
        val toks = tokenize(input)
        if (toks.length >= n) {
          val sb = new java.lang.StringBuilder
          var start = 0
          val last = toks.length - n
          while (start <= last) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(start + j))
              j += 1
            }
            val s = UTF8String.fromString(sb.toString)
            var i = 0
            while (i < k) {
              val h = XxHash64Function.hash(s, StringType, slotSeeds(i))
              if (h < sig(i)) sig(i) = h
              i += 1
            }
            start += 1
          }
        }
      }
      new GenericArrayData(sig)
    }

    override def eval(input: InternalRow): Any =
      computeSig(child.eval(input).asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashShingled", this, classOf[MinHashShingled].getName)
      val childGen = child.genCode(ctx)
      val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .javaType(dataType)
      ev.copy(
        code = code"""
          ${childGen.code}
          $javaType ${ev.value} = $ref.computeSig(
            ${childGen.isNull} ? null : ${childGen.value});
        """,
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression): MinHashShingled = copy(child = c)
  }

  // Column wrappers (classic-API bridge between Column and Expression)
  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
  def simhash64(c: Column): Column = toColumn(SimHash64(toExpr(c)))
  def portableSimhash48(c: Column): Column = toColumn(PortableSimHash48(toExpr(c)))
  def portableSimhash(c: Column, bits: Int): Column =
    toColumn(PortableSimHash48(toExpr(c), bits))
  def minhashSignature(shingles: Column, k: Int): Column =
    toColumn(MinHashSignature(toExpr(shingles), k))
  def minhashShingled(text: Column, n: Int, k: Int): Column =
    toColumn(MinHashShingled(toExpr(text), n, k))
  def wordShingles(text: Column, n: Int): Column =
    toColumn(WordShingles(toExpr(text), n))
  def rollingChunks(text: Column, window: Int = 16, maskBits: Int = 6,
      minChunk: Int = 16, maxChunk: Int = 256): Column =
    toColumn(RollingChunks(toExpr(text), window, maskBits, minChunk, maxChunk))
  def rollingChunkTexts(text: Column, window: Int = 16, maskBits: Int = 6,
      minChunk: Int = 16, maxChunk: Int = 256): Column =
    toColumn(RollingChunkTexts(toExpr(text), window, maskBits, minChunk, maxChunk))
}
