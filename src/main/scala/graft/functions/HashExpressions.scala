package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass hash expressions for the dedup operators.
  *
  * Both produce BIT-IDENTICAL results to their `functions._` HOF
  * equivalents (see TextFunctions) but hash each string ONCE:
  * Spark's `xxhash64(s, i)` is defined as
  * `hashInt(i, seed = hashUnsafeBytes(s, seed = 42))`, so the k per-seed
  * lanes derive from one string digest. The HOF forms re-hash the
  * string per lane — k× the work plus per-element interpretation
  * overhead; these expressions took the sf0.1 MinHash stage from 82 s
  * to the cost of one tokenization pass.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.minHashSig(input.asInstanceOf[ArrayData], k)

  // shared-kernel codegen (see NgramJoin): the shingle/tokenizer child
  // stays inside WholeStageCodegen; eval and codegen run the SAME method
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.minHashSig($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array, one string hash per token. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash with md5-derived token hashes — the ORACLE-portable
  * SimHash variant (q57): h(token) = first 4 md5 bytes big-endian,
  * which any engine can reproduce from the md5 hex string
  * (`(h div 2^b) mod 2` = bit b). Value-identical to the q57 HOF/SQL
  * formulation but one compiled pass per row instead of a 32-lane
  * interpreted fold (7.0 s → sub-second at sf0.1).
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.simHashMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.simHashMd5($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash with md5-derived token hashes — the ORACLE-portable
  * wide variant (q23): h(token) = first 8 md5 bytes big-endian (the
  * full first 16 hex nibbles), so any engine with md5 + exact integer
  * arithmetic can replicate every bit; DuckDB does it in HUGEINT and
  * maps the top bit back to the signed-64 two's-complement value.
  * Same single-compiled-pass shape as [[SimHashMd5]]; [[SimHash64]]
  * (xxhash64) remains the non-oracle throughput path.
  */
case class SimHashMd5Wide(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5_64"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.simHashMd5Wide(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.simHashMd5Wide($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection cardinality of two SORTED string arrays by linear
  * merge — no per-call hash set, no result array. Callers pre-sort once
  * per document (`array_sort`), turning a pair-verify join's dominant
  * cost into a cache-friendly scan. Equal to
  * `size(array_intersect(a, b))` for sorted distinct inputs.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashExpressionsInternal.sortedIntersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // the pair-verify join's inner kernel: keep the join projection in
  // WholeStageCodegen, call the shared merge loop once per pair
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = " +
        s"graft.functions.HashExpressionsInternal.sortedIntersectSize($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles from a token array in one pass —
  * value-identical to the `transform(sequence)+slice+concat_ws+
  * array_distinct` HOF form (single-space joins, first-occurrence
  * order) without per-shingle slice allocations. Short inputs yield an
  * empty array.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.wordNGrams(input.asInstanceOf[ArrayData], n)

  // shared-kernel codegen (see NgramJoin): the shingle build is q21's
  // map stage — the tokenizer child stays inside WholeStageCodegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.wordNGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POSITIONAL word n-grams (space-joined, duplicates kept) in one
  * compiled pass — value-identical to the `transform(sequence) +
  * slice + array_join` HOF form; shorter-than-n inputs yield empty.
  * The repetition-rule kernel (q73): per-position grams feed within-
  * document duplicate counting, so first-occurrence dedup (WordNGrams)
  * would be wrong here.
  */
case class NgramJoin(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "ngram_join"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.ngramJoin(input.asInstanceOf[ArrayData], n)

  // Call the shared kernel from generated code: the child (typically a
  // split() over the document) stays inside WholeStageCodegen instead
  // of being re-evaluated interpreted, and the kernel is the SAME
  // method eval uses — bit-identical by construction.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.ngramJoin($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared n-gram kernels, called from both interpreted eval and
  * generated code (public object: codegen'd classes live outside this
  * package).
  */
object HashExpressionsInternal {
  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  private val hexDigits = "0123456789abcdef".toCharArray

  /** k-lane xxhash64 MinHash signature; one string digest per token. */
  def minHashSig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, h1)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit xxhash64 SimHash; one string hash per token. */
  def simHash64(arr: ArrayData): Long = {
    val tally = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 63
    while (b >= 0) {
      acc = (acc << 1) | (if (tally(b) > 0) 1L else 0L)
      b -= 1
    }
    acc
  }

  /** 32-bit SimHash with md5-derived token hashes (oracle-portable). */
  def simHashMd5(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val tally = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 8 hex nibbles = first 4 bytes, big-endian, unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 31
    while (b >= 0) {
      acc = (acc << 1) | (if (tally(b) > 0) 1L else 0L)
      b -= 1
    }
    acc
  }

  /** 64-bit SimHash with md5-derived token hashes (oracle-portable,
    * wide variant): h(token) = first 8 digest bytes big-endian. */
  def simHashMd5Wide(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val tally = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 63
    while (b >= 0) {
      acc = (acc << 1) | (if (tally(b) > 0) 1L else 0L)
      b -= 1
    }
    acc
  }

  /** Linear-merge intersection cardinality of two sorted string arrays. */
  def sortedIntersectSize(x: ArrayData, y: ArrayData): Int = {
    var i = 0
    var j = 0
    var n = 0
    val nx = x.numElements()
    val ny = y.numElements()
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** DISTINCT space-joined n-grams, first-occurrence order (shingles);
    * shorter-than-n inputs → empty. */
  def wordNGrams(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= total - n) {
      var s = toks.getUTF8String(i)
      var j = 1
      while (j < n) {
        s = org.apache.spark.unsafe.types.UTF8String
          .concat(s, space, toks.getUTF8String(i + j))
        j += 1
      }
      seen.add(s)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Positional space-joined n-grams; shorter-than-n inputs → empty. */
  def ngramJoin(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total - n + 1)
    var i = 0
    while (i <= total - n) {
      out(i) = joinGram(toks, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional lowercase-hex md5 fingerprints of space-joined n-grams. */
  def ngramMd5(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](total - n + 1)
    var i = 0
    while (i <= total - n) {
      val s = joinGram(toks, i, n)
      md.reset()
      val d = md.digest(s.getBytes)
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-join of tokens [i, i+n) with `array_join` null semantics:
    * null elements are skipped (no doubled separator) — exact HOF
    * parity for the slice+array_join reference forms.
    */
  def joinGram(toks: ArrayData, i: Int, n: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    var s: org.apache.spark.unsafe.types.UTF8String = null
    var j = 0
    while (j < n) {
      if (!toks.isNullAt(i + j)) {
        val t = toks.getUTF8String(i + j)
        s = if (s == null) t
        else org.apache.spark.unsafe.types.UTF8String.concat(s, space, t)
      }
      j += 1
    }
    if (s == null) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 else s
  }
}

/** POSITIONAL md5 fingerprints of word n-grams from a token array in
  * one compiled pass — value-identical to the
  * `transform(sequence) + slice + array_join + md5` HOF form (one
  * lowercase-hex md5 per gram position, single-space joins, shorter-
  * than-n inputs yield empty) without the per-position interpreted
  * slice/concat/digest lambda. The corpus-dedup shuffle kernel (q72):
  * at 100 TB the explode of this array is the pipeline's map stage.
  */
case class NgramMd5(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "ngram_md5"

  override protected def nullSafeEval(input: Any): Any =
    HashExpressionsInternal.ngramMd5(input.asInstanceOf[ArrayData], n)

  // Same shared-kernel codegen as NgramJoin: the tokenizer child stays
  // codegen'd, the kernel is one non-virtual static-module call.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionsInternal.ngramMd5($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection cardinality of two SORTED long arrays (e.g. hashed
  * token sets) by linear merge — 8-byte compares instead of string
  * compares. With 64-bit hashes, collisions distort a set-similarity
  * count with probability ~|vocab|²/2⁶⁴ — negligible, and the DuckDB
  * oracle (which compares raw strings) would flag any distortion.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_long_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    val nx = x.numElements()
    val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  // the pair-verify compare loop, inlined into generated code: pure
  // primitive merge, no allocation, millions of calls per verify stage
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $i = 0; int $j = 0;
        int $nx = $a.numElements(); int $ny = $b.numElements();
        ${ev.value} = 0;
        while ($i < $nx && $j < $ny) {
          long $xv = $a.getLong($i); long $yv = $b.getLong($j);
          if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
          else if ($xv < $yv) $i++;
          else $j++;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HashFunctions {
  def sortedIntersectSize(a: Column, b: Column): Column =
    shims.column(SortedIntersectSize(shims.expression(a), shims.expression(b)))

  def sortedLongIntersectSize(a: Column, b: Column): Column =
    shims.column(SortedLongIntersectSize(shims.expression(a), shims.expression(b)))

  def wordNGrams(tokens: Column, n: Int): Column =
    shims.column(WordNGrams(shims.expression(tokens), n))

  def ngramMd5(tokens: Column, n: Int): Column =
    shims.column(NgramMd5(shims.expression(tokens), n))

  def ngramJoin(tokens: Column, n: Int): Column =
    shims.column(NgramJoin(shims.expression(tokens), n))

  def minhashSig(shingles: Column, k: Int): Column =
    shims.column(MinHashSig(shims.expression(shingles), k))

  def simhash64(tokens: Column): Column =
    shims.column(SimHash64(shims.expression(tokens)))

  def simhashMd5(tokens: Column): Column =
    shims.column(SimHashMd5(shims.expression(tokens)))

  def simhashMd5Wide(tokens: Column): Column =
    shims.column(SimHashMd5Wide(shims.expression(tokens)))
}
