package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Blocked Bloom filter as a typed [[Aggregator]] plus a codegen'd
  * membership [[Expression]] — the engine's runtime-filter surface.
  *
  * The build side aggregates 64-bit key hashes (`xxhash64(key)`) into a
  * fixed-size bitmap: O(m/8) bytes per partial buffer regardless of
  * group size, and `merge` is a bitwise OR — associative and
  * commutative, so Spark combines partials map-side like any partial
  * aggregate. The probe side tests k bit positions derived from the
  * same 64-bit hash by Kirsch–Mitzenmacher double hashing
  * (g_i = h1 + i·h2 mod m — two halves of one hash give k independent
  * probes; Kirsch & Mitzenmacher 2006).
  *
  * GUARANTEE: no false negatives — every inserted hash tests true — so
  * a bloom prefilter followed by the exact join returns EXACTLY the
  * plain join's rows (false positives survive the prefilter but die in
  * the join). That makes the operator's RESULT oracle-checkable with
  * plain SQL while its VALUE is physical: the probe side drops
  * non-matching rows at the scan, BEFORE paying the shuffle
  * (what Spark's own InjectRuntimeFilter does for selective joins,
  * here available as an explicit, tunable operator — see
  * [[graft.operators.BloomJoin]]).
  */
object BloomSketchInternal {
  /** Set the k probe bits of `hash` in `bitmap` (m = bitmap.length*8
    * bits, a power of two so `mod` is a mask). */
  def insert(bitmap: Array[Byte], hash: Long, numHashes: Int): Unit = {
    val mask = bitmap.length * 8 - 1
    val h1 = (hash & 0xffffffffL).toInt
    val h2 = (hash >>> 32).toInt
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      bitmap(pos >>> 3) = (bitmap(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  /** True iff all k probe bits of `hash` are set — never false for an
    * inserted hash (the no-false-negative contract). Shared by
    * interpreted eval and codegen so both paths are bit-identical. */
  def mightContain(bitmap: Array[Byte], hash: Long, numHashes: Int): Boolean = {
    val mask = bitmap.length * 8 - 1
    val h1 = (hash & 0xffffffffL).toInt
    val h2 = (hash >>> 32).toInt
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      if ((bitmap(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Bloom-bitmap build over 64-bit key hashes. `numBits` must be a power
  * of two (probe positions use a mask, not a division). */
class BloomBuild(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(numBits >= 8 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 8, got $numBits")
  require(numHashes >= 1)

  override def zero: Array[Byte] = new Array[Byte](numBits / 8)

  override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
    BloomSketchInternal.insert(b, h, numHashes)
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }

  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
}

/** `bloom_might_contain(hash)` against a driver-built bitmap. The
  * bitmap rides the expression (task binary → executors, like any
  * broadcast literal); the probe stays inside WholeStageCodegen, so the
  * prefilter costs k array reads per row — cheap enough to sit below
  * the scan's filter chain. */
case class BloomMightContain(
    child: Expression, bitmap: Array[Byte], numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomSketchInternal.mightContain(bitmap, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val bm = ctx.addReferenceObj("bloomBitmap", bitmap, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomSketchInternal.mightContain($bm, $c, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomSketch {
  /** Aggregate a 64-bit-hash column into a bloom bitmap (one row). */
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    udaf(new BloomBuild(numBits, numHashes)).apply(hash)

  /** Membership probe of a 64-bit-hash column against a built bitmap. */
  def mightContain(bitmap: Array[Byte], hash: Column, numHashes: Int): Column =
    shims.column(BloomMightContain(shims.expression(hash), bitmap, numHashes))
}
