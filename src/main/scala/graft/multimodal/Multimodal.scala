package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §7.5): image/audio/video as
  * opaque `binary` columns with typed metadata structs, processed by
  * batch decoders behind a narrow seam.
  *
  * The decode kernels themselves are STUBS — image/audio codecs are not
  * in this container — implemented as deterministic byte-level fakes so
  * every piece of Spark plumbing (schema, batch shape, partitioning,
  * null handling, feature extraction contract) is real and tested. A
  * production deployment swaps [[decodeKernel]]/[[frameKernel]] for
  * JNI/javacpp codecs; nothing else changes.
  *
  * Scale notes: decode is the expensive stage, so [[withDecodeParallelism]]
  * repartitions FIRST (ref Y3 precedent: repartition before costly
  * UDFs, bin/ztf/compute_ephemerides.py:77); media payloads stay in
  * executor memory one batch at a time — never collected.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("bytes", LongType)))

  // ---------------------------------------------------------------
  // STUB KERNELS — deterministic byte-level fakes standing in for real
  // codecs (no image/audio libraries in this container).
  // ---------------------------------------------------------------

  /** STUB decode: reads a fake 12-byte header (fmt byte, w, h, frames)
    * and returns metadata; a real kernel would parse JPEG/PNG/WAV.
    */
  private[multimodal] def decodeKernel(data: Array[Byte]): (String, Int, Int, Int) = {
    if (data == null || data.length < 12) ("unknown", 0, 0, 0)
    else {
      val bb = java.nio.ByteBuffer.wrap(data)
      val fmt = bb.get() match {
        case 1 => "png"; case 2 => "jpeg"; case 3 => "wav"; case 4 => "mp4"
        case _ => "raw"
      }
      bb.position(1)
      // 3-byte alignment skip keeps the fake header 12 bytes
      bb.position(4)
      val w = bb.getInt(); val h = bb.getInt()
      val frames = math.max(1, (data.length - 12) / math.max(1, w * h))
      (fmt, w, h, frames)
    }
  }

  /** STUB resize: a real kernel would rescale pixels; the fake keeps
    * the header and truncates/pads the payload to w*h bytes so output
    * size is what a real grayscale resize would produce.
    */
  private[multimodal] def resizeKernel(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (data == null || data.length < 12) Array.emptyByteArray
    else {
      val out = new Array[Byte](12 + w * h)
      System.arraycopy(data, 0, out, 0, 12)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.position(4); bb.putInt(w); bb.putInt(h)
      var i = 0
      while (i < w * h) {
        out(12 + i) = data(12 + (i % math.max(1, data.length - 12)))
        i += 1
      }
      out
    }
  }

  /** STUB frame sampling: every k-th fixed-size block of the payload
    * (a real kernel would seek keyframes).
    */
  private[multimodal] def frameKernel(
      data: Array[Byte], frameBytes: Int, everyK: Int): Seq[Array[Byte]] = {
    if (data == null || data.length <= 12 || frameBytes <= 0) Nil
    else data.drop(12).grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % everyK == 0 => f }
      .toSeq
  }

  /** STUB feature extraction: 16 deterministic hash-derived floats (a
    * real kernel would run an image/audio encoder).
    */
  private[multimodal] def featureKernel(data: Array[Byte]): Array[Float] = {
    val base = if (data == null) 0L else
      data.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    Array.tabulate(16) { i =>
      val x = base * (i * 2 + 1)
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  // ---------------------------------------------------------------
  // Spark plumbing (real)
  // ---------------------------------------------------------------

  private val decodeUdf = udf { data: Array[Byte] =>
    val (fmt, w, h, frames) = decodeKernel(data)
    (fmt, w, h, frames, if (data == null) 0L else data.length.toLong)
  }

  /** Decode metadata for a binary media column. */
  def withMediaMeta(df: DataFrame, mediaCol: String, metaCol: String = "media_meta"): DataFrame =
    df.withColumn(metaCol,
      decodeUdf(col(mediaCol))
        .cast(mediaMetaSchema.asInstanceOf[DataType])
        .as(metaCol))

  private val resizeUdf = udf { (data: Array[Byte], w: Int, h: Int) =>
    resizeKernel(data, w, h)
  }

  def resized(mediaCol: Column, w: Int, h: Int): Column =
    resizeUdf(mediaCol, lit(w), lit(h))

  private val framesUdf = udf { (data: Array[Byte], frameBytes: Int, everyK: Int) =>
    frameKernel(data, frameBytes, everyK)
  }

  /** Sampled frames as an array<binary> column (explode downstream). */
  def sampledFrames(mediaCol: Column, frameBytes: Int, everyK: Int): Column =
    framesUdf(mediaCol, lit(frameBytes), lit(everyK))

  private val featureUdf = udf { data: Array[Byte] => featureKernel(data) }

  /** Embedding-style features — feeds directly into the Similarity
    * operators (same array<float> contract as `embeddings.embedding`).
    */
  def mediaFeatures(mediaCol: Column): Column = featureUdf(mediaCol)

  /** Y3: spread rows before the expensive decode stage. */
  def withDecodeParallelism(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions)

  /** A deterministic fake media payload for fixtures: fake header +
    * pseudo-random body.
    */
  def fakeMedia(fmt: Int, w: Int, h: Int, bodyBytes: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](12 + bodyBytes)
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.put(fmt.toByte); bb.position(4); bb.putInt(w); bb.putInt(h)
    var i = 0
    var x = seed | 1
    while (i < bodyBytes) {
      x = x * 1103515245 + 12345
      out(12 + i) = (x >>> 16).toByte
      i += 1
    }
    out
  }
}
