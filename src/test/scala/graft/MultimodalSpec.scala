package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary columns with typed metadata, resize and
  * frame-sample transforms, feature extraction feeding the similarity
  * stack, parquet round trip, decode-stage repartitioning. Kernels are
  * deterministic stubs — the Spark contract around them is the subject.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = {
    import spark.implicits._
    (0 until 30).map { i =>
      (i.toLong, Multimodal.fakeMedia(
        fmt = 1 + i % 4, w = 8 + i % 3, h = 8, bodyBytes = 256, seed = i))
    }.toDF("media_id", "data")
  }

  test("metadata decode yields the typed struct") {
    val out = Multimodal.withMediaMeta(media, "data")
    assert(out.schema("media_meta").dataType === Multimodal.mediaMetaSchema)
    val r = out.filter(col("media_id") === 0)
      .select("media_meta.format", "media_meta.width", "media_meta.bytes")
      .collect()(0)
    assert(r.getString(0) === "png" && r.getInt(1) === 8 && r.getLong(2) === 268L)
    // null payloads degrade, not crash
    import spark.implicits._
    val withNull = Seq((99L, null: Array[Byte])).toDF("media_id", "data")
    val nr = Multimodal.withMediaMeta(withNull, "data")
      .select("media_meta.format").collect()(0)
    assert(nr.getString(0) === "unknown")
  }

  test("resize changes dimensions deterministically") {
    val out = media.withColumn("small", Multimodal.resized(col("data"), 4, 4))
    val sizes = out.select(length(col("small"))).distinct().collect()
    assert(sizes.length === 1 && sizes(0).getInt(0) === 12 + 16)
    val twice = media.withColumn("small", Multimodal.resized(col("data"), 4, 4))
      .select(md5(col("small"))).collect().map(_.getString(0))
    val again = media.withColumn("small", Multimodal.resized(col("data"), 4, 4))
      .select(md5(col("small"))).collect().map(_.getString(0))
    assert(twice.sameElements(again), "stub kernels must be deterministic")
  }

  test("frame sampling explodes into bounded binary frames") {
    val frames = media
      .select(col("media_id"),
        explode(Multimodal.sampledFrames(col("data"), frameBytes = 64, everyK = 2))
          .as("frame"))
    // 256-byte body / 64 = 4 blocks, every 2nd → 2 frames per row
    assert(frames.count() === media.count() * 2)
    assert(frames.select(max(length(col("frame")))).collect()(0).getInt(0) <= 64)
  }

  test("media features feed the ANN contract (array<float>, fixed dim)") {
    val feats = media.select(
      col("media_id").as("vec_id"),
      Multimodal.mediaFeatures(col("data")).as("embedding"))
    assert(feats.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    val dims = feats.select(size(col("embedding"))).distinct().collect()
    assert(dims.length === 1 && dims(0).getInt(0) === 16)
    // deterministic across evaluation
    val a = feats.collect().map(_.toString).sorted
    val b = media.select(col("media_id").as("vec_id"),
      Multimodal.mediaFeatures(col("data")).as("embedding"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("binary columns round-trip parquet and repartition for decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_").toString
    Multimodal.withDecodeParallelism(media, 6).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 30)
    val orig = media.select(col("media_id"), md5(col("data")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    back.select(col("media_id"), md5(col("data")).as("h")).collect()
      .foreach(r => assert(orig(r.getLong(0)) === r.getString(1)))
  }
}
