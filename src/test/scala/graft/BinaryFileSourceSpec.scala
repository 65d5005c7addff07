package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** `binaryFile` source — the standard multimodal ingestion path:
  * opaque media files land as (path, length, content) rows, then the
  * decode kernels take over. This is the missing first hop before
  * [[graft.multimodal.Multimodal]]'s decoders in a real image/audio
  * pipeline (TESTDATA has no binary column, so the repo's multimodal
  * queries synthesize payloads; this spec covers the file-based
  * route end to end with REAL PNG files on disk).
  */
class BinaryFileSourceSpec extends SparkTestBase {

  test("PNG files -> binaryFile rows -> real decode -> pixel stats") {
    val dir = Files.createTempDirectory("graft_bin_").toString
    // 3 deterministic 2x2 images + one decoy text file
    val pixels = Seq(
      Array[Byte](0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110),
      Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4),
      (0 until 12).map(i => (i * 7).toByte).toArray)
    pixels.zipWithIndex.foreach { case (px, i) =>
      Files.write(Paths.get(dir, s"img_$i.png"),
        Multimodal.encodePng(2, 2, px))
    }
    Files.write(Paths.get(dir, "notes.txt"), "not an image".getBytes)

    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
    assert(df.count() === 3, "glob filter must exclude the decoy")
    assert(df.schema.fieldNames.toSet ===
      Set("path", "modificationTime", "length", "content"))

    val decode = udf { bytes: Array[Byte] =>
      Multimodal.decodeImageIO(bytes) match {
        case Some(("png", w, h, rgb)) =>
          (w.toLong, h.toLong, rgb.map(_ & 0xff).map(_.toLong).sum)
        case _ => (-1L, -1L, -1L)
      }
    }
    val stats = df
      .select(regexp_extract(col("path"), "img_(\\d+)", 1)
        .cast("long").as("i"), decode(col("content")).as("s"))
      .select(col("i"), col("s._1").as("w"), col("s._2").as("h"),
        col("s._3").as("pixel_sum"))
      .collect().map(r => r.getAs[Long]("i") ->
        (r.getAs[Long]("w"), r.getAs[Long]("h"),
          r.getAs[Long]("pixel_sum"))).toMap
    pixels.zipWithIndex.foreach { case (px, i) =>
      val expected = px.map(_ & 0xff).map(_.toLong).sum
      assert(stats(i.toLong) === ((2L, 2L, expected)),
        s"img_$i decode mismatch")
    }
  }

  test("length column matches the on-disk byte count") {
    val dir = Files.createTempDirectory("graft_bin_len_").toString
    val bytes = Multimodal.encodePng(2, 2, new Array[Byte](12))
    Files.write(Paths.get(dir, "one.png"), bytes)
    val row = spark.read.format("binaryFile").load(dir)
      .select("length", "content").head
    assert(row.getLong(0) === bytes.length.toLong)
    assert(row.getAs[Array[Byte]](1).length === bytes.length)
  }
}
