package graft

import graft.functions.ImageDimsExpr
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** The container-header parser against REAL byte sequences — a
  * complete minimal PNG file, a JFIF JPEG header with padding
  * segments before SOF0, GIF87a/89a, BMP — plus truncation and
  * desync negatives.
  */
class ImageDimsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(ImageDimsExpr.imageDims(col("b")).as("d"))
      .collect().head
    if (r.isNullAt(0)) None
    else {
      val d = r.getStruct(0)
      Some((d.getString(0), d.getInt(1), d.getInt(2)))
    }
  }

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("complete minimal real PNG file parses (1x1, incl. IDAT/IEND)") {
    // a genuine, viewable 1x1 grayscale PNG
    val png = hexBytes(
      "89504E470D0A1A0A" +
        "0000000D 49484452 00000001 00000001 08 00 00 00 00 3A7E9B55" +
        "0000000A 49444154 789C636800000082 0081" + "DD8DB0EE" +
        "00000000 49454E44 AE426082")
    assert(parse(png) == Some(("png", 1, 1)))
  }

  test("JPEG: SOF0 behind APP0 + DQT + COM segments at varying offsets") {
    val jpeg = hexBytes(
      "FFD8" +
        "FFE0 0010 4A46494600 0101 00 0048 0048 00 00" + // APP0 JFIF
        "FFDB 0008 00 0102030405" +                      // DQT (toy)
        "FFFE 0006 48454C4C" +                           // COM "HELL"
        "FFC0 0011 08 0140 00F0 03 011100 021101 031101") // 320x240
    assert(parse(jpeg) == Some(("jpeg", 240, 320)))
    // progressive SOF2 is a frame header too
    val sof2 = hexBytes("FFD8 FFC2 0011 08 0010 0020 03 011100 021101 031101")
    assert(parse(sof2) == Some(("jpeg", 32, 16)))
    // DHT (C4) must NOT be mistaken for a frame header
    val dht = hexBytes("FFD8 FFC4 0003 00 FFC0 0011 08 0002 0003 03 011100 021101 031101")
    assert(parse(dht) == Some(("jpeg", 3, 2)))
  }

  test("GIF and BMP dimensions, little-endian") {
    val gif = hexBytes("474946383761" + "0501" + "0302") // GIF87a 261x515
    assert(parse(gif) == Some(("gif", 261, 515)))
    val bmp = hexBytes("424D" + "00" * 16 +
      "40010000" + "F0FFFFFF" + "0000") // 320 wide, height -16 top-down
    assert(parse(bmp) == Some(("bmp", 320, 16)))
  }

  test("WAV: canonical header, extra chunk with odd-length padding") {
    def wav(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.AudioMetaExpr.audioMeta(col("b")).as("a"))
        .collect().head
      if (r.isNullAt(0)) None
      else {
        val a = r.getStruct(0)
        Some((a.getInt(0), a.getInt(1), a.getInt(2), a.getLong(3),
          a.getLong(4)))
      }
    }
    // canonical 44-byte header: mono 8000 Hz 16-bit, 16000 data bytes
    // = exactly 1000 ms
    val canonical = hexBytes(
      "52494646 24400000 57415645" +
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 803E0000")
    assert(wav(canonical) == Some((1, 8000, 16, 16000L, 1000L)))
    // a LIST chunk with ODD length (pad byte) before fmt — the walk
    // must realign on the word boundary
    val padded = hexBytes(
      "52494646 33400000 57415645" +
        "4C495354 03000000 414243 00" + // LIST len 3 + pad
        "666D7420 10000000 0100 0200 401F0000 007D0000 0400 1000" +
        "64617461 803E0000")
    assert(wav(padded) == Some((2, 8000, 16, 16000L, 500L)))
    // truncated fmt / missing data → null
    assert(wav(hexBytes("52494646 08000000 57415645 666D7420 1000")) == None)
    assert(wav("RIFFxxxxWAVE".getBytes("UTF-8")) == None)
  }

  test("MP4: mvhd behind free/trak boxes, v0 and v1 layouts") {
    def mp4(bytes: Array[Byte]): Option[(Int, Long, Long)] = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(graft.functions.VideoMetaExpr.videoMeta(col("b")).as("v"))
        .collect().head
      if (r.isNullAt(0)) None
      else {
        val v = r.getStruct(0)
        Some((v.getInt(0), v.getLong(1), v.getLong(2)))
      }
    }
    // free box before moov; trak stub before mvhd inside moov;
    // timescale 600, duration 1500 → 2500 ms
    val v0 = hexBytes(
      "00000010 66747970 69736F6D 00000200" +
        "00000008 66726565" +
        "0000002C 6D6F6F76" +
        "00000008 7472616B" +
        "0000001C 6D766864 00 000000 00000000 00000000" +
        "00000258 000005DC")
    assert(mp4(v0) == Some((600, 1500L, 2500L)))
    // v1 layout: 64-bit times, timescale 90000, duration 180000 → 2000 ms
    val v1 = hexBytes(
      "00000030 6D6F6F76" +
        "00000028 6D766864 01 000000" +
        "0000000000000000 0000000000000000" +
        "00015F90 000000000002BF20")
    assert(mp4(v1) == Some((90000, 180000L, 2000L)))
    // malformed: box size smaller than header → null, no infinite loop
    assert(mp4(hexBytes("00000004 6D6F6F76")) == None)
    assert(mp4(hexBytes("00000010 66747970 69736F6D 00000200")) == None)
  }

  test("negatives: truncation, bad magic, desynchronized JPEG") {
    assert(parse(Array[Byte]()) == None)
    assert(parse(hexBytes("89504E47")) == None)          // truncated PNG
    assert(parse(hexBytes("FFD8 0011 2233")) == None)    // desync (no FF)
    assert(parse(hexBytes("FFD8 FFE0 0002")) == None)    // runs out
    assert(parse("not an image".getBytes("UTF-8")) == None)
  }
}
