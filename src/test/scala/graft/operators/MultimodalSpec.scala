package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real image decode (javax.imageio) + perceptual dHash + image near-dup. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def formulaRgb(id: Long)(x: Int, y: Int): Int =
    ImageCodec.formulaRgb(id)(x, y)

  test("png encode/decode roundtrip: exact dimensions and channel sums") {
    // 3x2 image with hand-computed channel sums
    val px = Map(
      (0, 0) -> 0x102030, (1, 0) -> 0x405060, (2, 0) -> 0x708090,
      (0, 1) -> 0xa0b0c0, (1, 1) -> 0xd0e0f0, (2, 1) -> 0x000000)
    val bytes = ImageCodec.encodePng(3, 2, (x, y) => px((x, y)))
    val d = ImageCodec.decode(bytes).get
    assert(d.width == 3 && d.height == 2)
    assert(d.sumR == 0x10 + 0x40 + 0x70 + 0xa0 + 0xd0 + 0x00)
    assert(d.sumG == 0x20 + 0x50 + 0x80 + 0xb0 + 0xe0 + 0x00)
    assert(d.sumB == 0x30 + 0x60 + 0x90 + 0xc0 + 0xf0 + 0x00)
    assert(d.meanR == d.sumR.toDouble / 6)
    // population std of the red channel, independently derived
    val rs = Seq(0x10, 0x40, 0x70, 0xa0, 0xd0, 0x00).map(_.toDouble)
    val m = rs.sum / 6
    assert(math.abs(d.stdR - math.sqrt(rs.map(v => v * v).sum / 6 - m * m)) < 1e-12)
  }

  test("dHash: identical images collide, tiny perturbation stays within 2 bits, different ids are distant") {
    val base = ImageCodec.decode(ImageCodec.encodePng(32, 24, formulaRgb(42))).get
    val same = ImageCodec.decode(ImageCodec.encodePng(32, 24, formulaRgb(42))).get
    assert(base.dHash == same.dHash)
    // perturb a few pixels inside the top-left dHash cell only: at most
    // the two comparisons involving that cell can flip
    val pert = ImageCodec.decode(
      ImageCodec.fixtureImage(42, 32, 24, perturbTopLeft = true)).get
    assert(java.lang.Long.bitCount(base.dHash ^ pert.dHash) <= 2)
    // unrelated ids: noise-like fields, expect a distant hash
    val other = ImageCodec.decode(ImageCodec.encodePng(32, 24, formulaRgb(77))).get
    assert(java.lang.Long.bitCount(base.dHash ^ other.dHash) > 10)
  }

  test("jpeg decodes too (dims exact; stats lossy, not asserted)") {
    val png = ImageCodec.encodePng(20, 10, formulaRgb(5))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val d = ImageCodec.decode(out.toByteArray).get
    assert(d.width == 20 && d.height == 10)
  }

  test("extractFeatures: real decode for images, fallback for other payloads") {
    val rows = Seq(
      (1L, ImageCodec.encodePng(16, 12, formulaRgb(1))),
      (2L, "not an image at all".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "payload")
    val feats = Multimodal.extractFeatures(df, "id", "payload")
    assert(feats.schema == Multimodal.FeatureSchema)
    val img = feats.where("id = 1").collect()(0)
    assert(img.getAs[Boolean]("is_image"))
    assert(img.getAs[Int]("width") == 16 && img.getAs[Int]("height") == 12)
    val expected = ImageCodec.decode(rows.head._2).get
    assert(img.getAs[Long]("sum_r") == expected.sumR)
    assert(img.getAs[Long]("dhash") == expected.dHash)
    assert(img.getSeq[Float](img.fieldIndex("features")).length == 8)
    val txt = feats.where("id = 2").collect()(0)
    assert(!txt.getAs[Boolean]("is_image"))
    assert(txt.isNullAt(txt.fieldIndex("dhash")))
    assert(txt.getSeq[Float](txt.fieldIndex("features")).length == 8)
    val nul = feats.where("id = 3").collect()(0)
    assert(!nul.getAs[Boolean]("is_image") && nul.getAs[Long]("n_bytes") == 0L)
  }

  test("imageNearDuplicates: planted near-identical siblings, and only them") {
    // 40 noise images; every id % 10 == 0 gets a sibling (id+1) equal to it
    // except a small bump confined to the top-left dHash cell
    val imgs = (0L until 40L).map { id =>
      val baseId = if (id % 10 == 1) id - 1 else id
      (id, ImageCodec.fixtureImage(baseId, 32, 24, perturbTopLeft = id % 10 == 1))
    }
    val df = imgs.toDF("id", "payload")
    val pairs = Multimodal.imageNearDuplicates(df, "id", "payload", maxDistance = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 40L by 10L).map(id => (id, id + 1)).toSet
    assert(pairs == expected, s"got $pairs expected $expected")
  }

  test("non-image payloads are excluded from near-dup banding") {
    val df = Seq(
      (1L, ImageCodec.encodePng(16, 16, formulaRgb(9))),
      (2L, ImageCodec.encodePng(16, 16, formulaRgb(9))),
      (3L, "text payload".getBytes("UTF-8"))).toDF("id", "payload")
    val pairs = Multimodal.imageNearDuplicates(df, "id", "payload")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  /** A 67-byte payload whose valid PNG header declares `w` x `h`: the
    * signature, a CRC-correct IHDR, and a truncated IDAT. Decoding it in
    * full would allocate w*h*4 bytes — the header peek must reject it
    * before that. */
  private def pngBomb(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    def chunk(name: String, body: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(body.length).array()
      out.write(len)
      val tagged = name.getBytes("US-ASCII") ++ body
      out.write(tagged)
      val crc = new java.util.zip.CRC32()
      crc.update(tagged)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte) // bit depth
      .put(2.toByte) // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", Array[Byte](0x78, 0x9c.toByte)) // zlib header, no data
    out.toByteArray
  }

  test("decompression-bomb guard: huge declared dimensions route to fallback, not OOM") {
    // header claims 50k x 50k (~10 GB decoded); the 67-byte payload must be
    // rejected at the header peek and flow through the fallback path
    val bomb = pngBomb(50000, 50000)
    assert(ImageCodec.decode(bomb).isEmpty)
    // a legitimate image alongside it still decodes; the bomb row survives
    // the pipeline as a non-image
    val df = Seq((1L, ImageCodec.encodePng(16, 12, formulaRgb(1))), (2L, bomb))
      .toDF("id", "payload")
    val feats = Multimodal.extractFeatures(df, "id", "payload")
      .select("id", "is_image").as[(Long, Boolean)].collect().toMap
    assert(feats(1L) && !feats(2L))
    // the cap is a parameter: a small image is rejected once the cap drops
    // below its pixel count (guard is exercised, not just the 64 MP default)
    val small = ImageCodec.encodePng(16, 12, formulaRgb(1))
    assert(ImageCodec.decode(small, maxPixels = 100).isEmpty)
    assert(ImageCodec.decode(small, maxPixels = 192).isDefined)
  }

  test("imageNearDuplicates recall holds when maxDistance exceeds the old fixed banding") {
    // find a sibling at dHash Hamming distance in (3, 6]: with the old
    // fixed 4x16 banding such a spread can span all four blocks and lose
    // the pair; derived banding (maxDistance+1 = 7 blocks) must keep it.
    // The fixture searches over whitened-cell perturbations (deterministic
    // codec, so the found sibling is stable).
    val base = ImageCodec.encodePng(36, 32, formulaRgb(3))
    val da = ImageCodec.decode(base).get.dHash
    // whiten k separated 4x4 cells of the 9x8 grid, k = 1..8
    val candidates = (1 to 8).map { k =>
      ImageCodec.encodePng(36, 32, (x, y) => {
        val cell = (y / 4) * 9 + (x / 4) // grid-aligned 4x4 blocks
        if (cell % 11 == 3 && cell / 11 < k) 0xffffff else formulaRgb(3)(x, y)
      })
    }
    val pert = candidates.find { img =>
      val d = java.lang.Long.bitCount(da ^ ImageCodec.decode(img).get.dHash)
      d > 3 && d <= 6
    }
    assert(pert.isDefined, "fixture search found no sibling in (3, 6]")
    val df = Seq((1L, base), (2L, pert.get)).toDF("id", "payload")
    val pairs = Multimodal.imageNearDuplicates(df, "id", "payload", maxDistance = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
