package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pure-JDK image codec: decode PNG/JPEG/BMP/GIF payloads to exact pixel
  * statistics plus a 64-bit perceptual difference hash.
  *
  * `javax.imageio` ships with the JDK, so this works offline with zero
  * added dependencies. Everything here is deterministic: channel sums are
  * exact integer arithmetic over the decoded pixels (PNG/BMP are lossless,
  * so they are oracle-checkable against the generative formula), and the
  * dHash downscale is an explicit area-average over an integer grid rather
  * than `Graphics2D` scaling (whose interpolation is implementation
  * dependent and would not reproduce across JDKs).
  *
  * Reference anchor: the multimodal column mandate (SURVEY.md §7.2 item 10)
  * — the reference treats media as opaque payloads; decode/feature-extract
  * is the parity-plus LLM-pipeline surface.
  */
object ImageCodec {

  /** Exact decode result: dimensions, per-channel integer sums and
    * sums-of-squares (the oracle-checkable primitives), derived floating
    * means/stds, and the 64-bit perceptual dHash. */
  final case class Decoded(
      width: Int,
      height: Int,
      sumR: Long, sumG: Long, sumB: Long,
      sumSqR: Long, sumSqG: Long, sumSqB: Long,
      dHash: Long) {
    def n: Long = width.toLong * height
    def meanR: Double = sumR.toDouble / n
    def meanG: Double = sumG.toDouble / n
    def meanB: Double = sumB.toDouble / n
    private def std(sum: Long, sumSq: Long): Double = {
      val m = sum.toDouble / n
      math.sqrt(sumSq.toDouble / n - m * m)
    }
    def stdR: Double = std(sumR, sumSqR)
    def stdG: Double = std(sumG, sumSqG)
    def stdB: Double = std(sumB, sumSqB)
  }

  /** dHash grid: 9 columns x 8 rows of area-averaged grayscale; 8
    * horizontal comparisons per row = 64 bits. */
  private val GridW = 9
  private val GridH = 8

  /** Decompression-bomb cap: a payload whose HEADER declares more pixels
    * than this is rejected before any pixel buffer is allocated. 64 MP
    * covers every legitimate photo/render; a hostile PNG header declaring
    * 50k x 50k would otherwise allocate ~10 GB on `ImageIO.read` and kill
    * the executor with an uncatchable OutOfMemoryError. */
  val DefaultMaxPixels: Long = 64L * 1024 * 1024

  /** Decode an image payload. Returns None for null/empty payloads, for
    * bytes no registered ImageIO reader recognises (text, audio, …), and
    * for payloads whose declared dimensions exceed `maxPixels` — callers
    * fall back to their non-image path. Dimensions are peeked from the
    * stream header via `ImageReader.getWidth/getHeight` BEFORE the full
    * decode, so oversized/hostile payloads never allocate pixel buffers. */
  def decode(payload: Array[Byte], maxPixels: Long = DefaultMaxPixels): Option[Decoded] = {
    if (payload == null || payload.length == 0) return None
    try {
      val stream = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(stream)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(stream, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) None
          else {
            val img = reader.read(0)
            if (img == null) None else Some(stats(img))
          }
        } finally reader.dispose()
      } finally stream.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def stats(img: BufferedImage): Decoded = {
    val w = img.getWidth
    val h = img.getHeight
    // one bulk getRGB: avoids per-pixel color-model dispatch
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sr, sg, sb, qr, qg, qb = 0L
    // per-cell grayscale sums for the dHash grid, accumulated in the same
    // single pass over the pixels (gray = integer luma, id-independent)
    val cellSum = new Array[Long](GridW * GridH)
    val cellCnt = new Array[Long](GridW * GridH)
    var y = 0
    while (y < h) {
      val cy = math.min(GridH - 1, y * GridH / h)
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        val r = (v >> 16) & 0xff
        val g = (v >> 8) & 0xff
        val b = v & 0xff
        sr += r; sg += g; sb += b
        qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
        val cx = math.min(GridW - 1, x * GridW / w)
        val c = cy * GridW + cx
        cellSum(c) += (299L * r + 587L * g + 114L * b) / 1000L
        cellCnt(c) += 1
        x += 1
      }
      y += 1
    }
    Decoded(w, h, sr, sg, sb, qr, qg, qb, dHashOf(cellSum, cellCnt))
  }

  /** 64-bit dHash: bit (row*8 + col) set iff cell(col,row) average gray >
    * cell(col+1,row). Empty cells (images narrower/shorter than the grid)
    * average as 0. */
  private def dHashOf(cellSum: Array[Long], cellCnt: Array[Long]): Long = {
    def avg(c: Int): Double =
      if (cellCnt(c) == 0) 0.0 else cellSum(c).toDouble / cellCnt(c)
    var hash = 0L
    var row = 0
    while (row < GridH) {
      var colIdx = 0
      while (colIdx < GridW - 1) {
        if (avg(row * GridW + colIdx) > avg(row * GridW + colIdx + 1))
          hash |= 1L << (row * (GridW - 1) + colIdx)
        colIdx += 1
      }
      row += 1
    }
    hash
  }

  /** Noise-like formula pixel field: channels mix id, x and y
    * multiplicatively, so different ids give uncorrelated fields (distant
    * dHashes) while every channel stays exactly recomputable in DuckDB SQL
    * (`((doc_id + 1) * (x + 3) * (y + 7)) % 256` etc.) — the basis of the
    * catalog's oracle-checked decode query. */
  def formulaRgb(id: Long)(x: Int, y: Int): Int = {
    // the multiplicative part alone depends on id only mod 256 (ids 256
    // apart would yield identical images); the (id div k)-scaled cross
    // terms break that periodicity for every id pair below lcm(256, k*256)
    val r = (((id + 1) * (x + 3) * (y + 7) + (id / 5) * (x + 2 * y)) % 256).toInt
    val g = (((id + 2) * (x + 5) * (y + 11) + (id / 7) * (2 * x + y)) % 256).toInt
    val b = (((id + 3) * (x + 7) * (y + 13) + (id / 3) * (x + y)) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Formula image for fixtures: the [[formulaRgb]] field at `w` x `h`;
    * with `perturbTopLeft` the four top-left pixels are bumped +48 per
    * channel (clamped) — confined to one dHash grid cell, so the perturbed
    * image's hash is within 2 bits of the base image's. */
  def fixtureImage(id: Long, w: Int, h: Int, perturbTopLeft: Boolean = false): Array[Byte] =
    encodePng(w, h, (x, y) => {
      val v = formulaRgb(id)(x, y)
      if (perturbTopLeft && x < 2 && y < 2) {
        val bump = (c: Int) => math.min(255, c + 48)
        (bump((v >> 16) & 0xff) << 16) | (bump((v >> 8) & 0xff) << 8) | bump(v & 0xff)
      } else v
    })

  /** Encode a formula-defined RGB image as PNG (lossless) — used by
    * fixture generators and catalog queries whose oracle recomputes the
    * same pixel function in SQL. `rgb(x, y)` returns a packed 0xRRGGBB. */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgb(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
