package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.MultimodalOps
import graft.ext.MultimodalOps.{ImageIoCodec, MediaRow}

/** The MediaCodec seam's production claim: a REAL decoder drops in without
  * touching the oracle-gated plumbing. The JDK ships PNG/BMP readers, so
  * this spec synthesizes images, pushes them through the same
  * mapPartitions kernel the registry query uses, and checks genuinely
  * decoded properties (dimensions, pixel checksum, resize geometry) that
  * byte statistics could not fake. */
class ImageIoCodecSpec extends AnyFunSuite {
  import TestSpark._

  private def image(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 1717 + seed) & 0xffffff)
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  private def pixelSum(img: BufferedImage): Long = {
    var sum = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      sum += (img.getRGB(x, y) & 0xffffff)
    sum
  }

  test("PNG and BMP decode through the registry's mapPartitions seam") {
    import spark.implicits._
    val png = image(32, 20, 7)
    val bmp = image(9, 13, 3)
    val ds = Seq(
      MediaRow(1L, "image", encode(png, "png")),
      MediaRow(2L, "image", encode(bmp, "bmp"))).toDS()
    val got = MultimodalOps.decodeFeaturesOf(ImageIoCodec, ds)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getLong(3))).toMap
    assert(got(1L) == ((32, 20, pixelSum(png))))
    assert(got(2L) == ((9, 13, pixelSum(bmp))))
  }

  test("resize is a real downscale: output re-decodes at w/k x h/k") {
    val bytes = encode(image(40, 24, 11), "png")
    val resized = ImageIoCodec.resize(bytes, 4)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back != null)
    assert((back.getWidth, back.getHeight) == ((10, 6)))
  }

  test("non-image payloads fail loudly, not silently") {
    val ex = intercept[IllegalArgumentException] {
      ImageIoCodec.features(
        MediaRow(9L, "image", "not an image".getBytes("UTF-8")))
    }
    assert(ex.getMessage.contains("not a decodable image"))
  }
}
