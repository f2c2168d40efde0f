package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.MultimodalOps

/** m06's perceptual contract on REAL decoded pixels: exact copies hash
  * identically (hamming 0), small perturbations stay within the banding
  * radius, and distinct content is filtered out by the exact hamming
  * check. DuckDB cannot decode PNGs, so this spec IS the gate — the same
  * footing as ImageIoCodecSpec for the codec itself.
  */
class AHashSpec extends AnyFunSuite {
  import TestSpark._

  private def image(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // Structured gradient — aHash needs luminance STRUCTURE, not noise.
  private def base(x: Int, y: Int): Int = {
    val l = (x * 4 + y) & 0xff
    (l << 16) | (l << 8) | l
  }
  // base with a dim 8x8 patch: a few cell means move slightly.
  private def perturbed(x: Int, y: Int): Int =
    if (x >= 20 && x < 28 && y >= 20 && y < 28) 0x101010 else base(x, y)
  // Inverted-axis gradient — structurally different content.
  private def other(x: Int, y: Int): Int = {
    val l = 255 - ((x + y * 4) & 0xff)
    (l << 16) | (l << 8) | l
  }

  private lazy val pairs = {
    import TestSpark.spark.implicits._
    val rows = Seq(
      (1L, png(image(64, 64, base))),
      (2L, png(image(64, 64, base))),      // exact copy of 1
      (3L, png(image(64, 64, perturbed))), // near-dup of 1
      (4L, png(image(64, 64, other))))     // distinct content
    MultimodalOps.m06AHashPairs(rows.toDF("media_id", "content"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("exact copies pair at hamming 0") {
    assert(pairs.get((1L, 2L)).contains(0L), pairs.toString)
  }

  test("perturbed copies pair within the radius; distinct content does not") {
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0L,
      s"perturbation either hashed identically or fell outside: $pairs")
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L },
      s"distinct content paired: $pairs")
  }
}
