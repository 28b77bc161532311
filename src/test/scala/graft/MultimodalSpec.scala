package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.ops.MultimodalOps

/** The REAL image decode path: in-repo generated PNG/JPEG fixtures
  * with known dimensions and pixel statistics, pushed through the
  * mapPartitions decode operators. */
class MultimodalSpec extends SparkSpec {

  private def imageBytes(fmt: String, w: Int, h: Int)
                        (pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def rgb(r: Int, g: Int, b: Int): Int = (r << 16) | (g << 8) | b

  test("decodeMeta reads true dimensions, channels, and format from generated PNG/JPEG") {
    import spark.implicits._
    val png = imageBytes("png", 31, 17)((_, _) => rgb(10, 20, 30))
    val jpg = imageBytes("jpeg", 8, 12)((_, _) => rgb(200, 100, 50))
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val metas = MultimodalOps.decodeMetaOf(
        Seq((1L, png), (2L, jpg), (3L, garbage)).toDS())
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).width === 31 && metas(1L).height === 17)
    assert(metas(1L).channels === 3 && metas(1L).format === "image/png")
    assert(metas(1L).n_bytes === png.length)
    assert(metas(2L).width === 8 && metas(2L).height === 12)
    assert(metas(2L).format === "image/jpeg")
    assert(metas(3L).format === MultimodalOps.Undecodable)
    assert(metas(3L).width === 0 && metas(3L).channels === 0)
  }

  test("imageStats computes channel means from real pixels") {
    import spark.implicits._
    // PNG is lossless: a solid color's channel means are exact
    val solid = imageBytes("png", 10, 10)((_, _) => rgb(40, 80, 120))
    // gradient: red ramps 0..249 along x on a 250x4 image -> mean 124.5
    val grad = imageBytes("png", 250, 4)((x, _) => rgb(x, 0, 255))
    val stats = MultimodalOps.imageStatsOf(
        Seq((1L, solid), (2L, grad), (3L, "not an image".getBytes("UTF-8"))).toDS())
      .collect().map(s => s.doc_id -> s).toMap
    assert(stats(1L).channel_means === Seq(40.0, 80.0, 120.0))
    assert(stats(2L).channel_means === Seq(124.5, 0.0, 255.0))
    assert(stats(2L).width === 250 && stats(2L).height === 4)
    assert(stats(3L).format === MultimodalOps.Undecodable)
    assert(stats(3L).channel_means.isEmpty)

    // JPEG is lossy but a solid color survives within quantization
    val jsolid = imageBytes("jpeg", 16, 16)((_, _) => rgb(100, 150, 200))
    val js = MultimodalOps.imageStatsOf(Seq((9L, jsolid)).toDS()).collect().head
    assert(js.channels === 3)
    js.channel_means.zip(Seq(100.0, 150.0, 200.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 4.0, s"jpeg mean $got vs $want drifted past quantization")
    }
  }
}
