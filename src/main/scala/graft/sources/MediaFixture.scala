package graft.sources

import graft.operators.Multimodal.{GridH, GridW}

/** Deterministic real-PNG fixture for q77b (VERDICT r11 "What's missing
  * #3"): the registered q77 row runs the byte-grid stub because the
  * driver fixture's media payloads are text-derived, so the REAL
  * javax.imageio decode path had no oracle row — only planted-PNG specs.
  * This fixture closes that: 16 tiny RGB PNGs whose pixel luminance is
  * known by CONSTRUCTION (each dHash grid cell is a constant 4×4 pixel
  * block), committed as parquet with BOTH the encoded PNG bytes (`media`,
  * what the engine decodes) and the raw luminance array (`px`, what the
  * DuckDB oracle recomputes the dHash from). Engine and oracle meet at
  * the hash: if javax.imageio did not return exactly the encoded pixels,
  * the hashes diverge and the oracle row fails.
  *
  * Pattern construction: asset `i`'s dHash is chosen up front as a 64-bit
  * pattern `bits(i)` and the grid is built to realize it — per row, walk
  * left to right adding +8 (bit set) or −8 (bit clear), starting at 128.
  * Derived assets (ids 8..12) copy a base asset and flip a chosen bit set
  * by shifting the row suffix past the flipped comparison by −2·diff —
  * the one comparison flips, every other diff in the row is untouched.
  * That plants exact Hamming distances: pairs (0,8),(1,9),(2,10) at 1-2
  * bits and (3,11) at exactly 3 (all ≤ 3 → mutual near-dup neighbors),
  * (4,12) at 5 bits (NOT neighbors) — so the q77b profile discriminates
  * both sides of the Hamming gate on real decoded pixels.
  *
  * Pixel exactness chain (why every comparison is bit-stable): pixels are
  * grayscale v∈[16,240] stored as RGB (v,v,v) in a truecolor PNG —
  * lossless, so `getRGB` returns the written value; the engine's
  * luminance (299r+587g+114b)/1000 is exactly v; each grid cell is the
  * mean of 16 equal-weight ints — a sum ≤ 4080 divided by 16, exact in
  * float32 and float64 alike, so engine (Float) and oracle (DOUBLE)
  * grids are value-identical and every `>` agrees.
  */
object MediaFixture {

  /** 4×4 pixels per dHash grid cell → 36×32 images; block-aligned with
    * gridFromImage's box bounds (c·W/GridW = 4c exactly), so the box
    * filter degenerates to the block constant's exact mean.
    */
  val Block = 4
  val W: Int = GridW * Block // 36
  val H: Int = GridH * Block // 32

  val NumAssets = 16

  /** Bit-flip sets for the derived assets 8+j (j = 0..4) over base j:
    * planted Hamming distances 1, 2, 1, 3 (boundary in), 5 (boundary out).
    */
  val Flips: Map[Int, Seq[Int]] = Map(
    0 -> Seq(0),
    1 -> Seq(5, 20),
    2 -> Seq(63),
    3 -> Seq(7, 30, 55),
    4 -> Seq(1, 9, 17, 25, 33))

  /** The target dHash bit k (0..63) of base asset `i` — an LCG-style mix,
    * deterministic and seedless so the committed parquet is reproducible
    * byte-for-byte from this source.
    */
  def bit(i: Int, k: Int): Boolean =
    (((i * 2654435761L + (k + 7) * 1103515245L + 12345L) >>> 16) & 1L) == 1L

  /** GridW×GridH cell luminances (row-major) for asset `id`: the base walk
    * realizing `bits(base)`, with the derived assets' suffix shifts
    * applied. Values stay within [16, 240] by construction (±64 walk drift
    * plus ≤ 3 suffix shifts of ±16 per row).
    */
  def cellGrid(id: Int): Array[Int] = {
    val base = if (id >= 8 && id <= 12) id - 8 else id
    val flips = if (id >= 8 && id <= 12) Flips(base).toSet else Set.empty[Int]
    val g = new Array[Int](GridW * GridH)
    for (r <- 0 until GridH) {
      g(r * GridW) = 128
      for (c <- 0 until GridW - 1) {
        val k = r * (GridW - 1) + c
        val diff = if (bit(base, k)) 8 else -8
        // a flip at k shifts THIS diff by -2*diff (comparison negates);
        // the shift rides the suffix so later diffs are unchanged
        val shift = if (flips.contains(k)) -2 * diff else 0
        g(r * GridW + c + 1) = g(r * GridW + c) + diff + shift
      }
    }
    g
  }

  /** Per-pixel luminance (row-major y*W+x) — each cell's constant spread
    * over its 4×4 block; the `px` column the oracle rebuilds the grid
    * from.
    */
  def pixels(id: Int): Array[Int] = {
    val g = cellGrid(id)
    val out = new Array[Int](W * H)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        out(y * W + x) = g((y / Block) * GridW + (x / Block))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Lossless truecolor PNG of `pixels(id)` — the bytes the engine's
    * javax.imageio path decodes.
    */
  def png(id: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = pixels(id)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val v = px(y * W + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray
  }

  /** Committed fixture location — repo-local (the driver's DuckDB oracle
    * reads it by absolute path), overridable for other checkouts.
    */
  def fixtureDir: String =
    sys.env.getOrElse("GRAFT_FIXTURES", "/root/repo/fixtures") + "/media_png"
}

/** One-shot generator for the committed parquet (run from the repo root):
  * {{{ sbt "runMain graft.sources.MediaFixtureGen" }}}
  * Idempotent — same source, same bytes.
  */
object MediaFixtureGen {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-media-fixture")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = (0 until MediaFixture.NumAssets).map { i =>
      (i.toLong, MediaFixture.png(i), MediaFixture.pixels(i).toSeq)
    }
    rows.toDF("media_id", "media", "px")
      .coalesce(1)
      .write.mode("overwrite").parquet(MediaFixture.fixtureDir)
    println(s"wrote ${rows.size} assets to ${MediaFixture.fixtureDir}")
    spark.stop()
  }
}
