package graft.tools

/** Prints the planted-pair Hamming distances behind `q_cross_modal` so the
  * query's spam threshold is pinned to measured data, not guessed.
  */
object DriveXmodal {
  def main(a: Array[String]): Unit = {
    def ph(i: Long) = graft.multimodal.Multimodal.phash64(
      graft.fixtures.ImageGen.texturedRaster(i))
    (20 until 30).foreach { i =>
      val d = java.lang.Long.bitCount(ph(i) ^ ph(i + 100L))
      println(s"XMODAL spam i=$i hamming=$d")
    }
    // cross-pair floor over the whole 210-raster fixture: the smallest
    // Hamming between any two DISTINCT rasters in play
    val ids = (0L until 200L) ++ (120L until 130L)
    val hs = ids.map(ph).toArray
    var mn = 64
    for (x <- hs.indices; y <- x + 1 until hs.length if hs(x) != hs(y))
      mn = math.min(mn, java.lang.Long.bitCount(hs(x) ^ hs(y)))
    println(s"XMODAL min-cross-hamming=$mn")
  }
}
