package graft.tools
object DriveImgScale {
  def work(tid: Int, per: Int): Long = {
    var ok = 0L
    var i = 0
    while (i < per) {
      val id = tid * 100000L + i
      val img = graft.fixtures.ImageGen.raster(id % 4096)
      val bytes = graft.fixtures.ImageGen.encode(img, graft.fixtures.ImageGen.fmtOf(id % 4096))
      val dec = graft.validate.ImageValidate.decode(bytes)
      if (graft.validate.ImageValidate.psnr(img, dec) > 30) ok += 1
      i += 1
    }
    ok
  }
  def main(a: Array[String]): Unit = {
    val per = 2000
    Seq(1, 2, 8).foreach { threads =>
      work(99, 200) // warm
      val t0 = System.nanoTime()
      val ts = (0 until threads).map(t => new Thread(() => work(t, per)))
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"IMG threads=$threads imgs=${threads * per} secs=$dt%.2f per_sec=${threads * per / dt}%.0f")
    }
  }
}
