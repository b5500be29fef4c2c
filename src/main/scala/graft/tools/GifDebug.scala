package graft.tools

object GifDebug {
  def main(args: Array[String]): Unit = {
    import graft.functions.Multimodal._
    val f0 = Array.tabulate(12)(i => (i * 20) % 256)
    val one = encodeGif(4, 3, Seq(f0))
    println("single: " + decodeGifFrames(one).map(_._4.toSeq).mkString(" | "))
    val f1 = Array.tabulate(12)(i => 255 - i)
    val f2 = Array.tabulate(12)(_ => 7)
    val three = encodeGif(4, 3, Seq(f0, f1, f2))
    decodeGifFrames(three).foreach { case (i, w, h, s) =>
      println(s"frame $i ${w}x$h: " + s.toSeq) }
  }
}
