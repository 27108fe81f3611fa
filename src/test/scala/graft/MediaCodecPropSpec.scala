package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bmp, Png, Wav}

/** Property round-trips for the media codecs over RANDOM content and
  * dimensions — the complement of MediaCodecSpec's fixed fixtures:
  * whatever plane/sample stream the generators produce, encode→decode
  * must be the identity (gray BMP/PNG via the luma identity; WAV PCM
  * verbatim), across odd widths (stride padding), both BMP row orders,
  * and the full int32 sample range. House idiom: ScalaCheck Gen +
  * explicit case loops (no scalatestplus bridge in the dependency set).
  */
class MediaCodecPropSpec extends AnyFunSuite {

  private val Cases = 200

  private def samples[A](g: Gen[A]): Seq[A] =
    Gen.listOfN(Cases, g).sample.get

  private val dimsAndPlane: Gen[(Int, Int, Array[Long], Boolean)] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 40)
    p <- Gen.containerOfN[Array, Long](w * h, Gen.chooseNum(0L, 255L))
    td <- Gen.oneOf(false, true)
  } yield (w, h, p, td)

  test(s"bmp: luma(decode(encode24(plane))) == plane for $Cases random " +
      "(plane, dims, row order) cases") {
    samples(dimsAndPlane).foreach { case (w, h, p, td) =>
      assert(Bmp.luma(Bmp.decode(Bmp.encode24(w, h, p, td)))
        .sameElements(p), s"${w}x$h topDown=$td")
    }
  }

  test(s"png: luma(decode(encodeGray(plane))) == plane for $Cases " +
      "random (plane, dims) cases") {
    samples(dimsAndPlane).foreach { case (w, h, p, _) =>
      assert(Bmp.luma(Png.decode(Png.encodeGray(w, h, p)))
        .sameElements(p), s"${w}x$h")
    }
  }

  test(s"wav: decode(encodePcm32(samples)) == samples across the full " +
      s"int32 range, $Cases cases") {
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      s <- Gen.containerOfN[Array, Long](n,
        Gen.chooseNum(Int.MinValue.toLong, Int.MaxValue.toLong))
    } yield s
    samples(gen).foreach { s =>
      assert(Wav.decode(Wav.encodePcm32(s)).sameElements(s))
    }
  }

  test(s"decodeImage dispatch: both containers of the same random " +
      s"32x32 plane decode to the same image, $Cases cases") {
    val gen = Gen.containerOfN[Array, Long](1024, Gen.chooseNum(0L, 255L))
    samples(gen).foreach { p =>
      val a = graft.operators.Multimodal.decodeImage(Bmp.encode24(32, 32, p))
      val b = graft.operators.Multimodal.decodeImage(Png.encodeGray(32, 32, p))
      assert(a.pixels.sameElements(b.pixels))
    }
  }
}
