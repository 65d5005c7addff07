package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the REAL codec-free image kernels (pure
  * byte math, no Spark session): P6 encode/decode as an exact round
  * trip over arbitrary dimensions and pixel bytes, header tolerance,
  * and nearest-neighbor resize structural invariants.
  */
object MultimodalProperties extends Properties("multimodal") {

  private val genDim = Gen.chooseNum(1, 24)
  private val genByte = Gen.chooseNum(0, 255).map(_.toByte)

  private def genRgb(w: Int, h: Int): Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](w * h * 3, genByte)

  property("ppm.roundTrip") = forAll(genDim, genDim) { (w, h) =>
    forAll(genRgb(w, h)) { rgb =>
      Multimodal.decodePpm(Multimodal.encodePpm(w, h, rgb)) match {
        case Some((dw, dh, drgb)) =>
          dw == w && dh == h && drgb.sameElements(rgb)
        case None => false
      }
    }
  }

  property("ppm.commentTolerant") = forAll(genDim, genDim) { (w, h) =>
    forAll(genRgb(w, h)) { rgb =>
      val withComment =
        (s"P6\n# a comment line\n$w $h\n# another\n255\n"
          .getBytes("US-ASCII") ++ rgb)
      Multimodal.decodePpm(withComment)
        .exists { case (dw, dh, d) =>
          dw == w && dh == h && d.sameElements(rgb)
        }
    }
  }

  property("ppm.truncatedNeverDecodes") = forAll(genDim, genDim) { (w, h) =>
    forAll(genRgb(w, h)) { rgb =>
      val full = Multimodal.encodePpm(w, h, rgb)
      // dropping any pixel byte must fail, never mis-decode
      Multimodal.decodePpm(full.dropRight(1)).isEmpty
    }
  }

  property("resize.identityAtSameDims") = forAll(genDim, genDim) { (w, h) =>
    forAll(genRgb(w, h)) { rgb =>
      Multimodal.resizeRgb(w, h, rgb, w, h).sameElements(rgb)
    }
  }

  property("resize.upscaleReplicatesCorners") =
    forAll(genDim, genDim) { (w, h) =>
      forAll(genRgb(w, h)) { rgb =>
        val out = Multimodal.resizeRgb(w, h, rgb, w * 2, h * 2)
        // (0,0) of the output samples (0,0) of the input; the output
        // buffer has exactly the resized pixel count
        out.length == w * 2 * h * 2 * 3 &&
          out(0) == rgb(0) && out(1) == rgb(1) && out(2) == rgb(2)
      }
    }
}
