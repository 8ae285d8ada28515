package graft.fixtures

import org.scalatest.funsuite.AnyFunSuite

/** Per-row payload invariant from BASELINE.json input_hint: lossless decode
  * bit-exact, lossy PSNR >= 40 dB, caption equality, phash consistency.
  */
class ImagesSpec extends AnyFunSuite {

  test("deterministic generation: same id, same bytes") {
    val a = Images.rowAt(7)
    val b = Images.rowAt(7)
    assert(a.bytes.sameElements(b.bytes))
    assert(a.caption == b.caption && a.phash == b.phash)
  }

  test("rows validate: png bit-exact, jpeg PSNR >= 40 dB, caption + phash") {
    val rows = (0L until 24L).map(Images.rowAt)
    assert(rows.exists(_.fmt == "png") && rows.exists(_.fmt == "jpeg"))
    rows.foreach { r =>
      assert(Images.validate(r), s"${r.image_id} (${r.fmt} ${r.w}x${r.h}) failed validation")
    }
  }

  test("corrupted caption or payload fails validation") {
    val r = Images.rowAt(3)
    assert(!Images.validate(r.copy(caption = r.caption + "!")))
    assert(!Images.validate(r.copy(phash = r.phash ^ 1L)))
  }

  test("tampered corpus: every kind produces exactly its analytic verdict (real decode)") {
    (0L until 48L).foreach { i =>
      val got = Images.validateVerdict(Images.tamperedRowAt(i))
      assert(got == Images.expectedVerdict(i),
        s"i=$i kind=${i % 6}: got $got, expected ${Images.expectedVerdict(i)}")
    }
  }

  test("analytic PSNR claims behind the tamper plan hold on every fixture size") {
    // kind 3's "quality" verdict rests on q0.30 JPEG landing < 40 dB, and
    // kind 5's on a one-pixel perturb breaking PNG bit-exactness — pin both
    // against real decodes across all (w, h) combinations in the corpus
    (0L until 48L).foreach { i =>
      val base = Images.rowAt(i)
      val render = Images.renderPixels(base.image_id, base.w, base.h)
      val lossy = Images.decode(Images.encodeJpeg(render, 0.30f))
      assert(Images.psnr(lossy, render) < 40.0,
        s"${base.image_id} ${base.w}x${base.h}: q0.30 JPEG unexpectedly >= 40 dB")
      // untampered JPEG at the fixture's q0.95 stays ABOVE the gate
      if (base.fmt == "jpeg")
        assert(Images.psnr(Images.decode(base.bytes), render) >= 40.0)
    }
    val img = Images.renderPixels("img-00000005", 32, 32)
    img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x00404040)
    val roundTrip = Images.decode(Images.encode(img, "png"))
    val clean = Images.renderPixels("img-00000005", 32, 32)
    val p = Images.psnr(roundTrip, clean)
    assert(p < 99.0 && p > 30.0, s"one-pixel perturb PSNR $p out of expected band")
  }
}
