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
}
