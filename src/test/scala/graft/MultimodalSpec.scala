package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaItem, Multimodal}

/** The batch plumbing mm_decode_batch runs but (deliberately) does not
  * emit: fixed-size grouping, per-batch decoder invocation, byte stats.
  */
class MultimodalSpec extends AnyFunSuite {

  private def item(id: Long, bytes: Array[Byte]) =
    MediaItem(id, "text", bytes.length.toLong, bytes)

  test("fakeDecode stamps every item with its batch's size") {
    val batch = (0 until 7).map(i => item(i, Array[Byte](1, 2, 3)))
    val out = Multimodal.fakeDecode(batch)
    assert(out.map(_.batch_size) == Seq.fill(7)(7))
  }

  test("grouped(32) batching yields full batches plus the remainder") {
    val items = (0 until 70).map(i => item(i, Array[Byte](i.toByte)))
    val sizes = items.grouped(32).map(g =>
      Multimodal.fakeDecode(g.toSeq).map(_.batch_size).distinct).toSeq
    assert(sizes == Seq(Seq(32), Seq(32), Seq(6)))
  }

  test("byte stats are unsigned and exact (one IEEE division, no rounding)") {
    val bytes = Array[Byte](0, -1, 127, -128) // unsigned: 0, 255, 127, 128
    val out = Multimodal.fakeDecode(Seq(item(1, bytes))).head
    assert(out.n_bytes == 4L)
    assert(out.max_byte == 255)
    assert(out.mean_byte == (0L + 255L + 127L + 128L).toDouble / 4)
  }

  test("empty payload degrades to zeros instead of dividing by zero") {
    val out = Multimodal.fakeDecode(Seq(item(2, Array.empty[Byte]))).head
    assert(out.mean_byte == 0.0 && out.max_byte == 0 && out.n_bytes == 0L)
  }
}
