package graft.multimodal

import graft.SparkSpec

class PhashSpec extends SparkSpec {

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, p) => Multimodal.Media(id, p) }.toDS()
  }

  // strongly-profiled payload: high bytes then low bytes — every
  // bucket sits far from the mean, so the fingerprint has wide margins
  private def profiled(hi: Int, lo: Int, n: Int = 600): Array[Byte] =
    (Array.fill(n / 2)(hi.toByte) ++ Array.fill(n / 2)(lo.toByte))

  test("phash: identical payloads pair at hamming 0; disjoint profiles do not pair") {
    val a = profiled(200, 10)
    val inverted = profiled(10, 200) // complement profile: hamming = 60
    val got = Multimodal.phashPairs(media(
      (1L, a), (2L, a.clone()), (3L, inverted)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 0)), got.mkString(", "))
  }

  test("phash: wide-margin fingerprints survive small perturbations") {
    val a = profiled(200, 10)
    val b = profiled(200, 10)
    b(5) = (b(5) + 3).toByte // tiny sample-level noise
    b(400) = (b(400) - 2).toByte
    val got = Multimodal.phashPairs(media((1L, a), (2L, b)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 0)), got.mkString(", "))
  }

  test("phash: payloads shorter than 60 samples are skipped") {
    val got = Multimodal.phashFingerprints(media(
      (1L, Array.fill(59)(1.toByte)), (2L, profiled(200, 10)))).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
