package graft.similarity

import graft.SparkSpec

class ContrastiveMiningSpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives: nearest same-label vector is excluded") {
    // anchor 1 (label 0) sits next to 2 (label 0, d=1) — its hard
    // negatives must skip 2 and rank the label-1 cluster by distance.
    val vecs = Seq(
      (1L, Array(0f, 0f), 0),
      (2L, Array(1f, 0f), 0),
      (3L, Array(2f, 0f), 1),
      (4L, Array(3f, 0f), 1),
      (5L, Array(4f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = ContrastiveMining.hardNegatives(vecs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.groupBy(_._1).view.mapValues(_.sortBy(e => (e._3, e._2))).toMap
    assert(byId(1L).map(_._2).toSeq == Seq(3L, 4L))  // never 2 (same label)
    assert(byId(1L).map(_._3).toSeq == Seq(2.0, 3.0))
    assert(byId(3L).map(_._2).toSeq == Seq(2L, 1L))  // cross-label only
    // every mined pair is cross-label
    val labels = Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1)
    assert(out.forall { case (id, nbr, _) => labels(id) != labels(nbr) })
    // k bound holds
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
  }
}
