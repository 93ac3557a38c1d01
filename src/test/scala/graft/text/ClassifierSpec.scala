package graft.text

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  // doc_id % 10 == 0 → held-out; others train
  private def confusion(docs: Seq[(Long, String, String)]): Seq[(String, String, Long)] = {
    import spark.implicits._
    Classifier.tokenClassifier(docs.toDF("doc_id", "lang", "text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("tokenClassifier: disjoint vocabularies classify perfectly") {
    val got = confusion(Seq(
      (1L, "en", "dog cat dog"),
      (2L, "en", "cat bird"),
      (3L, "fr", "chien chat"),
      (4L, "fr", "chat oiseau chat"),
      (10L, "en", "dog bird"),   // held-out, english words only
      (20L, "fr", "chien chat"), // held-out, french words only
      (30L, "fr", "oiseau")))    // held-out, french word only
    assert(got == Seq(("en", "en", 1L), ("fr", "fr", 2L)), got.mkString(", "))
  }

  test("tokenClassifier: affinity weighs class-conditional frequency, ties break to first class name") {
    // held-out doc 10 is the single shared token "x":
    //   en train: "x x x y" → cnt(x,en)=3, T_en=4 → score 3/4
    //   fr train: "x z"     → cnt(x,fr)=1, T_fr=2 → score 1/2
    val a = confusion(Seq(
      (1L, "en", "x x x y"),
      (2L, "fr", "x z"),
      (10L, "zz", "x")))
    assert(a == Seq(("zz", "en", 1L)), a.mkString(", "))
    // exact tie: cnt/T identical (1/2 vs 2/4) → smaller class name wins
    val b = confusion(Seq(
      (1L, "en", "x y"),
      (2L, "fr", "x x y z"),
      (10L, "zz", "x")))
    assert(b == Seq(("zz", "en", 1L)), b.mkString(", "))
  }

  test("tokenClassifier: doc with no trained tokens scores 0 everywhere, still predicted (first class)") {
    val got = confusion(Seq(
      (1L, "en", "alpha beta"),
      (2L, "fr", "gamma delta"),
      (10L, "en", "omega omega")))
    assert(got == Seq(("en", "en", 1L)), got.mkString(", "))
  }
}
