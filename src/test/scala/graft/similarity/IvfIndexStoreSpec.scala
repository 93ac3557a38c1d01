package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IvfIndexStoreSpec extends SparkSpec {

  test("persisted search is row-identical to the in-memory portable IVF (sf0.001)") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val dir = Files.createTempDirectory("graft-ivfidx-spec-")
    dir.toFile.deleteOnExit()
    IvfIndexStore.write(emb, dir.toString)
    val persisted = IvfIndexStore
      .search(spark, dir.toString, emb.filter(col("vec_id") < 20))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val inMemory = Ann
      .ivfKmeansTopKPortable(emb, 10, queryPred = col("vec_id") < 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(persisted == inMemory,
      "the parquet round-trip must not change a single result row")
  }

  test("index is self-contained: search touches only the index dir") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val dir = Files.createTempDirectory("graft-ivfidx-spec2-")
    dir.toFile.deleteOnExit()
    IvfIndexStore.write(emb, dir.toString)
    // queries built from a literal frame — no read of the corpus table
    val qRows = emb.filter(col("vec_id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    import spark.implicits._
    val queries = qRows.toSeq.toDF("vec_id", "embedding")
    val out = IvfIndexStore.search(spark, dir.toString, queries)
    assert(out.count() == 30)
    // and the lists sink really carries the vectors (the serving-side
    // contract): every corpus row is in exactly one inverted list
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.count() == emb.count())
    assert(lists.select("vec_id").distinct().count() == emb.count())
  }

  test("staleness tripwire: the fingerprint rejects a different corpus") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val dir = Files.createTempDirectory("graft-ivfidx-spec3-")
    dir.toFile.deleteOnExit()
    IvfIndexStore.write(emb, dir.toString)
    assert(IvfIndexStore.isFreshFor(spark, dir.toString, emb))
    // same row count, one vector perturbed — count alone cannot catch
    // it, the content fingerprint must
    val perturbed = emb.withColumn("embedding",
      when(col("vec_id") === 0,
        transform(col("embedding"), x => x + lit(1.0f)))
        .otherwise(col("embedding")))
    assert(!IvfIndexStore.isFreshFor(spark, dir.toString, perturbed),
      "a content change with unchanged count must flip the fingerprint")
    val other = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    assert(!IvfIndexStore.isFreshFor(spark, dir.toString, other))
  }
}
