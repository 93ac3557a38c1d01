package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session settings shared by the harness mains (Bench,
  * Verify, the SCALING measurement mains).
  *
  * Codegen-class cache (round-14 optimization, measured): Spark's
  * whole-stage-codegen compiler caches compiled classes in a
  * 100-entry LRU (`spark.sql.codegen.cache.maxEntries`, static conf).
  * This suite runs 243 declared queries — thousands of distinct
  * codegen units per pass — so the default cache thrashes completely
  * and EVERY pass re-pays Janino compilation for EVERY stage. Sizing
  * the cache to cover the suite removes that recompilation:
  * measured at sf0.1/32 cpus, a 21-query relational subset fell
  * 25.5 → 14.5 s published (pass 2: 25.6 → 14.5 s) and a 59-query
  * heavy subset (streaming + index families) 158.5 → 115.1 s, with
  * no code change. Scale-independent: compilation is per-JVM work —
  * a cluster driver AND every executor pay the same thrash when a
  * workload cycles more plan shapes than the cache holds. Env
  * override for constrained heaps; compiled classes are small, so
  * 8192 entries is a few tens of MB. */
object SessionTuning {

  val CodegenCacheKey = "spark.sql.codegen.cache.maxEntries"

  def codegenCacheEntries: String =
    sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192")

  /** Apply the shared engine-level settings to a session builder.
    * Static SQL confs (the codegen cache) only take effect when the
    * builder CREATES the JVM's first session — harness mains call this
    * before getOrCreate, which is exactly that moment. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config(CodegenCacheKey, codegenCacheEntries)
}
