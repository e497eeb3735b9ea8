package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures driver/executor storage growth when DISTINCT corpora churn
  * through the cosine router's LRU-8 memo ([[graft.search.TextSearch]]).
  *
  * Why measure instead of unpersist-on-evict: the memoized relations are
  * `localCheckpoint`ed — the stored blocks ARE the data (lineage is
  * truncated), so force-unpersisting an evicted entry would break any
  * caller still holding a returned plan that references it (recompute is
  * impossible by construction). Eviction therefore only drops the memo's
  * strong reference and lets the ContextCleaner reclaim the blocks once
  * caller references are gone — this probe quantifies what that policy
  * costs under worst-case churn (every call a distinct corpus, nothing
  * retained by the caller).
  *
  * Usage: graft.tools.MemoChurnProbe [nCorpora] [docsPerCorpus]
  * Prints one JSON line: storage bytes + cached-RDD count after warm-up,
  * mid-churn, and after churn + GC, plus the memo's own sizes.
  */
object MemoChurnProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nCorpora = args.headOption.map(_.toInt).getOrElse(24)
    val docsPer = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.search.TextSearch

    def corpus(seed: Int) = spark.range(docsPer.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          // sf0.1-documents-like rows: ~30 tokens from a salted vocab so
          // each corpus has a DISTINCT canonical plan (seed is baked in)
          (0 until 30).map(j =>
            concat(lit("w"), pmod(xxhash64(col("id"), lit(j), lit(seed)),
              lit(1000)))): _*).as("text"))

    def storage(): (Long, Int) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(i => i.memSize + i.diskSize).sum, infos.length)
    }

    TextSearch.clearRouterMemo()
    TextSearch.cosineSimilarityJoin(corpus(0), 0.9).count() // warm
    val (b0, n0) = storage()
    var mid: (Long, Int) = (0L, 0)
    (1 to nCorpora).foreach { i =>
      TextSearch.cosineSimilarityJoin(corpus(i), 0.9).count()
      if (i == nCorpora / 2) mid = storage()
    }
    val (b1, n1) = storage()
    // nothing retains the evicted plans here; give the ContextCleaner a
    // GC cycle to enqueue + drain
    System.gc(); Thread.sleep(3000)
    val (b2, n2) = storage()
    println(f"""{"n_corpora":$nCorpora,"docs_per":$docsPer,"after_warm_bytes":$b0,"after_warm_rdds":$n0,"mid_bytes":${mid._1},"mid_rdds":${mid._2},"after_churn_bytes":$b1,"after_churn_rdds":$n1,"after_gc_bytes":$b2,"after_gc_rdds":$n2}""")
    spark.stop()
  }
}
