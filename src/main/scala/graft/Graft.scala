package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single entry point for the library — the operator surface a user of
  * the reference system (IBM/tabsketchfm) maps onto directly, plus the
  * training-data-pipeline extensions. Every method delegates to the
  * module that implements it; see each module's Scaladoc for the scale
  * contract and the driver queries in [[SparkEntry]] for end-to-end,
  * oracle-verified usage of every operator.
  *
  * Reference workflow → facade:
  *  - sketch building (`data_prep.py` E1)       → [[ingestTable]], [[profileLake]], [[snapshot]], [[sketchStore]]
  *  - incremental upkeep (no reference analogue) → [[profileChunk]], [[mergeProfiles]]
  *  - discovery search (`embedding_search.py`)   → [[searchUnionable]], [[searchTables]], [[evaluateSearch]]
  *  - pair scoring (`tabsketchfm_finetune.py`)   → [[pairFeatures]], [[trainPairScorer]], external scorers via [[ml.Scorer]]
  *  - tokenizer tensors (`tabular_tokenizer.py`) → [[ml.FeatureAssembly]], [[ml.TokenizerOps]], [[ml.WordPiece]]
  *  - pipeline extensions                        → [[dedupCorpus]], [[qualityFilter]], [[scrubPii]], [[sampleStratified]], `operators.Ann`, `streaming.*`
  */
object Graft {

  // ---- ingest & profile (S*/P*/A* rows) ----

  /** Fault-tolerant table read: charset+delimiter sniff → strict →
    * permissive → xlsx; None for unreadable or <5-row tables. */
  def ingestTable(spark: SparkSession, path: String): Option[DataFrame] =
    ingest.RobustCsv.read(spark, path)

  /** Profile every table of a parquet lake into the long-format sketch
    * catalog (capped at the reference's 10k rows unless overridden).
    * ONE fixed-shape job regardless of table count (multi-path binary
    * scan + keyed aggregation) — the loop-free path for 40k-table lakes.
    * Tables whose parquet types the unified decoder cannot express
    * (decimals, maps/structs, non-float lists) are detected up front by
    * a one-job footer probe and profiled through the per-table path, so
    * mixed lakes profile completely instead of failing mid-job.
    * `withSketches=false` skips the MinHash digests, `withQuantiles=false`
    * the exact-decile subtree — stats-only profiling at corpus scale pays
    * for neither. */
  def profileLake(spark: SparkSession, dir: String, tables: Seq[String],
                  rowCap: Option[Int] = Some(10000),
                  withSketches: Boolean = true,
                  withQuantiles: Boolean = true): DataFrame = {
    require(tables.nonEmpty, "profileLake needs at least one table")
    val exotic = sources.LakeScan.unsupportedTables(spark, dir, tables).toSet
    val unified = tables.filterNot(exotic)
    val parts =
      (if (unified.nonEmpty)
        Seq(profile.Profiler.profileLakeUnified(spark, dir, unified,
          withSketches, rowCap, withQuantiles))
      else Nil) ++
      (if (exotic.nonEmpty)
        Seq(profile.Profiler.profileLake(spark, dir, tables.filter(exotic),
          withSketches, rowCap, withQuantiles))
      else Nil)
    parts.reduce(_ unionByName _)
  }

  /** Whole-table content snapshot (A13). */
  def snapshot(df: DataFrame, tableName: String): DataFrame =
    profile.Profiler.contentSnapshot(df, tableName)

  /** Persist / reload the catalog as partitioned parquet (S7/S8). */
  def sketchStore: store.SketchStore.type = store.SketchStore

  /** Mergeable partial profile of one chunk (append-only upkeep). */
  def profileChunk(df: DataFrame, tableName: String): DataFrame =
    profile.Incremental.profileChunk(df, tableName)

  /** Exact fold of chunk profiles (digests slot-min, HLL union). */
  def mergeProfiles(chunks: DataFrame): DataFrame =
    profile.Incremental.merge(chunks)

  /** Mergeable quantile sketch of one chunk (HDR-style exponential
    * histogram, exact-integer buckets) — the incremental/streaming
    * answer to the 13-vector's exact quantiles. */
  def quantileSketch(df: DataFrame, tableName: String): DataFrame =
    profile.QuantileSketch.sketchChunk(df, tableName)

  /** Fold chunk quantile sketches (bucket counts add). */
  def mergeQuantileSketches(sketches: DataFrame): DataFrame =
    profile.QuantileSketch.merge(sketches)

  /** Decile read-back from a merged quantile sketch (±1.6 % relative). */
  def sketchDeciles(sketch: DataFrame): DataFrame =
    profile.QuantileSketch.deciles(sketch)

  // ---- discovery search (J*/O*/Q* rows) ----

  /** Top-k unionable tables for a query table over the profile catalog. */
  def searchUnionable(profiles: DataFrame, queryTable: String, k: Int = 10): DataFrame =
    search.Discovery.searchUnionable(profiles, queryTable, k)

  /** Top-k near-duplicate tables by content-snapshot Jaccard. */
  def searchTables(snapshots: DataFrame, queryTable: String, k: Int = 10): DataFrame =
    search.Discovery.searchTables(snapshots, queryTable, k)

  /** precision/recall@k of ranked results against ground truth (J3). */
  def evaluateSearch(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame =
    search.Evaluation.precisionAtK(results, groundTruth, k)

  // ---- pair scoring (Q7) ----

  def pairFeatures(pairs: DataFrame, profiles: DataFrame): DataFrame =
    ml.PairScoring.pairFeatures(pairs, profiles)

  def trainPairScorer(features: DataFrame, labelCol: String,
                      problemType: String = "classification"): ml.TableScorer =
    new ml.Scorer.PipelineScorer(
      ml.PairScoring.trainScorer(features, labelCol, problemType))

  // ---- training-data pipeline extensions ----

  /** Near-dup removal end to end: banded MinHash pairs → connected
    * components → one representative per cluster. */
  def dedupCorpus(docs: DataFrame, threshold: Double = 0.8,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    operators.Dedup.dropNearDuplicates(docs,
      operators.Dedup.minhashNearDups(docs, threshold, idCol, textCol,
        bands = 20), idCol)

  def qualityFilter(docs: DataFrame,
                    rules: operators.TextAnalysis.QualityRules =
                      operators.TextAnalysis.QualityRules()): DataFrame =
    operators.TextAnalysis.qualityFilter(docs, rules)

  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    operators.TextAnalysis.scrubPii(docs, textCol)

  /** τ=0.5 temperature-flattened multi-source mixture sampling at a
    * token budget — deterministic, partition-invariant, engine-replayable. */
  def sampleTemperatureMix(df: DataFrame, sourceCol: String, tokenCol: String,
                           idCol: String, targetFrac: Double = 0.3): DataFrame =
    operators.Sampling.temperatureMixture(df, sourceCol, tokenCol, idCol, targetFrac)

  def sampleStratified(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double], defaultFraction: Double,
                       idCol: String, salt: String = "s0"): DataFrame =
    operators.Sampling.stratifiedSample(df, strataCol, fractions,
      defaultFraction, idCol, salt)

  /** Exact cosine top-k over an embedding column (queries broadcast). */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    operators.Ann.bruteForceTopK(corpus, queries, k)

  /** Int8 scalar-quantized cosine top-k: 4× smaller resident corpus,
    * exact-integer dots — the memory-bound scale path. */
  def annQuantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    operators.Ann.quantizedTopK(corpus, queries, k)

  /** Two-stage retrieval: quantized prefilter (k·oversample candidates)
    * → full-precision exact-cosine rerank. */
  def annRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                    oversample: Int = 4): DataFrame =
    operators.Ann.rerankTopK(corpus, queries, k, oversample)

  /** Trained-IVF ANN: deterministic integer-space Lloyd's k-means cells,
    * nProbe-cell search, full-precision cosine scoring. */
  def annKmeansIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                       kCells: Int = 64, iters: Int = 3, nProbe: Int = 4): DataFrame =
    operators.Ann.kmeansIvfTopK(corpus, queries, k, kCells, iters, nProbe)

  /** URL decomposition: scheme/host/path + registered domain. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame =
    operators.Web.withUrlParts(df, urlCol)

  /** CCNet-style per-registered-domain document cap (deterministic
    * salted-hash selection). Expects [[withUrlParts]] columns. */
  def capPerDomain(df: DataFrame, maxPerDomain: Int, idCol: String,
                   salt: String = "s0"): DataFrame =
    operators.Web.perDomainCap(df, maxPerDomain, idCol, salt)

  /** Train a BPE subword vocabulary: learned merge pairs over the
    * corpus word-frequency relation (one corpus-scale shuffle, then
    * vocab-sized rounds). */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               maxWords: Option[Int] = None): (Seq[ml.Bpe.Merge], DataFrame) =
    ml.Bpe.train(ml.Bpe.wordFreq(docs, textCol, maxWords), numMerges)

  /** BM25 keyword top-k over a document corpus (text-search modality). */
  /** Per-doc TF-IDF top terms (smooth idf, deterministic tiebreaks). */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5): DataFrame =
    search.TextSearch.tfidfTopTerms(docs, topK)

  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10): DataFrame =
    search.TextSearch.bm25TopK(docs, queryTerms, k)

  /** Bigram-LM mean log-probability per doc (perplexity-style quality
    * filtering; train and score corpora may differ). */
  def lmQualityScore(docs: DataFrame, train: DataFrame): DataFrame =
    operators.TextAnalysis.bigramLogProb(docs, train)

  /** CCNet head/middle/tail perplexity buckets per language (exact
    * positional tertiles over the LM score). */
  def perplexityBuckets(docs: DataFrame, train: DataFrame): DataFrame =
    operators.TextAnalysis.perplexityBuckets(docs, train)

  /** C4 line/page cleaning rules (terminal punctuation, min words per
    * line, javascript/lorem/brace/policy-word pages). Shuffle-free. */
  def c4Filter(docs: DataFrame,
               rules: operators.TextAnalysis.C4Rules =
                 operators.TextAnalysis.C4Rules()): DataFrame =
    operators.TextAnalysis.c4Filter(docs, rules)

  /** Dominant principal direction + explained-variance share of an
    * embedding corpus (All-but-the-top anisotropy report). */
  def embeddingPca(embs: DataFrame, nIter: Int = 6): DataFrame =
    operators.Ann.powerIterationPca(embs, nIter)

  /** All-but-the-top common-component removal: before/after variance
    * and axis-anisotropy report. */
  def embeddingAbtt(embs: DataFrame, nIter: Int = 6): DataFrame =
    operators.Ann.abttReport(embs, nIter)

  /** Mutual-kNN neighborhood health (hubness/orphans/reciprocity). */
  def knnGraphReport(embs: DataFrame, k: Int = 5): DataFrame =
    operators.Ann.knnGraphReport(embs, k)

  /** Soft dedup: 1/|cluster| ppm sampling weights instead of removal. */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id"): DataFrame =
    operators.Dedup.softDedupWeights(docs, pairs, idCol)

  /** Integer box-filter resize over REAL decoded image rasters. */
  def resizeImages(media: DataFrame, factor: Int = 2): DataFrame =
    multimodal.Multimodal.resizeStats(media, factor)

  /** Day-of-week seasonality index per event type (exact ppm). */
  def weekdaySeasonality(events: DataFrame): DataFrame =
    operators.Events.weekdaySeasonality(events)

  /** MERGE INTO semantics: apply an upsert/delete changelog to a keyed
    * snapshot — one struct-max compaction + one full-outer join. */
  def mergeUpsert(target: DataFrame, changes: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String], opCol: String = "op"): DataFrame =
    operators.Merge.upsert(target, changes, keyCols, orderCols, opCol)

  /** Out-of-order-safe LWW CDC apply with tombstones (commutative over
    * any batch split — the streaming foreachBatch shape). */
  def mergeUpsertLww(state: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], orderCols: Seq[String],
                     opCol: String = "op"): DataFrame =
    operators.Merge.upsertLww(state, changes, keyCols, orderCols, opCol)

  /** Fold a new duplicate-pair batch into a stored cluster-label
    * catalog (never rescans history; star-edge contraction). */
  def mergeClusterLabels(catalog: DataFrame, newPairs: DataFrame): DataFrame =
    operators.Dedup.mergeClusterLabels(catalog, newPairs)

  /** CCNet perplexity tertiles at bounded state: sketch-cut variant. */
  def perplexityBucketsSketch(docs: DataFrame, train: DataFrame): DataFrame =
    operators.TextAnalysis.perplexityBucketsSketch(docs, train)

  /** Drop docs sharing long n-grams with an eval set (leakage guard). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    threshold: Double = 0.05): DataFrame =
    operators.Decontamination.decontaminate(docs, benchmark, n, threshold)

  /** Decontamination overlap report with a Bloom-bitmap prefilter: the
    * corpus-side shingle test becomes a map-side predicate (zero
    * shuffle); exact overlap counts are unchanged (no false negatives). */
  def decontamReportBloom(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                          threshold: Double = 0.05,
                          spec: operators.Bloom.BloomSpec = operators.Bloom.BloomSpec()): DataFrame =
    operators.Bloom.prefilterOverlap(docs, benchmark, n, threshold, spec)

  /** CCNet-style line dedup: drop lines repeated across more than
    * `maxDocsPerLine` docs (min-id owner keeps its copy), reassemble
    * each doc's residue in order. */
  def lineDedup(docs: DataFrame, maxDocsPerLine: Int = 1): DataFrame =
    operators.Dedup.lineDedup(docs, maxDocsPerLine)

  /** Per-doc sketch catalog rows (fingerprint + MinHash) to persist for
    * later incremental dedup. */
  def docSketchCatalog(docs: DataFrame): DataFrame =
    operators.Dedup.sketchCatalog(docs)

  /** Flag a new batch against a stored [[docSketchCatalog]] — exact +
    * banded near-dup matches without rescanning the corpus. */
  def incrementalDedup(newDocs: DataFrame, catalog: DataFrame,
                       threshold: Double = 0.8): DataFrame =
    operators.Dedup.incrementalDedupReport(newDocs, catalog, threshold)

  /** Count-Min frequency sketch over a column — relational, mergeable
    * ([[mergeCms]]), never undercounts. */
  def cmsBuild(df: DataFrame, valueCol: String,
               spec: profile.CountMin.CmsSpec = profile.CountMin.CmsSpec()): DataFrame =
    profile.CountMin.build(df, valueCol, spec)

  def mergeCms(a: DataFrame, b: DataFrame): DataFrame = profile.CountMin.merge(a, b)

  def cmsEstimate(cms: DataFrame, values: DataFrame, valueCol: String,
                  spec: profile.CountMin.CmsSpec = profile.CountMin.CmsSpec()): DataFrame =
    profile.CountMin.estimate(cms, values, valueCol, spec)

  /** Relational HLL registers over a column (optionally grouped);
    * mergeable by register max ([[mergeHll]]). */
  def hllRegisters(df: DataFrame, valueCol: String,
                   groupCols: Seq[String] = Nil): DataFrame =
    profile.Hll.registers(df, valueCol, profile.Hll.HllSpec(), groupCols)

  def mergeHll(a: DataFrame, b: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    profile.Hll.merge(a, b, groupCols)

  def hllEstimate(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    profile.Hll.estimate(regs, profile.Hll.HllSpec(), groupCols)

  /** Winnowing rolling-hash fingerprints: any shared substring of
    * ≥ k+w-1 chars between two docs yields a shared fingerprint. */
  def fingerprintDocs(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", k: Int = 8, w: Int = 4): DataFrame =
    operators.TextAnalysis.winnowFingerprints(docs, idCol, textCol, k, w)

  /** Sliding-window chunking into training sequences (token windows
    * with overlap) — codegen'd, shuffle-free. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlap: Int = 0): DataFrame =
    operators.TextAnalysis.chunkDocuments(docs, chunkTokens, overlap)

  /** Greedy per-shard packing of docs into ≤ maxTokens training bins
    * (one shuffle on the shard key). */
  def packSequences(docs: DataFrame, maxTokens: Int, nShards: Int = 16): DataFrame =
    operators.TextAnalysis.packSequences(docs, maxTokens, nShards)

  /** Parse media container headers (PNG/JPEG/GIF dims) out of binary
    * payload columns — distributed, pure-JVM, no codec dependency. */
  def probeMedia(media: DataFrame,
                 decoder: multimodal.MediaDecoder = multimodal.HeaderDecoder): DataFrame =
    multimodal.Multimodal.probeHeaders(media, decoder)

  /** FULL-FRAME decode of PNG / GIF / baseline-JPEG payload columns
    * (pure-JVM inflate+unfilter, LZW, Huffman+IDCT): pixel dimensions,
    * channel count, per-channel means; nulls for payloads outside the
    * decodable profiles. */
  def decodeFrames(media: DataFrame): DataFrame =
    multimodal.Multimodal.pixelStats(media)

  /** Decode WAV/RIFF integer-PCM payload columns: sample rate,
    * channels, frames, duration, RMS amplitude; nulls for non-PCM. */
  def decodeAudio(media: DataFrame): DataFrame =
    multimodal.Multimodal.audioStats(media)

  /** Cross-format exact media dedup: fingerprint the DECODED pixels
    * (so PNG/GIF/JPEG re-encodings of one image collide) and group via
    * the standard exact-dedup operator — one hash shuffle. */
  def mediaDuplicates(media: DataFrame): DataFrame =
    operators.Dedup.exactDuplicates(
      multimodal.Multimodal.pixelFingerprints(media)
        .filter(org.apache.spark.sql.functions.col("pixel_fp").isNotNull),
      idCol = "media_id", textCol = "pixel_fp")

  /** Probe MP4/ISO-BMFF payload columns: movie duration, visual-track
    * dimensions, track count — the metadata a frame-sampling plan
    * consumes (frame decode itself stays behind the codec seam). */
  def probeVideo(media: DataFrame): DataFrame =
    multimodal.Multimodal.videoProbe(media)

  /** Export a trained pair scorer's logistic head as a REAL ONNX
    * artifact; score it back via [[ml.Scorer.onnxModelFactory]] (opens a
    * pure-JVM [[ml.OnnxSession]] per partition — swap in a JNI OrtSession
    * by replacing the factory body only). */
  def exportScorerOnnx(model: org.apache.spark.ml.PipelineModel, path: String): Unit =
    ml.OnnxExport.exportLogistic(model, path)

  /** Refresh only the re-profiled tables inside a stored catalog. */
  def upsertCatalog(profiles: DataFrame, path: String): Unit =
    store.SketchStore.upsertParquet(profiles, path)

  /** Migration audit: slot-level digest agreement between two sketch
    * catalogs (e.g. engine sketches in `core.ReferenceMinHash` parity
    * mode vs reference-produced documents). */
  def compareSketchCatalogs(a: DataFrame, b: DataFrame): DataFrame =
    store.SketchStore.compareDigests(a, b)

  // ---- custom joins ----

  /** Latest right row with ts <= left ts per key (one key shuffle). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, payloadCols: Seq[String]): DataFrame =
    operators.AsOf.join(left, right, keyCols, tsCol, payloadCols)

  /** Points matched to containing intervals via bucketized equi-join. */
  def rangeJoin(points: DataFrame, pCol: String, intervals: DataFrame,
                loCol: String, hiCol: String, bucketWidth: Double): DataFrame =
    operators.RangeJoin.pointInInterval(points, pCol, intervals, loCol, hiCol, bucketWidth)

  /** Interval×interval overlap pairs, bucketized, each pair once. */
  def intervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                          right: DataFrame, rLo: String, rHi: String,
                          bucketWidth: Double): DataFrame =
    operators.RangeJoin.intervalOverlap(left, lLo, lHi, right, rLo, rHi, bucketWidth)

  /** Hot-key-safe equi-join: left load spread over `factor` salt buckets. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int = 16): DataFrame =
    operators.Skew.saltedJoin(left, right, key, factor)

  // ---- profiling extensions: information theory, quality, drift ----

  /** Shannon entropy per column (key-likeness signal). */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame =
    profile.InfoTheory.columnEntropy(df, cols)

  /** Pairwise mutual information (soft-FD / correlated-dim probe). */
  def mutualInformation(df: DataFrame, a: String, b: String): DataFrame =
    profile.InfoTheory.mutualInformation(df, a, b)

  /** TANE g3 approximate-FD scan over the listed columns. */
  def fdScan(df: DataFrame, cols: Seq[String], epsilon: Double = 0.01): DataFrame =
    profile.InfoTheory.fdScan(df, cols, epsilon)

  /** Inclusion-dependency (FK-discovery) scan across labeled columns. */
  def indScan(candidates: Seq[(String, DataFrame, String)],
              minContainment: Double = 0.5): DataFrame =
    profile.InfoTheory.indScan(candidates, minContainment)

  /** Declarative data-quality checks (not-null/unique/range/set/regex/FK). */
  def qualityChecks(df: DataFrame, rules: Seq[profile.Checks.Rule]): DataFrame =
    profile.Checks.run(df, rules)

  /** PSI distribution drift between a baseline and a current snapshot. */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
               nBuckets: Int = 10): DataFrame =
    profile.Drift.psiReport(base, current, valueCol, nBuckets)

  /** KMV distinct sketch; merge with [[profile.Kmv.merge]]; set algebra
    * (union/intersection/Jaccard across groups) via
    * [[profile.Kmv.setEstimates]]. */
  def kmvSketch(df: DataFrame, valueCol: String,
                groupCols: Seq[String] = Nil): DataFrame =
    profile.Kmv.sketch(df, valueCol, profile.Kmv.KmvSpec(), groupCols)

  /** Robust median/MAD outlier report (Hampel rule, exact cent space). */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Double = 3.0): DataFrame =
    operators.Anomaly.madOutlierReport(df, valueCol, groupCols, k)

  // ---- dedup / sampling / evaluation extensions ----

  /** EXACT Jaccard ≥ τ self-join via prefix filtering (no LSH, exact
    * recall). */
  def exactNearDupPairs(docs: DataFrame, threshold: Double, n: Int = 3): DataFrame =
    operators.Dedup.exactJaccardSelfJoin(docs, threshold, n)

  /** Blocked-Levenshtein record-linkage pairs. */
  def fuzzyPairs(values: DataFrame, valCol: String,
                 blockExpr: org.apache.spark.sql.Column, maxDist: Int): DataFrame =
    operators.Dedup.editDistancePairs(values, valCol, blockExpr, maxDist)

  /** Embedding-cosine leakage report vs a broadcast eval set. */
  def semanticDecontamReport(corpus: DataFrame, benchmark: DataFrame,
                             threshold: Double): DataFrame =
    operators.Decontamination.semanticOverlapReport(corpus, benchmark, threshold)

  /** Efraimidis–Spirakis weighted sampling without replacement. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     groupCols: Seq[String] = Nil): DataFrame =
    operators.Sampling.weightedSample(df, idCol, weightCol, k, groupCols)

  /** Position-aware ranking quality (nDCG@k). */
  def ndcgAtK(results: DataFrame, groundTruth: DataFrame, k: Int): DataFrame =
    search.Evaluation.ndcgAtK(results, groundTruth, k)

  // ---- event analytics ----

  /** Ordered funnel with per-stage clock chaining. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame =
    operators.Events.funnel(events, steps)

  /** Weekly cohort retention matrix. */
  def cohortRetention(events: DataFrame): DataFrame =
    operators.Events.cohortRetention(events)

  /** Regular-grid LOCF resample riding the as-of join. */
  def resampleLocf(obs: DataFrame, keyCol: String, tsCol: String,
                   valCol: String): DataFrame =
    operators.Events.resampleLocf(obs, keyCol, tsCol, valCol)

  /** MMR-diversified retrieval re-rank over an embedding corpus. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, nCandidates: Int = 20,
                k: Int = 5, lambda: Double = 0.7): DataFrame =
    search.Mmr.rerank(corpus, queries, nCandidates, k, lambda)

  /** SCD2 change history: consecutive equal-value runs per key as
    * effective-dated versions. */
  def changeHistory(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, tieCol: String): DataFrame =
    operators.Events.changeHistory(events, keyCol, tsCol, valueCol, tieCol)

  /** Per-language OOV rate against the corpus' top-k token vocab. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 10): DataFrame =
    operators.TextAnalysis.vocabCoverage(docs, vocabSize)

  /** Join-key skew diagnostic: top-N key frequencies with shares. */
  def keySkew(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    operators.Skew.keySkewProfile(df, key, topN)

  /** Exact heavy hitters via the Misra–Gries two-pass pipeline. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
                   num: Long = 1, den: Long = 100): DataFrame =
    profile.HeavyHitters.exact(df, valueCol, k, num, den)

  /** WOE / information-value feature screen against a binary label. */
  def woeReport(df: DataFrame, valueCol: String,
                badLabel: org.apache.spark.sql.Column,
                buckets: Int = 10): DataFrame =
    profile.Woe.report(df, valueCol, badLabel, buckets)

  /** Chi-square association + Cramér's V between two categoricals. */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame =
    profile.InfoTheory.chiSquareAssociation(df, a, b)

  /** Mann–Kendall monotone-trend test over daily counts per key. */
  def mannKendall(events: DataFrame, keyCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame =
    operators.Events.mannKendall(events, keyCol, tsCol)

  /** Lag-k autocorrelation of daily counts per key (seasonality probe). */
  def autocorrelation(events: DataFrame, maxLag: Int = 3): DataFrame =
    operators.Events.autocorrelation(events, maxLag)

  /** Theil–Sen robust trend slope of daily counts per key. */
  def theilSen(events: DataFrame): DataFrame =
    operators.Events.theilSen(events)

  /** Benford first-digit conformance screen for a numeric column. */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame =
    profile.Drift.benfordReport(df, valueCol)

  /** Triangle census + global clustering coefficient of a link graph. */
  def triangleStats(edges: DataFrame): DataFrame =
    operators.Graph.triangleStats(edges)

  /** Single changepoint per key of the daily-count series. */
  def changepoint(events: DataFrame): DataFrame =
    operators.Events.changepoint(events)

  /** Deterministic k-fold cross-validation assignment. */
  def kFold(df: DataFrame, idCol: String, k: Int,
            salt: String = "fold0"): DataFrame =
    sources.Splits.kFold(df, idCol, k, salt)

  /** First-order event-type Markov transition matrix. */
  def transitionMatrix(events: DataFrame): DataFrame =
    operators.Events.transitionMatrix(events)

  /** Two-proportion A/B z-test of user-level conversion. */
  def abTest(events: DataFrame, successType: String = "purchase"): DataFrame =
    operators.Events.abTest(events, successType)

  /** Spearman rank correlation between two scoring views of items. */
  def spearman(items: DataFrame, idCol: String,
               scoreA: String, scoreB: String): DataFrame =
    search.Evaluation.spearman(items, idCol, scoreA, scoreB)

  /** Stream-static enrichment join with per-dimension-key rollup. */
  def streamEnrichedCounts(stream: DataFrame, dim: DataFrame,
                           streamKeyCol: String, dimKeyCol: String,
                           labelCol: String, amountCol: String): DataFrame =
    streaming.StreamingProfile.enrichedCounts(
      stream, dim, streamKeyCol, dimKeyCol, labelCol, amountCol)

  /** Stream-stream attribution join inside a bounded horizon. */
  def streamAttributionJoin(events: DataFrame, triggerType: String,
                            convType: String, horizon: String = "1 hour"): DataFrame =
    streaming.StreamingProfile.attributionJoin(events, triggerType, convType, horizon)

  /** Funnel latency distribution with exact positional percentiles. */
  def timeToConvert(events: DataFrame, fromType: String = "view",
                    toType: String = "purchase"): DataFrame =
    operators.Events.timeToConvert(events, fromType, toType)

  /** Two-sample Kolmogorov–Smirnov drift statistic (exact ECDFs). */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    profile.Drift.ksTest(a, b, valueCol)

  /** HITS hubs/authorities in exact integer ppm space. */
  def hits(edges: DataFrame, nIter: Int = 2): DataFrame =
    operators.Graph.hitsInt(edges, nIter)

  /** Reciprocal Rank Fusion of per-query top-k rank lists (hybrid
    * retrieval: BM25 + dense + sketch lists fuse on ranks alone). */
  def rrfFusion(lists: Seq[DataFrame], idCol: String = "doc_id",
                kConst: Int = 60, topK: Int = 10): DataFrame =
    search.Fusion.rrf(lists, idCol, kConst = kConst, topK = topK)

  /** Column-level schema/profile drift between two table snapshots. */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame =
    profile.SnapshotDiff.diff(a, b)

  /** Linear multi-touch attribution: 1/n credit per in-horizon touch. */
  def linearAttribution(events: DataFrame, triggerType: String = "click",
                        convType: String = "purchase",
                        horizon: String = "1 hour"): DataFrame =
    operators.Events.linearAttribution(events, triggerType, convType, horizon)

  /** Canonical text cleaning (NFC → control/format strip → whitespace
    * collapse) — run before any fingerprint/sketch/dedup. */
  def cleanText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    functions.NormalizeFunctions.clean_text(c)

  /** Exact TF-IDF cosine threshold self-join (blocked exact kernel). */
  def cosineSelfJoin(docs: DataFrame, threshold: Double,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    search.TextSearch.cosineSelfJoin(docs, threshold, idCol, textCol)

  /** Exact cosine self-join, auto-routed between the blocked kernel and
    * the L2AP posting join from a per-corpus vocabulary profile — the
    * entry point to use when the corpus regime is unknown. */
  def cosineSimilarityJoin(docs: DataFrame, threshold: Double,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    search.TextSearch.cosineSimilarityJoin(docs, threshold, idCol, textCol)

  /** Small-file compaction plan (next-fit-decreasing per partition). */
  def compactionPlan(files: DataFrame, partCol: String, idCol: String,
                     bytesCol: String, targetBytes: Long,
                     keepBytes: Long): DataFrame =
    sources.Layout.compactionPlan(files, partCol, idCol, bytesCol,
      targetBytes, keepBytes)

  /** k-anonymity / l-diversity re-identification audit. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, k: Long = 10L): DataFrame =
    operators.Privacy.kAnonymityReport(df, quasiCols, sensitiveCol, k)
}
