package graft.operators

import graft.Engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sentence-aware operators — segmentation, sentence-level exact dedup,
  * and sentence-preserving chunking. Pipeline extensions in the SURVEY
  * §7.2-M6 family: corpus hygiene at SENTENCE granularity is standard
  * LLM-data practice (boilerplate sentences repeat across documents that
  * are nowhere near document-level duplicates, and context-window packing
  * wants chunk boundaries that don't cut sentences in half).
  *
  * The driver fixtures are flat word streams with no punctuation, so the
  * family starts from an IN-PLAN synthesized punctuated corpus
  * ([[sentenced]]) — the `snapshot_diff` technique: derive the structured
  * input deterministically inside the plan, so the DuckDB oracle can
  * derive the identical corpus and the operators under test stay fully
  * hash-gated. The operators themselves ([[sentenceSegment]] and up) run
  * on ANY text with `[.!?]` sentence punctuation; only the `sentenced`
  * synthesizer is fixture-specific.
  *
  * 100 TB shape: synthesis and segmentation are pure per-row scalar
  * expressions (scan-fused, zero shuffles); dedup is one aggregate on the
  * sentence digest (map-side partials absorb hot boilerplate sentences —
  * deliberately NOT a window partitioned by the sentence, which would put
  * a million-document boilerplate sentence in one task) plus a digest-
  * keyed join; chunking windows partition by doc_id — balanced by
  * construction.
  */
object Sentences {

  /** The engine-portable 60-bit md5 digest (same spelling as
    * [[TextAnalysis.md5_60]], local copy to keep this module
    * self-contained).
    */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Average synthesized sentence length: token i ends a sentence when
    * md5_60("sent:" ++ token ++ ":" ++ i) ≡ 0 (mod this).
    */
  val SentenceEvery = 6

  /** In-plan sentence-punctuation synthesis over a flat-word corpus: a
    * deterministic ~1/[[SentenceEvery]] of token positions get a
    * terminal "." (the last token always does). The boundary gate hashes
    * (token, position) — NOT doc_id — so identical or near-identical
    * texts synthesize identical sentences, which is exactly the
    * structure sentence-level dedup exists to detect. Pure scalar
    * higher-order transform: zero shuffles.
    */
  def sentenced(docs: DataFrame): DataFrame = {
    val w = split(trim(col("text")), "\\s+")
    val punct = transform(w, (t, i) =>
      concat(t, when(
        h60(concat(lit("sent:"), t, lit(":"), (i + 1).cast("string")))
          % SentenceEvery === 0 || (i + 1) === size(w),
        lit(".")).otherwise(lit(""))))
    docs.select(col("doc_id"), array_join(punct, " ").as("text"))
  }

  /** Sentence segmentation: split `text` into `[.!?]`-terminated
    * sentences, one output row per (doc, sentence) with a 1-based
    * `sent_id` and the sentence's token count. The extraction regex
    * `[^.!?]+[.!?]?` needs no lookbehind (portable to RE2-family
    * engines, DuckDB included); sentences are trimmed of the inter-
    * sentence whitespace. Scan-fused posexplode — the only shuffle in
    * the gated entry is the presentation sort.
    */
  def sentenceSegment(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("text"),
          lit("[^.!?]+[.!?]?"), lit(0))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("sent_id"),
        trim(col("col")).as("sentence"))
      .withColumn("n_tokens",
        size(split(col("sentence"), "\\s+")).cast("long"))

  /** Sentence-level exact dedup decision table: every sentence keeps or
    * drops by first-occurrence ((doc_id, sent_id) order) of its
    * NORMALIZED form (lowercase, terminal punctuation stripped). The
    * decision is an aggregate on the full-128-bit md5 of the normalized
    * sentence (the repo's text-identity standard) followed by a
    * digest-keyed join — partial aggregation absorbs boilerplate
    * sentences repeated across millions of documents, where a
    * sentence-partitioned window would hot-spot.
    */
  def sentenceDedup(docs: DataFrame): DataFrame =
    // The segmented table feeds BOTH sides of the decision (the first-
    // occurrence aggregate and the probe join), and the two consumers
    // shuffle on h at different plan depths, so Catalyst/AQE cannot reuse
    // one exchange — without materialization the synthesis + segmentation
    // subtree executes twice (measured as two full passes in the 10×
    // stress). Materialize it once — the same stored-intermediate policy
    // as the PQ code index and the PageRank edge list; a production
    // pipeline would land this table in the lake as its own ETL stage.
    sentenceDedupFrom(sentenceSegment(docs).localCheckpoint())

  /** [[sentenceDedup]] over an ALREADY-MATERIALIZED segmented table
    * ([[sentenceSegment]] output): the two digest consumers re-derive
    * the scalar norm/md5 columns from the materialized rows — cheaper
    * than materializing a second, wider copy.
    */
  def sentenceDedupFrom(segmented: DataFrame): DataFrame = {
    val sents = segmented
      .withColumn("norm",
        lower(regexp_replace(col("sentence"), "[.!?]+$", "")))
      .withColumn("h", md5(col("norm")))
    val firsts = sents.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("sent_id"))).as("first"))
    sents.join(firsts, Seq("h"))
      .withColumn("keep",
        (struct(col("doc_id"), col("sent_id")) === col("first")).cast("int"))
      .select(col("doc_id"), col("sent_id"), col("n_tokens"), col("keep"))
      .orderBy(col("doc_id"), col("sent_id"))
  }

  /** Default token budget for the gated sentence-chunking entry. */
  val ChunkBudget = 32L

  /** Sentence-preserving chunking: consecutive sentences pack into
    * chunks of ~`budget` tokens; a sentence belongs to the chunk its
    * START offset falls in (chunk_id = tokens-before div budget), so no
    * sentence is ever split — a chunk may overflow by at most one
    * sentence tail, the standard trade for boundary-clean training
    * windows. Start-offset bucketing (rather than a greedy reset
    * counter) keeps the rule one running sum — expressible identically
    * in any engine, no per-doc recursion. Emits per-chunk sentence/token
    * counts and the portable md5-60 digest of the chunk text
    * (sentences joined in sent_id order — rebuilt deterministically via
    * sort_array, since collect_list order is not guaranteed).
    *
    * Windows partition by doc_id (balanced); the rollup is an ordinary
    * groupBy. Output rows = chunks, ~corpus_tokens/budget.
    */
  def sentenceChunks(docs: DataFrame, budget: Long = ChunkBudget): DataFrame =
    sentenceChunksFrom(sentenceSegment(docs), budget)

  /** [[sentenceChunks]] over a pre-segmented table — the chunking plan
    * itself is single-consumer, so this variant exists for callers that
    * already hold the materialized segmentation.
    */
  def sentenceChunksFrom(segmented: DataFrame,
      budget: Long = ChunkBudget): DataFrame = {
    require(budget > 0, s"chunk budget must be positive, got $budget")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sent_id"))
    segmented
      .withColumn("__sc_before", coalesce(
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("chunk_id", expr(s"__sc_before div $budget"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_sents"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(sent_id, sentence))), x -> x.sentence)"),
          " ").as("__sc_text"))
      .withColumn("chunk_md5_60", h60(col("__sc_text")))
      .select(col("doc_id"), col("chunk_id"), col("n_sents"),
        col("n_tokens"), col("chunk_md5_60"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Session-shared segmented table for the gated family: segmentation
    * is ONE landed ETL stage in a production pipeline (the
    * stored-intermediate policy [[sentenceDedup]] documents), and the
    * dedup and chunking reports both read it — so the gated entries
    * share one [[PlanCache]]-materialized segmentation per corpus
    * instead of re-running synthesis + segmentation per report. The
    * segmentation pass's own full cost stays measured by the UNCACHED
    * `sent_segment` gate ([[segmentDocs]] — same policy as the dedup
    * family's uncached `dedup_prefix` screen gate). Corpus-sized (it
    * carries the full sentence text, ≈ tokens/[[SentenceEvery]] rows),
    * so it persists DISK_ONLY: an on-heap corpus-sized cache squeezes
    * unified execution memory for every heavy join that follows in the
    * same executor (measured at the 20× probe — see [[PlanCache]]'s
    * level scaladoc), and the production shape for a landed
    * intermediate is the lake, not executor memory. Bounded at 4
    * corpora. Cached inputs are assumed immutable for the session (the
    * landed-intermediate contract); after an in-session rewrite of the
    * corpus files, call [[PlanCache.invalidate]] to drop the
    * materialization.
    */
  private val segCache = new PlanCache(
    level = org.apache.spark.storage.StorageLevel.DISK_ONLY)
  private def segmentedCached(docs: DataFrame): DataFrame =
    segCache.getOrMaterialize(docs, "segmented") {
      sentenceSegment(docs)
    }

  def segmentDocs(spark: SparkSession, dir: String): DataFrame =
    sentenceSegment(sentenced(Tables(spark, dir).documents))
      .orderBy(col("doc_id"), col("sent_id"))

  def dedupDocs(spark: SparkSession, dir: String): DataFrame =
    sentenceDedupFrom(segmentedCached(sentenced(Tables(spark, dir).documents)))

  def chunksDocs(spark: SparkSession, dir: String): DataFrame =
    sentenceChunksFrom(segmentedCached(sentenced(Tables(spark, dir).documents)))
}
