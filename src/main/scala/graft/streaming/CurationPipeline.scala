package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed Kafka→curate→Delta micro-batch body — SURVEY §3.1 step 3
  * ("Transform") made concrete and MEASURED, not just available: what a
  * training-data ingest daemon runs between decode and commit.
  *
  * Per micro-batch, in order:
  *   1. quality gate — length + alpha-ratio floors (the cheap map-only
  *      filters that drop most junk before anything expensive runs);
  *   2. content hash — md5 of the RAW text (dedup identity is the
  *      original content, never the masked rendering);
  *   3. in-batch exact dedup — keep-min doc_id per hash via a window
  *      (deterministic winner, no dropDuplicates nondeterminism);
  *   4. cross-corpus exact dedup — left-anti join against the hashes
  *      already committed: first-write-wins across batches, so the
  *      corpus stays exactly-deduped forever at per-batch cost. The
  *      probe reads ONE narrow column of the curated table
  *      (column-pruned parquet scan of `h`) and the batch side is
  *      micro-batch-sized, so Catalyst broadcasts it — O(corpus bytes
  *      of one column + batch), never a corpus rewrite. At larger
  *      corpus scale the same verb runs against a dedicated
  *      hash-signature table (the near-dup ingest flow in StreamingSpec
  *      does exactly that for MinHash signatures);
  *   5. PII mask — emails then digit runs, applied AFTER hashing;
  *   6. exactly-once commit — [[ExactlyOnceSink.process]] keyed on the
  *      stream's batchId: a replayed batch re-curates identical input
  *      to an identical frame and the claim no-ops.
  *
  * Throughput is measured by graft.IngestBench's docs arms (plain vs
  * curated — the delta IS the curation cost); CurationPipelineSpec
  * asserts the semantic invariants (gate, unique-hash corpus,
  * first-write-wins, masking, replay idempotence).
  */
object CurationPipeline {

  val MinChars = 64
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"

  /** Quality gate: text long enough, and letters+spaces make up at
    * least half of it (integer form 2*alpha >= len — no float ratio). */
  def gate(text: Column): Column =
    (length(text) >= MinChars) &&
      (length(regexp_replace(text, "[^A-Za-z ]", "")) * 2 >= length(text))

  /** PII mask: emails first (so their digits don't half-survive as
    * `<NUM>` fragments), then digit runs — the q_llm_pii_mask patterns. */
  def mask(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPat, "<EMAIL>"),
      "[0-9]+", "<NUM>")

  /** One curated micro-batch (stages 1-6 above). `batch` must carry
    * doc_id + text (extra metadata columns ride along untouched). */
  def curateBatch(batch: DataFrame, sink: ExactlyOnceSink,
      batchId: Long): Unit = {
    val s = batch.sparkSession
    val gated = batch.filter(gate(col("text")))
      .withColumn("h", md5(col("text")))
    val w = Window.partitionBy("h").orderBy("doc_id")
    val firsts = gated.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val committed = sink.read(s)
    val fresh =
      if (committed.columns.isEmpty) firsts
      else firsts.join(committed.select(col("h").as("__ch")).distinct(),
        firsts("h") === col("__ch"), "left_anti").drop("__ch")
    sink.process(fresh.withColumn("text", mask(col("text"))), batchId)
  }
}
