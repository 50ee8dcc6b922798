package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** foreachBatch → parquet gate harness: the bridge that turns streaming
  * transforms into artifacts the SAME correctness oracle that gates the
  * batch operators can check. The driver's DuckDB gate is batch-only
  * (it compares materialized parquet), so streaming evidence is produced
  * transitively: drive the stream through the production parquet sink,
  * read the result back, and assert equality with the oracle-gated batch
  * twin on identical input — stream output == batch output == DuckDB.
  *
  * The sink is [[Streaming.idempotentParquetSink]] — the real
  * batch-addressed exactly-once-effect landing path, not a test-only
  * shortcut — so the gate evidence also exercises checkpointing and the
  * partition-discovery read-back a production consumer performs.
  */
object StreamGate {

  /** Start `out` (a streaming DataFrame) into the idempotent parquet
    * sink at `outDir/data` (checkpoint at `outDir/_checkpoint`), run
    * each `feed` thunk in order draining the stream to completion after
    * each (so a caller can stage multi-batch arrival patterns with a
    * MemoryStream), and return the landed table read back as a batch
    * DataFrame. The sink's `batch_id` partition column is dropped on
    * read-back by default (it records delivery, not data); complete-
    * mode callers pass `keepBatchId = true` to select the final
    * emission themselves.
    */
  def runToParquet(spark: SparkSession, out: DataFrame, outDir: String,
      outputMode: String = "append", keepBatchId: Boolean = false)
      (feeds: (() => Unit)*): DataFrame = {
    val q = Streaming.idempotentParquetSink(out, s"$outDir/data",
      s"$outDir/_checkpoint", outputMode)
    try {
      if (feeds.isEmpty) q.processAllAvailable()
      else feeds.foreach { f => f(); q.processAllAvailable() }
    } finally q.stop()
    val landed = spark.read.parquet(s"$outDir/data")
    if (keepBatchId) landed else landed.drop("batch_id")
  }
}
