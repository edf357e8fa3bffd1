package graft.kg

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Incremental KG construction over an append-only pages directory —
  * SURVEY §2.12's "(if ever desired, `Trigger.AvailableNow` over the pages
  * table would reuse the same stage functions)" path, realized.
  *
  * New crawl segments land as parquet files under `pagesDir`; each
  * invocation processes exactly the files not yet seen (Structured
  * Streaming file-source checkpoint = the resume ledger, complementing the
  * batch manifest protocol of [[KgTables]]) and APPENDS the resulting
  * node/edge/metric rows to the output tables. Each micro-batch runs the
  * unchanged batch stages ([[Pipeline.run]]: extract → link → relate →
  * stats) via foreachBatch — valid because the edge/node output is a
  * per-document function (per-doc dedup, static dictionaries), so
  * streaming accumulation equals the one-shot batch run row-for-row
  * (KgStreamingSpec asserts this).
  *
  * At scale this is the "new segments arrive daily" entry: the dictionary
  * artifacts are prepared once ([[Pipeline.prepareLink]]) and reused across
  * batches; per-batch work is proportional to the new files only.
  */
object StreamingPipeline {

  /** Process all currently-unseen files under `pagesDir`, then stop
    * (Trigger.AvailableNow). Returns the number of micro-batches run. */
  def runAvailableNow(
      spark: SparkSession,
      pagesDir: String,
      dicts: Pipeline.Dicts,
      tablesRoot: String,
      checkpointDir: String,
      cfg: KgConfig = KgConfig.default,
      prepared: Option[Linking.Prepared] = None): Long = {
    import spark.implicits._
    val prep = prepared.getOrElse(Pipeline.prepareLink(spark, dicts, cfg))
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val stream = spark.readStream
      .schema(Encoders.product[PageRow].schema)
      .parquet(pagesDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val before = s.sparkContext.getPersistentRDDs.keySet
        val res = Pipeline.run(s, batch.as[PageRow], dicts, cfg,
          runId = s"stream-$batchId", prepared = Some(prep))
        res.edges.write.mode("append").parquet(s"$tablesRoot/kg_edges")
        res.nodes.write.mode("append").parquet(s"$tablesRoot/kg_nodes")
        res.metrics.write.mode("append").parquet(s"$tablesRoot/kg_metrics")
        // drop only the caches THIS batch created (prepared dictionary
        // tables persist across batches)
        s.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) }
          .values.foreach(_.unpersist(true))
        batches.incrementAndGet()
        ()
      }
      .start()
    query.awaitTermination()
    batches.get()
  }
}
