package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned corpus sink — the write side of the layout contract that
  * `PartitionLayoutSpec` proves on the read side (static + dynamic partition
  * pruning over `partition column = lang`-style directories).
  *
  * The two failure modes this writer exists to prevent at 100 TB:
  *
  *  - **small files**: a plain `df.write.partitionBy(c)` emits one file per
  *    (task × partition value) — with thousands of tasks each touching every
  *    value, a 20-value column yields tasks×20 splinter files and the next
  *    job's planning chokes on listings. Repartitioning on
  *    (c, hash(key) % filesPerPartition) first routes each partition value to
  *    exactly `filesPerPartition` tasks, so the file count is
  *    values × filesPerPartition BY CONSTRUCTION, independent of input
  *    parallelism.
  *  - **giant files**: one file per value (repartition on c alone) makes a
  *    skewed partition a multi-GB single-split read. The same salt bounds
  *    file size from above: raise `filesPerPartition` for bigger corpora, or
  *    set `maxRecordsPerFile` as a hard per-file ceiling the writer enforces
  *    by rolling files.
  *
  * Rows are clustered by `sortKey` *within* each file (`sortWithinPartitions`
  * — a local sort, no extra exchange beyond the routing repartition), which
  * keeps parquet min/max zone maps selective for range reads on the key.
  */
object CorpusSink {

  def write(
      df: DataFrame,
      path: String,
      partitionCol: String,
      sortKey: String,
      filesPerPartition: Int = 4,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(filesPerPartition > 0)
    df.repartition(col(partitionCol),
        pmod(hash(col(sortKey)), lit(filesPerPartition)))
      .sortWithinPartitions(col(partitionCol), col(sortKey))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
  }
}
