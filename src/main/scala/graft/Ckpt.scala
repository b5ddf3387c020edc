package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Loss-tolerant local checkpointing — the ONE policy point for every
  * `localCheckpoint` in the engine.
  *
  * `Dataset.localCheckpoint()` trades fault tolerance for speed: lineage
  * is truncated and the blocks live on the executors that computed them,
  * so on a real cluster ONE lost executor permanently strands every job
  * whose loop re-reads those blocks (the iterative label propagation,
  * PageRank's pinned edge list, streaming snapshot rebasing). Local mode
  * cannot lose an executor, which is exactly why the risk stays invisible
  * until a cluster rehearsal kills one (SCALING.md, round 10).
  *
  * The dial `spark.graft.checkpoint.replicated=true` (set by cluster
  * deployments; default off so single-JVM plans and benchmarks are
  * byte-identical to before) stores checkpoint blocks at
  * MEMORY_AND_DISK_2 — one replica on a second executor — so a single
  * executor loss degrades to a replica read instead of a dead job. The
  * cost is one extra network copy per checkpointed partition, paid only
  * where the dial is on. Multi-executor-loss tolerance needs reliable
  * `checkpoint()` to shared storage; at that point the job should be
  * re-run anyway.
  */
object Ckpt {
  private def replicated(conf: org.apache.spark.SparkConf): Boolean =
    conf.getOption("spark.graft.checkpoint.replicated")
      .exists(v => java.lang.Boolean.parseBoolean(v.trim))

  implicit final class DatasetCkpt[T](private val ds: Dataset[T]) extends AnyVal {
    /** Drop-in for `localCheckpoint()` honoring the replication dial. */
    def lossTolerantCheckpoint(): Dataset[T] =
      if (replicated(ds.sparkSession.sparkContext.getConf))
        ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_2)
      else ds.localCheckpoint()
  }

  implicit final class RddCkpt[T](private val rdd: org.apache.spark.rdd.RDD[T]) extends AnyVal {
    /** RDD form: `RDD.localCheckpoint` honors a pre-set storage level
      * (disk is added, replication preserved), so the dial pre-persists
      * at MEMORY_AND_DISK_2.
      */
    def lossTolerantCheckpoint(): org.apache.spark.rdd.RDD[T] = {
      if (replicated(rdd.sparkContext.getConf) &&
          rdd.getStorageLevel == StorageLevel.NONE)
        rdd.persist(StorageLevel.MEMORY_AND_DISK_2)
      rdd.localCheckpoint()
    }
  }
}
