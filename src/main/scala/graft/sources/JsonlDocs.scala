package graft.sources

import graft.Ckpt._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus source — the interchange format most raw training-data
  * drops arrive in (one JSON object per line; line-splittable, so a 100 TB
  * directory parallelizes by HDFS/object-store block with no custom record
  * splitter, unlike xz FASTA's file-per-task ceiling).
  *
  * Design points for scale:
  *  - the schema is DECLARED, never inferred: inference is a full extra
  *    pass over the data before the real one, and a drifting upstream field
  *    would silently change column types mid-corpus;
  *  - PERMISSIVE mode with a `_corrupt_record` column quarantines malformed
  *    lines into a reject frame instead of failing the job at hour N — the
  *    caller decides whether a reject rate is acceptable;
  *  - the clean frame lands on the exact `documents` table contract, so
  *    every downstream operator (dedup, quality, vocab, …) runs unchanged.
  */
object JsonlDocs {

  /** `documents`-contract schema plus the quarantine column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt_record", StringType)))

  /** Reads a JSONL path into (clean documents, quarantined raw lines).
    * `n_chars` is derived, not trusted from the producer.
    */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // a JSON line that parses but lacks required fields is also a reject
      .withColumn("_bad", col("_corrupt_record").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .lossTolerantCheckpoint() // one parse pass feeds both output frames
    val clean = raw.filter(!col("_bad"))
      .select(col("doc_id"), col("text"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("source"), lit("")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    val rejects = raw.filter(col("_bad"))
      .select(coalesce(col("_corrupt_record"),
        to_json(struct(col("doc_id"), col("text"), col("lang"), col("source"))))
        .as("raw_line"))
    (clean, rejects)
  }
}
