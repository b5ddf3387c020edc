package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: d4c band-size histogram at a given dir. */
object D4CProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    import spark.implicits._
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "lang", "text")
    val g = docs.as[(Long, String, String)].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      it.flatMap { case (id, lang, text) =>
        if (text == null || text.length < 4) None
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i + 4 <= text.length) { seen.add(text.substring(i, i + 4)); i += 1 }
          val mins = Array.fill(8)(0x10000)
          val itr = seen.iterator()
          var grams = 0
          while (itr.hasNext) {
            grams += 1
            md.reset()
            val d = md.digest(itr.next().getBytes(utf8))
            var p = 0
            while (p < 8) {
              val v = ((d(2 * p) & 0xff) << 8) | (d(2 * p + 1) & 0xff)
              if (v < mins(p)) mins(p) = v
              p += 1
            }
          }
          val hex = mins.map(v => f"$v%04x")
          val bands = Seq((0,1),(2,3),(4,5),(6,7)).map { case (a, b) =>
            hex(a) + hex(b)
          }
          Some((id, grams, bands))
        }
      }
    }.toDF("doc_id", "grams", "bands")
    g.select(explode(col("bands")).as("bk")).groupBy("bk")
      .agg(count(lit(1)).as("n")).agg(
        count(lit(1)).as("distinct_bands"),
        max(col("n")).as("max_band"),
        sum(col("n") * (col("n") - 1) / 2).as("pair_volume")).show(false)
    g.agg(avg("grams"), max("grams"), count(lit(1))).show(false)
    spark.stop()
  }
}
