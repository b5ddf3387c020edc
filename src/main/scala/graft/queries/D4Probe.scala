package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown for the d4b/d4c shared pipeline (not part of the
  * library surface; invoked manually via runMain during optimization rounds).
  * Times each stage with the noop sink so the computation is measured, not
  * the sink (optimization guide §1.4).
  */
object D4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.configure(spark)
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // piecewise d4b internals (mirrors d4Core's prefix path)
    for (pass <- 1 to 2) {
      println(s"== piecewise pass $pass ==")
      val docs = PipelineQueries.heapsViewDocs(spark, sfDir)
      val g = docs
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.flatMap { case (id, lang, text) =>
          val grams = PipelineQueries.packedGrams(text)
          if (grams == null) None else Some((id, lang, grams))
        })
        .toDF("doc_id", "lang", "g")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("g_materialize")(g.count())
      time("vocab_probe") {
        val cap = 64 * 128
        import scala.collection.mutable
        g.select(col("lang"), col("g")).rdd
          .treeAggregate(mutable.Map.empty[String, mutable.HashSet[Long]])(
            (acc, row) => {
              val set = acc.getOrElseUpdate(row.getString(0), mutable.HashSet.empty)
              if (set.size <= cap) {
                val it = row.getSeq[Long](1).iterator
                while (it.hasNext && set.size <= cap) set.add(it.next())
              }
              acc
            },
            (a, b) => { b.foreach { case (l, ss) =>
              val set = a.getOrElseUpdate(l, mutable.HashSet.empty)
              if (set.size <= cap) {
                val it = ss.iterator
                while (it.hasNext && set.size <= cap) set.add(it.next())
              } }; a })
      }
      val ex = g.select(col("lang"), col("doc_id"), explode(col("g")).as("gram"))
      val dfreq = ex.groupBy("lang", "gram").agg(count(lit(1)).as("df"))
      import org.apache.spark.sql.expressions.Window
      val byDoc = Window.partitionBy("doc_id").orderBy("df", "gram")
      val prefix = ex.join(dfreq.select("lang", "gram", "df"), Seq("lang", "gram"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")).cast("long"))
        .withColumn("rk", row_number().over(byDoc))
        .filter(col("rk") <= col("n") - expr("(3L * n + 4L) div 5L") + lit(1))
        .select("lang", "gram", "doc_id", "n", "rk")
      time("prefix_build")(noop(prefix))
      val alphaNeeded = expr("(3L * (na + nb) + 7L) div 8L")
      val cand = prefix.select(col("lang"), col("gram"), col("doc_id").as("doc_a"),
          col("n").as("na"), col("rk").as("ra"))
        .join(prefix.select(col("lang"), col("gram"), col("doc_id").as("doc_b"),
          col("n").as("nb"), col("rk").as("rb")), Seq("lang", "gram"))
        .filter(col("doc_a") < col("doc_b") &&
          col("na") * 3 <= col("nb") * 5 && col("nb") * 3 <= col("na") * 5)
        .filter(least(col("ra"), col("rb")) +
          least(col("na") - col("ra"), col("nb") - col("rb")) >= alphaNeeded)
        .select("lang", "doc_a", "doc_b")
        .distinct()
      time("cand_distinct")(noop(cand))
      val verify = cand
        .join(g.select(col("doc_id").as("doc_a"), col("g").as("ga")), Seq("doc_a"))
        .join(g.select(col("doc_id").as("doc_b"), col("g").as("gb")), Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
        .withColumn("uni", (size(col("ga")) + size(col("gb"))).cast("long") - col("inter"))
        .filter(col("inter") * 5 >= col("uni") * 3)
        .select(col("doc_a"), col("doc_b"), col("lang"),
          expr("(1000000L * inter) div uni").as("jaccard_ppm"))
        .orderBy("doc_a", "doc_b")
      time("verify_sort")(noop(verify))
      g.unpersist(blocking = true)
      spark.sqlContext.clearCache()
      System.gc()
    }

    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      time("heaps_view")(noop(PipelineQueries.heapsViewDocs(spark, sfDir)))
      time("grams_over_view") {
        val docs = PipelineQueries.heapsViewDocs(spark, sfDir)
        val g = docs
          .select(col("doc_id"), col("lang"), col("text"))
          .as[(Long, String, String)]
          .mapPartitions(_.flatMap { case (id, lang, text) =>
            if (text.length < 4) None
            else {
              val seen = new java.util.LinkedHashSet[String]()
              var i = 0
              while (i + 4 <= text.length) { seen.add(text.substring(i, i + 4)); i += 1 }
              Some((id, lang, seen.toArray(new Array[String](0)).toSeq))
            }
          })
          .toDF("doc_id", "lang", "g")
        noop(g)
      }
      time("d4b_full") {
        PipelineQueries.d4bJaccardPrefixPath(spark, sfDir).count()
      }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      time("d4c_full") {
        PipelineQueries.d4cJaccardBanded(spark, sfDir).count()
      }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
