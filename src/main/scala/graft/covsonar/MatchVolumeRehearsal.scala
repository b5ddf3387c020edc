package graft.covsonar

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `match` at population scale — the flagship query
  * (ref: lib/sonardb.py:3133-3486) measured past test-fixture size for the
  * first time: synthesize ~10⁶ genome rows WITH realistic profile shape
  * (Zipf-weighted variant draws from a 20k-variant pool over real
  * reference bases, shared-sequence dedup, categorical metadata pools),
  * write them through the store's real parquet path, then time the golden
  * match shapes (profile AND/OR groups, exclusion, metadata predicates,
  * combined, count mode).
  *
  * Profile synthesis bypasses the ALIGNER on purpose: alignment throughput
  * is measured elsewhere (IngestRateProbe, 81 genomes/s end-to-end); this
  * rehearsal isolates the QUERY side, whose inputs are store tables no
  * matter how they were produced.
  *
  * Run: `sbt "runMain graft.covsonar.MatchVolumeRehearsal [n] [storeDir]"`;
  * prints per-query wall seconds (min of 2), result rows, and rows/s over
  * the genome count, plus a plan audit line for the flagship shape.
  */
object MatchVolumeRehearsal {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dir = args.lift(1).getOrElse("target/match-volume-store")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.configure(spark)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val store = new SonarStore(spark, dir)

    // ---- synthetic population ------------------------------------------------
    val ref = Reference.sarsCov2.refSeq
    // 20k-SNP pool over real reference bases; token rank r is drawn with
    // Zipf-ish density (common variants shared by most genomes, a long
    // rare tail) — the shape real lineage-defining vs private mutations have
    val poolSize = 20000
    val pool: Array[String] = (0 until poolSize).map { r =>
      val pos = 1 + ((r.toLong * 2654435761L) % ref.length).toInt // 1-based
      val refBase = ref.charAt(pos - 1)
      val alt = "ACGT".filterNot(_ == refBase).charAt(r % 3)
      s"$refBase$pos$alt"
    }.toArray
    // token lookup as a plain array literal + element_at (1-based) — keeps
    // the synthesis expression fully codegen'd, no udf
    val poolCol = typedlit(pool.toSeq)
    def poolToken(idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      element_at(poolCol, idx + lit(1))

    // ~5% of accessions share the previous accession's sequence (the
    // accession-vs-sequence split the data model exists for)
    val base = spark.range(n)
      .withColumn("seqid", when(col("id") % 20 === 19, col("id") - 1).otherwise(col("id")))
      .withColumn("seqhash", md5(concat(lit("seq"), col("seqid"))))
    val genomes = base.select(
      concat(lit("VOL"), col("id")).as("accession"),
      concat(lit("synthetic genome "), col("id")).as("description"),
      col("seqhash"),
      concat(lit("B.1."), pmod(xxhash64(col("id"), lit(1)), lit(400)).cast("string")).as("lineage"),
      format_string("%05d", (pmod(xxhash64(col("id"), lit(2)), lit(90000)) + 10000).cast("int")).as("zip"),
      date_format(date_add(lit("2020-01-01").cast("date"),
        pmod(xxhash64(col("id"), lit(3)), lit(900)).cast("int")), "yyyy-MM-dd").as("date"),
      date_format(date_add(lit("2020-01-05").cast("date"),
        pmod(xxhash64(col("id"), lit(3)), lit(900)).cast("int")), "yyyy-MM-dd").as("submission_date"),
      lit("").as("gisaid"), lit("").as("ena"),
      concat(lit("SRC"), pmod(xxhash64(col("id"), lit(4)), lit(20)).cast("string")).as("source"),
      concat(lit("COLL"), pmod(xxhash64(col("id"), lit(5)), lit(50)).cast("string")).as("collection"),
      concat(lit("LAB"), pmod(xxhash64(col("id"), lit(6)), lit(200)).cast("string")).as("lab"),
      lit("ILLUMINA").as("technology"), lit("").as("platform"), lit("").as("chemistry"),
      lit("").as("software"), lit("").as("software_version"), lit("").as("material"),
      (pmod(xxhash64(col("id"), lit(7)), lit(2000)).cast("double") / 100.0 + 10.0).as("ct"),
      current_timestamp().as("imported"))

    val seqs = base.select(col("seqhash"), col("seqid")).distinct()
    // ~30 Zipf-ish draws per sequence: u³ density concentrates on low ranks
    val profiles = seqs
      .select(col("seqhash"),
        transform(sequence(lit(0), lit(29)), j =>
          poolToken(least(
            floor(pow(
              pmod(xxhash64(col("seqid"), j), lit(1L << 52)).cast("double") / lit((1L << 52).toDouble),
              lit(3.0)) * lit(poolSize.toDouble)).cast("int"),
            lit(poolSize - 1)))).as("draws"))
      .select(col("seqhash"),
        array_sort(array_distinct(col("draws"))).as("dna_profile"),
        array().cast("array<string>").as("aa_profile"),
        array().cast("array<string>").as("fs_profile"))

    val t0 = System.nanoTime()
    store.append("genome", genomes)
    store.append("sequence", seqs.select("seqhash"))
    store.append("profile", profiles)
    val buildS = (System.nanoTime() - t0) / 1e9
    val nGenomes = store.table("genome").count()
    val nSeqs = store.table("sequence").count()
    println(f"BUILD n=$nGenomes seqs=$nSeqs in $buildS%.1f s")

    // ---- the golden match shapes ----------------------------------------------
    val common = pool(2)      // rank 2: carried by most genomes
    val mid = pool(1000)
    val rare = pool(15000)
    val shapes: Seq[(String, MatchArgs)] = Seq(
      "full_scan_count" -> MatchArgs(),
      "profile_and" -> MatchArgs(profiles = Seq(Seq(common, mid))),
      "profile_or" -> MatchArgs(profiles = Seq(Seq(mid), Seq(rare))),
      "profile_rare" -> MatchArgs(profiles = Seq(Seq(rare))),
      "profile_exclude" -> MatchArgs(profiles = Seq(Seq(mid)),
        excludeProfiles = Seq(Seq(rare))),
      "metadata_only" -> MatchArgs(zips = Seq("1"), dates = Seq("2020-06-01:2021-06-01"),
        labs = Seq("LAB7")),
      "combined" -> MatchArgs(profiles = Seq(Seq(mid)), zips = Seq("1"),
        dates = Seq("2020-06-01:2021-06-01"), minCt = Some(15.0), maxCt = Some(25.0)))

    println(f"${"query"}%-18s ${"rows"}%12s ${"sec(min2)"}%10s ${"genomes/s"}%12s")
    shapes.foreach { case (name, margs) =>
      def once(): (Long, Double) = {
        val t = System.nanoTime()
        val rows = SonarMatch.matchGenomes(store, margs).count()
        (rows, (System.nanoTime() - t) / 1e9)
      }
      val (rows1, s1) = once()
      val (rows2, s2) = once()
      require(rows1 == rows2)
      val s = math.min(s1, s2)
      println(f"$name%-18s $rows1%12d $s%10.2f ${nGenomes / s}%12.0f")
    }

    // plan audit for the flagship: the profile predicate must reach the
    // scan as an array_contains filter, and the essence join must shuffle
    // on seqhash once (or broadcast the filtered side)
    val plan = SonarMatch.matchGenomes(store,
        MatchArgs(profiles = Seq(Seq(mid)), zips = Seq("1")))
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") || l.contains("array_contains")).take(4).toList
    println("PLAN " + pushed.mkString(" | ").take(600))
    val joins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") || l.contains("ShuffledHashJoin"))
    println(s"PLAN joins=$joins broadcast=${plan.contains("BroadcastHashJoin")}")
    spark.stop()
  }
}
