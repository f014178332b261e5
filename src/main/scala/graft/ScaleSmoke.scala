package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev tool: demonstrates the document operators' scaling beyond the
  * driver's sf0.1 — the suite's 100 TB claims are argued from plan
  * shape; this measures one actual scale-up.
  *
  * Generates a ×K replica of the documents corpus into
  * `target/scale{K}x/` with PER-COPY TOKEN SALTING: every token of
  * copy k is suffixed `~k`, so replicas share no shingles with each
  * other and the near-dup / contamination DENSITY stays exactly the
  * base corpus's (naive text replication would instead create K-sized
  * exact-dup cliques — quadratic pair growth that measures the data
  * change, not the engine). The honest expectation for the banded-LSH
  * and decontamination paths is therefore ~linear wall-time in K.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<base> runMain graft.ScaleSmoke [K] [q...]
  * Times each query twice on base and twice on the scaled copy (min
  * reported), QBench-style noop materialization.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // leading K is optional: `ScaleSmoke q82_bigram_lm` means 10x
    val k = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(10)
    val rest = args.dropWhile(_.forall(_.isDigit)).toSeq
    val qs = if (rest.nonEmpty) rest
      else Seq("q43_minhash_pairs", "q69_lsh_clusters",
               "q72_decontaminate", "q80_bloom_decontaminate")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"target/scale${k}x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ensureStaged(spark, base, outDir, k, qs)

    def time(q: String, dir: String, tag: String): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCALE $q $tag min=${runs.min}%.2f s " +
        s"(runs=${runs.map(r => f"$r%.2f").mkString(",")})")
    }
    qs.foreach { q => time(q, base, "base"); time(q, outDir, s"${k}x") }
    spark.stop()
  }

  /** Replica-staging marker machinery, shared with [[SpillSmoke]]:
    * line 1 records "<base> x<K>", later lines the staged family set.
    * A matching marker skips regeneration entirely (the r18 main
    * regenerated on EVERY invocation — minutes per 100x run); query
    * args needing unstaged families restage the union; a different
    * base or K fails loudly rather than silently measuring the wrong
    * replica (round-18 advice, generalized from SpillSmoke). Markers
    * are local-FS (replicas always live under target/). */
  private[graft] def readReplicaMarker(dir: String)
      : Option[(String, Set[String])] = {
    val marker = java.nio.file.Paths.get(dir, "_replica_ready")
    if (!java.nio.file.Files.exists(marker)) None
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(marker),
        "UTF-8").trim.split("\n").toSeq
      Some((lines.head, lines.drop(1).toSet))
    }
  }

  private[graft] def writeReplicaMarker(dir: String, base: String, k: Int,
                                        fams: Set[String]): Unit = {
    val marker = java.nio.file.Paths.get(dir, "_replica_ready")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker,
      (s"$base x$k" +: fams.toSeq.sorted).mkString("\n").getBytes("UTF-8"))
  }

  /** Marker-validated stage-or-reuse on a LIVE session. Returns true
    * when staging ran (caller may want to re-warm). */
  private[graft] def ensureStaged(spark: SparkSession, base: String,
                                  outDir: String, k: Int,
                                  qs: Seq[String]): Boolean = {
    val needed = familiesFor(qs)
    readReplicaMarker(outDir) match {
      case Some((hdr, _)) if hdr != s"$base x$k" =>
        sys.error(s"replica at $outDir was staged as '$hdr' but this run " +
          s"wants '$base x$k': delete $outDir (or point the replica dir " +
          "env var elsewhere) — reusing it would silently measure the " +
          "wrong data")
      case Some((_, staged)) if needed.subsetOf(staged) =>
        println(s"SCALE reusing staged replica at $outDir " +
          s"(${needed.toSeq.sorted.mkString(",")})")
        false
      case prev =>
        generate(spark, base, outDir, k, qs)
        writeReplicaMarker(outDir, base, k,
          prev.map(_._2).getOrElse(Set.empty[String]) ++ needed)
        true
    }
  }

  private val EventsQs = Seq("q130_", "q131_", "q132_", "q133_", "q134_",
    "q24_", "q28_", "q59_", "q142_", "q149_", "q161_", "q163_", "q172_",
    "q195_")
  private val FactQs = Seq("q147_", "q79_", "q01_", "q15_", "q37_",
    "q115_", "q165_", "q187_", "q197_")
  private val EmbQs = Seq("q40_", "q48_", "q86_", "q97_", "q98_", "q156_",
    "q168_", "q171_", "q174_")

  /** The replica families the selected queries read (documents always).
    * Recorded in [[SpillSmoke]]'s staging marker so a later run with
    * DIFFERENT query args can detect an incompletely-staged replica
    * instead of silently measuring against missing/stale files
    * (round-18 advice). */
  private[graft] def familiesFor(qs: Seq[String]): Set[String] = {
    val b = Set.newBuilder[String]
    b += "documents"
    if (qs.exists(q => EventsQs.exists(q.startsWith))) b += "events"
    if (qs.exists(q => FactQs.exists(q.startsWith))) b += "facts"
    if (qs.exists(q => EmbQs.exists(q.startsWith))) b += "embeddings"
    b.result()
  }

  /** Generates the ×K replica families the selected queries read
    * (documents always; events / lineitem+orders / embeddings when a
    * selected query's family matches). Factored out of main so
    * [[SpillSmoke]] can stage the same replicas. */
  def generate(spark: SparkSession, base: String, outDir: String,
               k: Int, qs: Seq[String]): Unit = {
    val fams = familiesFor(qs)
    val docs = Tables.documents(spark, base)
    val maxId = docs.agg(F.max("doc_id")).head().getLong(0) + 1L
    val salted = F.array_join(
      F.transform(F.split(F.col("text"), " "),
        t => F.concat(t, F.lit("~"), F.col("copy"))), " ")
    docs.crossJoin(spark.range(k).toDF("copy"))
      .select(
        (F.col("doc_id") + F.col("copy") * maxId).as("doc_id"),
        salted.as("text"),
        F.col("lang"), F.col("source"),
        F.length(salted).cast("long").as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"SCALE generated ${k}x corpus at $outDir")

    // events scale-up for the analytics family (q130–q134): each copy
    // is time-shifted past the base window (shift DERIVED from the
    // actual span, so copies stay disjoint under any generator
    // vintage) and gets fresh user/event ids — daily and hourly
    // PROFILES stay the base corpus's while user count, cohort count,
    // and the time range all grow ×K: the realistic "same workload,
    // K months later" growth, not a same-key pile-up. Skipped when no
    // selected query reads events.
    if (fams("events")) {
      val ev = Tables.events(spark, base)
      val b = ev.agg(F.max("user_id"), F.max("event_id"),
        F.expr("datediff(CAST(max(ts) AS DATE), CAST(min(ts) AS DATE))")).head()
      // an empty events table (or all-null ts) yields null maxes —
      // fail with a message instead of an opaque NPE on unboxing
      require(!b.isNullAt(0) && !b.isNullAt(1) && !b.isNullAt(2),
        s"events table at $base is empty or has null user_id/event_id/ts; " +
          "cannot derive scale-up shift")
      val maxUser = b.getLong(0) + 1L
      val maxEid = b.getLong(1) + 1L
      val shiftDays = b.getInt(2) + 2
      ev.crossJoin(spark.range(k).toDF("copy"))
        .select(
          (F.col("event_id") + F.col("copy") * maxEid).as("event_id"),
          F.expr(s"timestampadd(DAY, CAST(copy * $shiftDays AS INT), ts)").as("ts"),
          (F.col("user_id") + F.col("copy") * maxUser).as("user_id"),
          F.col("event_type"), F.col("value"), F.col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
      println(s"SCALE generated ${k}x events at $outDir (shift $shiftDays d/copy)")
    }

    // lineitem AND orders scale-up for the fact-side relational family
    // (q147/q79/q01/q15…): BOTH facts shift order keys by the same
    // base max per copy, so the lineitem↔orders join keys stay
    // consistent across copies (scaling only lineitem would orphan
    // every copied row at the join and silently measure a 1× probe —
    // round-10 review finding) while order GROUPS multiply rather than
    // deepen: per-order supplier fan-in, the thing q147's verdict
    // aggregation keys on, stays the base corpus's. Dimensions are NOT
    // scaled (that's the point of a dimension at 100 TB: it stays
    // broadcastable while facts grow); o_custkey passes through, so
    // customers just own k× the orders.
    if (fams("facts")) {
      val li = Tables.lineitem(spark, base)
      val b = li.agg(F.max("l_orderkey")).head()
      require(!b.isNullAt(0), s"lineitem table at $base is empty")
      val maxOk = b.getLong(0) + 1L
      li.crossJoin(spark.range(k).toDF("copy"))
        .select(
          (F.col("l_orderkey") + F.col("copy") * maxOk).as("l_orderkey"),
          F.col("l_partkey"), F.col("l_suppkey"), F.col("l_linenumber"),
          F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount"),
          F.col("l_tax"), F.col("l_returnflag"), F.col("l_linestatus"),
          F.col("l_shipdate"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
      spark.read.parquet(s"$base/orders.parquet")
        .crossJoin(spark.range(k).toDF("copy"))
        .select(
          (F.col("o_orderkey") + F.col("copy") * maxOk).as("o_orderkey"),
          F.col("o_custkey"), F.col("o_orderstatus"), F.col("o_totalprice"),
          F.col("o_orderdate"), F.col("o_orderpriority"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
      Seq("supplier", "nation", "region", "part", "customer").foreach { t =>
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
      println(s"SCALE generated ${k}x lineitem+orders (+passthrough dims) at $outDir")
    }

    // embeddings scale-up for the ANN/cluster family (q40/q48/q86/
    // q97/q98…): copies get fresh vec_ids and a tiny deterministic
    // per-(vector, copy, dim) jitter (≤1e-3, hash-derived) so the
    // scaled corpus has NO exact-duplicate vectors (pure replication
    // would make every top-k a tie pile-up and semantic dedup a
    // degenerate clique) while the cluster geometry — what IVF
    // training and outlier scoring key on — stays the base corpus's.
    if (fams("embeddings")) {
      val raw = spark.read.parquet(s"$base/embeddings.parquet")
      val elemSql = raw.schema("embedding").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.sql
      val b = raw.agg(F.max("vec_id")).head()
      require(!b.isNullAt(0), s"embeddings table at $base is empty")
      val maxVid = b.getLong(0) + 1L
      raw.crossJoin(spark.range(k).toDF("copy"))
        .select(
          (F.col("vec_id") + F.col("copy") * maxVid).as("vec_id"),
          F.expr(s"""transform(embedding, (x, i) ->
              CAST(x + CAST(pmod(xxhash64(vec_id, copy, i), 2000) - 1000 AS DOUBLE)
                       / 1000000.0 AS $elemSql))""").as("embedding"),
          F.col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"SCALE generated ${k}x embeddings (jittered copies) at $outDir")
    }
  }
}
