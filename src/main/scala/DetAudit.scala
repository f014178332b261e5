import org.apache.spark.sql.SparkSession

/** Dev tool: determinism-under-repartitioning audit over every
  * declared query. Runs each query three times — (32 partitions,
  * 128 MB splits), (7, 128 MB), (7, 64 KB splits), AQE OFF so the
  * counts are literal — and compares a canonical hash (rows sorted,
  * columns name-sorted, binary rendered hex). The two axes cover both
  * merge-order sources: shuffle partition count varies REDUCE-side
  * merge trees, input-split size varies MAP-side combine order. A
  * diff means output depends on partition/merge order: the latent
  * flake class a single gate run can never see (the round-17 sweep
  * caught q152's lattice-valued mean flipping its 4th decimal this
  * way). Run at sf0.01 — at sf0.001 most plans collapse to one
  * partition either way and the audit is vacuous:
  *
  *   SPARK_GRAFT_CPUS=8 sbt "runMain DetAudit /root/testdata/sf0.01"
  *
  * Expected: `DET SUMMARY 198 queries, 0 partitioning-sensitive`.
  * Genuinely partitioning-sensitive operators (none today) would be
  * documented here and skipped explicitly, not left to flake. */
object DetAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE OFF: at small SF adaptive coalescing collapses both
      // configs to the same effective partitioning, hiding exactly
      // the merge-order sensitivity this audit probes for
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def canonical(q: String): String = {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val cols = df.columns.sorted.toSeq
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map(r => (0 until r.length).map { i =>
          r.get(i) match {
            case b: Array[Byte] => b.map(x => f"$x%02x").mkString
            case s: Seq[_] => s.mkString("[", ",", "]")
            case v => String.valueOf(v)
          }
        }.mkString(""))
        .sorted.mkString("\n")
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(rows.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var diff = 0
    names.foreach { q =>
      try {
        // axis 1: reduce-side merge order (shuffle partition count);
        // axis 2: map-side combine order (input-split size — tiny
        // maxPartitionBytes fragments every scan into many splits)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        val h1 = canonical(q)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val h2 = canonical(q)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        val h3 = canonical(q)
        if (h1 != h2 || h2 != h3) {
          diff += 1; println(s"DET DIFF $q $h1 $h2 $h3")
        } else println(s"DET OK $q")
      } catch { case e: Throwable =>
        println(s"DET ERR $q ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"DET SUMMARY ${names.size} queries, $diff partitioning-sensitive")
    spark.stop()
  }
}
