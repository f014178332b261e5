package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IndexTables

/** End-to-end gcTables behavior against a REAL warehouse — the name-
  * shape tests in IncrementalNoveltySpec pin what MATCHES; this pins
  * what a sweep actually DROPS and what survives it, including the
  * concurrent-builder scenario the round-14 digest fix exists for:
  * a sanitization-colliding sibling dir's LIVE digested table must
  * survive the other dir's GC (pre-digest, alternating builds
  * collected each other forever). */
class IndexTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val prefix = "graft_gcspec_idx_v1_"
  private val dirA = "/data/sf0-1" // both sanitize to _data_sf0_1
  private val dirB = "/data/sf0_1"

  private def mkTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.range(1).write.mode("overwrite").saveAsTable(name)
  }

  test("gcTables sweeps own stale generations + retired names + sidecars; colliding sibling survives") {
    val staleFp = "aaaaaaaaaaaaaaaa"
    val ownStale = IndexTables.tableName(prefix, dirA, staleFp)
    // retired pre-digest format: prefix + sanitized + "_" + fp
    val ownRetired =
      (prefix + dirA.replaceAll("[^A-Za-z0-9]", "_") + "_" + staleFp).toLowerCase
    val siblingLive = IndexTables.tableName(prefix, dirB, "bbbbbbbbbbbbbbbb")
    Seq(ownStale, ownRetired, siblingLive).foreach(mkTable)

    // sidecar next to the stale generation's table dir
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecar = new org.apache.hadoop.fs.Path(wh, ownStale + "_bloom.bin")
    val out = fs.create(sidecar, true); out.write(Array[Byte](1, 2, 3)); out.close()

    val swept = scala.collection.mutable.ArrayBuffer[String]()
    IndexTables.gcTables(spark, prefix, dirA, p => swept += p.getName)

    assert(!spark.catalog.tableExists(ownStale), "own stale digested generation must drop")
    assert(!spark.catalog.tableExists(ownRetired), "own retired pre-digest name must drop")
    assert(spark.catalog.tableExists(siblingLive),
      "the sanitization-colliding sibling's LIVE table must survive (concurrent-builder safety)")
    assert(!fs.exists(sidecar), "stale generation's sidecar must be swept from the warehouse")
    assert(swept.contains(ownStale + "_bloom.bin"),
      s"onSweep must see every swept warehouse path, saw: $swept")
    assert(!swept.exists(_.contains(siblingLive)), "onSweep must never fire for a survivor")

    spark.sql(s"DROP TABLE IF EXISTS $siblingLive")
  }

  test("audit: current/stale/retired/bucket-spec checks page correctly") {
    val auditPrefix = "graft_auditspec_idx_v1_"
    val dir = TestSpark.sf0001 // a real source dir so the fingerprint resolves
    val fp = IndexTables.dataFingerprint(spark, dir)
    val current = IndexTables.tableName(auditPrefix, dir, fp)
    val stale = IndexTables.tableName(auditPrefix, dir, "aaaaaaaaaaaaaaaa")
    val retired =
      (auditPrefix + dir.replaceAll("[^A-Za-z0-9]", "_") + "_bbbbbbbbbbbbbbbb").toLowerCase

    def rows() = graft.ops.IndexTables.audit(spark, auditPrefix, dir)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap

    // nothing built yet: current is a warn (next probe builds), no debris
    Seq(current, stale, retired).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val before = rows()
    assert(before("index_current")._1 == "warn", s"got $before")
    assert(before("stale_generations") == (("ok", "none")))
    assert(before("retired_naming") == (("ok", "none")))

    // healthy build: bucketed current table via the real write path
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .limit(20).select(col("doc_id"), xxhash64(col("text")).as("fp"))
      .select(col("fp"), col("doc_id").as("first_doc"))
    graft.ops.Bucketing.writeBucketed(docs, current, "fp", 4)
    // plus planted debris: a stale digested generation + a retired name
    spark.range(1).write.mode("overwrite").saveAsTable(stale)
    spark.range(1).write.mode("overwrite").saveAsTable(retired)
    val after = rows()
    assert(after("index_current") == (("ok", current)), s"got $after")
    assert(after("bucket_spec") == (("ok", "buckets=4")))
    assert(after("stale_generations")._1 == "warn" &&
      after("stale_generations")._2.contains(stale))
    assert(after("retired_naming")._1 == "warn" &&
      after("retired_naming")._2.contains(retired))

    // a live bloom sidecar BELONGS to the current generation — it
    // must not read as stale debris
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveSidecar = new org.apache.hadoop.fs.Path(wh, current + "_bloom.bin")
    val out = fs.create(liveSidecar, true); out.write(Array[Byte](1)); out.close()
    val withSidecar = rows()
    assert(!withSidecar("stale_generations")._2.contains("_bloom.bin"),
      s"current generation's own sidecar flagged stale: $withSidecar")
    fs.delete(liveSidecar, false)

    // an unbucketed table under the current name is the paged failure
    spark.sql(s"DROP TABLE IF EXISTS $current")
    spark.range(1).write.mode("overwrite").saveAsTable(current)
    assert(rows()("bucket_spec")._1 == "fail")
    Seq(current, stale, retired).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // cross-JVM view: a warehouse DIR with no catalog entry (another
    // session's table, or this one post-restart) must surface — as
    // the catalog-less current (warn, probe rebuilds) and as
    // warehouse-only stale debris
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh, current))
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh, stale))
    val crossJvm = rows()
    assert(crossJvm("index_current")._1 == "warn" &&
      crossJvm("index_current")._2.contains("catalog-less"), s"got $crossJvm")
    assert(crossJvm("stale_generations")._1 == "warn" &&
      crossJvm("stale_generations")._2.contains(stale))
    Seq(current, stale).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(wh, n), true))
  }

  test("audit resolves the bucketed-join family's fingerprint over ITS source file, not documents.parquet") {
    // the round-15 advice bug: auditing graft_bkt_orders_v1_ with the
    // one-size documents.parquet default computed a WRONG current name,
    // flagged the LIVE index stale, and skipped the bucket_spec check
    val dir = TestSpark.sf0001
    val bktPrefix = "graft_bkt_orders_v1_"
    assert(IndexTables.defaultFileFor(bktPrefix) == "orders.parquet")
    assert(IndexTables.defaultFileFor("graft_spans_idx_v1_") == "documents.parquet")
    assert(IndexTables.defaultFileFor("graft_unknown_idx_v9_") == "documents.parquet")

    val fp = IndexTables.dataFingerprint(spark, dir, "orders.parquet")
    val current = IndexTables.tableName(bktPrefix, dir, fp)
    // the production discipline: GC before build (also clears debris a
    // prior crashed run left in the warehouse under this name)
    IndexTables.gcTables(spark, bktPrefix, dir)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey")).limit(20)
    graft.ops.Bucketing.writeBucketed(orders, current, "o_orderkey", 4)

    def rows(file: Option[String]) =
      IndexTables.audit(spark, bktPrefix, dir, file)
        .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap

    // per-family default: the LIVE orders index reads current+bucketed
    val auto = rows(None)
    assert(auto("index_current") == (("ok", current)), s"got $auto")
    assert(auto("bucket_spec") == (("ok", "buckets=4")), s"got $auto")
    assert(auto("stale_generations") == (("ok", "none")), s"got $auto")
    // explicit override matches (the idxfsck [file] operand path)
    assert(rows(Some("orders.parquet"))("index_current") == (("ok", current)))
    // and the OLD one-size behavior is reproducible only by forcing the
    // wrong file — pinning exactly what the per-family default fixes:
    // wrong fingerprint → live index misread as stale, spec check skipped
    val wrong = rows(Some("documents.parquet"))
    assert(wrong("index_current")._1 == "warn", s"got $wrong")
    assert(wrong("stale_generations")._2.contains(current), s"got $wrong")
    assert(!wrong.contains("bucket_spec"), s"got $wrong")
    spark.sql(s"DROP TABLE IF EXISTS $current")
  }

  test("interleaved build≡gc from two builders of DIFFERENT dirs leaves both live tables probeable") {
    // the alternating-build scenario: A gc+build, then B gc+build, then
    // A gc again (as if rebuilding) — B's live table must still exist
    val fpA = "cccccccccccccccc"; val fpB = "dddddddddddddddd"
    val tA = IndexTables.tableName(prefix, dirA, fpA)
    val tB = IndexTables.tableName(prefix, dirB, fpB)
    IndexTables.gcTables(spark, prefix, dirA); mkTable(tA)
    IndexTables.gcTables(spark, prefix, dirB); mkTable(tB)
    IndexTables.gcTables(spark, prefix, dirA); mkTable(tA)
    assert(spark.catalog.tableExists(tA) && spark.catalog.tableExists(tB),
      "alternating builds of colliding dirs must not collect each other")
    assert(spark.table(tA).count() == 1 && spark.table(tB).count() == 1)
    Seq(tA, tB).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
