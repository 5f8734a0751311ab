package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.tables.BucketedSnapshotTable.{BucketEntry, PointSet}

/** Round-10 advisor items: point-set conjunction soundness across hash
  * kinds, the ANALYZE critical-section shrink, zone-free TIMESTAMP_NTZ
  * stats, keys-header None-vs-Some(Nil) preservation, and the legacy
  * manifest contentV sentinel. */
class AdviceR10Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("cross-kind point-set AND keeps coerce-equal literals (no false unsatisfiable under OR)") {
    val t = new BucketedSnapshotTable(tmp("bxkind"), numBuckets = 16,
      keys = Seq("k"), bloomCols = Seq("oid"))
    t.scd1Merge(spark, (1 to 160).map(i => (i, 1L, i.toLong))
      .toDF("k", "seq", "oid"), "seq")

    // `oid = 1 AND oid = '1'` HOLDS on a long column (Spark coerces the
    // string) — the conjunction must not collapse to the empty point set
    val and = t.predPointSets($"oid" === 1L && $"oid" === "1")
    assert(and("oid").longs.contains(1L), s"cross-kind AND lost the long: $and")

    // and under OR the other branch must not become the "complete" set:
    // the pre-fix behavior pruned every file holding oid=1 rows here
    val pred = ($"oid" === 1L && $"oid" === "1") || $"oid" === 5L
    val pts = t.predPointSets(pred)
    assert(pts("oid").longs == Set(1L, 5L), s"OR union lost a branch: $pts")
    val (_, n) = t.update(spark, pred, Seq("oid" -> lit(-1L)))
    assert(n == 2, s"UPDATE must hit BOTH oid=1 and oid=5 rows, hit $n")
    assert(t.read(spark).filter($"oid" === -1L).count() == 2)

    // a genuinely unsatisfiable same-kind conjunction still prunes all
    assert(t.predPointSets($"oid" === 1L && $"oid" === 2L)("oid") ==
      PointSet(Set.empty, Set.empty))
    // '1.0' coerces to 1 on a numeric column but is not integer-shaped —
    // the conjunction carries both sides instead of claiming empty
    val mixed = t.predPointSets($"oid" === 1L && $"oid" === "1.0")("oid")
    assert(mixed.longs.contains(1L) && mixed.strs.contains("1.0"))
  }

  test("ANALYZE builds sidecars outside the commit lock; racing merge commits during the build") {
    val root = tmp("banlk")
    val t = new BucketedSnapshotTable(root, numBuckets = 8, keys = Seq("k"),
      statsCols = Seq("d"))
    val writer = new BucketedSnapshotTable(root, 8, Seq("k")) // no statsCols
    writer.scd1Merge(spark, (1 to 80).map(i => (i, 1L, i.toLong))
      .toDF("k", "seq", "d"), "seq") // v1, no sidecars
    // a merge lands BETWEEN the (now unlocked) sidecar build and the
    // metadata commit — pre-fix the build held the lock, so this schedule
    // could not exist (the merge would block for the whole backfill)
    var fired = false
    TestHooks.onStep(t, {
      case "analyze_built" if !fired =>
        fired = true
        writer.scd1Merge(spark, Seq((3, 2L, 999L)).toDF("k", "seq", "d"), "seq") // v2
      case _ => ()
    })
    val v = t.analyze(spark)
    TestHooks.onStep(t, _ => ())
    assert(fired && v == 3, s"analyze must commit on top of the racer (got v$v)")
    // the racer's entry survives; its batch dir simply lacks sidecars yet
    assert(t.read(spark).filter($"k" === 3).select("d").as[Long].head() == 999L)
    val l = BucketedSnapshotTable.layoutOf(spark, root).get
    assert(l.statsCols == Seq("d"))
    // absent sidecars on the raced dir keep its buckets (superset) …
    val cand = t.statsCandidates(spark, t.manifest(spark), $"d" === 999L).get
    assert(cand.nonEmpty)
    // … and INCREMENTAL covers exactly the missing dir afterwards
    t.analyze(spark, onlyMissing = true)
    val (touched, n) = t.update(spark, $"d" === 999L, Seq("d" -> lit(1000L)))
    assert(n == 1 && touched.size == 1)
  }

  test("TIMESTAMP_NTZ stats are zone-free: non-UTC session cannot mis-prune") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // UTC+9: the pre-fix session-zone cast stored wall-9h, so a file
      // whose true wall max exceeded the bound read as below it — a WRONG
      // prune that silently missed UPDATE/DELETE rows
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val t = new BucketedSnapshotTable(tmp("bntz"), numBuckets = 8,
        keys = Seq("k"), statsCols = Seq("ts"))
      t.scd1Merge(spark, (1 to 80).map(i => (i, 1L)).toDF("k", "seq")
        .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp_ntz")), "seq")
      val hot = t.scd1Merge(spark, Seq((3, 2L), (4, 2L)).toDF("k", "seq")
        .withColumn("ts", lit("2024-01-01 12:00:00").cast("timestamp_ntz")), "seq")
      val pred = $"ts" >= lit("2024-01-01 10:00:00").cast("timestamp_ntz")
      assert(t.statsCandidates(spark, t.manifest(spark), pred) == Some(hot),
        "zone-free NTZ stats must keep exactly the noon-batch buckets")
      val (touched, n) = t.update(spark, pred, Seq("seq" -> lit(3L)))
      assert(n == 2 && touched == hot,
        s"NTZ range UPDATE missed rows in a non-UTC session (n=$n)")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("metadata commit over a keys-less manifest preserves None (never writes keys=)") {
    val root = tmp("bnokeys")
    val t = new BucketedSnapshotTable(root, numBuckets = 4, keys = Seq("k"))
    t.scd1Merge(spark, (1 to 8).map(i => (i, 1L, i.toLong)).toDF("k", "seq", "d"), "seq")
    // simulate a pre-r7 manifest: strip the keys header from the live file
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = t.currentVersion(spark).get
    val mPath = new org.apache.hadoop.fs.Path(root, s"_manifest_v$v")
    val in = f.open(mPath)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    val out = f.create(mPath, true)
    try out.write(lines.filterNot(_.startsWith("keys=")).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    assert(BucketedSnapshotTable.layoutOf(spark, root).get.keys.isEmpty)
    // ANALYZE constructs the table with keys = Nil for such manifests; its
    // metadata commit must keep the header ABSENT, not write `keys=`
    new BucketedSnapshotTable(root, 4, Nil, statsCols = Seq("d")).analyze(spark)
    val l = BucketedSnapshotTable.layoutOf(spark, root).get
    assert(l.keys.isEmpty,
      s"ANALYZE turned the absent keys header into Some(${l.keys}) — " +
        "CHANGES would silently proceed with empty bucket keys")
    assert(l.statsCols == Seq("d"))
    // and a table WITH keys keeps inheriting them through a keys-less
    // maintenance writer (compact does not need bucketExpr)
    val root2 = tmp("bkeyinh")
    val t2 = new BucketedSnapshotTable(root2, 4, Seq("k"))
    t2.scd1Merge(spark, (1 to 8).map(i => (i, 1L)).toDF("k", "seq"), "seq")
    new BucketedSnapshotTable(root2, 4, Nil).compact(spark)
    assert(BucketedSnapshotTable.layoutOf(spark, root2).get.keys == Some(Seq("k")))
  }

  test("legacy-manifest contentV sentinel: different unparseable dirs compare CHANGED") {
    val mx = Int.MaxValue
    def e(dir: String, cv: Int) = Some(BucketEntry(dir, cv))
    // two different unparseable dirs → changed (pre-fix: both Int.MaxValue
    // compared equal and the bucket silently vanished from the feed)
    assert(BucketedSnapshotTable.contentDiffers(e("foo", mx), e("bar", mx)))
    // same dir → same immutable bytes → unchanged (sound prune)
    assert(!BucketedSnapshotTable.contentDiffers(e("foo", mx), e("foo", mx)))
    // sentinel vs parsed → changed (conservative over-read)
    assert(BucketedSnapshotTable.contentDiffers(e("foo", mx), e("_batch_v3", 3)))
    // normal entries: contentV comparison, dir moves ignored (OPTIMIZE)
    assert(!BucketedSnapshotTable.contentDiffers(e("_batch_v9", 3), e("_batch_v7", 3)))
    assert(BucketedSnapshotTable.contentDiffers(e("_batch_v7", 3), e("_batch_v7", 5)))
    assert(BucketedSnapshotTable.contentDiffers(None, e("_batch_v7", 5)))
  }
}
