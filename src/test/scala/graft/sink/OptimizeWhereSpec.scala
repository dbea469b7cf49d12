package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-scoped OPTIMIZE (`GRAFT OPTIMIZE … WHERE`, Delta
  * `OPTIMIZE WHERE` parity) — the 100 TB compaction form: only the
  * selected partitions' files rewrite; everything else republishes by
  * reference. Gates: untouched partitions keep their exact manifest
  * entries (zero IO), content identity, manifest-only typed predicate
  * evaluation (numeric partitions compare numerically, not
  * lexicographically), DV folding on the rewritten subset only,
  * no-op on no match, and the loud rejections. */
class OptimizeWhereSpec extends SparkSpec {
  import spark.implicits._

  private def mk(dir: String): Unit =
    (0 until 4).foreach { b =>
      CdcTable.append(
        Seq(("en", s"e$b", b.toLong), ("de", s"d$b", b.toLong + 10))
          .toDF("lang", "_id", "v"),
        dir, partitionBy = Seq("lang"))
    }

  test("WHERE rewrites only the selected partition; others carry by reference") {
    val dir = tmpDir("ow_scope")
    mk(dir)
    val beforeFiles = CdcTable.log(dir).flatMap(_.files)
    val deBefore = beforeFiles.filter(_.contains("lang=de")).toSet
    val enBefore = beforeFiles.filter(_.contains("lang=en")).toSet
    assert(enBefore.size >= 4 && deBefore.size >= 4)
    val res = spark.sql(
      s"GRAFT OPTIMIZE '$dir' WHERE lang = 'en' FILES 1").collect()(0)
    val after = CdcTable.log(dir).last
    val deAfter = after.files.filter(_.contains("lang=de")).toSet
    val enAfter = after.files.filter(_.contains("lang=en")).toSet
    assert(deAfter == deBefore,
      "untouched partitions must keep their exact manifest entries")
    assert(enAfter.intersect(enBefore).isEmpty && enAfter.size < enBefore.size,
      s"selected partition must consolidate: ${enAfter.size} files")
    assert(res.getInt(0) == beforeFiles.size &&
      res.getInt(1) == after.files.size)
    // content identity
    assert(CdcTable.read(spark, dir).select("_id", "v")
      .as[(String, Long)].collect().toSet ==
      (0 until 4).flatMap(b =>
        Seq((s"e$b", b.toLong), (s"d$b", b.toLong + 10))).toSet)
  }

  test("predicate types come from the schema: numeric partitions compare numerically") {
    val dir = tmpDir("ow_typed")
    Seq(2L, 10L).foreach { p =>
      CdcTable.append(Seq((p, s"k$p")).toDF("bucket", "_id"), dir,
        partitionBy = Seq("bucket"))
    }
    val before = CdcTable.log(dir).flatMap(_.files)
    // lexicographically "10" < "2" — typed evaluation must pick ONLY
    // bucket=2's file for `bucket > 5`
    CdcTable.optimizeWhere(spark, dir, Some("bucket > 5"), nFiles = Some(1))
    val after = CdcTable.log(dir).last.files
    assert(after.filter(_.contains("bucket=2")).toSet ==
      before.filter(_.contains("bucket=2")).toSet,
      "bucket=2 must carry untouched")
    assert(after.filter(_.contains("bucket=10"))
      .forall(f => !before.contains(f)),
      "bucket=10 must rewrite")
    assert(CdcTable.read(spark, dir).count() == 2)
  }

  test("DVs fold on the rewritten partition only; carried sidecars keep applying") {
    val dir = tmpDir("ow_dv")
    mk(dir)
    CdcTable.deleteKeysDV(spark, dir, Seq("e1", "d1").toDF("_id"),
      Seq("_id"))
    assert(CdcTable.read(spark, dir).count() == 6)
    CdcTable.optimizeWhere(spark, dir, Some("lang = 'en'"), nFiles = Some(1))
    val after = CdcTable.log(dir).last
    assert(after.dvFiles.nonEmpty,
      "carried de files still need their tombstones")
    // e1 folded physically, d1 still DV-filtered at read
    assert(CdcTable.read(spark, dir).select("_id").as[String]
      .collect().toSet ==
      Set("e0", "e2", "e3", "d0", "d2", "d3"))
  }

  test("no-op on no match; loud rejects for non-partition predicates") {
    val dir = tmpDir("ow_rej")
    mk(dir)
    val tail = CdcTable.log(dir).last.commit
    val (b, a, c) = CdcTable.optimizeWhere(spark, dir, Some("lang = 'xx'"))
    assert(b == a && c == tail, "no match must not commit")
    val e = intercept[IllegalArgumentException](
      CdcTable.optimizeWhere(spark, dir, Some("v > 0")))
    assert(e.getMessage.contains("partition columns only"))
    val flat = tmpDir("ow_flat")
    CdcTable.append(Seq((1L, "a")).toDF("v", "_id"), flat,
      partitionBy = Nil)
    val e2 = intercept[IllegalArgumentException](
      CdcTable.optimizeWhere(spark, flat, Some("v > 0")))
    assert(e2.getMessage.contains("no partition columns"))
  }

  test("SMALLER THAN bin-packs only the small files, from manifest sizes alone") {
    val dir = tmpDir("ow_small")
    // one BIG file (500 padded rows) + four 1-row files
    CdcTable.append((1 to 500).map(i =>
      (s"big$i", "x" * 200)).toDF("_id", "pad").coalesce(1), dir,
      partitionBy = Nil)
    (1 to 4).foreach(i => CdcTable.append(
      Seq((s"s$i", "y")).toDF("_id", "pad").coalesce(1), dir,
      partitionBy = Nil))
    val log0 = CdcTable.log(dir)
    val big = log0.head.files.head
    assert(log0.head.fileBytes(big) >
      log0.last.fileBytes(log0.last.files.head),
      "manifest must record sizes")
    // exact byte threshold = the big file's size: it carries by
    // reference, the four small files bin-pack into one
    val (b, a, _) = CdcTable.optimizeWhere(spark, dir, None,
      nFiles = Some(1), smallerThan = Some(log0.head.fileBytes(big)))
    assert(CdcTable.log(dir).last.files.contains(big),
      "the big file must carry by reference")
    assert(b == 5 && a == 2,
      s"four small files bin-pack into one: $b -> $a")
    assert(CdcTable.read(spark, dir).count() == 504)
    // SQL form parses and runs (MB-granular threshold)
    spark.sql(s"GRAFT OPTIMIZE '$dir' SMALLER THAN 1 MB FILES 1")
      .collect()
    assert(CdcTable.read(spark, dir).count() == 504)
  }

  test("detail answers live bytes from the manifest (no stat storm)") {
    val dir = tmpDir("ow_detail")
    mk(dir)
    val d = CdcTable.detail(dir)
    val manifestBytes = CdcTable.log(dir).flatMap(_.fileBytes.values).sum
    assert(d.liveBytes == manifestBytes && manifestBytes > 0,
      s"detail must use recorded sizes: ${d.liveBytes} vs $manifestBytes")
  }

  test("WHERE composes with ZORDER on the scoped subset") {
    val dir = tmpDir("ow_z")
    (0 until 4).foreach { b =>
      CdcTable.append((0 until 50).map(i =>
        ("en", s"e$b-$i", scala.util.hashing.MurmurHash3
          .stringHash(s"$b-$i").toLong))
        .toDF("lang", "_id", "v"), dir, partitionBy = Seq("lang"))
    }
    spark.sql(s"GRAFT OPTIMIZE '$dir' WHERE lang = 'en' " +
      "ZORDER BY (v) FILES 4").collect()
    // clustered: a narrow v-range lands in few files
    val scanned = CdcTable.read(spark, dir)
      .filter(col("v") < -1500000000L)
      .select(input_file_name()).distinct().count()
    assert(scanned <= 2, s"z-ordered scoped rewrite must cluster: $scanned")
    assert(CdcTable.read(spark, dir).count() == 200)
  }
}
