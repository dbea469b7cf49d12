package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** The md5-prefix feature hash of the engine, re-derived
    * independently (same mirror as the DSIR spec). */
  private def fid(bg: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(bg.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(4).map("%02x".format(_)).mkString.take(7), 16) % 65536
  }

  /** Brute-force reference: presence features (distinct bigram fids +
    * bias 65536), full-batch GD with the 1/(n·L) step in exact
    * BigInt fixed point — truncating division toward zero. */
  private def bruteTrain(rows: Seq[(Long, String, Boolean)],
      iters: Int): Map[Long, Long] = {
    val feats = rows.map { case (id, t, tgt) =>
      val toks = t.trim.split("\\s+", -1).toSeq.filter(_.nonEmpty)
      val fs = (if (toks.length >= 2)
        toks.sliding(2).map(_.mkString(" ")).map(fid).toSet
      else Set.empty[Long]) + 65536L
      (id, tgt, fs)
    }
    val n = rows.size.toLong
    val lMax = feats.map(_._3.size).max.toLong
    val denom = BigInt(n * lMax)
    var w = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val grad = scala.collection.mutable.Map.empty[Long, BigInt]
      feats.foreach { case (_, tgt, fs) =>
        val y = if (tgt) 1000000L else 0L
        val m = fs.iterator.map(f => w.getOrElse(f, 0L)).sum
        val r = BigInt(y - m)
        fs.foreach(f => grad(f) = grad.getOrElse(f, BigInt(0)) + r)
      }
      w = grad.iterator.map { case (f, g) =>
        f -> (w.getOrElse(f, 0L) + (g / denom).toLong) // BigInt / truncates
      }.filter(_._2 != 0L).toMap
    }
    w
  }

  test("train matches the brute-force GD reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(30, Gen.zip(doc, Gen.oneOf(true, false)))
    (1 to 3).foreach { seed =>
      val rows = corpusGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((t, tgt), i) => (i.toLong, t, tgt) }
      val df = rows.toDF("id", "text", "is_t")
      val got = Classifier.train(df, "id", col("is_t"))
        .as[(Long, Long)].collect().toMap
      val expect = bruteTrain(rows, iters = 3)
      assert(got == expect, s"seed=$seed got=$got expect=$expect")
    }
  }

  test("scores separate target from background and round-trip exactly") {
    // two disjoint vocabularies; the probe must rank any target doc
    // above any background doc after 3 steps
    val rows = (0 until 20).map { i =>
      val tgt = i % 2 == 0
      val text = if (tgt) "clean prose reads well here clean prose"
        else "zz qq xx vv zz qq xx vv"
      (i.toLong, text + s" t$i", tgt)
    }
    val df = rows.toDF("id", "text", "is_t")
    val w = Classifier.train(df, "id", col("is_t"))
    val scores = Classifier.score(df, "id", w)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val tgtMin = rows.filter(_._3).map(r => scores(r._1)).min
    val bgMax = rows.filterNot(_._3).map(r => scores(r._1)).max
    assert(tgtMin > bgMax,
      s"no separation: target min $tgtMin vs background max $bgMax")
    // determinism: a re-run is bit-identical
    val w2 = Classifier.train(df, "id", col("is_t"))
      .as[(Long, Long)].collect().toMap
    assert(w2 == w.as[(Long, Long)].collect().toMap)
  }

  test("score on a foreign corpus: unseen features contribute zero") {
    val ref = Seq((1L, "good clean text here", true),
      (2L, "bad noisy junk rows", false)).toDF("id", "text", "t")
    val w = Classifier.train(ref, "id", col("t"))
    val r = Classifier.score(
        Seq((10L, "wholly unseen vocabulary")).toDF("id", "text"),
        "id", w)
      .as[(Long, Long, Long)].collect().head
    // 2 bigram features + bias; only the bias can be in the model
    val biasW = w.filter(col("fid") === 65536L)
      .as[(Long, Long)].collect().headOption.map(_._2).getOrElse(0L)
    assert(r._2 == 3L && r._3 == biasW, s"$r bias=$biasW")
  }

  test("classifierFilterStreamToTable gates a stream at an absolute cut") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir("clfout")
    val ckpt = tmpDir("clfck")
    val ref = (0 until 10).map { i =>
      val tgt = i % 2 == 0
      (i.toLong,
        (if (tgt) "clean prose reads well here" else "zz qq xx vv") + s" t$i",
        tgt)
    }.toDF("id", "text", "t")
    val w = Classifier.train(ref, "id", col("t"))
    val arriving = Seq((10L, "clean prose reads well"),
      (11L, "zz qq xx vv"), (12L, "clean prose zz qq"))
    // cut halfway between the trained margins of the two vocabularies
    val s = Classifier.score(arriving.toDF("doc_id", "text"), "doc_id", w)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val cut = (s(10L) + s(11L)) / 2
    val mem = MemoryStream[(Long, String)]
    val q = Classifier.classifierFilterStreamToTable(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", () => w, cut,
      out, ckpt)
    try {
      mem.addData(arriving.take(2): _*); q.processAllAvailable()
      mem.addData(arriving.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val kept = graft.sink.CdcTable.read(spark, out)
      .select("doc_id").as[Long].collect().toSet
    val mirror = arriving.map(_._1).filter(id => s(id) >= cut).toSet
    assert(kept == mirror, s"stream $kept vs batch mirror $mirror")
    assert(kept.contains(10L) && !kept.contains(11L))
  }
}
