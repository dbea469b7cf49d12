package graft.reconcile

import graft.SparkSpec

class ReconcilerSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "name", "amount")
  private def tgt = Seq(
    (1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0), (5L, "e", 50.0))
    .toDF("id", "name", "amount")

  test("diff finds missing, extra and mismatched rows") {
    val r = Reconciler.diff(src, tgt, "id", Seq("name", "amount"))
    assert(r.missingInTarget.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(r.extraInTarget.select("id").as[Long].collect().toSeq == Seq(5L))
    assert(r.mismatched.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(r.counts == ((4L, 4L)))
  }

  test("bucket digests match iff contents match") {
    val same = Reconciler.compareBuckets(src, src, "id", 8,
      Seq("name", "amount"))
    assert(same.filter(!$"is_match").count() == 0)
    val diff = Reconciler.compareBuckets(src, tgt, "id", 8,
      Seq("name", "amount"))
    assert(diff.filter(!$"is_match").count() > 0)
  }

  test("repair plan upserts missing+mismatched (source wins), deletes extra") {
    val p = Reconciler.repairPlan(src, tgt, "id", Seq("name", "amount"))
    val up = p.upserts.select("id").as[Long].collect().sorted
    assert(up.toSeq == Seq(2L, 3L))
    assert(p.deletes.as[Long].collect().toSeq == Seq(5L))
    // applying the plan reconciles: (tgt minus deletes minus upserted
    // keys) union upserts == src
    val applied = tgt.join(p.deletes.toDF("id"), Seq("id"), "left_anti")
      .join(p.upserts.select("id"), Seq("id"), "left_anti")
      .unionByName(p.upserts)
    val r2 = Reconciler.diff(src, applied, "id", Seq("name", "amount"))
    assert(r2.missingInTarget.count() == 0 && r2.extraInTarget.count() == 0
      && r2.mismatched.count() == 0)
  }
}
