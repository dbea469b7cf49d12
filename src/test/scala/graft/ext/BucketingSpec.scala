package graft.ext

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans zero shuffle exchanges") {
    val facts = spark.range(0, 10000).toDF("k")
      .withColumn("v", $"k" * 3)
    val dims = spark.range(0, 1000).toDF("k")
      .withColumn("name", org.apache.spark.sql.functions
        .concat(org.apache.spark.sql.functions.lit("d"), $"k"))
    Bucketing.writeBucketed(facts, "bk_facts", "k")
    Bucketing.writeBucketed(dims, "bk_dims", "k")
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bk_facts", "bk_dims", "k")
      assert(joined.count() == 1000)
      assert(Bucketing.isShuffleFree(joined),
        s"expected no Exchange:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
    }
  }
}
