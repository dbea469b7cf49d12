package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The MapType overflow spill end to end over DataFrames: a
  * high-cardinality-key corpus (every batch brings novel nested keys)
  * must keep a BOUNDED table schema, and castTo must project struct
  * batches into the spilled map faithfully (absent keys drop, present
  * values widen). */
class MapSpillSpec extends SparkSpec {

  private def batch(keys: Seq[(String, Any)], id: Long) = {
    val attrT = StructType(keys.map { case (k, v) =>
      StructField(k, v match {
        case _: Long => LongType
        case _: String => StringType
      })
    })
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("attrs", attrT)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(id, Row(keys.map(_._2): _*))), schema)
  }

  test("castTo projects a struct batch into the spilled map column") {
    val b1 = batch(Seq("k1" -> 1L, "k2" -> 2L), 1L)
    val b2 = batch(Seq("k3" -> 3L, "k4" -> 4L, "k5" -> 5L), 2L)
    val merged = SchemaMerge.merge(b1.schema, b2.schema,
      SchemaMerge.Auto, maxStructFields = 4)
    assert(merged("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))

    val out = SchemaMerge.castTo(b1, merged)
      .unionByName(SchemaMerge.castTo(b2, merged))
    val rows = out.select(col("id"), col("attrs"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, Long](1).toMap)
      .toMap
    assert(rows(1L) == Map("k1" -> 1L, "k2" -> 2L), s"got ${rows(1L)}")
    assert(rows(2L) == Map("k3" -> 3L, "k4" -> 4L, "k5" -> 5L))
  }

  test("100 novel keys stay one bounded map column, values queryable") {
    // simulate 100 batches each bringing a fresh key: the merged
    // schema must stay 2 columns (id + one map), not 101
    var schema = batch(Seq("k0" -> 0L), 0L).schema
    (1 until 100).foreach { i =>
      schema = SchemaMerge.merge(schema,
        batch(Seq(s"k$i" -> i.toLong), i.toLong).schema,
        SchemaMerge.Auto, maxStructFields = 16)
    }
    assert(schema.size == 2, s"schema must stay bounded: $schema")
    assert(schema("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    // every batch still projects and its key/value survives
    val all = (0 until 100).map(i =>
      SchemaMerge.castTo(batch(Seq(s"k$i" -> i.toLong), i.toLong), schema))
      .reduce(_ unionByName _)
    assert(all.count() == 100)
    val probed = all.select(col("id"),
        element_at(col("attrs"), concat(lit("k"), col("id"))).as("v"))
      .filter(col("v") === col("id"))
    assert(probed.count() == 100,
      "every row's own key must be present with its value")
  }

  test("spill with heterogeneous value types stringifies, nulls drop") {
    val b1 = batch(Seq("k1" -> 1L, "k2" -> 2L, "k3" -> 3L), 1L)
    val b2 = batch(Seq("k4" -> "x", "k5" -> 5L), 2L)
    val merged = SchemaMerge.merge(b1.schema, b2.schema,
      SchemaMerge.Auto, maxStructFields = 4)
    assert(merged("attrs").dataType ==
      MapType(StringType, StringType, valueContainsNull = true))
    val rows = SchemaMerge.castTo(b1, merged)
      .unionByName(SchemaMerge.castTo(b2, merged))
      .collect().map(r => r.getLong(0) -> r.getMap[String, String](1).toMap)
      .toMap
    assert(rows(1L) == Map("k1" -> "1", "k2" -> "2", "k3" -> "3"))
    // b2's absent keys (k1..k3 were never in its struct) must DROP
    // from its map, not appear as nulls
    assert(rows(2L) == Map("k4" -> "x", "k5" -> "5"), s"got ${rows(2L)}")
  }

  test("CdcTable.append with the cap keeps the table schema bounded") {
    import graft.sink.CdcTable
    val dir = java.nio.file.Files.createTempDirectory("spill").toString
    CdcTable.append(batch(Seq("k1" -> 1L, "k2" -> 2L, "k3" -> 3L), 1L),
      dir, maxStructFields = 4)
    // still under the cap: attrs stays a struct
    assert(CdcTable.currentSchema(dir).get("attrs")
      .dataType.isInstanceOf[StructType])
    CdcTable.append(batch(Seq("k4" -> 4L, "k5" -> 5L), 2L),
      dir, maxStructFields = 4)
    // merged width 5 > 4: the column spills, schema stays 2 columns
    val schema = CdcTable.currentSchema(dir).get
    assert(schema.size == 2, s"$schema")
    assert(schema("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    // both generations read back through the spilled schema
    val rows = CdcTable.read(spark, dir)
      .collect().map(r => r.getLong(0) ->
        r.getMap[String, Long](r.fieldIndex("attrs")).toMap).toMap
    assert(rows(1L) == Map("k1" -> 1L, "k2" -> 2L, "k3" -> 3L),
      s"old-generation struct rows project into the map: ${rows(1L)}")
    assert(rows(2L) == Map("k4" -> 4L, "k5" -> 5L))
  }

  test("nested struct field-union evolution reads by NAME, not position") {
    import graft.sink.CdcTable
    val dir = java.nio.file.Files.createTempDirectory("nestevo").toString
    val s1 = StructType(Seq(StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("s", StructType(Seq(
        // b FIRST: a positional struct cast would map b's value onto a
        StructField("b", LongType), StructField("a", LongType))))))
    CdcTable.append(spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Row(10L))), s1), dir)
    CdcTable.append(spark.createDataFrame(
      java.util.Arrays.asList(Row(2L, Row(99L, 20L))), s2), dir)
    val rows = CdcTable.read(spark, dir).select("id", "s.a", "s.b")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows(1L) == ((Some(10L), None)),
      s"old-gen a keeps its value, b null-fills: ${rows(1L)}")
    assert(rows(2L) == ((Some(20L), Some(99L))),
      s"field values must follow NAMES across generations: ${rows(2L)}")
  }

  test("a spilled map survives later merges that pass NO cap") {
    import graft.sink.CdcTable
    val dir = java.nio.file.Files.createTempDirectory("spillstick").toString
    CdcTable.append(batch(Seq("k1" -> 1L, "k2" -> 2L, "k3" -> 3L), 1L),
      dir, maxStructFields = 2)
    assert(CdcTable.currentSchema(dir).get("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    // plain append (no cap argument): the recorded spill must absorb
    // the struct batch, NOT degrade the column to string
    CdcTable.append(batch(Seq("k9" -> 9L), 2L), dir)
    val schema = CdcTable.currentSchema(dir).get
    assert(schema("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true),
      s"cap-less merge must respect the spilled map: $schema")
    val rows = CdcTable.read(spark, dir)
      .collect().map(r => r.getLong(0) ->
        r.getMap[String, Long](r.fieldIndex("attrs")).toMap).toMap
    assert(rows(2L) == Map("k9" -> 9L), s"got ${rows(2L)}")
  }

  test("a FIRST batch already past the cap spills immediately") {
    import graft.sink.CdcTable
    val dir = java.nio.file.Files.createTempDirectory("spillfirst").toString
    // 5 keys > cap 4 on a fresh table: the self-merge's x == y
    // short-circuit must not smuggle the over-cap struct through
    CdcTable.append(batch(
      Seq("k1" -> 1L, "k2" -> 2L, "k3" -> 3L, "k4" -> 4L, "k5" -> 5L),
      1L), dir, maxStructFields = 4)
    assert(CdcTable.currentSchema(dir).get("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    assert(CdcTable.read(spark, dir)
      .selectExpr("attrs['k5']").head().getLong(0) == 5L)
  }

  test("null struct rows stay null through the spill projection") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("attrs", StructType(Seq(
        StructField("k1", LongType), StructField("k2", LongType))))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Row(7L, null)), Row(2L, null)),
      schema)
    val target = StructType(Seq(StructField("id", LongType),
      StructField("attrs",
        MapType(StringType, LongType, valueContainsNull = true))))
    val rows = SchemaMerge.castTo(df, target).collect()
      .map(r => r.getLong(0) ->
        Option(r.getMap[String, Long](1)).map(_.toMap)).toMap
    assert(rows(1L) == Some(Map("k1" -> 7L)),
      s"null-valued field drops: ${rows(1L)}")
    assert(rows(2L) == None, "a null struct row must stay null")
  }

  test("castTo treats types differing only in nullability as equal") {
    // a frame written from non-null in-memory data records
    // array<float> containsNull=false; the parquet relation reads it
    // back containsNull=true — Spark 4 refuses that element cast, so
    // castTo must pass the column through untouched (regression for
    // the first array<float> payload through CdcTable: the vector
    // near-dup index)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(1.0f, 2.0f), Map("a" -> 1L), Row(7L))),
      StructType(Seq(StructField("id", LongType),
        StructField("e", ArrayType(FloatType, containsNull = true)),
        StructField("m",
          MapType(StringType, LongType, valueContainsNull = true)),
        StructField("s", StructType(Seq(StructField("x", LongType)))))))
    val target = StructType(Seq(StructField("id", LongType),
      StructField("e", ArrayType(FloatType, containsNull = false)),
      StructField("m",
        MapType(StringType, LongType, valueContainsNull = false)),
      StructField("s", StructType(Seq(StructField("x", LongType))))))
    val out = SchemaMerge.castTo(df, target)
    // no Cast survives in the plan for these columns…
    assert(!out.queryExecution.analyzed.toString.toLowerCase
      .contains("cast(e"), out.queryExecution.analyzed.toString)
    // …and the data round-trips
    val r = out.collect().head
    assert(r.getSeq[Float](1) == Seq(1.0f, 2.0f))
    assert(r.getMap[String, Long](2).toMap == Map("a" -> 1L))
    assert(r.getStruct(3).getLong(0) == 7L)
  }
}
