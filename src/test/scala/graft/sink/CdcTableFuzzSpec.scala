package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Schema-evolution fuzz for the engine core: random sequences of
  * appends drawn from a widening-compatible schema family must always
  * read back as the union of everything appended, cast to the final
  * merged schema — no dropped rows, no miscast values, regardless of
  * the order generations open. Every value is chosen integer-exact so
  * int→long→double widening preserves it bit-for-bit. */
class CdcTableFuzzSpec extends SparkSpec {

  /** One append variant: how to build the frame and what each row
    * should look like under the final merged schema. */
  private case class Variant(name: String, schema: StructType,
      mk: (String, Int) => Row)

  private val variants: Seq[Variant] = Seq(
    Variant("int",
      StructType(Seq(StructField("_id", StringType),
        StructField("a", IntegerType))),
      (id, v) => Row(id, v)),
    Variant("long",
      StructType(Seq(StructField("_id", StringType),
        StructField("a", LongType))),
      (id, v) => Row(id, v.toLong)),
    Variant("double",
      StructType(Seq(StructField("_id", StringType),
        StructField("a", DoubleType))),
      (id, v) => Row(id, v.toDouble)),
    Variant("plus_b",
      StructType(Seq(StructField("_id", StringType),
        StructField("a", IntegerType), StructField("b", LongType))),
      (id, v) => Row(id, v, v.toLong * 10)),
    Variant("plus_c",
      StructType(Seq(StructField("_id", StringType),
        StructField("a", IntegerType), StructField("c", StringType))),
      (id, v) => Row(id, v, s"s$v")))

  private val seqGen: Gen[List[(Int, Int)]] = for {
    nAppends <- Gen.choose(2, 5)
    picks <- Gen.listOfN(nAppends,
      Gen.zip(Gen.choose(0, variants.size - 1), Gen.choose(1, 5)))
  } yield picks

  test("random widening append sequences read back losslessly") {
    (0 until 12).foreach { seed =>
      seqGen(Gen.Parameters.default, Seed(seed.toLong)).foreach { picks =>
        val dir = tmpDir(s"fuzz$seed")
        // expected: (_id, a-as-double, b-opt, c-opt) per appended row
        val expected = scala.collection.mutable.ArrayBuffer
          .empty[(String, Double, Option[Long], Option[String])]
        picks.zipWithIndex.foreach { case ((vi, nRows), ai) =>
          val v = variants(vi)
          val rows = (0 until nRows).map { r =>
            val id = s"s$seed-a$ai-r$r"
            val base = (ai + 1) * 100 + r
            expected += ((id, base.toDouble,
              if (v.name == "plus_b") Some(base.toLong * 10) else None,
              if (v.name == "plus_c") Some(s"s$base") else None))
            v.mk(id, base)
          }
          val df: DataFrame = spark.createDataFrame(
            new java.util.ArrayList[Row](
              scala.jdk.CollectionConverters
                .SeqHasAsJava(rows).asJava), v.schema)
          CdcTable.append(df, dir, partitionBy = Nil)
        }
        val back = CdcTable.read(spark, dir)
        val cols = back.columns.toSet
        assert(cols.contains("_id") && cols.contains("a"), cols)
        val widest = picks.map(p => variants(p._1).name)
        val aType = back.schema("a").dataType
        if (widest.contains("double")) assert(aType == DoubleType)
        else assert(aType == IntegerType || aType == LongType ||
          aType == DoubleType)
        val got = back.collect().map { r =>
          val a = r.get(r.fieldIndex("a")) match {
            case i: java.lang.Integer => i.doubleValue()
            case l: java.lang.Long => l.doubleValue()
            case d: java.lang.Double => d.doubleValue()
            case other => fail(s"unexpected a type: $other")
          }
          (r.getString(r.fieldIndex("_id")), a,
            if (cols.contains("b"))
              Option(r.get(r.fieldIndex("b")))
                .map(_.asInstanceOf[Long]) else None,
            if (cols.contains("c"))
              Option(r.get(r.fieldIndex("c")))
                .map(_.asInstanceOf[String]) else None)
        }.toSeq
        assert(got.size == expected.size,
          s"seed=$seed picks=$picks: ${got.size} vs ${expected.size}")
        assert(got.sortBy(_._1) == expected.sortBy(_._1).toSeq,
          s"seed=$seed picks=$picks mismatch")
      }
    }
  }
}
