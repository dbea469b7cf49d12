package graft.core

import graft.core.SchemaMerge._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Properties of the widening lattice — mirrors the reference's unit
  * expectations (tests/unit/test_bson_to_delta.py:32-39 int widening,
  * :134-140 mixed arrays; test_type_resolver.py) plus algebraic laws
  * the reference never states but its matrix implies. */
class SchemaMergeSpec extends AnyFunSuite {

  /** Deterministic property driver over ScalaCheck generators. */
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val numerics: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
  private val scalars: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, TimestampType, NullType)
  private val types: Gen[DataType] = Gen.frequency(
    8 -> scalars,
    2 -> scalars.map(ArrayType(_, containsNull = true)),
    // nested: struct{a: T}, struct{a: array<T>}, array<struct{a: T}>
    1 -> scalars.map(t => StructType(Seq(StructField("a", t)))),
    1 -> scalars.map(t => StructType(Seq(StructField("a",
      ArrayType(t, containsNull = true))))),
    1 -> scalars.map(t => ArrayType(
      StructType(Seq(StructField("a", t))), containsNull = true)))

  test("numeric widening: wider wins (int32+int64→int64, int+double→double)") {
    assert(mergeTypes(IntegerType, LongType) == LongType)
    assert(mergeTypes(LongType, IntegerType) == LongType)
    assert(mergeTypes(IntegerType, DoubleType) == DoubleType)
    assert(mergeTypes(FloatType, LongType) == FloatType)
  }

  test("null resolves to the other type") {
    assert(mergeTypes(NullType, IntegerType) == IntegerType)
    assert(mergeTypes(StringType, NullType) == StringType)
  }

  test("incompatible pair falls back to string in Auto, raises in Strict") {
    assert(mergeTypes(BooleanType, IntegerType) == StringType)
    assert(mergeTypes(TimestampType, LongType) == StringType)
    assertThrows[SchemaConflictException](
      mergeTypes(BooleanType, IntegerType, Strict))
  }

  test("arrays merge element types recursively") {
    assert(mergeTypes(ArrayType(IntegerType), ArrayType(DoubleType)) ==
      ArrayType(DoubleType, containsNull = true))
  }

  test("structs union fields and merge overlaps recursively") {
    val a = StructType(Seq(StructField("x", IntegerType, nullable = false),
      StructField("y", StringType)))
    val b = StructType(Seq(StructField("x", LongType),
      StructField("z", BooleanType)))
    val m = merge(a, b)
    assert(m.fieldNames.toSeq == Seq("x", "y", "z"))
    assert(m("x").dataType == LongType)
    assert(m.fields.forall(_.nullable), "all merged fields nullable")
  }

  test("decimal widening keeps max integral digits and scale") {
    assert(mergeTypes(DecimalType(10, 2), DecimalType(5, 4)) ==
      DecimalType(12, 4))
  }

  test("Strict allows new fields but rejects type changes") {
    val a = StructType(Seq(StructField("x", IntegerType)))
    val plusField = StructType(Seq(StructField("x", IntegerType),
      StructField("y", StringType)))
    assert(merge(a, plusField, Strict).fieldNames.length == 2)
    val changed = StructType(Seq(StructField("x", DoubleType)))
    assertThrows[SchemaConflictException](merge(a, changed, Strict))
  }

  test("merge is commutative on the resulting type (property)") {
    forAll(types, types) { (a, b) =>
      assert(mergeTypes(a, b) == mergeTypes(b, a))
    }
  }

  test("merge is idempotent (property)") {
    forAll(types) { a => assert(mergeTypes(a, a) == a) }
  }

  test("merge is associative (property)") {
    forAll(types, types, types) { (a, b, c) =>
      assert(mergeTypes(mergeTypes(a, b), c) ==
        mergeTypes(a, mergeTypes(b, c)))
    }
  }

  test("merged type is a safe widening target of both inputs (numerics)") {
    forAll(numerics, numerics) { (a, b) =>
      val m = mergeTypes(a, b)
      assert(isSafeWidening(a, m) && isSafeWidening(b, m))
    }
  }

  test("coercion keeps the typed side only when existing is typed") {
    // existing typed + incoming string → typed (values coerce per row)
    for (t <- Seq(DateType, TimestampType, IntegerType, LongType,
        DoubleType, BooleanType, DecimalType(10, 2)))
      assert(mergeTypes(t, StringType, Coercion) == t, t.sql)
    // mirrored: existing string stays string (disk can't be retyped)
    assert(mergeTypes(StringType, DateType, Coercion) == StringType)
    assert(mergeTypes(StringType, LongType, Coercion) == StringType)
    // non-coercible conflicts still degrade like Auto
    assert(mergeTypes(ArrayType(LongType), StringType, Coercion)
      == StringType)
    // numerics still widen normally under Coercion
    assert(mergeTypes(IntegerType, DoubleType, Coercion) == DoubleType)
  }

  test("coercion merge stays idempotent and safe (property)") {
    forAll(types) { a => assert(mergeTypes(a, a, Coercion) == a) }
    forAll(numerics, numerics) { (a, b) =>
      val m = mergeTypes(a, b, Coercion)
      assert(isSafeWidening(a, m) && isSafeWidening(b, m))
    }
  }

  test("nested struct past maxStructFields spills to map<string,V>") {
    def struct(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    val a = StructType(Seq(StructField("id", LongType),
      StructField("attrs", struct("k1" -> LongType, "k2" -> LongType))))
    val b = StructType(Seq(StructField("id", LongType),
      StructField("attrs", struct("k3" -> LongType, "k4" -> LongType,
        "k5" -> LongType))))
    // under the cap: attrs (5 merged keys > 4) spills, values stay long
    val m = merge(a, b, Auto, maxStructFields = 4)
    assert(m("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true), s"$m")
    // heterogeneous values fall back to string inside the map
    val c = StructType(Seq(StructField("attrs",
      struct("k1" -> LongType, "k2" -> BooleanType, "k3" -> StringType,
        "k4" -> LongType, "k5" -> LongType))))
    val mc = merge(StructType(Nil), c, Auto, maxStructFields = 4)
    assert(mc("attrs").dataType ==
      MapType(StringType, StringType, valueContainsNull = true))
    // an already-spilled map absorbs later struct batches (and widens)
    val next = merge(m,
      StructType(Seq(StructField("attrs",
        struct("k9" -> DoubleType)))), Auto, maxStructFields = 4)
    assert(next("attrs").dataType ==
      MapType(StringType, DoubleType, valueContainsNull = true), s"$next")
    // under the cap the spilled type is still a safe widening target
    assert(isSafeWidening(a("attrs").dataType, m("attrs").dataType))
    assert(isSafeWidening(b("attrs").dataType, m("attrs").dataType))
    // without the cap: plain field union, no map anywhere
    val un = merge(a, b, Auto)
    assert(un("attrs").dataType.isInstanceOf[StructType])
    // the TOP-level row struct never collapses, however wide
    val wide = StructType((1 to 50).map(i => StructField(s"c$i", LongType)))
    assert(merge(wide, wide, Auto, maxStructFields = 4)
      .isInstanceOf[StructType])
    assert(merge(wide, wide, Auto, maxStructFields = 4).size == 50)
  }

  test("map/struct absorb: Strict-without-cap raises, non-string keys fall back") {
    val mapT = MapType(StringType, LongType, valueContainsNull = true)
    val structT = StructType(Seq(StructField("k", LongType)))
    // Strict WITHOUT the spill feature keeps its type-change promise
    intercept[SchemaConflictException] {
      mergeTypes(mapT, structT, Strict, "attrs")
    }
    // Strict WITH a cap: the spill is table-recorded shape, absorb
    assert(mergeTypes(mapT, structT, Strict, "attrs",
      maxStructFields = 4) == mapT)
    // Auto absorbs with or without the cap (the r7 regression)
    assert(mergeTypes(mapT, structT, Auto, "attrs") == mapT)
    assert(mergeTypes(structT, mapT, Auto, "attrs") == mapT)
    // a non-string-keyed map is NOT a spill shape — castTo cannot key
    // it from field names, so the pair falls back to string
    val intMap = MapType(IntegerType, LongType, valueContainsNull = true)
    assert(mergeTypes(intMap, structT, Auto, "attrs") == StringType)
    assert(mergeTypes(intMap, structT, Auto, "attrs",
      maxStructFields = 4) == StringType)
  }

  test("capped merge never yields an over-cap nested struct (property)") {
    val nestedStruct: Gen[StructType] = for {
      n <- Gen.chooseNum(0, 5)
      fields <- Gen.listOfN(n,
        Gen.zip(Gen.oneOf("a", "b", "c", "d", "e", "f"), scalars))
    } yield StructType(fields.distinctBy(_._1)
      .map { case (nm, t) => StructField(nm, t) })
    val rowSchema: Gen[StructType] = nestedStruct.map(s =>
      StructType(Seq(StructField("id", LongType),
        StructField("nested", s))))
    def assertCapped(t: DataType, top: Boolean): Unit = t match {
      case s: StructType =>
        if (!top) assert(s.size <= 3, s"over-cap struct survived: $s")
        s.fields.foreach(f => assertCapped(f.dataType, top = false))
      case ArrayType(e, _) => assertCapped(e, top = false)
      case MapType(_, v, _) => assertCapped(v, top = false)
      case _ =>
    }
    forAll(rowSchema, rowSchema) { (a, b) =>
      val m = merge(a, b, Auto, maxStructFields = 3)
      assertCapped(m, top = true)
      // idempotent: re-merging the result changes nothing
      assert(merge(m, m, Auto, maxStructFields = 3) == m)
      // absorbing either input again keeps the cap invariant
      assertCapped(merge(m, b, Auto, maxStructFields = 3), top = true)
    }
  }

  test("diff reports added/removed/changed") {
    val a = StructType(Seq(StructField("x", IntegerType),
      StructField("y", StringType)))
    val b = StructType(Seq(StructField("x", LongType),
      StructField("z", BooleanType)))
    val d = diff(a, b)
    assert(d.added == Seq("z") && d.removed == Seq("y"))
    assert(d.changed == Seq(("x", IntegerType, LongType)))
  }
}
