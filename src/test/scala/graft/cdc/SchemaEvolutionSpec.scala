package graft.cdc

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import SchemaEvolution._

/** Encodes the reference's schema-evolution acceptance cases
  * (`/root/reference/README.md:453-480`, FIXTURES.md B.3) plus a
  * ScalaCheck property over random evolution sequences.
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  private def checkProp(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  // person(firstName varchar null, lastName varchar null, age int not null)
  private val person = StructType(Seq(
    StructField("firstName", StringType, nullable = true),
    StructField("lastName", StringType, nullable = true),
    StructField("age", IntegerType, nullable = false)))

  test("case 1: dropping a column is BACKWARD-compatible (README.md:466-469)") {
    val dropped = StructType(person.fields.filterNot(_.name == "lastName"))
    assert(check(person, dropped).isCompatible)
  }

  test("case 2: adding a nullable column is compatible (README.md:471-474)") {
    val added = StructType(person.fields :+
      StructField("email", StringType, nullable = true))
    assert(check(person, added).isCompatible)
  }

  test("case 3: adding NOT NULL without default fails (README.md:476-479)") {
    val added = StructType(person.fields :+
      StructField("address", StringType, nullable = false))
    val verdict = check(person, added)
    assert(!verdict.isCompatible)
    verdict match {
      case Incompatible(reasons) =>
        assert(reasons.exists(_.contains("address")))
      case _ => fail("expected Incompatible")
    }
  }

  test("numeric widening is readable; narrowing is not") {
    val intAge = person
    val longAge = StructType(person.fields.map {
      case f if f.name == "age" => f.copy(dataType = LongType)
      case f => f
    })
    assert(check(intAge, longAge).isCompatible)
    assert(!check(longAge, intAge).isCompatible)
  }

  test("tightening nullable→required is incompatible") {
    val tightened = StructType(person.fields.map {
      case f if f.name == "firstName" => f.copy(nullable = false)
      case f => f
    })
    assert(!check(person, tightened).isCompatible)
  }

  test("FORWARD mode mirrors: drop of a required column is incompatible") {
    // old reader expects age (required); new data lacks it.
    val dropped = StructType(person.fields.filterNot(_.name == "age"))
    assert(!check(person, dropped, Forward).isCompatible)
    // but dropping a nullable column is fine even FORWARD
    val droppedNullable = StructType(person.fields.filterNot(_.name == "lastName"))
    assert(check(person, droppedNullable, Forward).isCompatible)
  }

  test("registry accepts compatible chains and rejects case-3 evolution") {
    val reg = new SchemaRegistry()
    assert(reg.register("person-value", person) === Right(1))
    val v2 = StructType(person.fields :+
      StructField("email", StringType, nullable = true))
    assert(reg.register("person-value", v2) === Right(2))
    val bad = StructType(v2.fields :+
      StructField("address", StringType, nullable = false))
    assert(reg.register("person-value", bad).isLeft)
    assert(reg.latest("person-value").contains(v2))
    assert(reg.history("person-value").size === 2)
  }

  test("mergeReadSchema nullifies columns absent from any version") {
    val v2 = StructType(person.fields.filterNot(_.name == "age") :+
      StructField("email", StringType, nullable = true))
    val merged = mergeReadSchema(Seq(person, v2))
    assert(merged.fieldNames.toSet ===
      Set("firstName", "lastName", "age", "email"))
    assert(merged("age").nullable, "age missing from v2 must become nullable")
    assert(merged("email").nullable)
  }

  // ---- property: verdict matches the readability rule -----------------

  private val fieldGen: Gen[StructField] = for {
    name <- Gen.oneOf("a", "b", "c", "d", "e", "f")
    tpe <- Gen.oneOf(StringType, IntegerType, LongType, DoubleType)
    nullable <- Gen.oneOf(true, false)
  } yield StructField(name, tpe, nullable)

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    fields <- Gen.listOfN(n, fieldGen)
  } yield StructType(fields.groupBy(_.name).map(_._2.head).toSeq)

  test("property: BACKWARD verdict == every reader field is fillable/readable") {
    checkProp(Prop.forAll(schemaGen, schemaGen) { (oldS: StructType, newS: StructType) =>
      val verdict = SchemaEvolution.check(oldS, newS).isCompatible
      val widen = Set(("integer", "long"), ("integer", "double"),
        ("long", "double"), ("float", "double"))
      val oldByName = oldS.fields.map(f => f.name -> f).toMap
      val expected = newS.fields.forall { nf =>
        oldByName.get(nf.name) match {
          case None => nf.nullable
          case Some(of) =>
            val typeOk = of.dataType == nf.dataType ||
              widen((of.dataType.typeName, nf.dataType.typeName))
            typeOk && (!of.nullable || nf.nullable)
        }
      }
      verdict == expected
    })
  }
}
