package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import SchemaHistory._

/** Replays the reference's ALTER-TABLE acceptance narrative
  * (`/root/reference/README.md:453-480`) as a DDL event stream.
  */
class SchemaHistorySpec extends AnyFunSuite {

  private val subject = "osci.db.cdc_test_db.person-value"

  private def seedPerson(reg: SchemaRegistry): Unit =
    reg.register(subject, StructType(Seq(
      StructField("firstName", StringType, nullable = true),
      StructField("lastName", StringType, nullable = true),
      StructField("age", IntegerType, nullable = false))))

  test("the README case sequence: drop ok, add-nullable ok, add-required rejected") {
    val reg = new SchemaRegistry()
    seedPerson(reg)
    val applied = replay(reg, Seq(
      DdlEvent(subject, 100, "drop_column", "lastName", "string", true),
      DdlEvent(subject, 200, "add_column", "email", "varchar", true),
      DdlEvent(subject, 300, "add_column", "address", "varchar", false)))

    assert(applied(0).version === Some(2)) // case 1 pass
    assert(applied(1).version === Some(3)) // case 2 pass
    assert(applied(2).version === None)    // case 3 fail
    assert(applied(2).rejection.exists(_.contains("address")))

    // rejected DDL did not advance the subject
    assert(reg.latest(subject).get.fieldNames.toSeq ===
      Seq("firstName", "age", "email"))
    assert(reg.history(subject).size === 3)
  }

  test("rejection does not poison subsequent compatible DDL") {
    val reg = new SchemaRegistry()
    seedPerson(reg)
    val applied = replay(reg, Seq(
      DdlEvent(subject, 100, "add_column", "bad", "int", false),
      DdlEvent(subject, 200, "add_column", "good", "int", true)))
    assert(applied(0).version === None)
    assert(applied(1).version === Some(2))
    assert(reg.latest(subject).get.fieldNames.contains("good"))
    assert(!reg.latest(subject).get.fieldNames.contains("bad"))
  }

  test("drop of a nonexistent column replays idempotently") {
    val reg = new SchemaRegistry()
    seedPerson(reg)
    val applied = replay(reg, Seq(
      DdlEvent(subject, 100, "drop_column", "lastName", "string", true),
      DdlEvent(subject, 150, "drop_column", "lastName", "string", true)))
    assert(applied(0).version === Some(2))
    // second drop is a no-op schema ⇒ idempotent re-register, same version
    assert(applied(1).version === Some(2))
  }

  test("multiple subjects interleave independently") {
    val reg = new SchemaRegistry()
    seedPerson(reg)
    reg.register("other-value", StructType(Seq(
      StructField("x", LongType, nullable = true))))
    val applied = replay(reg, Seq(
      DdlEvent("other-value", 120, "add_column", "y", "double", true),
      DdlEvent(subject, 110, "add_column", "email", "string", true)))
    assert(applied.forall(_.version.isDefined))
    assert(reg.latest("other-value").get.fieldNames.toSeq === Seq("x", "y"))
    assert(reg.latest(subject).get.fieldNames.contains("email"))
  }
}
