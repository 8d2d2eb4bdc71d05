package graft

import graft.model._

class RegistrySpec extends SparkSpecBase {

  test("value kinds parse round-trip incl. lists") {
    assert(ValueKind.parse("DOUBLE") == ValueKind.DoubleK)
    assert(ValueKind.parse("FLOAT_LIST") == ValueKind.ListK(ValueKind.FloatK))
    assertThrows[IllegalArgumentException](ValueKind.parse("NOPE"))
  }

  test("feature refs use table:feature string form") {
    assert(FeatureRef.parse("user_activity:value") == FeatureRef("user_activity", "value"))
    assert(FeatureRef("t", "f").toString == "t:f")
  }

  test("registry rejects invalid names (reference Matchers semantics)") {
    val r = new Registry
    assertThrows[IllegalArgumentException](r.applyEntity(Entity("user-id", ValueKind.Int64K)))
    assertThrows[IllegalArgumentException](r.applyEntity(Entity("1user", ValueKind.Int64K)))
    r.applyEntity(Entity("user_id", ValueKind.Int64K))
    assertThrows[IllegalArgumentException] {
      r.applyTable(FeatureTable("t!", Seq("user_id"), Seq(Feature("f", ValueKind.DoubleK))))
    }
    assertThrows[IllegalArgumentException] {
      r.applyTable(FeatureTable("t", Seq("user_id"), Seq(Feature("f spaces", ValueKind.DoubleK))))
    }
  }

  test("registry validates entities on table apply") {
    val r = new Registry
    r.applyEntity(Entity("user_id", ValueKind.Int64K))
    assertThrows[IllegalArgumentException] {
      r.applyTable(FeatureTable("t", Seq("nope"), Seq(Feature("f", ValueKind.DoubleK))))
    }
    r.applyTable(FeatureTable("t", Seq("user_id"), Seq(Feature("f", ValueKind.DoubleK))))
    assert(r.getTable("t").get.featureRefs == Seq(FeatureRef("t", "f")))
    r.deleteTable("t")
    assert(r.getTable("t").isEmpty)
  }

  test("registry save/load round-trips entities and tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg").toString
    val r = Registry.demo(sfDir)
    Registry.save(r, spark, dir)
    val back = Registry.load(spark, dir)
    assert(back.listEntities.toSet == r.listEntities.toSet)
    assert(back.listTables.map(_.copy(features = Seq.empty)).toSet ==
           r.listTables.map(_.copy(features = Seq.empty)).toSet)
    assert(back.getTable("user_activity").get.features.map(_.name).toSet ==
           r.getTable("user_activity").get.features.map(_.name).toSet)
  }

  test("filterTables matches entity sets and label subsets") {
    val r = Registry.demo(sfDir)
    assert(r.filterTables(entitiesFilter = Seq("user_id")).map(_.name) == Seq("user_activity"))
    assert(r.filterTables(labelsFilter = Map("graft.ts_unit" -> "nanos")).map(_.name) == Seq("user_activity"))
    assert(r.filterTables(labelsFilter = Map("graft.ts_unit" -> "millis")).isEmpty)
    assert(r.filterTables().size == 2)
  }

  test("demo registry dumps one row per table×feature") {
    val df = Registry.demo(sfDir).toDF(spark)
    assert(df.count() == 4)
    assert(df.columns.contains("max_age_sec"))
  }
}
