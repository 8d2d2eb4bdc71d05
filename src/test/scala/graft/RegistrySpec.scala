package graft

import graft.model._

class RegistrySpec extends SparkSpecBase {

  private val src = Some("/tmp/nowhere.parquet")

  private def table(name: String = "t",
                    entities: Seq[String] = Seq("user_id"),
                    features: Seq[Feature] = Seq(Feature("f", ValueKind.DoubleK)),
                    labels: Map[String, String] = Map.empty,
                    batchSourcePath: Option[String] = src,
                    streamSource: Option[StreamSourceSpec] = None) =
    FeatureTable(name, entities, features, labels = labels,
      batchSourcePath = batchSourcePath, streamSource = streamSource)

  private def freshRegistry: Registry = {
    val r = new Registry
    r.applyEntity(Entity("user_id", ValueKind.Int64K))
    r
  }

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
    val r = freshRegistry
    assertThrows[IllegalArgumentException](r.applyEntity(Entity("user-id", ValueKind.Int64K)))
    assertThrows[IllegalArgumentException](r.applyEntity(Entity("1user", ValueKind.Int64K)))
    assertThrows[IllegalArgumentException](r.applyTable(table(name = "t!")))
    assertThrows[IllegalArgumentException](
      r.applyTable(table(features = Seq(Feature("f spaces", ValueKind.DoubleK)))))
  }

  test("registry validates entities on table apply") {
    val r = freshRegistry
    assertThrows[IllegalArgumentException](r.applyTable(table(entities = Seq("nope"))))
    r.applyTable(table())
    assert(r.getTable("t").get.featureRefs == Seq(FeatureRef("t", "f")))
    r.deleteTable("t")
    assert(r.getTable("t").isEmpty)
  }

  // Each case quotes the reference rule it mirrors
  // (core/src/main/java/feast/core/validators/FeatureTableValidator.java:35-70).
  test("validateSpec parity: FeatureTableValidator rules") {
    val r = freshRegistry
    // "FeatureTable name must be provided"
    assertThrows[IllegalArgumentException](r.applyTable(table(name = "")))
    // "FeatureTable cannot have labels with empty key."
    assertThrows[IllegalArgumentException](r.applyTable(table(labels = Map("" -> "v"))))
    // "FeatureTable entities list cannot be empty."
    assertThrows[IllegalArgumentException](r.applyTable(table(entities = Seq.empty)))
    // "FeatureTable features list cannot be empty."
    assertThrows[IllegalArgumentException](r.applyTable(table(features = Seq.empty)))
    // "FeatureTable batch source cannot be empty."
    assertThrows[IllegalArgumentException](r.applyTable(table(batchSourcePath = None)))
    // "Features cannot have labels with empty key."
    assertThrows[IllegalArgumentException](r.applyTable(
      table(features = Seq(Feature("f", ValueKind.DoubleK, labels = Map("" -> "v"))))))
    // "Reserved names has been used as Feature(s) names." — both reserved
    // names, as either feature or entity
    assertThrows[IllegalArgumentException](r.applyTable(
      table(features = Seq(Feature("event_timestamp", ValueKind.DoubleK)))))
    assertThrows[IllegalArgumentException](r.applyTable(
      table(features = Seq(Feature("created_timestamp", ValueKind.DoubleK)))))
    r.applyEntity(Entity("event_timestamp", ValueKind.Int64K))
    assertThrows[IllegalArgumentException](r.applyTable(
      table(entities = Seq("event_timestamp"))))
    // "Entity and Feature names within a Feature Table should be unique."
    assertThrows[IllegalArgumentException](r.applyTable(
      table(features = Seq(Feature("user_id", ValueKind.DoubleK)))))
    assertThrows[IllegalArgumentException](r.applyTable(
      table(features = Seq(Feature("f", ValueKind.DoubleK), Feature("f", ValueKind.Int64K)))))
    // a fully-valid spec still applies
    r.applyTable(table())
    assert(r.getTable("t").nonEmpty)
  }

  // reference: core/model/Project.java + service/ProjectService.java +
  // SpecService.java project autofill/archived checks.
  test("project namespacing: scoping, autofill, archive semantics") {
    val r = new Registry
    r.createProject("team-a") // dashes allowed for projects only
    assertThrows[IllegalArgumentException](r.createProject("team-a")) // "Project already exists"
    assertThrows[IllegalArgumentException](r.createProject("bad name"))
    r.applyEntity(Entity("user_id", ValueKind.Int64K), project = "team-a")
    r.applyEntity(Entity("user_id", ValueKind.Int64K)) // default project
    // same table name in two projects = two independent tables
    r.applyTable(table(features = Seq(Feature("fa", ValueKind.DoubleK))), project = "team-a")
    r.applyTable(table(features = Seq(Feature("fb", ValueKind.DoubleK))))
    assert(r.getTable("t", "team-a").get.features.head.name == "fa")
    assert(r.getTable("t").get.features.head.name == "fb")
    assert(r.getTable("t", "team-a").get ne r.getTable("t").get)
    assert(r.listTables("team-a").size == 1 && r.listTables.size == 1)
    // empty project autofills to "default" (SpecService.java:104)
    assert(r.getTable("t", "").get.features.head.name == "fb")
    // apply auto-creates an unknown project (SpecService.java:281)
    r.applyEntity(Entity("item_id", ValueKind.Int64K), project = "auto_made")
    assert(r.getEntity("item_id", "auto_made").nonEmpty)
    // archive: unknown project errors, default cannot be archived,
    // archived projects reject writes, and vanish from listProjects
    assertThrows[IllegalArgumentException](r.archiveProject("ghost"))
    assertThrows[UnsupportedOperationException](r.archiveProject(Project.Default))
    r.archiveProject("team-a")
    assert(!r.listProjects.map(_.name).contains("team-a"))
    assertThrows[IllegalArgumentException]( // "Project is archived"
      r.applyEntity(Entity("x", ValueKind.Int64K), project = "team-a"))
    // reads of archived projects still work (reference keeps the data)
    assert(r.getTable("t", "team-a").nonEmpty)
  }

  // reference: core/validators/DataSourceValidator.java STREAM_KAFKA /
  // STREAM_KINESIS arms + Matchers.checkValidClassPath.
  test("stream source spec validation parity") {
    val r = freshRegistry
    def withStream(s: StreamSourceSpec) = table(streamSource = Some(s))
    // Kafka: bootstrap_servers/topic required; proto format needs a valid
    // class path; avro passes
    assertThrows[IllegalArgumentException](r.applyTable(withStream(
      KafkaSourceSpec("", "topic", StreamFormat.AvroFormat()))))
    assertThrows[IllegalArgumentException](r.applyTable(withStream(
      KafkaSourceSpec("b:9092", "", StreamFormat.AvroFormat()))))
    assertThrows[IllegalArgumentException](r.applyTable(withStream(
      KafkaSourceSpec("b:9092", "topic", StreamFormat.ProtoFormat("not a classpath!")))))
    r.applyTable(withStream(
      KafkaSourceSpec("b:9092", "topic", StreamFormat.ProtoFormat("com.example.FeatureRow"))))
    r.applyTable(withStream(
      KafkaSourceSpec("b:9092", "topic", StreamFormat.AvroFormat("{}"))))
    // Kinesis: region/stream_name required
    assertThrows[IllegalArgumentException](r.applyTable(withStream(
      KinesisSourceSpec("", "stream", StreamFormat.AvroFormat()))))
    assertThrows[IllegalArgumentException](r.applyTable(withStream(
      KinesisSourceSpec("us-east-1", "", StreamFormat.AvroFormat()))))
    r.applyTable(withStream(
      KinesisSourceSpec("us-east-1", "stream", StreamFormat.ProtoFormat("com.example.Row"))))
    // File: path required
    assertThrows[IllegalArgumentException](r.applyTable(withStream(
      FileStreamSourceSpec(""))))
  }

  test("registry save/load round-trips entities, tables, projects and stream sources") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg").toString
    val r = Registry.demo(sfDir)
    r.createProject("team-b")
    r.applyEntity(Entity("item_id", ValueKind.Int64K), project = "team-b")
    r.applyTable(FeatureTable("items", Seq("item_id"),
      Seq(Feature("price", ValueKind.DoubleK)),
      batchSourcePath = Some("/tmp/items.parquet"),
      streamSource = Some(KinesisSourceSpec("eu-west-1", "item_stream",
        StreamFormat.ProtoFormat("com.example.Item"), fieldMapping = Map("p" -> "price")))),
      project = "team-b")
    Registry.save(r, spark, dir)
    val back = Registry.load(spark, dir)
    assert(back.listEntities.toSet == r.listEntities.toSet)
    assert(back.listEntities("team-b").toSet == r.listEntities("team-b").toSet)
    assert(back.listTables.map(_.copy(features = Seq.empty)).toSet ==
           r.listTables.map(_.copy(features = Seq.empty)).toSet)
    assert(back.getTable("user_activity").get.features.map(_.name).toSet ==
           r.getTable("user_activity").get.features.map(_.name).toSet)
    // typed stream sources round-trip exactly
    assert(back.getTable("user_activity").get.streamSource ==
           r.getTable("user_activity").get.streamSource)
    assert(back.getTable("items", "team-b").get.streamSource ==
           r.getTable("items", "team-b").get.streamSource)
  }

  test("load accepts a round-3 (v1) registry save: ';'-separated unescaped labels") {
    import spark.implicits._
    // byte-for-byte the shape round 3's save wrote: labels joined with ';'
    // unescaped, and NO feature_labels column on tables
    val dir = java.nio.file.Files.createTempDirectory("graft-reg-v1").toString
    Seq(("default", false)).toDF("name", "archived")
      .coalesce(1).write.json(s"$dir/projects")
    Seq(("default", "user_id", "INT64", "actor", "team=ml;tier=gold"))
      .toDF("project", "name", "value_type", "description", "labels")
      .coalesce(1).write.json(s"$dir/entities")
    Seq(("default", "activity", "user_id", "value", "DOUBLE",
        604800L, "ts", "", "/tmp/ev.parquet", "", "graft.ts_unit=nanos;owner=data"))
      .toDF("project", "table_name", "entities", "feature", "value_type",
        "max_age_sec", "event_ts_col", "created_ts_col", "batch_source",
        "stream_source", "labels")
      .coalesce(1).write.json(s"$dir/tables")
    val r = Registry.load(spark, dir)
    assert(r.listEntities.head.labels == Map("team" -> "ml", "tier" -> "gold"))
    val t = r.getTable("activity").get
    assert(t.labels == Map("graft.ts_unit" -> "nanos", "owner" -> "data"))
    assert(t.maxAgeSec.contains(604800L))
    // re-save writes v2; the round trip preserves the maps exactly
    val dir2 = java.nio.file.Files.createTempDirectory("graft-reg-v1b").toString
    Registry.save(r, spark, dir2)
    val r2 = Registry.load(spark, dir2)
    assert(r2.listEntities.head.labels == Map("team" -> "ml", "tier" -> "gold"))
    assert(r2.getTable("activity").get.labels ==
      Map("graft.ts_unit" -> "nanos", "owner" -> "data"))
    // and a v2 string whose VALUE contains ';' (no k=v shape after it)
    // still parses as v2
    assert(SourceValidation.parseMapCompat("k=a;b") == Map("k" -> "a;b"))
    assert(SourceValidation.parseMapCompat("a=1;b=2") == Map("a" -> "1", "b" -> "2"))
  }

  test("save/load keeps archived projects' contents, stores and on-demand views") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg2").toString
    val r = Registry.demo(sfDir)
    // archived project WITH contents: reference Core archives but keeps data
    r.createProject("old-team")
    r.applyEntity(Entity("thing_id", ValueKind.Int64K), project = "old-team")
    r.applyTable(FeatureTable("things", Seq("thing_id"),
      Seq(Feature("weight", ValueKind.DoubleK)),
      batchSourcePath = Some("/tmp/things.parquet")), project = "old-team")
    r.archiveProject("old-team")
    // a store with config + subscriptions must survive the round trip
    r.applyStore(StoreSpec("online_main", "parquet",
      config = Map("path" -> "/tmp/store", "note" -> "a=b,c|d"),
      subscriptions = Seq(Subscription("default", "*"),
        Subscription("default", "secret_*", exclude = true))))
    Registry.save(r, spark, dir)
    val back = Registry.load(spark, dir)
    // archived project: contents present, still archived (writes rejected)
    assert(back.getTable("things", "old-team").get.features.map(_.name) == Seq("weight"))
    assert(!back.listProjects.exists(_.name == "old-team"))
    assert(back.listAllProjects.exists(p => p.name == "old-team" && p.archived))
    assertThrows[IllegalArgumentException](
      back.applyEntity(Entity("x", ValueKind.Int64K), project = "old-team"))
    // stores + on-demand views round-trip exactly
    assert(back.getStore("online_main") == r.getStore("online_main"))
    assert(back.getOnDemandView("activity_derived") == r.getOnDemandView("activity_derived"))
  }

  test("request-data-only on-demand views (no inputs) survive save/load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg4").toString
    val r = new Registry
    r.applyOnDemandView(OnDemandView("reqonly", Seq.empty,
      Seq(OnDemandFeature("const_two", "1 + 1"))))
    Registry.save(r, spark, dir)
    val back = Registry.load(spark, dir)
    assert(back.getOnDemandView("reqonly") == r.getOnDemandView("reqonly"))
  }

  test("stream source render/parse survives delimiter characters (Avro schema JSON)") {
    // a realistic Avro schema contains '|' in doc strings and ','/':'
    // everywhere; fieldMapping keys/values may carry ','/'='/'|'
    val schema = """{"type":"record","name":"E","doc":"a|b,c=d","fields":[{"name":"v","type":"double"}]}"""
    val spec = KafkaSourceSpec("broker-1:9092,broker-2:9092", "topic.v1",
      StreamFormat.AvroFormat(schema), "ts",
      fieldMapping = Map("raw,key" -> "clean=value", "pipe|key" -> "v|2"))
    assert(StreamSourceSpec.parse(spec.render) == spec)
    val fspec = FileStreamSourceSpec("/data/with|pipe", "json", "ts",
      fieldMapping = Map("a" -> "b"))
    assert(StreamSourceSpec.parse(fspec.render) == fspec)
    // and through a full registry save/load
    val dir = java.nio.file.Files.createTempDirectory("graft-reg3").toString
    val r = new Registry
    r.applyEntity(Entity("user_id", ValueKind.Int64K))
    r.applyTable(FeatureTable("esc", Seq("user_id"),
      Seq(Feature("value", ValueKind.DoubleK, labels = Map("unit" -> "m=s,x"))),
      batchSourcePath = Some("/tmp/esc.parquet"), streamSource = Some(spec),
      // the ';x=y' value is the v1-lookalike shape: ';' is escaped on
      // write, so the compat parser can never mistake this v2 save for v1
      labels = Map("note" -> "a=b,c", "tricky" -> "v;x=y")))
    Registry.save(r, spark, dir)
    val back = Registry.load(spark, dir).getTable("esc").get
    assert(back.streamSource.contains(spec))
    // table AND feature label maps survive delimiter-laden values
    assert(back.labels == Map("note" -> "a=b,c", "tricky" -> "v;x=y"))
    assert(back.features.head.labels == Map("unit" -> "m=s,x"))
  }

  // reference: core/model/Store.java + common/models/Store.java
  // (parseSubscriptionFrom / convertStringToSubscription /
  // isSubscribedToFeatureSet).
  test("store subscriptions: string form, globs, exclusion priority") {
    // "project:name:exclude" round-trip + 2-part backward-compat form
    assert(Subscription.parse("default:driver_*:false") ==
           Subscription("default", "driver_*"))
    assert(Subscription.parse("team-a:t1") == Subscription("team-a", "t1"))
    assert(Subscription.parse("*:*:true") == Subscription("*", "*", exclude = true))
    assert(Subscription.parse(Subscription("p", "n", exclude = true).render) ==
           Subscription("p", "n", exclude = true))
    // "Missing arguments in subscription string"
    assertThrows[IllegalArgumentException](Subscription("", "n"))
    assertThrows[IllegalArgumentException](Subscription("p", ""))
    // glob matching on both project and name
    val s = StoreSpec("online", "parquet",
      subscriptions = Seq(Subscription("team-*", "driver_*")))
    assert(s.isSubscribedTo("team-a", "driver_hourly"))
    assert(!s.isSubscribedTo("other", "driver_hourly"))
    assert(!s.isSubscribedTo("team-a", "rider_hourly"))
    // exclusions have highest priority (reference Case 1 before Case 2)
    val excl = StoreSpec("online", "parquet", subscriptions = Seq(
      Subscription("*", "*"),
      Subscription("default", "secret_*", exclude = true)))
    assert(excl.isSubscribedTo("default", "driver_hourly"))
    assert(!excl.isSubscribedTo("default", "secret_stats"))
    // no include patterns -> subscribed to nothing
    assert(!StoreSpec("s", "parquet").isSubscribedTo("default", "t"))
    // registry CRUD
    val r = freshRegistry
    r.applyStore(s)
    assert(r.getStore("online").contains(s))
    assert(r.listStores == Seq(s))
    assertThrows[IllegalArgumentException](r.applyStore(StoreSpec("bad name", "parquet")))
  }

  test("entity labels filter and persist (reference hasAllLabels)") {
    val r = new Registry
    r.applyEntity(Entity("user_id", ValueKind.Int64K, labels = Map("team" -> "growth", "pii" -> "no")))
    r.applyEntity(Entity("device_id", ValueKind.StringK, labels = Map("team" -> "infra")))
    assert(r.filterEntities(Map("team" -> "growth")).map(_.name) == Seq("user_id"))
    assert(r.filterEntities(Map("team" -> "growth", "pii" -> "no")).map(_.name) == Seq("user_id"))
    assert(r.filterEntities(Map("team" -> "nope")).isEmpty)
    assert(r.filterEntities(Map.empty).size == 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ent-labels").toString
    Registry.save(r, spark, dir)
    assert(Registry.load(spark, dir).getEntity("user_id").get.labels ==
           Map("team" -> "growth", "pii" -> "no"))
  }

  test("filterTables matches entity sets and label subsets") {
    val r = Registry.demo(sfDir)
    assert(r.filterTables(entitiesFilter = Seq("user_id")).map(_.name) == Seq("user_activity"))
    assert(r.filterTables(labelsFilter = Map("graft.ts_unit" -> "nanos")).map(_.name) == Seq("user_activity"))
    assert(r.filterTables(labelsFilter = Map("graft.ts_unit" -> "millis")).isEmpty)
    assert(r.filterTables().size == 2)
  }

  test("demo registry dumps one row per project×table×feature") {
    val df = Registry.demo(sfDir).toDF(spark)
    assert(df.count() == 4)
    assert(df.columns.contains("max_age_sec"))
    assert(df.columns.head == "project")
    assert(df.select("project").distinct().collect().map(_.getString(0)).toSeq == Seq("default"))
  }

  test("registryDiffOf: whole-table adds/removes and cross-project isolation") {
    import spark.implicits._
    def dump(rows: Seq[(String, String, String, String, Long)]) =
      rows.toDF("project", "table_name", "feature", "value_type", "max_age_sec")
    val old = dump(Seq(
      ("default", "t1", "f1", "DOUBLE", 0L),
      ("default", "gone", "g1", "STRING", 10L),
      ("other", "t1", "f1", "DOUBLE", 0L))) // same table name, other project
    val neu = dump(Seq(
      ("default", "t1", "f1", "DOUBLE", 0L),
      ("default", "born", "b1", "INT64", 0L),
      ("other", "t1", "f1", "STRING", 0L))) // retyped ONLY in `other`
    val got = graft.operators.FeatureOps.registryDiffOf(old, neu).collect()
      .map(r => (r.getAs[String]("project"), r.getAs[String]("table_name"),
        r.getAs[String]("feature")) -> r.getAs[String]("status")).toMap
    assert(got(("default", "t1", "f1")) == "UNCHANGED")
    assert(got(("default", "gone", "g1")) == "REMOVED")
    assert(got(("default", "born", "b1")) == "ADDED")
    assert(got(("other", "t1", "f1")) == "TYPE_CHANGED",
      "a retype in one project must not leak into its namesake")
    assert(got.size == 4)
  }
}
