package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Registry data model, mirroring the reference's feature-store registry
  * (reference: core/src/main/java/feast/core/model/EntityV2.java,
  * FeatureTable.java:76-99, FeatureV2.java and the Value proto in
  * datatypes/). Spark-side it is plain metadata: case classes + a map.
  */
sealed abstract class ValueKind(val name: String) {
  def sparkType: DataType
}

object ValueKind {
  case object BytesK   extends ValueKind("BYTES")   { val sparkType: DataType = BinaryType }
  case object StringK  extends ValueKind("STRING")  { val sparkType: DataType = StringType }
  case object Int32K   extends ValueKind("INT32")   { val sparkType: DataType = IntegerType }
  case object Int64K   extends ValueKind("INT64")   { val sparkType: DataType = LongType }
  case object DoubleK  extends ValueKind("DOUBLE")  { val sparkType: DataType = DoubleType }
  case object FloatK   extends ValueKind("FLOAT")   { val sparkType: DataType = FloatType }
  case object BoolK    extends ValueKind("BOOL")    { val sparkType: DataType = BooleanType }
  case object UnixTsK  extends ValueKind("UNIX_TIMESTAMP") { val sparkType: DataType = TimestampType }
  final case class ListK(element: ValueKind) extends ValueKind(element.name + "_LIST") {
    val sparkType: DataType = ArrayType(element.sparkType)
  }

  val scalars: Seq[ValueKind] =
    Seq(BytesK, StringK, Int32K, Int64K, DoubleK, FloatK, BoolK, UnixTsK)

  def parse(s: String): ValueKind =
    if (s.endsWith("_LIST")) ListK(parse(s.stripSuffix("_LIST")))
    else scalars.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown value type: $s"))
}

/** An entity = a join key (reference: EntityV2). */
final case class Entity(name: String, valueType: ValueKind, description: String = "")

/** A single feature column (reference: FeatureV2). */
final case class Feature(name: String, valueType: ValueKind, labels: Map[String, String] = Map.empty)

/** A feature reference `table:feature`
  * (reference: common/../FeatureV2.getFeatureStringRef). */
final case class FeatureRef(table: String, feature: String) {
  override def toString: String = s"$table:$feature"
}

object FeatureRef {
  def parse(s: String): FeatureRef = s.split(":", 2) match {
    case Array(t, f) => FeatureRef(t, f)
    case _           => throw new IllegalArgumentException(s"bad feature ref: $s")
  }
}

/** A feature table: entities + features + freshness TTL + sources
  * (reference: FeatureTable.java — entities, features, maxAgeSecs,
  * batchSource, streamSource).
  */
final case class FeatureTable(
    name: String,
    entities: Seq[String],
    features: Seq[Feature],
    maxAgeSec: Option[Long] = None,
    eventTsCol: String = "event_timestamp",
    createdTsCol: Option[String] = None,
    batchSourcePath: Option[String] = None,
    streamSourcePath: Option[String] = None,
    labels: Map[String, String] = Map.empty) {
  def featureRefs: Seq[FeatureRef] = features.map(f => FeatureRef(name, f.name))
}

/** One derived feature of an on-demand view: a SQL expression over the
  * retrieved input columns (`table__feature`) and entity/request columns. */
final case class OnDemandFeature(name: String, sqlExpr: String)

/** On-demand feature view (reference: serving
  * OnlineTransformationService.java / isOnDemandFeatureReference — features
  * computed at retrieval time from other features + request data; here the
  * transformation is a Catalyst SQL expression instead of a remote python
  * transformation service). */
final case class OnDemandView(
    name: String,
    inputs: Seq[FeatureRef],
    features: Seq[OnDemandFeature])

/** In-memory registry with the reference Core's CRUD surface
  * (reference: CoreServiceImpl.java apply/get/list/delete). */
final class Registry {
  private val entities = scala.collection.mutable.LinkedHashMap.empty[String, Entity]
  private val tables   = scala.collection.mutable.LinkedHashMap.empty[String, FeatureTable]
  private val odfvs    = scala.collection.mutable.LinkedHashMap.empty[String, OnDemandView]

  // reference: core/src/main/java/feast/core/validators/Matchers.java
  // (checkValidCharacters) — names are lower snake-case identifiers
  private val ValidName = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  private def requireValidName(kind: String, name: String): Unit =
    require(ValidName.matches(name),
      s"invalid $kind name '$name': must match ${ValidName.regex}")

  def applyEntity(e: Entity): Unit = {
    requireValidName("entity", e.name)
    entities.update(e.name, e)
  }
  def applyTable(t: FeatureTable): Unit = {
    requireValidName("table", t.name)
    t.features.foreach(f => requireValidName("feature", f.name))
    val missing = t.entities.filterNot(entities.contains)
    require(missing.isEmpty, s"unknown entities: ${missing.mkString(",")}")
    tables.update(t.name, t)
  }
  def applyOnDemandView(v: OnDemandView): Unit = {
    requireValidName("on-demand view", v.name)
    v.features.foreach(f => requireValidName("on-demand feature", f.name))
    val missing = v.inputs.map(_.table).distinct.filterNot(tables.contains)
    require(missing.isEmpty, s"unknown input tables: ${missing.mkString(",")}")
    odfvs.update(v.name, v)
  }
  def getEntity(name: String): Option[Entity] = entities.get(name)
  def getTable(name: String): Option[FeatureTable] = tables.get(name)
  def getOnDemandView(name: String): Option[OnDemandView] = odfvs.get(name)
  def listOnDemandViews: Seq[OnDemandView] = odfvs.values.toSeq
  def listEntities: Seq[Entity] = entities.values.toSeq
  def listTables: Seq[FeatureTable] = tables.values.toSeq
  def deleteTable(name: String): Unit = tables.remove(name)

  /** Tables whose entity set equals `entitiesFilter` and whose labels
    * contain every (k,v) of `labelsFilter` (reference:
    * FeatureTable.java:281-284 hasAllEntities + label filtering in
    * CoreServiceImpl.listFeatureTables). */
  def filterTables(entitiesFilter: Seq[String] = Seq.empty,
                   labelsFilter: Map[String, String] = Map.empty): Seq[FeatureTable] =
    listTables
      .filter(t => entitiesFilter.isEmpty || t.entities.toSet == entitiesFilter.toSet)
      .filter(t => labelsFilter.forall { case (k, v) => t.labels.get(k).contains(v) })

  /** Registry contents as a DataFrame (one row per table×feature). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    listTables.flatMap { t =>
      t.features.map { f =>
        (t.name, t.entities.mkString(","), f.name, f.valueType.name,
         t.maxAgeSec.getOrElse(0L), t.batchSourcePath.getOrElse(""))
      }
    }.toDF("table_name", "entities", "feature", "value_type", "max_age_sec", "batch_source")
  }
}

object Registry {

  /** Persist a registry as JSON datasets (entities + one row per
    * table×feature) — the registry IS data, so it round-trips through the
    * same engine. */
  def save(r: Registry, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    r.listEntities.map(e => (e.name, e.valueType.name, e.description))
      .toDF("name", "value_type", "description")
      .coalesce(1).write.mode("overwrite").json(s"$dir/entities")
    r.listTables.flatMap { t =>
      t.features.map { f =>
        (t.name, t.entities.mkString(","), f.name, f.valueType.name,
         t.maxAgeSec.getOrElse(-1L), t.eventTsCol, t.createdTsCol.getOrElse(""),
         t.batchSourcePath.getOrElse(""), t.streamSourcePath.getOrElse(""),
         t.labels.map { case (k, v) => s"$k=$v" }.mkString(";"))
      }
    }.toDF("table_name", "entities", "feature", "value_type", "max_age_sec",
           "event_ts_col", "created_ts_col", "batch_source", "stream_source",
           "labels")
      .coalesce(1).write.mode("overwrite").json(s"$dir/tables")
  }

  def load(spark: SparkSession, dir: String): Registry = {
    val r = new Registry
    spark.read.json(s"$dir/entities").collect().foreach { row =>
      r.applyEntity(Entity(
        row.getAs[String]("name"),
        ValueKind.parse(row.getAs[String]("value_type")),
        Option(row.getAs[String]("description")).getOrElse("")))
    }
    val rows = spark.read.json(s"$dir/tables").collect()
    rows.groupBy(_.getAs[String]("table_name")).foreach { case (name, fs) =>
      val head = fs.head
      def opt(s: String): Option[String] =
        Option(head.getAs[String](s)).filter(_.nonEmpty)
      r.applyTable(FeatureTable(
        name = name,
        entities = head.getAs[String]("entities").split(",").toSeq,
        features = fs.toSeq.map(f => Feature(f.getAs[String]("feature"),
          ValueKind.parse(f.getAs[String]("value_type")))),
        maxAgeSec = Some(head.getAs[Long]("max_age_sec")).filter(_ >= 0),
        eventTsCol = head.getAs[String]("event_ts_col"),
        createdTsCol = opt("created_ts_col"),
        batchSourcePath = opt("batch_source"),
        streamSourcePath = opt("stream_source"),
        labels = opt("labels").map(_.split(";").toSeq
          .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap)
          .getOrElse(Map.empty)))
    }
    r
  }
  /** Demo registry over the driver testdata (events as the feature stream). */
  def demo(sfDir: String): Registry = {
    val r = new Registry
    r.applyEntity(Entity("user_id", ValueKind.Int64K, "event actor"))
    r.applyEntity(Entity("c_custkey", ValueKind.Int64K, "customer key"))
    r.applyTable(FeatureTable(
      name = "user_activity",
      entities = Seq("user_id"),
      features = Seq(Feature("value", ValueKind.DoubleK), Feature("event_type", ValueKind.StringK)),
      maxAgeSec = Some(7L * 86400),
      eventTsCol = "ts",
      batchSourcePath = Some(s"$sfDir/events.parquet"),
      labels = Map("graft.ts_unit" -> "nanos")))
    r.applyOnDemandView(OnDemandView(
      name = "activity_derived",
      inputs = Seq(FeatureRef("user_activity", "value")),
      features = Seq(
        OnDemandFeature("value_x2", "round(user_activity__value * 2, 4)"),
        OnDemandFeature("is_high", "user_activity__value > 50"))))
    r.applyTable(FeatureTable(
      name = "customer_profile",
      entities = Seq("c_custkey"),
      features = Seq(Feature("c_acctbal", ValueKind.DoubleK), Feature("c_mktsegment", ValueKind.StringK)),
      eventTsCol = "o_orderdate",
      batchSourcePath = Some(s"$sfDir/customer.parquet")))
    r
  }
}
