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

/** In-memory registry with the reference Core's CRUD surface
  * (reference: CoreServiceImpl.java apply/get/list/delete). */
final class Registry {
  private val entities = scala.collection.mutable.LinkedHashMap.empty[String, Entity]
  private val tables   = scala.collection.mutable.LinkedHashMap.empty[String, FeatureTable]

  def applyEntity(e: Entity): Unit = entities.update(e.name, e)
  def applyTable(t: FeatureTable): Unit = {
    val missing = t.entities.filterNot(entities.contains)
    require(missing.isEmpty, s"unknown entities: ${missing.mkString(",")}")
    tables.update(t.name, t)
  }
  def getEntity(name: String): Option[Entity] = entities.get(name)
  def getTable(name: String): Option[FeatureTable] = tables.get(name)
  def listEntities: Seq[Entity] = entities.values.toSeq
  def listTables: Seq[FeatureTable] = tables.values.toSeq
  def deleteTable(name: String): Unit = tables.remove(name)

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
      batchSourcePath = Some(s"$sfDir/events.parquet")))
    r.applyTable(FeatureTable(
      name = "customer_profile",
      entities = Seq("c_custkey"),
      features = Seq(Feature("c_acctbal", ValueKind.DoubleK), Feature("c_mktsegment", ValueKind.StringK)),
      eventTsCol = "o_orderdate",
      batchSourcePath = Some(s"$sfDir/customer.parquet")))
    r
  }
}
