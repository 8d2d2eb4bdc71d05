package graft

import java.sql.Timestamp

import graft.operators.PointInTimeJoin

/** Randomized differential test: PointInTimeJoin.asof vs a naive in-memory
  * reference implementation, across many seeded random datasets with key
  * misses, exact-timestamp ties, duplicate (key, ts) pairs and TTLs. */
class AsofPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def naiveAsof(
      feats: Seq[(Long, Timestamp, Double)],
      entities: Seq[(Long, Timestamp, Long)],
      maxAgeSec: Option[Long]): Map[Long, Option[(Timestamp, Double)]] =
    entities.map { case (key, entityTs, rowId) =>
      val candidates = feats.filter(f => f._1 == key && !f._2.after(entityTs))
      val latest = candidates.sortBy(f => (f._2.getTime, f._3)).lastOption
      val fresh = latest.filter { case (_, ts, _) =>
        maxAgeSec.forall(age => ts.getTime >= entityTs.getTime - age * 1000L)
      }
      rowId -> fresh.map(f => (f._2, f._3))
    }.toMap

  test("asof equals the naive reference on 12 random datasets") {
    val rnd = new scala.util.Random(7)
    for (iter <- 1 to 12) {
      val maxAge = if (rnd.nextBoolean()) Some(rnd.between(60L, 3600L)) else None
      val feats = Seq.fill(40)((rnd.nextInt(4).toLong,
        new Timestamp(base + rnd.nextInt(5000) * 1000L), rnd.nextInt(50).toDouble))
      val entities = (1 to 25).map(i => (rnd.nextInt(6).toLong,
        new Timestamp(base + rnd.nextInt(5000) * 1000L), i.toLong))
      val expected = naiveAsof(feats, entities, maxAge)
      val actual = PointInTimeJoin.asof(
          entities.toDF("user_id", "entity_ts", "row_id"),
          feats.toDF("user_id", "ts", "value"),
          Seq("user_id"), "entity_ts", "ts", Seq("value"), maxAge)
        .collect().map { r =>
          r.getAs[Long]("row_id") ->
            (Option(r.getAs[Timestamp]("feat_ts")), Option(r.getAs[java.lang.Double]("feat_value")))
        }.toMap
      entities.foreach { case (_, _, rowId) =>
        val exp = expected(rowId)
        val act = actual(rowId)
        assert(act._1 == exp.map(_._1) && act._2.map(_.doubleValue) == exp.map(_._2),
          s"iter=$iter row=$rowId maxAge=$maxAge: expected $exp, got $act")
      }
    }
  }
}
