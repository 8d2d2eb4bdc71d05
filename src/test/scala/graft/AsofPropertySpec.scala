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

  private def naiveForward(
      feats: Seq[(Long, Timestamp, Double)],
      entities: Seq[(Long, Timestamp, Long)],
      maxAgeSec: Option[Long]): Map[Long, Option[(Timestamp, Double)]] =
    entities.map { case (key, entityTs, rowId) =>
      val candidates = feats.filter(f => f._1 == key && !f._2.before(entityTs))
        .filter { case (_, ts, _) =>
          maxAgeSec.forall(age => ts.getTime <= entityTs.getTime + age * 1000L)
        }
      // earliest feature ts wins; among features at that ts, greatest value
      val earliest = candidates.map(_._2.getTime).minOption.map { ts =>
        val best = candidates.filter(_._2.getTime == ts).map(_._3).max
        (new Timestamp(ts), best)
      }
      rowId -> earliest
    }.toMap

  private def naiveNearest(
      feats: Seq[(Long, Timestamp, Double)],
      entities: Seq[(Long, Timestamp, Long)],
      maxAgeSec: Option[Long]): Map[Long, Option[(Timestamp, Double)]] = {
    val back = naiveAsof(feats, entities, maxAgeSec)
    val fwd = naiveForward(feats, entities, maxAgeSec)
    entities.map { case (_, entityTs, rowId) =>
      rowId -> ((back(rowId), fwd(rowId)) match {
        case (Some(b), Some(f)) =>
          val (db, df) = (math.abs(b._1.getTime - entityTs.getTime),
            math.abs(f._1.getTime - entityTs.getTime))
          if (db <= df) Some(b) else Some(f) // tie prefers backward
        case (b, f) => b.orElse(f)
      })
    }.toMap
  }

  test("forward and nearest as-of equal their naive references on 12 random datasets") {
    val rnd = new scala.util.Random(11)
    for (iter <- 1 to 12) {
      val maxAge = if (rnd.nextBoolean()) Some(rnd.between(60L, 3600L)) else None
      val feats = Seq.fill(40)((rnd.nextInt(4).toLong,
        new Timestamp(base + rnd.nextInt(5000) * 1000L), rnd.nextInt(50).toDouble))
      val entities = (1 to 25).map(i => (rnd.nextInt(6).toLong,
        new Timestamp(base + rnd.nextInt(5000) * 1000L), i.toLong))
      val entDf = entities.toDF("user_id", "entity_ts", "row_id")
      val featDf = feats.toDF("user_id", "ts", "value")
      def run(df: org.apache.spark.sql.DataFrame) =
        df.collect().map { r =>
          r.getAs[Long]("row_id") ->
            (Option(r.getAs[Timestamp]("feat_ts")),
              Option(r.getAs[java.lang.Double]("feat_value")))
        }.toMap
      val actF = run(PointInTimeJoin.asofForward(
        entDf, featDf, Seq("user_id"), "entity_ts", "ts", Seq("value"), maxAge))
      val actN = run(PointInTimeJoin.asofNearest(
        entDf, featDf, Seq("user_id"), "entity_ts", "ts", Seq("value"), maxAge))
      val expF = naiveForward(feats, entities, maxAge)
      val expN = naiveNearest(feats, entities, maxAge)
      entities.foreach { case (_, _, rowId) =>
        assert(actF(rowId)._1 == expF(rowId).map(_._1) &&
          actF(rowId)._2.map(_.doubleValue) == expF(rowId).map(_._2),
          s"forward iter=$iter row=$rowId maxAge=$maxAge: " +
            s"expected ${expF(rowId)}, got ${actF(rowId)}")
        assert(actN(rowId)._1 == expN(rowId).map(_._1) &&
          actN(rowId)._2.map(_.doubleValue) == expN(rowId).map(_._2),
          s"nearest iter=$iter row=$rowId maxAge=$maxAge: " +
            s"expected ${expN(rowId)}, got ${actN(rowId)}")
      }
    }
  }

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
