package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("asofBackward picks latest right row at or before left ts, per key") {
    val left = Seq(
      (1L, 100L, ts(50)), (1L, 101L, ts(10)), (1L, 102L, ts(5)),
      (2L, 200L, ts(30))
    ).toDF("user_id", "event_id", "t")
    val right = Seq(
      (1L, 900L, ts(8)), (1L, 901L, ts(50)), (1L, 902L, ts(60)),
      (3L, 903L, ts(1))
    ).toDF("user_id", "event_id", "t")

    val got = AsOfJoin.asofBackward(left, right, Seq("user_id"),
        "t", "t", Seq("event_id"), tiebreak = Some("event_id"))
      .select(col("event_id"), col("__match.event_id").as("m"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got(100L).contains(901L)) // inclusive: right at same ts matches
    assert(got(101L).contains(900L)) // latest ≤ 10 is ts(8)
    assert(got(102L).isEmpty)        // nothing at or before ts(5)
    assert(got(200L).isEmpty)        // no right rows for key 2
  }

  test("asofForward picks earliest right row at or after left ts, per key") {
    val left = Seq(
      (1L, 100L, ts(50)), (1L, 101L, ts(10)), (1L, 102L, ts(70)),
      (2L, 200L, ts(30))
    ).toDF("user_id", "event_id", "t")
    val right = Seq(
      (1L, 900L, ts(8)), (1L, 901L, ts(50)), (1L, 902L, ts(60)),
      (3L, 903L, ts(1))
    ).toDF("user_id", "event_id", "t")

    val got = AsOfJoin.asofForward(left, right, Seq("user_id"),
        "t", "t", Seq("event_id"), tiebreak = Some("event_id"))
      .select(col("event_id"), col("__match.event_id").as("m"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got(100L).contains(901L)) // inclusive: right at same ts matches
    assert(got(101L).contains(901L)) // earliest >= 10 is ts(50)
    assert(got(102L).isEmpty)        // nothing at or after ts(70)
    assert(got(200L).isEmpty)        // no right rows for key 2
  }

  test("asofNearest picks the closer side; ties and equal-ts go backward") {
    val left = Seq(
      (1L, 100L, ts(50)), // back at 40 (d=10) vs fwd at 70 (d=20) -> back
      (1L, 101L, ts(65)), // back at 40 (d=25) vs fwd at 70 (d=5)  -> fwd
      (1L, 102L, ts(55)), // back at 40 (d=15) = fwd at 70 (d=15)  -> back
      (1L, 103L, ts(70)), // exact-ts match counts as backward, d=0
      (1L, 104L, ts(5)),  // nothing before -> forward only
      (1L, 105L, ts(99)), // nothing after  -> backward only
      (2L, 200L, ts(30))  // no right rows at all -> null
    ).toDF("user_id", "event_id", "t")
    val right = Seq(
      (1L, 900L, ts(40)), (1L, 901L, ts(70)),
      (3L, 903L, ts(1))
    ).toDF("user_id", "event_id", "t")

    val got = AsOfJoin.asofNearest(left, right, Seq("user_id"),
        "t", "t", Seq("event_id"), tiebreak = Some("event_id"))
      .select(col("event_id"), col("__match.event_id").as("m"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got(100L).contains(900L))
    assert(got(101L).contains(901L))
    assert(got(102L).contains(900L)) // equidistant -> backward wins
    assert(got(103L).contains(901L)) // d=0 via the backward scan
    assert(got(104L).contains(900L)) // only a forward match (earliest >= 5)
    assert(got(105L).contains(901L)) // only a backward match exists
    assert(got(200L).isEmpty)
    assert(got.size == 7)            // every left row exactly once
  }

  test("asofBackward keeps every left row exactly once") {
    val left = Seq((1L, 1L, ts(1)), (1L, 2L, ts(2)), (2L, 3L, ts(3)))
      .toDF("k", "id", "t")
    val right = Seq((1L, 10L, ts(0))).toDF("k", "id", "t")
    val got = AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("id"))
    assert(got.count() == 3)
  }
}
