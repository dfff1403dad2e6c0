package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class CovisitationSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, user: Long, minute: Long, item: Long) =
    (id, new Timestamp(1700000000000L + minute * 60000L), user, "view",
      1.0, s"""{"k": $item}""")

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double, String)],
                  k: Int = 5, maxItems: Int = 50) =
    Covisitation.topCovisited(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      k = k, maxItemsPerSession = maxItems)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))

  test("items in one session pair up; sessions 30min apart don't") {
    // user 1: items 10, 20 within minutes; then item 30 an hour later
    val rows = Seq(ev(1, 1, 0, 10), ev(2, 1, 5, 20), ev(3, 1, 120, 30))
    val got = run(rows).toSet
    assert(got == Set((10L, 20L, 1L, 1), (20L, 10L, 1L, 1)))
  }

  test("counts accumulate across users; rank by (cnt desc, co_item asc)") {
    val rows = Seq(
      ev(1, 1, 0, 10), ev(2, 1, 1, 20),             // u1: {10,20}
      ev(3, 2, 0, 10), ev(4, 2, 1, 20), ev(5, 2, 2, 30), // u2: {10,20,30}
      ev(6, 3, 0, 10), ev(7, 3, 1, 30))             // u3: {10,30}
    val got = run(rows, k = 2)
    val for10 = got.filter(_._1 == 10L).sortBy(_._4).toSeq
    assert(for10 == Seq((10L, 20L, 2L, 1), (10L, 30L, 2L, 2))) // tie → 20 first
  }

  test("duplicate item views in a session count once") {
    val rows = Seq(ev(1, 1, 0, 10), ev(2, 1, 1, 10), ev(3, 1, 2, 20))
    val got = run(rows).filter(t => t._1 == 10L && t._2 == 20L)
    assert(got.map(_._3).toSeq == Seq(1L))
  }

  test("marathon sessions are dropped before pairing") {
    // session with 3 items when cap is 2 contributes nothing
    val rows = Seq(ev(1, 1, 0, 10), ev(2, 1, 1, 20), ev(3, 1, 2, 30),
      ev(4, 2, 0, 40), ev(5, 2, 1, 50))
    val got = run(rows, maxItems = 2)
    assert(got.forall(t => t._1 >= 40L))
  }

  test("events without an item are ignored") {
    val rows = Seq(ev(1, 1, 0, 10),
      (2L, new Timestamp(1700000060000L), 1L, "view", 1.0, """{"x": 1}"""))
    assert(run(rows).isEmpty)
  }
}
