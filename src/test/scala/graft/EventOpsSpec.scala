package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000), i.toLong % 7,
        "purchase", v, s"""{"k": $i}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("fraud filter is strict >: boundary value excluded") {
    val df = mkEvents(Seq(99.99, 100.0, 100.0000001, 150.0))
    val fraud = EventOps.fraudFilter(df).select("value").as[Double].collect()
    assert(fraud.toSeq === Seq(100.0000001, 150.0))
  }

  test("property: branch legs are disjoint and complete for random values") {
    val gen = Gen.listOfN(40, Gen.choose(0.0, 200.0))
    (0 until 5).foreach { i =>
      val vs = gen(Gen.Parameters.default, Seed(42L + i)).get
      val df = mkEvents(vs)
      val fraud = EventOps.fraudFilter(df).count()
      val other = EventOps.branchOther(df).count()
      assert(fraud + other === vs.length.toLong, s"sample $i")
    }
  }

  test("parseProps yields null for malformed JSON instead of failing") {
    val df = Seq(
      (0L, new java.sql.Timestamp(0L), 0L, "x", 1.0, """{"k": 42}"""),
      (1L, new java.sql.Timestamp(0L), 0L, "x", 1.0, """not json"""),
      (2L, new java.sql.Timestamp(0L), 0L, "x", 1.0, null.asInstanceOf[String])
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ks = EventOps.parseProps(df).select("k").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(ks.toSeq === Seq(Some(42), None, None))
  }

  test("top10 ranks by exact total with user_id tie-break") {
    // users 0..5 get 3×150, user 6 gets 2×150 → 450-ties ordered by user_id
    val df = mkEvents(Seq.fill(20)(150.0))
    val rows = EventOps.top10ByUser(df).select("user_id").as[Long].collect()
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }
}
